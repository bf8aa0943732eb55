from .solvers import solve, solve_component, SolverPerformance  # noqa: F401
