"""Solution controls: SIMPLE/PISO/PIMPLE outer-iteration drivers.

Capability surface of the reference's solutionControl family (reference:
cfdTools/general/solutionControl: simpleControl.H:47, pimpleControl.H:47):
corrector counts from fvSolution, residual-based convergence
(residualControl) evaluated from the per-step solver performance the
jitted step returns.
"""

from __future__ import annotations

import re

from ..utils.dictionary import Dictionary
from ..utils.logging import info


class SolutionControl:
    dict_name = "SIMPLE"

    def __init__(self, case):
        self.case = case
        self.dict = case.algo_dict(self.dict_name) or Dictionary()
        self.n_non_orth = int(self.dict.scalar(
            "nNonOrthogonalCorrectors", 0))
        self.momentum_predictor = self.dict.boolean(
            "momentumPredictor", True)
        self.p_ref_cell = int(self.dict.scalar("pRefCell", 0))
        self.p_ref_value = float(self.dict.scalar("pRefValue", 0.0))
        self._residual_targets = self._read_residual_control()
        self._converged = False

    def _read_residual_control(self):
        rc = self.dict.subdict("residualControl", required=False)
        out = {}
        if rc:
            for key, val in rc.items():
                if isinstance(val, Dictionary):  # PIMPLE form
                    out[str(key)] = float(val.scalar("tolerance", 0.0))
                else:
                    out[str(key)] = float(val)
        return out

    def criteria_satisfied(self, initial_residuals: dict) -> bool:
        """initial_residuals: field -> initial residual this iteration."""
        if not self._residual_targets:
            return False
        checked = False
        for pattern, target in self._residual_targets.items():
            for field, res in initial_residuals.items():
                if re.fullmatch(pattern, field) or pattern == field:
                    checked = True
                    if res > target:
                        return False
        return checked


class SimpleControl(SolutionControl):
    """reference: simpleControl::loop — steady iterations until
    residualControl targets are met or endTime."""
    dict_name = "SIMPLE"

    def loop(self, initial_residuals: dict | None = None) -> bool:
        if initial_residuals and self.criteria_satisfied(initial_residuals):
            info("\nSIMPLE solution converged in "
                 f"{self.case.time.name} iterations\n")
            self._converged = True
            return False
        return self.case.time.loop()

    @property
    def converged(self):
        return self._converged


class PisoControl(SolutionControl):
    dict_name = "PISO"

    def __init__(self, case):
        super().__init__(case)
        self.n_correctors = int(self.dict.scalar("nCorrectors", 1))


class PimpleControl(SolutionControl):
    """reference: pimpleControl.H:47 — nOuterCorrectors outer loops of
    nCorrectors PISO corrections; final-iteration solver/relaxation
    switching handled by the solver via 'final' flags."""
    dict_name = "PIMPLE"

    def __init__(self, case):
        super().__init__(case)
        self.n_outer = int(self.dict.scalar("nOuterCorrectors", 1))
        self.n_correctors = int(self.dict.scalar("nCorrectors", 1))
        self.turb_on_final_only = self.dict.boolean(
            "turbOnFinalIterOnly", True)
