from .hooks import halo, set_halo, clear_hooks  # noqa: F401
