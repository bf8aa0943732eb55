from .field import Dimensioned, SurfaceField, VolField  # noqa: F401
from . import bcs  # noqa: F401  (populates the BC registry)
from .io import read_vol_field, write_vol_field  # noqa: F401
