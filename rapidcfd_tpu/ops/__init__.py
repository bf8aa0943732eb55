from . import fvc  # noqa: F401
from . import fvm  # noqa: F401
from .fvmatrix import FvMatrix  # noqa: F401
