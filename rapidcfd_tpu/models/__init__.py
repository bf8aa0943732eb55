from .transport import SinglePhaseTransportModel  # noqa: F401
from . import turbulence  # noqa: F401
from . import turbulence_extra  # noqa: F401
