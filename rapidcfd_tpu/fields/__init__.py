from .field import Dimensioned, SurfaceField, VolField  # noqa: F401
from . import bcs  # noqa: F401  (populates the BC registry)
from . import bcs_derived  # noqa: F401  (derived BC zoo, second tranche)
from . import bcs_coupled  # noqa: F401  (jump-cyclic family + fanPressure)
from . import bcs_mapped  # noqa: F401  (mapped* family + directionMixed)
from .io import read_vol_field, write_vol_field  # noqa: F401
