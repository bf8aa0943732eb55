from .polymesh import PolyMesh, read_polymesh  # noqa: F401
from .mesharrays import MeshArrays, build_mesh_arrays  # noqa: F401
