from .dimensions import DimensionSet, dimless  # noqa: F401
from .dictionary import Dictionary, parse_dictionary, parse_file  # noqa: F401
from .registry import register, lookup, registered_names  # noqa: F401
