from .functionobjects import FunctionObjectList  # noqa: F401
