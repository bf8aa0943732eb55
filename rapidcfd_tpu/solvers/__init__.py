from .case import Case  # noqa: F401
