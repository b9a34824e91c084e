from . import common_functions  # noqa: F401
