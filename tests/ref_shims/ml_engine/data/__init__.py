from . import grouping  # noqa: F401
