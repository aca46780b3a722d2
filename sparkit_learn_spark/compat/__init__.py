"""Migration facades for reference-API users."""

from .blocked import ArrayTable, DictTable, block  # noqa: F401
