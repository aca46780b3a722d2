"""Migration facades for reference-API users."""

from .blocked import (  # noqa: F401
    ArrayTable,
    DictTable,
    SparseTable,
    block,
    set_arrow_block_size,
)
