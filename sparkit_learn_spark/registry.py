"""Query/operator registry.

Each operator from SURVEY.md §2B registers a PySpark callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) its DuckDB
oracle SQL. ``__spark_entry__.py`` exposes these to the driver.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


def set_oracle(name: str, oracle: str) -> None:
    """Attach/replace the oracle of an already-registered query —
    for oracles composed from OTHER registered oracles (e.g. an eval
    query wrapping its classifier's SQL as a CTE), which cannot be
    passed to @register before the referenced module finished
    importing."""
    if name not in QUERIES:
        raise KeyError(f"set_oracle before registration: {name}")
    ORACLES[name] = textwrap.dedent(oracle).strip()


_LOADED = False


def load_all() -> None:
    """Import every query module so registrations run exactly once."""
    global _LOADED
    if _LOADED:
        return
    from . import queries  # noqa: F401  (imports all submodules)

    _LOADED = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
