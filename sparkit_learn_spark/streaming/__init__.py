"""Structured-Streaming layer.

``transforms`` holds event-stream transformations written against a
plain DataFrame so the SAME code runs in batch mode (driver-checkable
against DuckDB) and in Structured Streaming (pytest parity harness,
tests/test_streaming.py) — the batch≡stream contract of SURVEY §5.2.
"""

from . import transforms  # noqa: F401
