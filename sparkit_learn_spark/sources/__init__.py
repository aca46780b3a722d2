"""Sources & sinks: batch parquet I/O and streaming file sources."""

from .parquet_io import read_events_stream, write_parquet  # noqa: F401
