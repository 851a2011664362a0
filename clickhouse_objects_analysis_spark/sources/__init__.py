"""Source/sink connectors (SURVEY §2.B scans/sources/sinks)."""

from .io import (  # noqa: F401
    numbers,
    read_csv,
    read_json,
    scratch_path,
    write_csv,
    write_json,
    write_partitioned_parquet,
)
