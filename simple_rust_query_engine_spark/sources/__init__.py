"""Sources & sinks.

The reference supports a single source (CSV, ``FileFormat::Csv`` is
the sole variant, ``src/io/mod.rs:57-59``) and NO sinks
(``src/io/writer/mod.rs`` is empty).  Here: CSV + parquet + NDJSON +
ORC readers and parquet/csv/json/orc writers (capability bonus
flagged in SURVEY §2.1).
"""

from .csv import CsvReadOptions, read_csv
from .json import read_json, read_orc, write_json, write_orc
from .write import write_csv, write_parquet

__all__ = [
    "CsvReadOptions",
    "read_csv",
    "read_json",
    "read_orc",
    "write_csv",
    "write_json",
    "write_orc",
    "write_parquet",
]
