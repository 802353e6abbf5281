"""Plan inspection helpers."""

from .inspect import explain_str, pushed_filters, read_schema_columns, scan_info

__all__ = ["explain_str", "scan_info", "pushed_filters", "read_schema_columns"]
