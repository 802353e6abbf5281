"""Sinks (beyond reference parity — it has none, io/writer/mod.rs:1).

At 100 TB, output partitioning is the contract: ``partition_by`` for
downstream pruning, sensible file counts via AQE coalescing instead of
``coalesce(1)`` driver funnels.
"""

from __future__ import annotations

from typing import Optional, Sequence


def write_parquet(
    df,
    path: str,
    mode: str = "overwrite",
    partition_by: Optional[Sequence[str]] = None,
) -> None:
    inner = getattr(df, "df", df)
    writer = inner.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df, path: str, mode: str = "overwrite", header: bool = True) -> None:
    inner = getattr(df, "df", df)
    inner.write.mode(mode).option("header", str(header).lower()).csv(path)
