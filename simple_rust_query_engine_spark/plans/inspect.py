"""Physical-plan inspection — the rebuild's answer to the reference's
plan-shape tests (predicate_pushdown.rs:539-719,
projection_pushdown.rs:303-442 assert Display forms of rewritten
plans).  Here we assert on Spark's formatted physical plan instead:
PushedFilters reaching the parquet scan, ReadSchema column pruning,
broadcast-vs-shuffle join choice, WholeStageCodegen coverage.
"""

from __future__ import annotations

import re


def explain_str(df, mode: str = "formatted") -> str:
    from pyspark.sql import DataFrame as _SparkDF

    # unwrap an EngineDataFrame facade — but NEVER via bare getattr on
    # a real DataFrame: attribute access falls through to COLUMNS, so
    # a frame with a column literally named "df" (vocab_stats) would
    # hand back a Column here
    inner = df if isinstance(df, _SparkDF) else getattr(df, "df", df)
    return inner._sc._jvm.PythonSQLUtils.explainString(
        inner._jdf.queryExecution(), mode
    )


def scan_info(df) -> list[dict]:
    """Parse every parquet scan node out of the formatted plan:
    pushed filters + read schema per scan."""
    text = explain_str(df, "formatted")
    scans = []
    for block in re.split(r"\n\(\d+\) ", text):
        if not block.startswith("Scan parquet") and "Scan parquet" not in block.split("\n")[0]:
            continue
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: struct<(.*?)>", block, re.S)
        scans.append(
            {
                "pushed_filters": pushed.group(1) if pushed else "",
                "read_schema": schema.group(1).replace("\n", "") if schema else "",
            }
        )
    return scans


def pushed_filters(df) -> list[str]:
    return [s["pushed_filters"] for s in scan_info(df)]


def read_schema_columns(df) -> list[list[str]]:
    cols = []
    for s in scan_info(df):
        names = [c.split(":")[0].strip() for c in s["read_schema"].split(",") if ":" in c]
        cols.append(names)
    return cols


def join_strategies(df) -> list[str]:
    """Which join operators Catalyst picked (BroadcastHashJoin,
    SortMergeJoin, ShuffledHashJoin, BroadcastNestedLoopJoin...)."""
    text = explain_str(df, "formatted")
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)",
        text,
    )
