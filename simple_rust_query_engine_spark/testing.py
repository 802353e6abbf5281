"""Local oracle-parity harness mirroring the driver's t2 check:
run each ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, compare row count + column names +
order-insensitive values (exact for ints/strings, tiny epsilon for
floats).
"""

from __future__ import annotations

import math
import os

import duckdb

from .session import TPCH_TABLES


def duckdb_conn(sf_dir: str):
    con = duckdb.connect()
    for name in TPCH_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _norm_cell(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _sort_cell(v):
    # rows that compare equal under the value tolerance must also sort
    # identically, or cross-engine float jitter could misalign the
    # pairwise zip — so the SORT key rounds floats more coarsely (1e-6)
    # than the comparison (1e-9 cell rounding + 1e-9 isclose): jitter
    # between the two scales sorts identically and still compares.
    if isinstance(v, float) and not isinstance(v, bool):
        return str(round(v, 6)) if not math.isnan(v) else "NaN"
    return str(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, _sort_cell(x)) for x in r))
    return sorted(cols), out


#: coarse cross-engine type vocabulary — the driver's schema gate
#: compares types, so the local mirror must too; coarse because the
#: engines legitimately differ in width (DuckDB SUM(BIGINT)→HUGEINT,
#: quantile→DECIMAL) while a string-vs-number or ts-vs-number slip is
#: always a bug
_TYPE_CANON = {
    "tinyint": "int", "smallint": "int", "int": "int", "integer": "int",
    "bigint": "int", "hugeint": "int", "ubigint": "int", "uinteger": "int",
    "float": "float", "real": "float", "double": "float",
    "boolean": "bool", "varchar": "str", "string": "str",
    "date": "date",
}


def _canon_type(t: str) -> str:
    t = str(t).lower()
    if t.startswith("decimal"):
        return "float"
    if "timestamp" in t:
        return "ts"
    if t.startswith("array") or t.endswith("[]") or t.startswith("list"):
        return "array"
    return _TYPE_CANON.get(t, t)


def compare(spark_df, con, sql: str, float_tol: float = 1e-9) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity).

    ``float_tol`` default is deliberately tight (1e-9): every oracle
    twin is built from identical deterministic arithmetic, so floats
    agree to the last decimal the comparison sees — a looser default
    would hide exactly the class of cross-engine drift (round-boundary
    flips) that the driver's exact value-hash catches.
    """
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_res = con.sql(sql)
    o_cols = list(o_res.columns)
    o_rows = [tuple(r) for r in o_res.fetchall()]

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems

    s_types = {c: _canon_type(t) for c, t in spark_df.dtypes}
    o_types = {c: _canon_type(t) for c, t in zip(o_res.columns, o_res.types)}
    for c in s_cols:
        if s_types[c] != o_types.get(c):
            problems.append(
                f"dtype {c}: spark={s_types[c]} oracle={o_types.get(c)}"
            )
    if problems:
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")

    _, sn = _norm_rows(s_cols, s_rows)
    _, on = _norm_rows(o_cols, o_rows)
    n_bad = 0
    for i, (a, b) in enumerate(zip(sn, on)):
        if a == b:
            continue
        ok = len(a) == len(b)
        if ok:
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    if not math.isclose(x, y, rel_tol=float_tol, abs_tol=float_tol):
                        ok = False
                        break
                elif isinstance(x, float) and isinstance(y, (int,)) or (
                    isinstance(y, float) and isinstance(x, int)
                ):
                    if not math.isclose(float(x), float(y), rel_tol=float_tol):
                        ok = False
                        break
                elif x != y:
                    ok = False
                    break
        if not ok:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={a} oracle={b}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems


def check_all(spark, sf_dir: str, only: list[str] | None = None) -> dict[str, list[str]]:
    """Run every queries()/oracle_sql() pair; return {name: problems}."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = duckdb_conn(sf_dir)
    results: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            results[name] = ["(rows-only: no oracle)"]
            continue
        try:
            results[name] = compare(fn(spark, sf_dir), con, oracles[name])
        except Exception as exc:  # surface, keep going
            results[name] = [f"EXCEPTION: {type(exc).__name__}: {exc}"]
    return results
