"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast of the query vector
against a map-only scoring pass, then TakeOrderedAndProject.  Exactly
the plan you want at scale: score is embarrassingly parallel, only k
rows cross the final exchange.

Scale path: random-hyperplane LSH bucketing — deterministic sign-bit
buckets computed map-only; candidate search touches one bucket
(≈ n / 2^bits of the corpus).  An IVF variant would replace the
hyperplanes with k-means centroids (Spark ML KMeans) — same plan
shape: assign → co-partition by cell → search probed cells.

Determinism for the DuckDB oracle: dot products are sequential left
folds over index order (F.aggregate ↔ list_reduce) with float→double
casts — bit-identical across engines, so even raw doubles hash-match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LSH_PLANES = 4  # bucket bits for the scale path


def _dots(a, b) -> Column:
    """Sequential left-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine(a, b) -> Column:
    # fixed operation order (dot / |a| / |b|) so engines agree bitwise
    return _dots(a, b) / _norm(a) / _norm(b)


def ann_brute_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """Top-k cosine neighbours of ``query_vec_id`` by full scan.

    The 1-row query side is cross-joined (Catalyst → broadcast
    nested loop over a single row = free); scoring is map-only.
    Norms are precomputed per row so the scoring pass folds each
    embedding once, not three times.  Division order (dot / |q| /
    |c|) mirrors the oracle — float division is order-sensitive in
    the last bit."""
    q = (
        emb.filter(F.col("vec_id") == query_vec_id)
        .select(
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_nrm"),
        )
    )
    return (
        emb.filter(F.col("vec_id") != query_vec_id)
        .withColumn("nrm", _norm(F.col("embedding")))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (_dots(F.col("q_emb"), F.col("embedding")) / F.col("q_nrm") / F.col("nrm")).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def hyperplane_sign(emb_col, j: int) -> Column:
    """Sign bit of the dot product with deterministic pseudo-random
    hyperplane j: component i is +1 when (i*j + i + j) is even."""
    signed = F.zip_with(
        emb_col,
        F.sequence(F.lit(0), F.size(emb_col) - 1),
        lambda x, i: F.when(((i * F.lit(j) + i + F.lit(j)) % 2) == 0, x.cast("double")).otherwise(
            -x.cast("double")
        ),
    )
    dot = F.aggregate(signed, F.lit(0.0), lambda acc, x: acc + x)
    return F.when(dot > 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(emb_col) -> Column:
    b = F.lit(0)
    for j in range(LSH_PLANES):
        b = b + hyperplane_sign(emb_col, j) * F.lit(2**j)
    return b.cast("int")


def ann_lsh_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 5) -> DataFrame:
    """Scale-path ANN: search only the query's hyperplane bucket.
    Recall < 1 by design; production raises LSH_PLANES and probes
    neighbouring buckets (multi-probe)."""
    bucketed = emb.withColumn("bucket", lsh_bucket(F.col("embedding")))
    q = (
        bucketed.filter(F.col("vec_id") == query_vec_id)
        .select(
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_nrm"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    return (
        bucketed.filter(F.col("vec_id") != query_vec_id)
        .withColumn("nrm", _norm(F.col("embedding")))
        .join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .select(
            "vec_id",
            "bucket",
            (_dots(F.col("q_emb"), F.col("embedding")) / F.col("q_nrm") / F.col("nrm")).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ann_lsh_multiprobe_topk(
    emb: DataFrame, query_vec_id: int = 0, k: int = 5
) -> DataFrame:
    """Multi-probe LSH: search the query's bucket PLUS every bucket at
    hamming distance 1 (one hyperplane bit flipped) — the standard
    recall upgrade over single-probe without adding hash tables.  The
    vectors most likely lost to single-probe sit just across ONE
    hyperplane; probing the LSH_PLANES+1 nearest buckets recovers
    them while still scanning only (planes+1)/2^planes of the corpus.
    Plan shape is unchanged: map-side bucketing, 1-row broadcast,
    disjunctive equi-probes on the broadcast side, TakeOrdered."""
    bucketed = emb.withColumn("bucket", lsh_bucket(F.col("embedding")))
    q = (
        bucketed.filter(F.col("vec_id") == query_vec_id)
        .select(
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_nrm"),
            F.col("bucket").alias("q_bucket"),
        )
    )
    probe = F.col("bucket") == F.col("q_bucket")
    for j in range(LSH_PLANES):
        probe = probe | (
            F.col("bucket") == F.col("q_bucket").bitwiseXOR(F.lit(1 << j))
        )
    return (
        bucketed.filter(F.col("vec_id") != query_vec_id)
        .withColumn("nrm", _norm(F.col("embedding")))
        .join(F.broadcast(q), probe)
        .select(
            "vec_id",
            "bucket",
            (_dots(F.col("q_emb"), F.col("embedding")) / F.col("q_nrm") / F.col("nrm")).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


IVF_CELLS = 16   # coarse cells (vectors 0..15 act as fixed centroids)
IVF_PROBE = 4    # cells searched per query


def _ivf_centroids(emb: DataFrame):
    """Deterministic 'trained' centroids: the first IVF_CELLS vectors
    by vec_id.  In production this is KMeans (Spark ML) — either way
    the centroid matrix is driver-side model state, tiny (cells×dim),
    and broadcast into the assignment UDF; collecting it is the IVF
    design, not a driver-side data loop."""
    rows = (
        emb.filter(F.col("vec_id") < IVF_CELLS)
        .orderBy("vec_id")
        .select("vec_id", "embedding")
        .collect()
    )
    C = np.stack([np.asarray(r.embedding) for r in rows]).astype(np.float64)
    return C


def _cell_assign_udf(C: "np.ndarray"):
    """cell = argmax over centroids of cos(v, c); ties → lowest cell.
    Sequential-fold arithmetic (dims left-to-right) for oracle parity."""
    from pyspark.sql.functions import pandas_udf

    n_cells, dim = C.shape
    c_nrm = np.zeros(n_cells)
    for d in range(dim):
        c_nrm = c_nrm + C[:, d] * C[:, d]
    c_nrm = np.sqrt(c_nrm)

    @pandas_udf("int")
    def assign(embs: pd.Series) -> pd.Series:
        if len(embs) == 0:
            return pd.Series([], dtype="int32")
        A = np.stack(embs.to_numpy()).astype(np.float64)
        v_nrm = np.zeros(len(A))
        dot = np.zeros((len(A), n_cells))
        for d in range(A.shape[1]):
            v_nrm = v_nrm + A[:, d] * A[:, d]
            dot = dot + np.outer(A[:, d], C[:, d])
        cos = dot / np.sqrt(v_nrm)[:, None] / c_nrm[None, :]
        return pd.Series(np.argmax(cos, axis=1).astype("int32"))

    return assign


def ann_ivf_topk(emb: DataFrame, query_vec_id: int = 0, k: int = 5) -> DataFrame:
    """IVF ANN: assign every vector to its nearest coarse cell
    (map-side, broadcast centroid matrix), then search only the
    query's IVF_PROBE nearest cells.  Same plan at 100 TB: the
    assignment is a map over input splits; the probe prunes the scan
    to n_probe/n_cells of the corpus (with cell as a partition/
    cluster key the pruning happens at the storage layer)."""
    C = _ivf_centroids(emb)
    assign = _cell_assign_udf(C)
    cells = emb.withColumn("cell", assign(F.col("embedding")))

    q = (
        cells.filter(F.col("vec_id") == query_vec_id)
        .select(
            F.col("embedding").alias("q_emb"),
            _norm(F.col("embedding")).alias("q_nrm"),
        )
    )
    # the query's IVF_PROBE nearest cells, computed from the same
    # centroid matrix (driver-side: n_cells tiny)
    q_row = emb.filter(F.col("vec_id") == query_vec_id).select("embedding").collect()
    v = np.asarray(q_row[0].embedding, dtype=np.float64)
    dim = len(v)
    v_nrm = 0.0
    dots = np.zeros(len(C))
    for d in range(dim):
        v_nrm = v_nrm + v[d] * v[d]
        dots = dots + v[d] * C[:, d]
    c_nrm = np.zeros(len(C))
    for d in range(dim):
        c_nrm = c_nrm + C[:, d] * C[:, d]
    cos_c = dots / np.sqrt(v_nrm) / np.sqrt(c_nrm)
    # stable sort: cosine ties break toward the lower cell id, like
    # the oracle's ORDER BY c_cos DESC, cell ASC
    probe = sorted(np.argsort(-cos_c, kind="stable")[:IVF_PROBE].tolist())

    return (
        cells.filter(F.col("vec_id") != query_vec_id)
        .filter(F.col("cell").isin(probe))
        .withColumn("nrm", _norm(F.col("embedding")))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "cell",
            (_dots(F.col("q_emb"), F.col("embedding")) / F.col("q_nrm") / F.col("nrm")).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def q_ann_brute(t: dict) -> DataFrame:
    return ann_brute_topk(t["embeddings"], query_vec_id=0, k=10)


def q_ann_lsh(t: dict) -> DataFrame:
    return ann_lsh_topk(t["embeddings"], query_vec_id=0, k=5)


def q_ann_ivf(t: dict) -> DataFrame:
    return ann_ivf_topk(t["embeddings"], query_vec_id=0, k=5)


def q_ann_multiprobe(t: dict) -> DataFrame:
    return ann_lsh_multiprobe_topk(t["embeddings"], query_vec_id=0, k=5)


NEARDUP_T = 0.45


def q_embedding_neardup(t: dict) -> DataFrame:
    """Embedding near-dup pairs (cosine >= NEARDUP_T), LSH-bucket
    blocked.  (Threshold calibrated to the driver corpus — its max
    pairwise cosine ≈ 0.51.)

    Plan: groupBy(bucket).applyInPandas — each vector crosses the
    shuffle ONCE (a bucket-join would materialize every candidate
    pair × two 64-float vectors through the exchange: ~250 MB at
    sf0.1 vs ~1 MB here); the within-bucket pairwise matrix is numpy.
    Bit-parity with the DuckDB oracle: the dimension loop accumulates
    partial sums left-to-right exactly like list_reduce/F.aggregate,
    float32→float64 products are exact, division order dot/|a|/|b|.

    At 100 TB: one shuffle on a uniform bucket key; per-bucket work
    is dense vectorized compute — the classic blocked all-pairs
    shape.  A hot bucket means real near-dups (the output itself)."""

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"vec_a": pd.Series(dtype="int64"),
                 "vec_b": pd.Series(dtype="int64"),
                 "cos_sim": pd.Series(dtype="float64")}
            )
        pdf = pdf.sort_values("vec_id")
        ids = pdf["vec_id"].to_numpy()
        A = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        dim = A.shape[1]
        nrm2 = np.zeros(n)
        dot = np.zeros((n, n))
        for d in range(dim):  # left-to-right fold, same as the oracle
            col = A[:, d]
            nrm2 = nrm2 + col * col
            dot = dot + np.outer(col, col)
        nrm = np.sqrt(nrm2)
        cos = dot / nrm[:, None] / nrm[None, :]
        ia, ib = np.triu_indices(n, k=1)  # sorted ids ⇒ vec_a < vec_b
        keep = cos[ia, ib] >= NEARDUP_T
        return pd.DataFrame(
            {"vec_a": ids[ia[keep]], "vec_b": ids[ib[keep]],
             "cos_sim": cos[ia[keep], ib[keep]]}
        )

    emb = t["embeddings"].withColumn("bucket", lsh_bucket(F.col("embedding")))
    return emb.groupBy("bucket").applyInPandas(
        bucket_pairs, "vec_a long, vec_b long, cos_sim double"
    )


# ------------------------------------------------------------- oracle
# DuckDB lists are 1-indexed; fold order mirrors F.aggregate exactly.
def _sql_dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, 65), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, x) -> acc + x)"
    )


def _sql_norm(a: str) -> str:
    return f"sqrt({_sql_dot(a, a)})"


def _sql_cos(a: str, b: str) -> str:
    return f"{_sql_dot(a, b)} / {_sql_norm(a)} / {_sql_norm(b)}"


_SQL_COS = _sql_cos("a_emb", "b_emb")


def _sql_sign(emb: str, j: int) -> str:
    return (
        f"(CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(1, 65), "
        f"i -> CASE WHEN ((i-1)*{j} + (i-1) + {j}) % 2 = 0 "
        f"THEN {emb}[i]::DOUBLE ELSE -{emb}[i]::DOUBLE END)), "
        f"(acc, x) -> acc + x) > 0 THEN 1 ELSE 0 END)"
    )


def _sql_bucket(emb: str) -> str:
    return "(" + " + ".join(f"{_sql_sign(emb, j)} * {2**j}" for j in range(LSH_PLANES)) + ")::INT"


_IVF_ORACLE = f"""
    WITH cent AS (
        SELECT vec_id AS cell, embedding AS c_emb FROM embeddings
        WHERE vec_id < {IVF_CELLS}
    ),
    scored AS (
        SELECT v.vec_id, cent.cell,
               {_sql_cos('v_emb', 'c_emb')} AS c_cos
        FROM (SELECT vec_id, embedding AS v_emb FROM embeddings) v
        CROSS JOIN cent
    ),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY c_cos DESC, cell ASC) AS rn
            FROM scored) t
        WHERE rn = 1
    ),
    probe AS (
        SELECT cell FROM scored WHERE vec_id = 0
        ORDER BY c_cos DESC, cell ASC LIMIT {IVF_PROBE}
    )
    SELECT b.vec_id AS vec_id, a2.cell::INT AS cell, {_SQL_COS} AS cos_sim
    FROM (SELECT embedding AS a_emb FROM embeddings WHERE vec_id = 0) q,
         (SELECT vec_id, embedding AS b_emb FROM embeddings
          WHERE vec_id <> 0) b
    JOIN assigned a2 ON a2.vec_id = b.vec_id
    WHERE a2.cell IN (SELECT cell FROM probe)
    ORDER BY cos_sim DESC, vec_id ASC LIMIT 5
"""

ORACLE: dict[str, str] = {
    "ann_ivf": _IVF_ORACLE,
    "ann_brute": f"""
        SELECT b.vec_id AS vec_id, {_SQL_COS} AS cos_sim
        FROM (SELECT embedding AS a_emb FROM embeddings WHERE vec_id = 0) q,
             (SELECT vec_id, embedding AS b_emb FROM embeddings WHERE vec_id <> 0) b
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """,
    "ann_lsh": f"""
        WITH bucketed AS (
            SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
            FROM embeddings
        )
        SELECT b.vec_id AS vec_id, b.bucket AS bucket, {_SQL_COS} AS cos_sim
        FROM (SELECT embedding AS a_emb, bucket FROM bucketed WHERE vec_id = 0) q
        JOIN (SELECT vec_id, embedding AS b_emb, bucket FROM bucketed
              WHERE vec_id <> 0) b
          ON q.bucket = b.bucket
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 5
    """,
    "ann_multiprobe": f"""
        WITH bucketed AS (
            SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
            FROM embeddings
        )
        SELECT b.vec_id AS vec_id, b.bucket AS bucket, {_SQL_COS} AS cos_sim
        FROM (SELECT embedding AS a_emb, bucket FROM bucketed WHERE vec_id = 0) q
        JOIN (SELECT vec_id, embedding AS b_emb, bucket FROM bucketed
              WHERE vec_id <> 0) b
          ON (b.bucket = q.bucket
              {' '.join(f'OR b.bucket = xor(q.bucket, {1 << j})' for j in range(LSH_PLANES))})
        ORDER BY cos_sim DESC, vec_id ASC LIMIT 5
    """,
    "embedding_neardup": f"""
        WITH bucketed AS (
            SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
            FROM embeddings
        )
        SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, {_SQL_COS} AS cos_sim
        FROM (SELECT vec_id, embedding AS a_emb, bucket FROM bucketed) x
        JOIN (SELECT vec_id, embedding AS b_emb, bucket FROM bucketed) y
          ON x.bucket = y.bucket AND x.vec_id < y.vec_id
        WHERE {_SQL_COS} >= 0.45
    """,
}

QUERIES = {
    "ann_brute": q_ann_brute,
    "ann_lsh": q_ann_lsh,
    "ann_multiprobe": q_ann_multiprobe,
    "ann_ivf": q_ann_ivf,
    "embedding_neardup": q_embedding_neardup,
}
