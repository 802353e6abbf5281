"""Deduplication operators for LLM training-data pipelines.

Four families, each idiomatic Spark with a DuckDB oracle twin built
from identical deterministic arithmetic:

exact        hash-groupBy on md5(text) — one shuffle on the digest.
minhash_lsh  shingle→minhash→band→bucket-join. Signatures are pure
             vectorized array expressions (NO explode, no shuffle);
             only the band-bucket self-join shuffles, on the band key.
             This is the shape that survives 100 TB: candidate pairs
             ≈ true near-dups, never O(n²).
simhash      per-bit affine-hash votes folded over the token array;
             near-dup pairs by hamming distance over a band-bucketed
             self-join (band on high bits blocks the O(n²) compare).
ngram_jaccard exact 3-gram shingle Jaccard via explode + self-join —
             the *exact* verifier used downstream of LSH candidates;
             quadratic in colliding buckets, so keep it behind
             blocking at scale.

Cross-engine determinism: the word hash is an affine combo of
codepoints (see ``text.word_hash``); all arithmetic stays < 2^53 so
Spark longs and DuckDB BIGINTs agree exactly.  Swap ``F.xxhash64``
in production when no oracle twin is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_hash

MH_K = 16          # minhash functions
MH_BANDS = 4       # LSH bands (rows per band = MH_K // MH_BANDS)
MH_MOD = 1000003   # prime modulus for the affine permutations
SH_BITS = 16       # simhash width
SH_MOD = 1048583   # prime for per-bit mixing


def _distinct_word_hashes(text_col):
    return F.array_distinct(
        F.transform(F.array_distinct(F.split(text_col, " ")), word_hash)
    )


# ------------------------------------------------------------ exact
def q_dedup_exact(t: dict) -> DataFrame:
    """Exact dedup: group by content digest, keep lowest doc_id.
    Scale: shuffle on md5 — uniformly distributed, no skew."""
    return (
        t["documents"]
        .groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# ---------------------------------------------------------- minhash
def _perm(i: int):
    # closure factory: a bare 1-arg lambda, so F.transform doesn't
    # mistake an extra default param for the index argument
    return lambda x: (F.lit(2 * i + 3) * x + F.lit(7 * i + 1)) % F.lit(MH_MOD)


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """doc_id + sig array<long>[MH_K]; map-only, vectorized."""
    whs = _distinct_word_hashes(F.col("text"))
    sig = F.array(
        *[F.array_min(F.transform(whs, _perm(i))) for i in range(MH_K)]
    )
    return docs.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(docs: DataFrame) -> DataFrame:
    """Candidate near-dup pairs via banded LSH + exact signature
    agreement estimate. Returns (doc_a, doc_b, n_match, est_jaccard)."""
    rows = MH_K // MH_BANDS
    sigs = minhash_signatures(docs)
    band_arr = F.array(
        *[
            F.concat_ws(
                ",",
                F.lit(b),
                *[F.element_at("sig", b * rows + j + 1).cast("string") for j in range(rows)],
            )
            for b in range(MH_BANDS)
        ]
    )
    bands = sigs.select("doc_id", F.explode(band_arr).alias("band"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    n_match = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            n_match.alias("n_match"),
            (n_match.cast("double") / F.lit(float(MH_K))).alias("est_jaccard"),
        )
    )


def q_dedup_minhash(t: dict) -> DataFrame:
    return minhash_lsh_pairs(t["documents"])


# ---------------------------------------------------------- simhash
def simhash(docs: DataFrame) -> DataFrame:
    """SH_BITS-bit simhash: per bit j, fold +1/-1 votes of an affine
    per-bit hash parity over the (distinct) token hashes."""
    whs = _distinct_word_hashes(F.col("text"))

    def vote(j):
        def step(acc, x):
            bit = ((x * F.lit(2 * j + 3) + F.lit(j)) % F.lit(SH_MOD)) % 2
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

        return F.aggregate(whs, F.lit(0), step)

    sh = None
    for j in range(SH_BITS):
        term = F.when(vote(j) > 0, F.lit(2**j)).otherwise(F.lit(0))
        sh = term if sh is None else sh + term
    return docs.select("doc_id", sh.cast("long").alias("simhash"))


def q_simhash(t: dict) -> DataFrame:
    return simhash(t["documents"])


def q_simhash_pairs(t: dict) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= 3, blocked on the high
    byte of the hash (cheap band) so the self-join isn't O(n²) on big
    corpora: near-identical docs agree on high bits with high prob."""
    sh = simhash(t["documents"]).withColumn(
        "block", (F.col("simhash") / F.lit(256)).cast("long")
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "block"
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "block"
    )
    ham = F.expr("bit_count(sh_a ^ sh_b)")
    return (
        a.join(b, ["block"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )


# ----------------------------------------------------- ngram jaccard
def ngram_shingles(text_col, n: int = 3):
    """Distinct word n-gram shingles; empty when the doc is shorter
    than n tokens (guarded — Spark's sequence() would count down)."""
    toks = F.split(text_col, " ")
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), k - F.lit(n)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)]
        ),
    )
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def q_ngram_jaccard(t: dict) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.5). The
    explode + shingle self-join is the exact-verification stage; at
    scale it runs only over LSH candidate buckets."""
    d = t["documents"]
    sh = d.select(
        "doc_id", F.explode(ngram_shingles(F.col("text"))).alias("shingle")
    )
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    ca = cnt.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    cb = cnt.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("common")
    )
    return (
        common.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )


# ------------------------------------------------------------ oracle
_SQL_WH = "(ascii(w)*131 + length(w)*31 + ascii(reverse(w)))::BIGINT"
_SQL_WHS = (
    "list_distinct(list_transform(list_distinct(string_split(text, ' ')), "
    f"w -> {_SQL_WH}))"
)


def _minhash_sig_sql() -> str:
    cols = ", ".join(
        f"list_min(list_transform(hs, x -> ({2 * i + 3}*x + {7 * i + 1}) % {MH_MOD})) AS s{i}"
        for i in range(MH_K)
    )
    return f"SELECT doc_id, {cols} FROM (SELECT doc_id, {_SQL_WHS} AS hs FROM documents) t"


def _minhash_oracle() -> str:
    rows = MH_K // MH_BANDS
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, '{b},' || {parts} AS band FROM sig".format(
            b=b,
            parts=" || ',' || ".join(f"s{b * rows + j}::VARCHAR" for j in range(rows)),
        )
        for b in range(MH_BANDS)
    )
    n_match = " + ".join(f"(x.s{i} = y.s{i})::INT" for i in range(MH_K))
    return f"""
        WITH sig AS ({_minhash_sig_sql()}),
        bands AS ({band_selects}),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, ({n_match}) AS n_match,
               ({n_match})::DOUBLE / {MH_K}.0 AS est_jaccard
        FROM cand JOIN sig x ON cand.doc_a = x.doc_id
                  JOIN sig y ON cand.doc_b = y.doc_id
    """


def _simhash_expr_sql() -> str:
    terms = []
    for j in range(SH_BITS):
        vote = (
            f"list_sum(list_transform(hs, x -> CASE WHEN "
            f"((x*{2 * j + 3} + {j}) % {SH_MOD}) % 2 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {2**j} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::BIGINT"


def _simhash_oracle() -> str:
    return f"""
        SELECT doc_id, {_simhash_expr_sql()} AS simhash
        FROM (SELECT doc_id, {_SQL_WHS} AS hs FROM documents) t
    """


def _simhash_pairs_oracle() -> str:
    return f"""
        WITH sh AS (
            SELECT doc_id, {_simhash_expr_sql()} AS simhash
            FROM (SELECT doc_id, {_SQL_WHS} AS hs FROM documents) t
        ), blocked AS (
            SELECT doc_id, simhash, simhash // 256 AS block FROM sh
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.simhash, b.simhash))::INT AS hamming
        FROM blocked a JOIN blocked b
          ON a.block = b.block AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """


ORACLE: dict[str, str] = {
    "dedup_exact": """
        SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
               COUNT(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "dedup_minhash": _minhash_oracle(),
    "simhash": _simhash_oracle(),
    "simhash_pairs": _simhash_pairs_oracle(),
    "ngram_jaccard": """
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, s FROM (
                SELECT doc_id,
                       unnest([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                               for i in range(1, len(w) - 1)]) AS s
                FROM tok
            ) t
        ),
        cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               common::DOUBLE / (ca.n_sh + cb.n_sh - common) AS jaccard
        FROM common
        JOIN cnt ca ON doc_a = ca.doc_id
        JOIN cnt cb ON doc_b = cb.doc_id
        WHERE common::DOUBLE / (ca.n_sh + cb.n_sh - common) >= 0.5
    """,
}

QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_minhash": q_dedup_minhash,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "ngram_jaccard": q_ngram_jaccard,
}
