"""Training-batch layout operators: sequence packing and deterministic
mixture sampling.

Beyond reference parity (the reference is a pure relational engine);
these are the two steps between "curated corpus" and "tensors":

* ``pack_sequences`` — concat-and-chunk layout: within each shard,
  documents are concatenated in deterministic order and split every
  ``seq_len`` tokens — exactly how LLM pretraining data is packed
  (documents straddle sequence boundaries; nothing is padded away).
  Emitted as one row per (document × sequence) overlap, which is the
  index a loader needs to materialize any sequence.

  Scale: the running token sum is a window per SHARD (here the
  ``source`` column; any hash bucket works) — never a global
  single-partition window.  One shuffle on the shard key; each shard
  packs independently, exactly how a 1000-executor job shards 100 TB.

* ``sample_mixture`` — per-language downsampling to target mixture
  rates, decided by a deterministic affine hash of ``doc_id`` — the
  same doc set is kept on every engine, every run, every cluster
  (``rand()`` would be none of those).  Map-only, no shuffle.

Both have exact DuckDB oracle twins (integer arithmetic < 2^53).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEQ_LEN = 64            # tokens per packed sequence (driver-scale)
MIX_MOD = 1_000_003     # sampling-hash modulus (prime)
MIX_A = 2_654_435       # affine multiplier (< 2^22 keeps products < 2^53)
MIX_B = 1_013_904       # affine offset

#: target keep-rates per language — the classic mixture-rebalance
#: (keep all English, thin the long tail) expressed as exact
#: thousandths so the threshold is integer on both engines
MIX_RATES = {"en": 1.0, "es": 0.5, "de": 0.5, "fr": 0.25, "zh": 0.25}


def _affine_bucket(col, a: int = MIX_A, b: int = MIX_B):
    """Deterministic affine hash of an integer id into [0, MIX_MOD) —
    the ONE definition every sampling/sharding op (and its oracle twin,
    via the same constants) derives buckets from.  All intermediates
    stay < 2^53, so the arithmetic is exact on every engine."""
    return (col % MIX_MOD * a + b) % MIX_MOD


def _salted_sort_key(salt: str):
    """Deterministic pseudorandom ORDER for doc_id: md5 of the salted
    id — lowercase hex compares identically under ASCII everywhere.
    Change the salt to draw an independent order."""
    return F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string")))


def pack_sequences(
    docs: DataFrame,
    seq_len: int = SEQ_LEN,
    shard_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk packing index: (shard, seq_id, doc_id,
    n_tok_in_seq) for every sequence a document contributes tokens to.

    Within a shard, docs are ordered by doc_id; token spans
    [cum_start, cum_end) map onto fixed windows of ``seq_len`` via
    floor division; a doc spanning a boundary appears in both
    sequences with the split token counts.  Sum(n_tok_in_seq) per
    (shard, seq_id) == seq_len for every full sequence, == remainder
    for the shard's last one — pinned by tests.

    ``doc_id`` must be UNIQUE within a shard (true of the driver
    corpus and any sane ingest key): it is the concat order.  The
    explicit ROWS frame makes the requirement visible — under the
    default RANGE frame duplicate ids would silently share one
    cum_end (double-counted spans); under ROWS they would instead be
    nondeterministically ordered.  Either way duplicates are a data
    bug, not a packing the operator can define.
    """
    n_tok = F.regexp_count(F.col(text_col), F.lit(r"\S+"))
    w = (
        Window.partitionBy(shard_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        docs.select(shard_col, "doc_id", n_tok.alias("n_tok"))
        .filter(F.col("n_tok") > 0)
        .withColumn("cum_end", F.sum("n_tok").over(w))
        .withColumn("cum_start", F.col("cum_end") - F.col("n_tok"))
    )
    first_seq = F.floor(F.col("cum_start") / seq_len).cast("long")
    last_seq = F.floor((F.col("cum_end") - 1) / seq_len).cast("long")
    exploded = spans.select(
        shard_col,
        "doc_id",
        "cum_start",
        "cum_end",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * seq_len
    tok_in = F.least(F.col("cum_end"), seq_lo + seq_len) - F.greatest(
        F.col("cum_start"), seq_lo
    )
    return exploded.select(
        shard_col, "seq_id", "doc_id", tok_in.alias("n_tok_in_seq")
    )


def sample_mixture(
    docs: DataFrame,
    rates: dict[str, float] | None = None,
    key_col: str = "lang",
) -> DataFrame:
    """Keep each row iff ``affine_hash(doc_id) mod M < rate(key) * M``.

    The hash is uniform enough for rate targeting and exactly
    reproducible anywhere; unknown keys default to keep-all.  Returns
    (doc_id, key, bucket) for the surviving rows — bucket exposed so
    downstream stages can sub-sample consistently (a stricter rate
    keeps a subset of a looser one: thresholds nest).
    """
    rates = MIX_RATES if rates is None else rates
    bucket = _affine_bucket(F.col("doc_id"))
    expr = None
    for k, r in rates.items():
        cond = F.lit(int(r * MIX_MOD))
        expr = (
            F.when(F.col(key_col) == k, cond)
            if expr is None
            else expr.when(F.col(key_col) == k, cond)
        )
    thresh = expr.otherwise(F.lit(MIX_MOD)) if expr is not None else F.lit(MIX_MOD)
    return (
        docs.select("doc_id", key_col, bucket.alias("bucket"), thresh.alias("_t"))
        .filter(F.col("bucket") < F.col("_t"))
        .drop("_t")
    )


SHUF_SHARDS = 8          # output shards (1000s on a real cluster)
SHUF_SALT = "shuf"       # ordering-hash salt — change to reshuffle
SPLIT_A = 1_592_653      # holdout-hash affine multiplier (< 2^21)
SPLIT_B = 713_904        # holdout-hash affine offset
SPLIT_TRAIN = 0.9        # train fraction


def shuffle_shards(
    docs: DataFrame, n_shards: int = SHUF_SHARDS, salt: str = SHUF_SALT
) -> DataFrame:
    """Deterministic global training shuffle: (doc_id, shard, pos).

    Training loaders need the corpus in a fixed pseudorandom order,
    reproducible across engines/runs/clusters (``orderBy(rand())`` is
    none of those, and a single global sort is a one-partition
    bottleneck anyway).  Shard assignment is the affine doc_id hash
    mod ``n_shards``; within-shard order is md5 of the salted doc_id
    (hex strings compare identically under ASCII everywhere).  Reading
    shards 0..n-1 each in ``pos`` order IS the shuffled corpus.

    Scale: ONE hash shuffle on ``shard`` + a per-shard sort — with
    shards sized to executors (1000s at 100 TB) this is exactly the
    distributed shuffle a petabyte pretraining pipeline runs; no
    global ordering structure anywhere.
    """
    shard = _affine_bucket(F.col("doc_id")) % n_shards
    sort_key = _salted_sort_key(salt)
    w = Window.partitionBy("shard").orderBy("sort_key", "doc_id")
    return (
        docs.select(
            "doc_id", shard.alias("shard"), sort_key.alias("sort_key")
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


def train_test_split(
    docs: DataFrame,
    train_frac: float = SPLIT_TRAIN,
    key_col: str = "lang",
) -> DataFrame:
    """Deterministic holdout split: tag each row ``train``/``test`` by
    an affine doc_id hash (independent of the mixture-sampling hash —
    different constants), so the same documents land in the same split
    on every engine and every run, and membership never depends on
    partitioning.  The hash is key-independent, so per-``key_col``
    fractions concentrate tightly around ``train_frac`` (law of large
    numbers — exact stratification would need a per-stratum global
    rank, a shuffle this map-only operator refuses to pay).  Output
    keeps ``key_col`` so downstream can audit per-stratum balance with
    one groupBy."""
    split = _holdout_split(F.col("doc_id"), train_frac)
    return docs.select("doc_id", key_col, split.alias("split"))


def _holdout_split(key, train_frac: float = SPLIT_TRAIN):
    """The ONE train/test assignment expression, shared by the per-doc
    and per-cluster splitters — ``split_by_cluster``'s documented
    singleton-agreement guarantee (a doc whose label is its own id
    gets the identical assignment) depends on the two expressions
    staying byte-identical, so they must not be two copies."""
    bucket = _affine_bucket(key, SPLIT_A, SPLIT_B)
    return F.when(
        bucket < F.lit(int(train_frac * MIX_MOD)), F.lit("train")
    ).otherwise(F.lit("test"))


def split_by_cluster(
    labeled: DataFrame,
    train_frac: float = SPLIT_TRAIN,
    label_col: str = "label",
) -> DataFrame:
    """Leakage-free holdout split: hash the duplicate CLUSTER, not the
    document.  ``train_test_split`` assigns per-doc, so copies and
    near-copies of one document straddle the train/test boundary —
    the held-out half is then memorized verbatim by training and
    every eval number built on it is inflated.  This takes any
    ``(doc_id, label)`` cluster assignment — ``dedup_cc``'s near-dup
    components in the driver row; an exact content digest works too —
    and hashes the LABEL, so whole clusters land on one side and test
    docs are guaranteed content-unseen in train.

    Uses the SAME affine constants as ``train_test_split``, so a
    singleton cluster (the common case) gets the identical assignment
    (its label IS its doc_id under the min-reachable-id convention) —
    cluster-awareness changes only the docs that actually have copies.

    Scale: map-only over the label table; the cluster structure is
    whatever the labeler already paid for — no new shuffle, no
    cluster map on the driver."""
    split = _holdout_split(F.col(label_col), train_frac)
    return labeled.select(
        "doc_id", F.col(label_col).alias("cluster_id"), split.alias("split")
    )


STRAT_K = 25             # sampled docs per stratum
STRAT_SALT = "strat"     # sampling-order salt — change to resample
STRAT_BUCKETS = 32       # pre-prune fan-out (see stratified_sample)

BUDGET_TOKENS = 2000     # per-language token budget (driver-scale)
BUDGET_SALT = "budget"   # selection-order salt


def two_phase_topk(
    df: DataFrame,
    key_col: str,
    order_cols: list,
    k: int,
    n_buckets: int,
    bucket_id_col: str = "doc_id",
) -> DataFrame:
    """Skew-safe EXACT top-k per stratum: (1) pre-prune top-k per
    (stratum, hash-bucket) — ``n_buckets`` spreads each stratum over
    that many reducers, and Spark's WindowGroupLimit prunes to k
    map-side; (2) final top-k over the ≤ n_buckets × k survivors per
    stratum, a trivially small sort.  Phase 1 keeps a superset of the
    global top-k (every globally-top-k row is top-k in its own bucket
    under the shared order), so the result is EXACT at any fan.
    ``order_cols`` must be a total order (include a unique tiebreak).
    Appends a 1-based ``rank`` column; NULL stratum keys form their
    own stratum (window semantics on both engines).

    ``k`` may be an int or a COLUMN of ``df`` (a per-stratum quota,
    constant within each stratum — ``temperature_mixture`` rides its
    broadcast-joined ``n_target`` through here); the superset
    argument is unchanged since the bound is constant per stratum.
    Column quotas forgo the map-side WindowGroupLimit (it needs a
    literal limit) but keep the (stratum, bucket) fan-out that is the
    actual skew protection."""
    k_col = F.lit(k) if isinstance(k, int) else k
    bucket = _affine_bucket(F.col(bucket_id_col)) % n_buckets
    keyed = df.withColumn("_b", bucket)
    w_pre = Window.partitionBy(key_col, "_b").orderBy(*order_cols)
    pruned = (
        keyed.withColumn("_rn", F.row_number().over(w_pre))
        .filter(F.col("_rn") <= k_col)
        .drop("_rn", "_b")
    )
    w_fin = Window.partitionBy(key_col).orderBy(*order_cols)
    return pruned.withColumn(
        "rank", F.row_number().over(w_fin).cast("long")
    ).filter(F.col("rank") <= k_col)


def stratified_sample(
    docs: DataFrame,
    k: int = STRAT_K,
    key_col: str = "lang",
    salt: str = STRAT_SALT,
    n_buckets: int = STRAT_BUCKETS,
) -> DataFrame:
    """Exact deterministic k-per-stratum sample: the k docs with the
    smallest ``md5(salt || doc_id)`` within each ``key_col`` value,
    with their sample rank.  Same k docs on every engine/run/cluster.

    Scale: the naive form is one ``row_number`` window partitioned by
    the stratum — with 5 languages over 100 TB that funnels N/5 rows
    into each of 5 reducers' sorts, the same low-cardinality holistic
    straggler ``quantile`` documents.  ``two_phase_topk`` fixes that
    exactly; dial ``n_buckets`` to executor count at scale.
    """
    keyed = docs.select(
        "doc_id", key_col, _salted_sort_key(salt).alias("sort_key")
    )
    return two_phase_topk(
        keyed,
        key_col,
        [F.col("sort_key").asc(), F.col("doc_id").asc()],
        k,
        n_buckets,
    ).select("doc_id", key_col, "rank")


def token_budget_mixture(
    docs: DataFrame,
    budget: int = BUDGET_TOKENS,
    key_col: str = "lang",
    text_col: str = "text",
    salt: str = BUDGET_SALT,
) -> DataFrame:
    """Per-stratum token-BUDGET selection (mixtures are specified in
    tokens, not document counts): walk each stratum's docs in
    deterministic hash order and keep docs until the running token
    total reaches ``budget`` (the doc that crosses the line is kept —
    the standard greedy rule, so every stratum emits ≥ 1 doc).

    Scale: the running total is a prefix sum over a hash ORDER within
    a ~5-value stratum key — naively one cumulative window per
    language, the single-reducer straggler again.  Here it is a
    DISTRIBUTED PREFIX SUM: bucket = first hex char of the md5 sort
    key (16 range-ordered buckets; two chars = 256 at scale — md5's
    lexicographic order makes bucket order consistent with row order),
    (1) per-(stratum, bucket) token totals — a strata × 16-row frame —
    get cumulative OFFSETS via a window over that tiny frame, (2) the
    within-(stratum, bucket) cumulative window runs on 16× more
    reducers than the naive form, and each row's global running total
    is offset + within-bucket cumulative.  One data-sized shuffle on
    (stratum, bucket); the offset frame broadcasts back.  All-integer
    token arithmetic — exact on every engine.
    """
    from .dedup import materialize

    n_tok = F.regexp_count(F.col(text_col), F.lit(r"\S+"))
    sort_key = _salted_sort_key(salt)
    keyed = (
        docs.select(
            "doc_id", key_col, n_tok.alias("n_tok"), sort_key.alias("sort_key")
        )
        .filter(F.col("n_tok") > 0)
        .withColumn("bucket", F.substring("sort_key", 1, 1))
    )
    # two consumers need this frame (the offset aggregation and the
    # data-sized cumulative window), and Catalyst cannot reuse the
    # exchange between them (join-key null filters push into one
    # branch's scan but not the other's, breaking canonical equality)
    # — without a barrier the regexp tokenization over the FULL TEXT,
    # the dominant map-side cost, runs twice.  The barrier stores only
    # the 5 small derived columns, never the text.
    keyed = materialize(keyed)
    w_in = (
        Window.partitionBy(key_col, "bucket")
        .orderBy("sort_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = keyed.withColumn("in_cum", F.sum("n_tok").over(w_in))
    # bucket totals aggregate over the CHECKPOINTED frame, not over
    # `cum`: a plain hash agg with map-side partial combine — deriving
    # them from the window output would re-run the data-sized
    # sort + running sum a second time in the offsets branch
    totals = keyed.groupBy(key_col, "bucket").agg(
        F.sum("n_tok").alias("bucket_tok")
    )
    w_off = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "offset", F.coalesce(F.sum("bucket_tok").over(w_off), F.lit(0))
    ).drop("bucket_tok")
    out = (
        cum.join(F.broadcast(offsets), [key_col, "bucket"])
        .withColumn("cum_end", (F.col("offset") + F.col("in_cum")).cast("long"))
    )
    return out.filter(F.col("cum_end") - F.col("n_tok") < budget).select(
        "doc_id", key_col, "n_tok", "cum_end"
    )


TEMP_TARGET = 300        # total docs selected by the temperature mix
TEMP_SALT = "temp"       # selection-order salt
TEMP_W_SCALE = 1_000_000  # weight quantization (sqrt(n) -> integer)


def temperature_mixture(
    docs: DataFrame,
    target: int = TEMP_TARGET,
    key_col: str = "source",
    salt: str = TEMP_SALT,
    n_buckets: int = STRAT_BUCKETS,
) -> DataFrame:
    """Temperature-weighted mixture sampling (α = 0.5): per-source
    quotas ∝ √n_source — the standard rebalance (GPT-3 §2.2, LLaMA
    §2; multilingual T=2 sampling) that upweights small sources
    relative to proportional sampling without letting one giant crawl
    dominate.  Selects exactly ``want_s = min(n_s, ⌊target·w_s/Σw⌋)``
    docs per source, deterministically (smallest salted md5 order),
    and emits (doc_id, source, rank, n_target).

    Cross-engine exactness: the only float op is the correctly-
    rounded IEEE ``sqrt`` (bit-identical everywhere), immediately
    quantized to an integer weight ``w_s = ⌊√n_s · 10⁶⌋``; quota
    arithmetic is then pure int64 (target·w < 2⁶³), so the driver
    hash gate holds bit-for-bit.

    Scale: counts/weights/quotas are a source-cardinality frame
    (broadcast); selection is the same two-phase skew-safe top-k as
    ``stratified_sample`` — phase 1 ranks per (source, hash-bucket)
    so a 5-source corpus never funnels N/5 rows through one reducer;
    per-source quotas ride the broadcast join, so the per-row filter
    ``rank <= want`` costs nothing extra.  Phase 1 keeps a superset
    of each source's global top-want (any global top-want row is
    top-want in its own bucket), so the result is exact."""
    counts = docs.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    weights = counts.select(
        key_col,
        "n",
        F.floor(F.sqrt(F.col("n")) * F.lit(TEMP_W_SCALE)).cast("long").alias("w"),
    )
    tot = weights.agg(F.sum("w").alias("wt"))
    wants = weights.crossJoin(F.broadcast(tot)).select(
        key_col,
        F.least(
            F.col("n"), F.expr(f"({target} * w) div wt")
        ).alias("n_target"),
    )
    keyed = docs.select(
        "doc_id", key_col, _salted_sort_key(salt).alias("sort_key")
    ).join(F.broadcast(wants), key_col)
    return two_phase_topk(
        keyed,
        key_col,
        [F.col("sort_key").asc(), F.col("doc_id").asc()],
        F.col("n_target"),
        n_buckets,
    ).select("doc_id", key_col, "rank", "n_target")


# ------------------------------------------------------------ driver
def q_pack_sequences(t: dict) -> DataFrame:
    return pack_sequences(t["documents"])


def q_sample_mixture(t: dict) -> DataFrame:
    return sample_mixture(t["documents"])


def q_shuffle_shards(t: dict) -> DataFrame:
    return shuffle_shards(t["documents"])


def q_train_test_split(t: dict) -> DataFrame:
    return train_test_split(t["documents"])


def q_stratified_sample(t: dict) -> DataFrame:
    return stratified_sample(t["documents"])


def q_token_budget_mixture(t: dict) -> DataFrame:
    return token_budget_mixture(t["documents"])


def q_temperature_mixture(t: dict) -> DataFrame:
    return temperature_mixture(t["documents"])


def _rates_case_sql() -> str:
    whens = "\n".join(
        f"WHEN lang = '{k}' THEN {int(r * MIX_MOD)}" for k, r in MIX_RATES.items()
    )
    return f"CASE {whens} ELSE {MIX_MOD} END"


ORACLE: dict[str, str] = {
    "pack_sequences": rf"""
        WITH spans AS (
            SELECT source, doc_id,
                   len(regexp_extract_all(text, '\S+')) AS n_tok,
                   -- ::BIGINT — DuckDB window SUM over BIGINT yields
                   -- HUGEINT, which range() refuses
                   SUM(len(regexp_extract_all(text, '\S+'))) OVER (
                       PARTITION BY source ORDER BY doc_id
                   )::BIGINT AS cum_end
            FROM documents
            WHERE len(regexp_extract_all(text, '\S+')) > 0
        ), exploded AS (
            SELECT source, doc_id,
                   cum_end - n_tok AS cum_start, cum_end,
                   unnest(range((cum_end - n_tok) // {SEQ_LEN},
                                (cum_end - 1) // {SEQ_LEN} + 1)) AS seq_id
            FROM spans
        )
        SELECT source, seq_id::BIGINT AS seq_id, doc_id,
               (least(cum_end, seq_id * {SEQ_LEN} + {SEQ_LEN})
                - greatest(cum_start, seq_id * {SEQ_LEN}))::BIGINT
                   AS n_tok_in_seq
        FROM exploded
    """,
    "sample_mixture": f"""
        SELECT doc_id, lang,
               (doc_id % {MIX_MOD} * {MIX_A} + {MIX_B}) % {MIX_MOD} AS bucket
        FROM documents
        WHERE (doc_id % {MIX_MOD} * {MIX_A} + {MIX_B}) % {MIX_MOD}
              < {_rates_case_sql()}
    """,
    "shuffle_shards": f"""
        WITH keyed AS (
            SELECT doc_id,
                   (doc_id % {MIX_MOD} * {MIX_A} + {MIX_B})
                       % {MIX_MOD} % {SHUF_SHARDS} AS shard,
                   md5('{SHUF_SALT}' || CAST(doc_id AS VARCHAR)) AS sort_key
            FROM documents
        )
        SELECT doc_id, shard,
               ROW_NUMBER() OVER (
                   PARTITION BY shard ORDER BY sort_key, doc_id
               ) AS pos
        FROM keyed
    """,
    "train_test_split": f"""
        SELECT doc_id, lang,
               CASE WHEN (doc_id % {MIX_MOD} * {SPLIT_A} + {SPLIT_B})
                         % {MIX_MOD} < {int(SPLIT_TRAIN * MIX_MOD)}
                    THEN 'train' ELSE 'test' END AS split
        FROM documents
    """,
    # the oracle is the NAIVE one-window form — DuckDB is fine with it
    # at check scale, and its equality with the two-phase Spark plan is
    # exactly the superset-pruning claim under test
    "stratified_sample": f"""
        WITH ranked AS (
            SELECT doc_id, lang,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5('{STRAT_SALT}' || CAST(doc_id AS VARCHAR)),
                                doc_id
                   ) AS rank
            FROM documents
        )
        SELECT doc_id, lang, rank FROM ranked WHERE rank <= {STRAT_K}
    """,
    # likewise the naive single cumulative window — equality with the
    # distributed prefix-sum proves offset + within-bucket == global
    "token_budget_mixture": rf"""
        WITH toks AS (
            SELECT doc_id, lang,
                   len(regexp_extract_all(text, '\S+')) AS n_tok,
                   md5('{BUDGET_SALT}' || CAST(doc_id AS VARCHAR)) AS sort_key
            FROM documents
            WHERE len(regexp_extract_all(text, '\S+')) > 0
        ), c AS (
            SELECT doc_id, lang, n_tok,
                   SUM(n_tok) OVER (
                       PARTITION BY lang ORDER BY sort_key, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   )::BIGINT AS cum_end
            FROM toks
        )
        SELECT doc_id, lang, n_tok, cum_end
        FROM c WHERE cum_end - n_tok < {BUDGET_TOKENS}
    """,
}

ORACLE["temperature_mixture"] = f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n,
               CAST(floor(sqrt(n) * {TEMP_W_SCALE}) AS BIGINT) AS w
        FROM counts
    ),
    tot AS (SELECT SUM(w)::BIGINT AS wt FROM w),
    wants AS (
        SELECT source, LEAST(n, ({TEMP_TARGET} * w) // wt) AS n_target
        FROM w, tot
    ),
    ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('{TEMP_SALT}' || doc_id::VARCHAR), doc_id
               ) AS rank
        FROM documents
    )
    SELECT r.doc_id, r.source, r.rank, wa.n_target
    FROM ranked r JOIN wants wa USING (source)
    WHERE r.rank <= wa.n_target
"""

QUERIES = {
    "pack_sequences": q_pack_sequences,
    "sample_mixture": q_sample_mixture,
    "shuffle_shards": q_shuffle_shards,
    "train_test_split": q_train_test_split,
    "stratified_sample": q_stratified_sample,
    "token_budget_mixture": q_token_budget_mixture,
    "temperature_mixture": q_temperature_mixture,
}
