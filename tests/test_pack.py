"""Sequence packing + mixture sampling invariants."""

from pyspark.sql import functions as F

from simple_rust_query_engine_spark.pipeline.pack import (
    MIX_MOD,
    MIX_RATES,
    SEQ_LEN,
    pack_sequences,
    sample_mixture,
)


def test_pack_sequences_exact_cover(tables):
    """Every sequence except each shard's last holds exactly SEQ_LEN
    tokens; totals equal the corpus token count — the concat-and-chunk
    layout loses and pads nothing."""
    docs = tables["documents"]
    packed = pack_sequences(docs)
    per_seq = packed.groupBy("source", "seq_id").agg(
        F.sum("n_tok_in_seq").alias("n")
    )
    last_seq = per_seq.groupBy("source").agg(F.max("seq_id").alias("last"))
    full = per_seq.join(
        last_seq,
        (per_seq.source == last_seq.source) & (per_seq.seq_id < last_seq.last),
    )
    bad = full.filter(F.col("n") != SEQ_LEN).count()
    assert bad == 0

    total_packed = packed.agg(F.sum("n_tok_in_seq")).first()[0]
    total_tokens = docs.select(
        F.sum(F.regexp_count("text", F.lit(r"\S+")))
    ).first()[0]
    assert total_packed == total_tokens


def test_pack_sequences_straddlers_split_consistently(tables):
    """A doc appearing in two sequences contributes its full token
    count across them, in adjacent seq_ids."""
    packed = pack_sequences(tables["documents"])
    multi = (
        packed.groupBy("source", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            (F.max("seq_id") - F.min("seq_id")).alias("span"),
            F.sum("n_tok_in_seq").alias("tok_sum"),
        )
        .filter(F.col("n_seqs") > 1)
    )
    assert multi.count() > 0  # SEQ_LEN=64 vs ~45-token docs: straddlers exist
    assert multi.filter(F.col("span") != F.col("n_seqs") - 1).count() == 0


def test_sample_mixture_rates_and_nesting(tables):
    docs = tables["documents"]
    kept = sample_mixture(docs)
    rates = {
        r.lang: r.kept / r.total
        for r in docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("total"))
        .join(
            kept.groupBy("lang").agg(F.count(F.lit(1)).alias("kept")), "lang"
        )
        .collect()
    }
    for lang, target in MIX_RATES.items():
        if lang in rates:
            assert abs(rates[lang] - target) < 0.25, (lang, rates[lang], target)
    # determinism: same result set on a second evaluation
    assert kept.count() == sample_mixture(docs).count()
    # nesting: halving every rate keeps a subset (thresholds nest)
    half = sample_mixture(docs, {k: v / 2 for k, v in MIX_RATES.items()})
    assert half.join(kept, ["doc_id"], "left_anti").count() == 0
    assert (kept.agg(F.max("bucket")).first()[0] or 0) < MIX_MOD
