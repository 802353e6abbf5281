"""Weak-hash vs strong-hash MinHash parity on a planted near-dup
corpus (round-5 follow-up): the oracle-friendly weak word-hash and the
production blake2b shingle digests must DETECT THE SAME planted
duplicates — the hash swap changes shingle ids, not the LSH recall
characteristics.  The permutations and corpus are deterministic
(seeded), so the assertions are exact reruns, not flaky samples; the
bounds carry slack below the observed values so a Spark upgrade that
nudges nothing semantic keeps them green.
"""

import random

import pytest

from simple_rust_query_engine_spark.pipeline.dedup import minhash_lsh_pairs

# diverse first/last chars and lengths: the weak hash is
# ord(first)*131 + len*31 + ord(last), so a uniform-prefix vocabulary
# (e.g. "w000".."w499") would collapse it to a handful of values —
# realistic words keep its collision rate representative
_vocab_rng = random.Random(0xC0FFEE)
VOCAB = sorted(
    {
        "".join(
            _vocab_rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(_vocab_rng.randint(3, 9))
        )
        for _ in range(600)
    }
)[:500]
N_BASE = 30          # independent base docs
N_PLANTED = 10       # bases 0..9 get a near-dup copy (id 1000+i)
DOC_LEN = 100
JACC_THRESHOLD = 0.5  # est_jaccard cut for "near-dup detected"


def _corpus(seed: int):
    rng = random.Random(seed)
    rows = []
    texts = []
    for i in range(N_BASE):
        words = [rng.choice(VOCAB) for _ in range(DOC_LEN)]
        texts.append(words)
        rows.append((i, " ".join(words)))
    for i in range(N_PLANTED):
        dup = list(texts[i])
        # perturb one interior token — shingle Jaccard ~0.94, well
        # above the LSH s-curve knee for 4 bands x 4 rows
        dup[rng.randrange(1, DOC_LEN - 1)] = rng.choice(VOCAB)
        rows.append((1000 + i, " ".join(dup)))
    planted = {(i, 1000 + i) for i in range(N_PLANTED)}
    return rows, planted


def _detected(spark, rows, strong: bool):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, strong_hash=strong).collect()
        if r.est_jaccard >= JACC_THRESHOLD
    }


@pytest.mark.parametrize("seed", [7, 23])
def test_weak_and_strong_hash_agree_on_planted_dups(spark, seed):
    rows, planted = _corpus(seed)
    weak = _detected(spark, rows, strong=False)
    strong = _detected(spark, rows, strong=True)

    # recall: each path must find nearly all planted pairs (a 1-token
    # perturbation leaves shingle Jaccard ~0.94; banded-LSH miss
    # probability per pair is ~0.2%)
    for name, found in (("weak", weak), ("strong", strong)):
        recall = len(found & planted) / len(planted)
        assert recall >= 0.9, (name, seed, sorted(planted - found))

    # precision: independent 100-token docs over a 500-word vocabulary
    # share almost no shingles — at most one spurious pair tolerated
    # (the weak hash's ascii collisions are the only plausible source)
    for name, found in (("weak", weak), ("strong", strong)):
        assert len(found - planted) <= 1, (name, seed, sorted(found - planted))

    # survivor-set agreement: greedy keep-lowest-id survivors under
    # each path must agree on the planted duplicates
    all_ids = {r[0] for r in rows}
    surv_weak = all_ids - {b for _, b in weak}
    surv_strong = all_ids - {b for _, b in strong}
    disagree = surv_weak ^ surv_strong
    assert len(disagree) <= 1, (seed, sorted(disagree))
    # and both paths dropped (nearly) all planted dup copies
    planted_copies = {b for _, b in planted}
    assert len(planted_copies - surv_weak) >= 0.9 * N_PLANTED
    assert len(planted_copies - surv_strong) >= 0.9 * N_PLANTED


def test_word_hash_cross_engine_non_ascii(spark):
    # the ONE Python word-hash kernel (py_word_hash, folded by every
    # Arrow UDF) must agree with the JVM expression AND the DuckDB
    # oracle on real text — including accented, CJK, and astral
    # (non-BMP) characters, where a UTF-16-unit-counting engine would
    # diverge from codepoint counters.  All three count codepoints.
    import duckdb
    from pyspark.sql import functions as F

    from simple_rust_query_engine_spark.pipeline.text import (
        py_word_hash,
        word_hash,
    )

    words = ["hello", "héllo", "naïve", "日本語", "🙂", "x𝄞", "𝄞clef", "ß", "", "a"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    jvm = {r.w: r.h for r in df.select("w", word_hash(F.col("w")).alias("h")).collect()}
    con = duckdb.connect()
    for w in words:
        duck = con.sql(
            "SELECT (ascii(?)*131 + length(?)*31 + ascii(reverse(?)))::BIGINT",
            params=[w, w, w],
        ).fetchone()[0]
        assert jvm[w] == py_word_hash(w) == duck, (w, jvm[w], py_word_hash(w), duck)
