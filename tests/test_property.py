"""Property-based tests (hypothesis): the vectorized shingle /
minhash implementations agree with straightforward Python references
on arbitrary token streams — guarding the places where the driver
corpus can't reach (tiny docs, repeated words, single chars)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from simple_rust_query_engine_spark.pipeline.dedup import (
    MH_K,
    MH_MOD,
    SH_M,
    SH_P,
    SHINGLE_N,
    minhash_signatures,
    ngram_shingles,
)

WORDS = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=5), min_size=0, max_size=12
)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _py_word_hash(w: str) -> int:
    return (ord(w[0]) * 131 + len(w) * 31 + ord(w[-1])) if w else 0


def _py_shingle_hashes(text: str) -> list[int]:
    ws = text.split(" ")
    if len(ws) < SHINGLE_N:
        return []
    wh = [_py_word_hash(w) for w in ws]
    seen = []
    for i in range(len(wh) - SHINGLE_N + 1):
        h = wh[i]
        for j in range(1, SHINGLE_N):
            h = (h * SH_P + wh[i + j]) % SH_M
        if h not in seen:
            seen.append(h)
    return seen


@settings(**_SETTINGS)
@given(ws=WORDS)
def test_ngram_shingles_matches_python(spark, ws):
    text = " ".join(ws)
    got = (
        spark.createDataFrame([(text,)], "text string")
        .select(ngram_shingles(F.col("text")).alias("s"))
        .collect()[0]
        .s
    )
    toks = text.split(" ")
    exp = (
        list(
            dict.fromkeys(
                " ".join(toks[i : i + SHINGLE_N])
                for i in range(len(toks) - SHINGLE_N + 1)
            )
        )
        if len(toks) >= SHINGLE_N
        else []
    )
    assert got == exp


@settings(**_SETTINGS)
@given(ws=WORDS)
def test_minhash_signature_matches_python(spark, ws):
    text = " ".join(ws)
    got = (
        minhash_signatures(
            spark.createDataFrame([(0, text)], "doc_id long, text string")
        )
        .collect()[0]
        .sig
    )
    hs = _py_shingle_hashes(text)
    if not hs:
        exp = [None] * MH_K
    else:
        exp = [
            min(((2 * i + 3) * x + 7 * i + 1) % MH_MOD for x in hs)
            for i in range(MH_K)
        ]
    assert list(got) == exp
