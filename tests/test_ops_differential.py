"""Property-based differential tests for the training-data operators:
random documents through the Spark ops vs independent pure-Python
re-implementations (shared code: none — only the md5 library primitive).

Alphabet is ASCII so the Python tokenizer `[^A-Za-z0-9]+` is exactly the
Spark `[^\\p{L}\\p{N}]+` split on these inputs."""

import hashlib
import re
import string
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rdf_mapper_spark.ops.dedup import jaccard_pairs, simhash_md5
from rdf_mapper_spark.ops.text import winnow_fingerprints

_word = st.text(alphabet=string.ascii_lowercase + "0123456789",
                min_size=1, max_size=6)
_text = st.lists(_word, min_size=0, max_size=30).map(" ".join)
_docs = st.lists(_text, min_size=1, max_size=8)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^A-Za-z0-9]+", text.lower()) if t]


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int, w: int) -> set[int]:
    toks = _tokens(text)
    grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    hs = [_h60(g) for g in grams]
    if not hs:
        return set()
    return {min(hs[i:i + w]) for i in range(max(len(hs) - w + 1, 1))}


def _py_simhash(text: str) -> int:
    toks = _tokens(text)
    if not toks:
        return 0
    votes = [0] * 60
    for t in toks:
        h = _h60(t)
        for j in range(60):
            votes[j] += 1 if (h >> j) & 1 else -1
    return sum(1 << j for j in range(60) if votes[j] > 0)


def _py_jaccard(texts: list[str], threshold: float, n: int):
    def sh(text):
        toks = _tokens(text)
        if n == 1:
            return set(toks)
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: sh(t) for i, t in enumerate(texts)}
    out = {}
    for a in sets:
        for b in sets:
            if a >= b or not (sets[a] & sets[b]):
                continue
            j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            j4 = float(Decimal(repr(j)).quantize(Decimal("0.0001"),
                                                 ROUND_HALF_UP))
            if j4 >= threshold:
                out[(a, b)] = j4
    return out


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_docs)
def test_winnow_matches_python(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r.doc_id: set(r.fps) for r in df.select(
        "doc_id",
        winnow_fingerprints(F.col("text"), k=3, w=2).alias("fps")).collect()}
    want = {i: _py_winnow(t, 3, 2) for i, t in enumerate(texts)}
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_docs)
def test_simhash_md5_matches_python(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r.doc_id: r.h for r in df.select(
        "doc_id", simhash_md5(F.col("text")).alias("h")).collect()}
    want = {i: _py_simhash(t) for i, t in enumerate(texts)}
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_docs, st.sampled_from([1, 2]), st.sampled_from([0.2, 0.5]))
def test_jaccard_matches_python(spark, texts, n, threshold):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {(r.id_a, r.id_b): r.jaccard for r in
           jaccard_pairs(df, threshold, n=n).collect()}
    assert got == _py_jaccard(texts, threshold, n)
