"""Quality-filter degenerate-row semantics + mixed-language routing.

Round-4 hardening: NULL/empty text (failed extraction) must be DROPPED
with the explicit `null_text` reason — without the guard every rule
condition folds to NULL, concat_ws skips them all, and junk rows pass
the corpus filter — and the verdict must agree with the DuckDB oracle
on exactly those degenerate rows.
"""

import duckdb
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from rdf_mapper_spark.ops.text import filter_documents, quality_reasons

GOOD = ("the curious researchers examined the ancient library and the "
        "students gathered around the wooden tables to discuss the findings "
        "of the expedition in the quiet evening")

SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])


def _docs(spark):
    return spark.createDataFrame([
        (0, GOOD, "en"),
        (1, None, "en"),        # failed extraction
        (2, "", "fr"),          # empty extraction
        (3, "aa bb cc", "en"),  # too_short
    ], SCHEMA)


def test_null_and_empty_text_dropped(spark):
    out = {r.doc_id: r for r in filter_documents(
        _docs(spark), lang_col="lang").collect()}
    assert out[0].keep and out[0].reasons == ""
    assert not out[1].keep and out[1].reasons == "null_text"
    assert not out[2].keep and out[2].reasons == "null_text"
    assert not out[3].keep and "too_short" in out[3].reasons


def test_null_text_without_lang_routing(spark):
    df = _docs(spark).select(
        "doc_id", quality_reasons(F.col("text")).alias("reasons"))
    got = {r.doc_id: r.reasons for r in df.collect()}
    assert got[1] == "null_text" and got[2] == "null_text"


def test_oracle_agrees_on_degenerate_rows(spark):
    """The __spark_entry__ DuckDB oracle and the Spark operator must give
    identical verdicts on NULL/empty text — the class of row where the
    two engines' arithmetic (0/0, NULL aggregates) would otherwise
    diverge silently."""
    import __spark_entry__ as entry_mod

    sdf = filter_documents(_docs(spark), lang_col="lang")
    srows = sorted((r.doc_id, r.keep, r.reasons) for r in sdf.collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(0, GOOD, "en"), (1, None, "en"), (2, "", "fr"),
         (3, "aa bb cc", "en")],
    )
    orows = sorted(
        tuple(r) for r in
        con.execute(entry_mod.oracle_sql()["quality_filter"]).fetchall()
    )
    assert srows == orows


def test_repetition_metrics_known_values(spark):
    from rdf_mapper_spark.ops.text import repetition_metrics

    df = spark.createDataFrame(
        [(0, "x\ny\nx\nx"), (1, "a b a b a b"), (2, "all unique words here")],
        ["doc_id", "text"])
    out = {r.doc_id: r for r in repetition_metrics(df).collect()}
    # doc 0: 4 lines, 2 distinct -> dup 0.5; 'x' x3 of 4 line chars
    assert out[0].dup_line_frac == 0.5
    assert out[0].dup_line_char_frac == 0.75
    # doc 1: one line; top 2-gram 'a b' x3 -> 9 chars of 11
    assert out[1].dup_line_frac == 0.0
    assert out[1].top_2gram_char_frac == round(9 / 11, 4)
    # doc 2: no repetition anywhere
    r2 = out[2]
    assert r2.dup_line_frac == 0.0 and r2.dup_line_char_frac == 0.0
    # every 2-gram unique -> top covers exactly one gram's chars
    assert 0 < r2.top_2gram_char_frac < 0.6


def test_unigram_logprob_ranks_common_over_rare(spark):
    """Self-scored corpus: a doc of corpus-common tokens must out-score a
    doc of hapaxes; OOV (beyond top_k) tokens hit the 1/total floor; the
    scoring join must broadcast (no token-keyed shuffle)."""
    from rdf_mapper_spark.ops.lm import unigram_logprob, unigram_vocab

    rows = [(i, "the cat sat on the mat and the dog ran") for i in range(8)]
    rows.append((100, "zyx wvu tsr qpo nml kji"))  # hapax soup
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in unigram_logprob(df, top_k=5).collect()}
    assert out[0].avg_logp > out[100].avg_logp
    assert out[0].n_tok == 10 and out[100].n_tok == 6

    # fixed reference vocab: scoring against another corpus's model
    vocab = unigram_vocab(df.where("doc_id < 100"), top_k=5)
    fixed = unigram_logprob(df, vocab=vocab)
    assert fixed.count() == 9

    plan = (unigram_logprob(df, top_k=5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan


def test_tfidf_top_terms_known_ranking(spark):
    from rdf_mapper_spark.ops.text import tfidf_top_terms

    rows = [
        (0, "apple apple apple shared words"),
        (1, "banana banana shared words"),
        (2, "cherry shared words"),
        (3, "shared words only here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_top_terms(df, k=1, max_df_frac=0.5).collect()
    top = {r.doc_id: r.term for r in out}
    # 'shared'/'words' are in every doc -> killed by max_df (and would
    # have idf ~ 0 anyway); each doc's distinctive term wins
    assert top[0] == "apple" and top[1] == "banana" and top[2] == "cherry"
    assert top[3] in ("only", "here")
    # apple(tf=3) out-scores cherry(tf=1) at equal idf
    scores = {r.doc_id: r.score for r in out}
    assert scores[0] > scores[2]


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token covered, consecutive chunks share exactly `overlap`
    tokens, short docs give one chunk, empty docs none; map-only plan."""
    from rdf_mapper_spark.ops.text import chunk_documents

    words = " ".join(f"w{i}" for i in range(300))
    df = spark.createDataFrame(
        [(0, words), (1, "just five tiny words here"), (2, "")],
        ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=128, overlap=16)
    rows = sorted(((r.doc_id, r.chunk_id, r.n_tok, r.chunk_text)
                   for r in out.collect()))
    by_doc = {}
    for d, c, n, t in rows:
        by_doc.setdefault(d, []).append((c, n, t.split(" ")))
    # doc 0: 300 tokens, stride 112 -> 3 chunks of 128/128/76
    assert [n for _, n, _ in by_doc[0]] == [128, 128, 76]
    # consecutive chunks overlap by exactly 16 tokens
    for (c1, _, t1), (c2, _, t2) in zip(by_doc[0], by_doc[0][1:]):
        assert t1[-16:] == t2[:16]
    # full coverage in order
    flat = by_doc[0][0][2] + by_doc[0][1][2][16:] + by_doc[0][2][2][16:]
    assert flat == words.split(" ")
    assert [n for _, n, _ in by_doc[1]] == [5]
    assert 2 not in by_doc
    plan = (chunk_documents(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan and "EvalPython" not in plan
