"""Unigram language-model quality scoring (the CCNet-shaped signal).

CCNet ranks web text by the perplexity of a pretrained LM; the honest
self-contained analog is a CORPUS-DERIVED unigram model with a capped
vocabulary: estimate p(token) from the corpus itself (or any reference
corpus), keep the top-k vocabulary as the model, and score each document
by its mean token log-probability.  Low scores = rare-token soup
(gibberish, boilerplate navigation, wrong-language fragments); high =
common fluent text.  Used as a quality band alongside the Gopher rules
(ops/text.quality_reasons) rather than instead of them.

Scale shape: the vocabulary build is ONE groupBy(token) with map-side
partials; the capped table (top_k rows) is then BROADCAST to the scoring
join, so the hot tokens ('the', ...) never shuffle — the classic skew
trap of a token-keyed join is avoided by construction.  Out-of-vocab
tokens score at the floor probability 1/total (the capped-LM
convention), so the model size is a knob, not a correctness concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdf_mapper_spark.ops.text import tokens_col


def unigram_vocab(docs: DataFrame, text_col: str = "text",
                  top_k: int = 50_000) -> DataFrame:
    """-> (t, c) the top-k unigram counts; deterministic tie-break
    (count desc, token asc).  total token count rides along as a column
    so the scorer needs no second aggregate."""
    toks = docs.select(F.explode(tokens_col(F.col(text_col))).alias("t"))
    counts = toks.groupBy("t").agg(F.count("*").alias("c"))
    w_total = counts.agg(F.sum("c").alias("total"))
    # Distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition bounded heaps merged at the driver), so billions of
    # distinct tokens never funnel through a single-task sort the way an
    # unpartitioned row_number window would.
    top = counts.orderBy(F.col("c").desc(), F.col("t").asc()).limit(top_k)
    return top.crossJoin(F.broadcast(w_total))


def unigram_logprob(docs: DataFrame, vocab: DataFrame | None = None,
                    text_col: str = "text", id_col: str = "doc_id",
                    top_k: int = 50_000) -> DataFrame:
    """-> (doc_id, n_tok, avg_logp): mean ln p(token) per document under
    the capped unigram model (OOV floor = 1/total).  ``vocab`` defaults
    to `unigram_vocab(docs)` — self-scoring; pass a reference corpus's
    vocab to score against a fixed model (the production setup)."""
    if vocab is None:
        vocab = unigram_vocab(docs, text_col, top_k)
    counts = vocab.select("t", "c")
    tot = vocab.select("total").limit(1)
    toks = docs.select(F.col(id_col).alias("id"),
                       F.explode(tokens_col(F.col(text_col))).alias("t"))
    per_tok = (
        toks.join(F.broadcast(counts), "t", "left")  # OOV -> null c
        .crossJoin(F.broadcast(tot))                 # scalar total
        .select("id", F.ln(
            F.coalesce(F.col("c"), F.lit(1)).cast("double")
            / F.col("total").cast("double")).alias("lp"))
    )
    return (
        per_tok.groupBy("id")
        .agg(F.count("*").alias("n_tok"),
             F.round(F.avg("lp"), 4).alias("avg_logp"))
        .select(F.col("id").alias(id_col), "n_tok", "avg_logp")
    )
