"""Mention detection + entity linking against a broadcast alias dictionary.

North-rule machinery: candidate n-grams are generated with higher-order
array functions (no shuffle, no python), then equi-joined against the
broadcast alias dictionary — the Spark-native generalization of the
reference's per-distinct-key reconciliation cache
(template_state.py:71-78, reconcile.py:23-43): the join IS the cache.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _ngram_array(tokens: Column, n: int) -> Column:
    """All n-grams of a token array — O(len) sliding zip_with."""
    from rdf_mapper_spark.ops.text import ngrams_col

    return ngrams_col(tokens, n)


def detect_mentions(pages: DataFrame, text_col: str = "text",
                    max_ngram: int = 2) -> DataFrame:
    """pages -> (url, mention) candidate surface forms (lowercased n-grams).

    Stays inside whole-stage codegen: split -> transform/slice -> explode.
    """
    tokens = F.split(F.lower(F.col(text_col)), r"[^\p{L}\p{N}]+")
    grams = [_ngram_array(tokens, n) for n in range(1, max_ngram + 1)]
    all_grams = F.concat(*grams) if len(grams) > 1 else grams[0]
    return pages.select(
        "url", F.explode(all_grams).alias("mention")
    ).where(F.col("mention") != "")


def link_entities(pages: DataFrame, aliases: DataFrame,
                  text_col: str = "text", max_ngram: int = 2) -> DataFrame:
    """-> (url, mention, entity_iri, entity_type) via broadcast hash join.

    The alias dictionary is the small dimension (north rule: broadcast it);
    hot aliases (popular entities) skew the join output, which downstream
    dedup handles with salting + AQE.
    """
    mentions = detect_mentions(pages, text_col=text_col, max_ngram=max_ngram)
    return mentions.join(
        F.broadcast(aliases), mentions["mention"] == aliases["alias"], "inner"
    ).select("url", "mention", "entity_iri", "entity_type")


def linked_pages(pages: DataFrame, aliases: DataFrame,
                 text_col: str = "text", max_ngram: int = 2) -> DataFrame:
    """Pages joined with their linked mentions (one row per url x mention),
    the input table for the candidate-triple mapping spec."""
    links = link_entities(pages, aliases, text_col=text_col,
                          max_ngram=max_ngram)
    return pages.join(links, "url", "inner")
