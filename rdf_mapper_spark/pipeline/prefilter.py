"""Corpus hygiene between extract and link: the training-data operators
composed into the KG flow.

At crawl scale most junk is cheap to reject BEFORE the linking join and
the triple emission: the quality verdict is a pure projection the scan
absorbs, and canonical-URL dedup removes the "same page, many URLs" class
with one shuffle whose key (the canonical URL) is uniformly distributed.
Everything downstream then shuffles and emits strictly less.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rdf_mapper_spark.ops.text import quality_reasons
from rdf_mapper_spark.ops.web import normalize_url


def prefilter_pages(extracted: DataFrame, url_col: str = "url",
                    text_col: str = "text",
                    quality: bool = True,
                    dedup_canonical_url: bool = True,
                    lang_col: str | None = "lang") -> DataFrame:
    """Drop pages failing the Gopher-style quality rules
    (ops/text.quality_reasons), then keep ONE page per canonical URL
    (ops/web.normalize_url).

    The stopword rule routes per row by ``lang_col`` when the column is
    present (known lists en/fr/de, fallback en) — a real crawl is mostly
    non-English, and judging every page against the English stopword list
    silently drops most fr/de/es content.  Pass ``lang_col=None`` to
    force the static English rule.

    The survivor is deterministic — smallest raw URL, then LATEST
    warc_ts, then text — so re-runs and resume-from-checkpoint emit
    identical triple sets (the pipeline's idempotence contract) even when
    the same raw URL was crawled twice with different content.
    row_number over the canonical key is one shuffle; at 100 TB it rides
    the same exchange a groupBy would, and AQE splits any pathological
    canonical key.
    """
    out = extracted
    if quality:
        lc = (F.col(lang_col)
              if lang_col is not None and lang_col in extracted.columns
              else None)
        out = out.where(
            quality_reasons(F.col(text_col), lang_col=lc) == "")
    if dedup_canonical_url:
        order = [F.col(url_col).asc()]
        if "warc_ts" in out.columns:
            order.append(F.col("warc_ts").desc_nulls_last())
        if text_col in out.columns:
            order.append(F.col(text_col).asc_nulls_last())
        w = Window.partitionBy("__curl").orderBy(*order)
        out = (
            out.withColumn("__curl", normalize_url(F.col(url_col)))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__curl", "__rn")
        )
    return out
