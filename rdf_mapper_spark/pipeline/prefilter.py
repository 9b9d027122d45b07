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
                    dedup_canonical_url: bool = True) -> DataFrame:
    """Drop pages failing the Gopher-style quality rules
    (ops/text.quality_reasons), then keep ONE page per canonical URL
    (ops/web.normalize_url).

    The survivor is deterministic — the lexicographically smallest raw URL
    in the group — so re-runs and resume-from-checkpoint emit identical
    triple sets (the pipeline's idempotence contract). row_number over the
    canonical key is one shuffle; at 100 TB it rides the same exchange a
    groupBy would, and AQE splits any pathological canonical key.
    """
    out = extracted
    if quality:
        out = out.where(quality_reasons(F.col(text_col)) == "")
    if dedup_canonical_url:
        w = Window.partitionBy("__curl").orderBy(F.col(url_col).asc())
        out = (
            out.withColumn("__curl", normalize_url(F.col(url_col)))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__curl", "__rn")
        )
    return out
