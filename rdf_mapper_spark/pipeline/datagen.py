"""Deterministic synthetic Common-Crawl-style pages + alias dictionary.

BASELINE.json `input_hint` mandates the input shape
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string) and
forbids external data — this generator is pure Column expressions over
`spark.range`, so it is fully distributed, seeded, and reproducible at any
scale (no driver-side data, no python in the loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_FILLER = [
    "the", "quick", "analysis", "shows", "that", "industry", "reports",
    "confirm", "steady", "growth", "across", "regional", "markets", "while",
    "experts", "suggest", "caution", "regarding", "volatile", "commodity",
    "prices", "and", "regulatory", "changes", "announced", "this", "quarter",
    "with", "further", "details", "expected", "in", "upcoming", "briefings",
]

_LANGS = ["en", "fr", "de", "es"]

ENTITY_IRI_BASE = "http://kg.example.org/entity/"
ENTITY_TYPES = ["org:Organization", "foaf:Person", "geo:SpatialThing"]


def _pick(seed_col: Column, options: list[str], salt: int) -> Column:
    arr = F.array(*[F.lit(o) for o in options])
    idx = F.pmod(F.xxhash64(seed_col, F.lit(salt)), F.lit(len(options)))
    return F.element_at(arr, (idx + 1).cast("int"))


def _entity_mention(seed_col: Column, n_entities: int, salt: int) -> Column:
    """Skewed entity pick: entity id ~ floor(sqrt(uniform)) — a few hot
    entities appear in a large share of pages (the north rule's hot-key
    case), the long tail is uniform."""
    u = F.pmod(F.xxhash64(seed_col, F.lit(salt)), F.lit(n_entities * n_entities))
    ent = F.floor(F.sqrt(u.cast("double"))).cast("bigint")
    return F.concat(F.lit("Entity"), ent)


def make_pages(spark: SparkSession, n_pages: int, n_entities: int = 500,
               seed: int = 42, partitions: int | None = None,
               hot_entity_frac: float | None = None,
               hot_entity: str = "Entity1") -> DataFrame:
    """Synthesize the pages table; deterministic in (n_pages, n_entities, seed).

    ``hot_entity_frac`` plants a HOT KEY for skew stress benches: that
    fraction of pages gets its first mention replaced by ``hot_entity``,
    so one entity dominates the mention stream (the north rule's
    pathological-key case) while everything else stays identical."""
    base = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    s = F.xxhash64(i, F.lit(seed))

    words = [
        _pick(s + F.lit(k), _FILLER, k) for k in range(18)
    ]
    mentions = [
        _entity_mention(s, n_entities, 101),
        _entity_mention(s, n_entities, 202),
        _entity_mention(s, n_entities, 303),
    ]
    if hot_entity_frac is not None:
        cut = int(hot_entity_frac * 1_000_000)
        is_hot = F.pmod(F.xxhash64(i, F.lit(4242)), F.lit(1_000_000)) < cut
        mentions[0] = F.when(is_hot, F.lit(hot_entity)).otherwise(mentions[0])
    text = F.concat_ws(
        " ",
        *words[:6], mentions[0], *words[6:10], mentions[1],
        *words[10:15], mentions[2], *words[15:],
    )
    html = F.concat(
        F.lit("<html><head><title>page "), i.cast("string"),
        F.lit("</title><script>var x=1;</script></head><body><p>"),
        text,
        F.lit("</p><!-- comment --></body></html>"),
    ).cast("binary")
    return base.select(
        F.concat(
            F.lit("https://example.org/site"),
            F.pmod(s, F.lit(1000)).cast("string"),
            F.lit("/page"), i.cast("string"),
        ).alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp")
         + F.make_interval(secs=i.cast("double"))).alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        _pick(s, _LANGS, 7).alias("lang"),
    )


def make_alias_dict(spark: SparkSession, n_entities: int = 500) -> DataFrame:
    """Alias dictionary: surface form (lowercased) -> entity IRI + type.

    Two surface variants per entity so canonicalization has real work:
    'entityN' and 'entity N'."""
    base = spark.range(0, n_entities)
    i = F.col("id")
    iri = F.concat(F.lit(ENTITY_IRI_BASE), i.cast("string"))
    etype = _pick(i, ENTITY_TYPES, 13)
    v1 = base.select(
        F.concat(F.lit("entity"), i.cast("string")).alias("alias"),
        iri.alias("entity_iri"), etype.alias("entity_type"),
    )
    v2 = base.select(
        F.concat(F.lit("entity "), i.cast("string")).alias("alias"),
        iri.alias("entity_iri"), etype.alias("entity_type"),
    )
    # every third entity also has a LEGACY IRI sharing the same surface form
    # -> connected-components canonicalization has real clusters to merge
    legacy = base.where(i % 3 == 0).select(
        F.concat(F.lit("entity"), i.cast("string")).alias("alias"),
        F.concat(F.lit("http://kg.example.org/legacy/"),
                 i.cast("string")).alias("entity_iri"),
        etype.alias("entity_type"),
    )
    return v1.unionByName(v2).unionByName(legacy)
