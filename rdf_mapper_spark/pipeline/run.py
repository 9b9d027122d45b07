"""End-to-end web-scale KG construction (the BASELINE north rule flow).

    pages -> extract -> link -> candidate triples (template engine)
          -> canonicalize (CC over sameAs evidence) -> dedup -> materialize

The candidate-triple stage IS the template engine: the mapping below is an
ordinary mapping spec compiled over the linked-pages DataFrame, so the
benchmark throughput measures the engine itself at scale.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rdf_mapper_spark.engine import MapperEngine
from rdf_mapper_spark.pipeline.canonicalize import (
    canonical_mapping,
    rewrite_canonical,
    sameas_edges_from_aliases,
)
from rdf_mapper_spark.pipeline.checkpoint import StageRunner
from rdf_mapper_spark.pipeline.extract import with_extracted_text
from rdf_mapper_spark.pipeline.linking import linked_pages
from rdf_mapper_spark.quads import dedup_quads
from rdf_mapper_spark.sinks import write_graph_tables
from rdf_mapper_spark.spec import MappingSpec

#: The KG mapping applied to linked pages. Deterministic, content-keyed
#: subjects (urls / entity IRIs) — no row ordinals anywhere, per
#: SURVEY.md §7.4(2).
PIPELINE_SPEC = {
    "globals": {"$datasetBase": "http://kg.example.org"},
    "resources": [
        {
            "name": "page",
            "properties": {
                "@id": "<{url}>",
                "@type": "<{$datasetBase}/def/WebPage>",
                "<dct:language>": "{lang}",
                "<dct:date>": "{warc_ts}",
                "<{$datasetBase}/def/mentions>": "<{entity_iri}>",
            },
        },
        {
            "name": "entity",
            "properties": {
                "@id": "<{entity_iri}>",
                "@type": "<{entity_type}>",
                "<skos:prefLabel>": "{mention}",
            },
        },
    ],
}


def build_quads(linked: DataFrame, cache_input: bool = True) -> DataFrame:
    """Candidate quads from linked pages (no dedup — staged separately).

    The linked-pages input carries the extraction UDF + n-gram explode +
    broadcast join; with two resource templates it would otherwise be
    recomputed per branch, so persist it once (cache_input)."""
    spec = MappingSpec(PIPELINE_SPEC, auto_declare=False)
    engine = MapperEngine(spec)
    return engine.apply(linked, file_name="pages", dedup=False,
                        cache_input=cache_input)


def _input_fingerprint(pages: DataFrame, aliases: DataFrame,
                       spec_dict: dict) -> str:
    """Identity of (page files+sizes, alias content, mapping spec).

    The alias checksum is an order-insensitive aggregate over per-row md5
    prefixes — dictionary-sized, one tiny job; page data is identified by
    its file listing (content hashing 100 TB would defeat the point of
    resuming). In-memory page DataFrames (no input files) fall back to
    schema + count."""
    h = hashlib.md5()
    h.update(json.dumps(spec_dict, sort_keys=True, default=str).encode())
    files = sorted(pages.inputFiles())
    h.update("|".join(files).encode())
    for f in files:
        path = f[7:] if f.startswith("file://") else (
            f[5:] if f.startswith("file:") else f)
        try:
            h.update(str(os.stat(path).st_size).encode())
        except OSError:
            pass
    h.update(str(pages.schema).encode())
    if not files:
        h.update(str(pages.count()).encode())
    row_h = F.md5(F.concat_ws(
        "\x00", *[F.col(c).cast("string") for c in aliases.columns]
    ))
    chk = (
        aliases.select(row_h.alias("h"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.conv(F.substring("h", 1, 15), 16, 10)
                   .cast("decimal(38,0)")).alias("s"))
        .collect()[0]
    )
    h.update(f"{chk['n']}:{chk['s']}".encode())
    return h.hexdigest()


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    aliases: DataFrame,
    workdir: Optional[str] = None,
    dedup_salt: int = 0,
    materialize: bool = True,
) -> dict:
    """Run all stages; returns metrics incl. emitted triple count + timings.

    With ``workdir`` set, every stage checkpoints and is resumable; without,
    the plan runs fused (fastest single-pass benchmark mode).
    dedup_salt=0 relies on AQE skew splitting (one shuffle); raise it when a
    single quad repeats enough to blow a reducer even after AQE (salting
    trades a second shuffle for bounded task input).
    """
    t0 = time.time()
    runner = StageRunner(spark, workdir or "", enabled=workdir is not None)
    # fingerprint the ACTUAL inputs (file identities+sizes, the alias table
    # content, the mapping spec): any change forces recompute instead of
    # silently resuming stale stage parquet. Only computed when resuming is
    # possible — the fused benchmark path pays nothing.
    fp = (_input_fingerprint(pages, aliases, PIPELINE_SPEC)
          if workdir is not None else "")

    extracted = runner.run(
        "extract",
        lambda: with_extracted_text(pages).select(
            "url", "warc_ts",
            F.col("extracted_text").alias("text"), "lang",
        ),
        fingerprint=fp,
    )
    linked = runner.run(
        "link", lambda: linked_pages(extracted, aliases), fingerprint=fp
    )
    # fused mode: persist the UDF-heavy linked input; checkpointed mode
    # reads it back from parquet, which is already cheap to rescan.
    # Project to the columns the mapping actually references BEFORE the
    # persist — `text` (~1 KB/row) would otherwise be materialized in the
    # cache for nothing (persist defeats Catalyst column pruning).
    triple_cols = ["url", "warc_ts", "lang", "mention", "entity_iri",
                   "entity_type"]
    candidate = runner.run(
        "triples",
        lambda: build_quads(linked.select(*triple_cols),
                            cache_input=workdir is None),
        fingerprint=fp,
    )

    def canonical() -> DataFrame:
        edges = sameas_edges_from_aliases(aliases)
        mapping = canonical_mapping(edges)
        rewritten = rewrite_canonical(candidate, mapping)
        return dedup_quads(rewritten, salt=dedup_salt)

    final = runner.run("canonical", canonical, fingerprint=fp)

    n_triples = final.count()
    if materialize and workdir:
        write_graph_tables(final, f"{workdir}/graph_tables")
    wall = time.time() - t0
    return {
        "triples": n_triples,
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(n_triples / wall, 1) if wall > 0 else None,
        "stages": runner.metrics,
    }
