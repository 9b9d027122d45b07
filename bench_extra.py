#!/usr/bin/env python
"""Per-query optimization harness (bench.py stays FROZEN for measurement).

Times any subset of the headline queries with the same session config and
methodology as bench.py (count(), best-of-N), and optionally captures
.explain("formatted") for each into plans/r06/.

Usage:
    python bench_extra.py q1 q2 ...      # time the named queries
    python bench_extra.py --all          # every headline query
    python bench_extra.py --plans SUFFIX q1 q2   # also write
        plans/r06/<query>_<SUFFIX>.txt  (e.g. SUFFIX=before/after)
    python bench_extra.py --trials N ...  # best-of-N (default 2)
    python bench_extra.py --pipeline      # time the kg_pipeline metric

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "kg_flagship", "kg_typed_literals", "dedup_minhash_buckets",
    "dedup_simhash", "embedding_near_dups",
    "pricing_summary", "segment_revenue", "ann_topk", "ann_lsh",
    "ann_lsh_indexed", "ann_ivf_indexed", "ann_ivfpq_indexed",
    "text_analysis", "text_winnow",
    "kg_incremental", "quality_filter", "web_canonical_urls",
    "decontaminate", "pii_scrub", "repetition_metrics",
    "corpus_curation", "lm_logprob", "tfidf_terms",
    "chunk_documents", "corpus_stats",
    "corpus_curation_neardup", "dedup_paragraphs", "cap_per_source",
    "pack_sequences", "kg_bgp_star", "kg_path_cites", "session_stats",
    "kg_entity_table", "kg_predicate_stats", "kg_shape_violations",
    "events_asof", "kg_bgp_stored",
    "kg_rdfs_inference", "kg_sameas", "kg_bgp_optional", "kg_construct",
    "semantic_dedup", "kg_update",
    "kg_sparql_select", "kg_sparql_agg",
]


def main() -> None:
    args = sys.argv[1:]
    plans_suffix = None
    trials_n = 2
    do_pipeline = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans":
            plans_suffix = args[i + 1]
            i += 2
        elif a == "--trials":
            trials_n = int(args[i + 1])
            i += 2
        elif a == "--all":
            names = list(HEADLINE)
            i += 1
        elif a == "--pipeline":
            do_pipeline = True
            i += 1
        else:
            names.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import build_spark

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    # warm the JVM/codegen path the way bench.py does (small pipeline pass)
    from rdf_mapper_spark.pipeline.datagen import make_alias_dict, make_pages
    from rdf_mapper_spark.pipeline.run import run_pipeline

    t0 = time.time()
    run_pipeline(spark, make_pages(spark, 10_000, n_entities=500),
                 make_alias_dict(spark, 500), workdir=None,
                 materialize=False)
    warm = round(time.time() - t0, 3)

    out: dict = {"warmup_sec": warm, "sf_dir": sf_dir, "cpus": cpus}

    if do_pipeline:
        import shutil
        import tempfile
        pages_dir = os.path.join(tempfile.gettempdir(), "bench_pages_x")
        shutil.rmtree(pages_dir, ignore_errors=True)
        n_pages = int(os.environ.get("SPARK_GRAFT_PAGES", "100000"))
        make_pages(spark, n_pages, n_entities=2000).write.parquet(pages_dir)
        pages = spark.read.parquet(pages_dir)
        aliases = make_alias_dict(spark, 2000)
        trials = []
        for _ in range(3):
            t0 = time.time()
            run_pipeline(spark, pages, aliases, workdir=None,
                         materialize=False)
            trials.append(round(time.time() - t0, 3))
        out["kg_pipeline"] = min(trials)
        out["kg_pipeline_trials"] = trials

    plan_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "plans", "r06")
    if plans_suffix:
        os.makedirs(plan_dir, exist_ok=True)

    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(name)
        if plans_suffix:
            df = fn(spark, sf_dir)
            with open(os.path.join(plan_dir,
                                   f"{name}_{plans_suffix}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        trials = []
        for _ in range(trials_n):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            trials.append(round(time.time() - t0, 3))
        out[name] = min(trials)
        out[f"{name}_trials"] = trials
        out[f"{name}_rows"] = n
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: out[name], "trials": trials, "rows": n}),
              flush=True)

    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
