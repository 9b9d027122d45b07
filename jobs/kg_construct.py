"""spark-submit entry point for the KG-construction pipeline (north rule
execution mode):

    spark-submit --master <cluster> \\
        --py-files rdf_mapper_spark.zip \\
        jobs/kg_construct.py PAGES_PARQUET WORKDIR \\
        [--aliases ALIASES_PARQUET] [--n-entities N] [--dedup-salt K]

The package ships as a zip on the executors' PYTHONPATH (--py-files); the
job itself imports it only inside main() so the import happens after
spark-submit has installed the archive.  Stages checkpoint to WORKDIR with
per-partition lineage metrics and are resumable (pipeline.checkpoint).

Build the archive with:  python jobs/package_pyfiles.py dist/
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(prog="kg_construct")
    ap.add_argument("pages", help="input pages parquet/Iceberg path "
                                  "(url, warc_ts, html, text, lang)")
    ap.add_argument("workdir", help="checkpoint + graph-table output dir")
    ap.add_argument("--aliases", default=None,
                    help="alias dictionary parquet (alias, entity_iri, "
                         "entity_type); default: synthetic dictionary")
    ap.add_argument("--n-entities", type=int, default=200,
                    help="synthetic dictionary size when --aliases absent")
    ap.add_argument("--dedup-salt", type=int, default=0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("rdf-mapper-kg-construct").getOrCreate()

    from rdf_mapper_spark.pipeline.datagen import make_alias_dict
    from rdf_mapper_spark.pipeline.run import run_pipeline

    pages = spark.read.parquet(args.pages)
    aliases = (spark.read.parquet(args.aliases) if args.aliases
               else make_alias_dict(spark, args.n_entities))
    metrics = run_pipeline(spark, pages, aliases, workdir=args.workdir,
                           dedup_salt=args.dedup_salt, materialize=True)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
