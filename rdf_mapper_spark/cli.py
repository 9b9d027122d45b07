"""CLI parity with the reference ``mapper`` console script (mapper.py:36-66):

    python -m rdf_mapper_spark.cli TEMPLATE DATAFILE [OUTFILE]
        [--format turtle|nquads|trig|update|delete]
        [--auto-declare] [--abort-on-error]
        [--master local[*]] [--nquads-dir DIR]

CSV and .json/.jsonlines inputs are dispatched by extension exactly like the
reference; parquet directories/files are accepted as the web-scale input.
Turtle/TriG/update/delete serialize driver-side (test/interop scale);
``--nquads-dir`` writes the distributed N-Quads sink instead.

A ``query`` mode runs SPARQL text against a stored quad table (the
read side, rdf_mapper_spark/sparql.py):

    python -m rdf_mapper_spark.cli query STORE "SELECT ... WHERE {...}"
        [--format csv|json] [--limit N] [--master local[*]]

STORE is a write_quad_store directory (predicate-partitioned, pruned
reads) or any parquet of quad rows.  SELECT/ASK print solutions to
stdout; CONSTRUCT/DESCRIBE print Turtle.
"""

from __future__ import annotations

import argparse
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rdf-mapper-spark",
        description="Transform csv/jsonlines/parquet into RDF via a mapping "
                    "template, on Spark",
    )
    p.add_argument("template", help="mapping template YAML")
    p.add_argument("datafile", help="input data (.csv, .json/.jsonlines, .parquet)")
    p.add_argument("outfile", nargs="?", default=None,
                   help="output file (default stdout)")
    p.add_argument("--format", default="turtle",
                   choices=["turtle", "nquads", "trig", "update", "delete"])
    p.add_argument("--auto-declare", action="store_true")
    p.add_argument("--abort-on-error", action="store_true")
    p.add_argument("--master", default="local[*]")
    p.add_argument("--nquads-dir", default=None,
                   help="write distributed N-Quads to this directory instead "
                        "of serializing on the driver")
    return p


def build_query_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rdf-mapper-spark query",
        description="Run a SPARQL query string against a quad store",
    )
    p.add_argument("store", help="quad-store directory or quad parquet")
    p.add_argument("sparql", help="SPARQL query text (or @file to read)")
    p.add_argument("--format", default="csv", choices=["csv", "json"],
                   help="solution output format for SELECT")
    p.add_argument("--limit", type=int, default=10_000,
                   help="cap printed solutions (default 10000; a SELECT "
                        "over a billion-solution store must not collect "
                        "unbounded to the driver)")
    p.add_argument("--no-limit", action="store_true",
                   help="print every solution (explicit escape hatch)")
    p.add_argument("--master", default="local[*]")
    return p


def query_main(argv: list[str]) -> int:
    from pyspark.sql import SparkSession

    from rdf_mapper_spark.sinks import turtle_string
    from rdf_mapper_spark.sparql import sparql
    from rdf_mapper_spark.store import read_quad_store, read_stats

    args = build_query_parser().parse_args(argv)
    text = args.sparql
    if text.startswith("@"):
        with open(text[1:], encoding="utf-8") as fh:
            text = fh.read()
    spark = (
        SparkSession.builder.master(args.master)
        .appName("rdf-mapper-spark-query")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    is_store = os.path.isdir(args.store) and any(
        e.startswith("p=") for e in os.listdir(args.store))
    stats = None
    if is_store:      # predicate-partitioned store: decode NULL-graph
        quads = read_quad_store(spark, args.store)
        stats = read_stats(spark, args.store)   # ANALYZE sidecar, if any
    else:
        quads = spark.read.parquet(args.store)
    out = sparql(quads, text, stats=stats)
    if isinstance(out, bool):                     # ASK
        print("true" if out else "false")
        return 0
    cols = out.columns
    if set(cols) >= {"s", "p", "o", "ok"}:        # CONSTRUCT / DESCRIBE
        sys.stdout.write(turtle_string(out, {}))
        return 0
    rows = (out.collect() if args.no_limit
            else out.limit(args.limit).collect())
    if args.format == "json":
        import json
        for r in rows:
            print(json.dumps(r.asDict(), ensure_ascii=False))
    else:
        print(",".join(cols))
        for r in rows:
            print(",".join("" if r[c] is None else str(r[c])
                           for c in cols))
    return 0


def main(argv: list[str] | None = None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "query":
        return query_main(argv[1:])

    from pyspark.sql import SparkSession

    from rdf_mapper_spark.engine import MapperEngine
    from rdf_mapper_spark.quads import DEFAULT_GRAPH
    from rdf_mapper_spark.sinks import (
        sparql_delete_script,
        sparql_update_script,
        trig_string,
        turtle_string,
        write_nquads,
    )
    from rdf_mapper_spark.sources import read_csv, read_jsonlines, read_pages
    from rdf_mapper_spark.spec import load_spec

    args = build_parser().parse_args(argv)
    spec = load_spec(args.template, auto_declare=args.auto_declare)
    spark = (
        SparkSession.builder.master(args.master)
        .appName("rdf-mapper-spark")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    name, ext = os.path.splitext(args.datafile)
    if ext == ".csv":
        df = read_csv(spark, args.datafile)
    elif ext in (".json", ".jsonlines"):
        df = read_jsonlines(spark, args.datafile)
    elif ext in (".parquet", ""):
        df = read_pages(spark, args.datafile)
    else:
        print(f"Did not recognise file type of {args.datafile}",
              file=sys.stderr)
        return 2

    engine = MapperEngine(spec)
    quads = engine.apply(df, file_name=os.path.basename(name))

    if args.nquads_dir:
        write_nquads(quads, args.nquads_dir)
        out_text = f"# N-Quads written to {args.nquads_dir}\n"
    elif args.format == "turtle":
        out_text = turtle_string(quads, dict(spec.namespaces))
    elif args.format == "trig":
        out_text = trig_string(quads, dict(spec.namespaces))
    elif args.format == "nquads":
        from rdf_mapper_spark.quads import nquads_lines

        out_text = "\n".join(
            r["value"] for r in nquads_lines(quads).collect()
        ) + "\n"
    elif args.format == "update":
        out_text = sparql_update_script(quads, engine.resolve_preserved_graphs(),
                                        dict(spec.namespaces))
    else:
        out_text = sparql_delete_script(quads, engine.resolve_preserved_graphs(),
                                        dict(spec.namespaces))

    if args.outfile:
        with open(args.outfile, "w", encoding="utf-8") as fh:
            fh.write(out_text)
    else:
        sys.stdout.write(out_text)

    if args.abort_on_error:
        try:
            engine.check_abort_on_error()
        except RuntimeError as err:
            print(str(err), file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
