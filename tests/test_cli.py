"""CLI parity: the reference mini-example through the command line."""

import subprocess
import sys

from rdf_mapper_spark.turtle import canonical_quadset, parse_nquads, parse_turtle


def test_cli_mini_example(tmp_path):
    out = tmp_path / "out.ttl"
    r = subprocess.run(
        [sys.executable, "-m", "rdf_mapper_spark.cli",
         "/root/reference/examples/scratch/mini-example.yaml",
         "/root/reference/examples/scratch/mini-data.csv",
         str(out), "--master", "local[2]"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    quads = parse_turtle(out.read_text())
    labels = sorted(q.o.value for q in quads if q.p.endswith("prefLabel"))
    assert labels == ["blue", "green", "red", "yellow"]
    refnos = {q.o.value for q in quads if q.p.endswith("referenceNumber")}
    assert refnos == {"300", "400", "500", "600"}


def test_cli_nquads_format(tmp_path):
    out = tmp_path / "out.nq"
    r = subprocess.run(
        [sys.executable, "-m", "rdf_mapper_spark.cli",
         "/root/reference/examples/scratch/mini-example.yaml",
         "/root/reference/examples/scratch/mini-data.csv",
         str(out), "--format", "nquads", "--master", "local[2]"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    quads = parse_nquads(out.read_text())
    assert len(quads) == 12


def test_cli_query_mode(tmp_path, spark):
    """End-to-end: write a quad store, query it with SPARQL text via
    the CLI `query` mode (separate spark-less subprocess)."""
    from rdf_mapper_spark.store import analyze_store, write_quad_store

    rows = [(None, "iri", "d1", "type", "literal", "Doc", None, None),
            (None, "iri", "d1", "src", "literal", "a", None, None),
            (None, "iri", "d2", "type", "literal", "Doc", None, None),
            (None, "iri", "d2", "src", "literal", "b", None, None),
            (None, "iri", "d3", "type", "literal", "Img", None, None)]
    quads = spark.createDataFrame(
        rows, "g string, sk string, s string, p string, ok string, "
              "o string, odt string, olg string")
    store = str(tmp_path / "store")
    write_quad_store(quads, store)
    analyze_store(spark, store)      # CLI auto-loads the stats sidecar

    r = subprocess.run(
        [sys.executable, "-m", "rdf_mapper_spark.cli", "query", store,
         'SELECT ?d ?s WHERE { ?d <type> "Doc" ; <src> ?s } ORDER BY ?d',
         "--master", "local[2]"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines() if ln]
    assert lines == ["d,s", "d1,a", "d2,b"]

    ask = subprocess.run(
        [sys.executable, "-m", "rdf_mapper_spark.cli", "query", store,
         'ASK { ?d <type> "Img" }', "--master", "local[2]"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert ask.returncode == 0 and ask.stdout.strip() == "true"
