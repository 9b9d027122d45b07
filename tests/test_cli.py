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
