"""North-rule execution mode: the pipeline must run via
`spark-submit --py-files rdf_mapper_spark.zip jobs/kg_construct.py ...`.

The subprocess runs with cwd set to the TEMP dir and no repo PYTHONPATH, so
the import can only succeed through the --py-files archive — this is the
deployment path a real cluster uses.
"""

import json
import os
import subprocess
import sys

import pyspark

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    return os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    sys.path.insert(0, HERE)
    from jobs.package_pyfiles import build

    zip_path = build(str(tmp_path / "dist"))

    # input pages parquet (synthesized with the packaged datagen)
    from rdf_mapper_spark.pipeline.datagen import make_pages

    pages_dir = str(tmp_path / "pages")
    make_pages(spark, 300, n_entities=40).write.parquet(pages_dir)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    workdir = str(tmp_path / "wd")
    out = subprocess.run(
        [_spark_submit(), "--master", "local[2]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(HERE, "jobs", "kg_construct.py"),
         pages_dir, workdir, "--n-entities", "40"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    metrics = json.loads(
        [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert metrics["triples"] > 300
    # stage checkpoints + lineage metrics landed in the workdir
    assert os.path.exists(os.path.join(workdir, "canonical._metrics.json"))
    meta = json.load(open(os.path.join(workdir, "canonical._metrics.json")))
    assert meta["success"] and meta["per_partition"]
    # graph tables materialized
    assert os.path.isdir(os.path.join(workdir, "graph_tables"))
