"""Build the --py-files archive for spark-submit deployment.

    python jobs/package_pyfiles.py [outdir]   ->  outdir/rdf_mapper_spark.zip

The zip contains the package at archive root (the layout --py-files
expects on the executor PYTHONPATH).
"""

from __future__ import annotations

import os
import sys
import zipfile

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(outdir: str) -> str:
    os.makedirs(outdir, exist_ok=True)
    out = os.path.join(outdir, "rdf_mapper_spark.zip")
    pkg = os.path.join(HERE, "rdf_mapper_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, HERE))
    return out


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
