#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE north rule).

No real cluster exists in this sandbox, so the same job runs at two
parallelism levels — local[8] (N) and local[32] (4N) — on IDENTICAL input;
throughput at both plus the scaling efficiency
    eff = throughput(4N) / (4 * throughput(N))
is written to BENCH/BASELINE.md. Each level runs in a fresh JVM (subprocess)
so executor-thread counts are honest.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_level(cpus: int, sf_dir: str, pages: int | None) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    if pages:
        env["SPARK_GRAFT_PAGES"] = str(pages)
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pages = os.environ.get("SPARK_GRAFT_PAGES")
    pages_n = int(pages) if pages else None
    lo = run_level(8, sf_dir, pages_n)
    hi = run_level(32, sf_dir, pages_n)
    tp_lo = lo["triples_per_sec"]
    tp_hi = hi["triples_per_sec"]
    eff = tp_hi / (4.0 * tp_lo)
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    md = f"""# BENCH baseline — two-cluster-size scaling

Same job (full KG pipeline: extract -> link -> triples -> canonicalize ->
dedup over {lo['pages']} synthetic pages) at two parallelism levels on
identical input. local[8]/local[32] stand in for N vs 4N executors (no real
cluster in this sandbox).

| level | cpus | pipeline wall (s) | triples | triples/sec |
|---|---|---|---|---|
| N  | 8  | {lo['queries']['kg_pipeline']} | {lo['triples']} | {tp_lo} |
| 4N | 32 | {hi['queries']['kg_pipeline']} | {hi['triples']} | {tp_hi} |

**Scaling efficiency = {tp_hi} / (4 x {tp_lo}) = {eff:.3f}**
(target >= 0.8 per BASELINE.json)

Spark confs: AQE on (coalesce + skew-join), shuffle.partitions = 2 x cores,
Arrow enabled, salted final dedup (salt=16).

Full per-query timings:

```json
{json.dumps({'local8': lo, 'local32': hi}, indent=1)}
```
"""
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write(md)
    print(json.dumps({
        "throughput_n": tp_lo,
        "throughput_4n": tp_hi,
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
