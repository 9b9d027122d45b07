#!/usr/bin/env python
"""Profile one headline query: run it (count(), N trials) with the UI
enabled, then dump per-stage wall/exec times from the REST API plus the
number of jobs/stages — identifies whether time goes to driver (gaps),
task execution, or scheduling overhead.

Usage: python scripts/profile_query.py <query> [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> None:
    name = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        .config("spark.sql.files.openCostInBytes", "0")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()[name]

    # plan-build + analysis cost alone
    t0 = time.time()
    df = fn(spark, sf_dir)
    build_s = time.time() - t0
    t0 = time.time()
    df._jdf.queryExecution().executedPlan()
    plan_s = time.time() - t0

    times = []
    for _ in range(trials):
        t0 = time.time()
        fn(spark, sf_dir).count()
        times.append(round(time.time() - t0, 3))

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4040/api/v1/applications/{app_id}"

    def get(path):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    jobs = get("/jobs")
    stages = get("/stages?status=complete")
    print(f"build={build_s:.3f}s plan={plan_s:.3f}s trials={times}")
    print(f"jobs={len(jobs)} stages={len(stages)}")
    tot_exec = 0.0
    rows = []
    for st in stages:
        dur = st.get("executorRunTime", 0) / 1000.0
        sub = st.get("submissionTime")
        comp = st.get("completionTime")
        wall = ""
        rows.append((dur, st["stageId"], st["numTasks"],
                     st.get("name", "")[:80]))
        tot_exec += dur
    rows.sort(reverse=True)
    print(f"total executorRunTime={tot_exec:.1f}s (sum over tasks)")
    for dur, sid, ntasks, nm in rows[:25]:
        print(f"  stage {sid:5d} exec={dur:8.2f}s tasks={ntasks:4d}  {nm}")
    # job-level wall clock (submission->completion) to find driver gaps
    jw = []
    for j in jobs:
        try:
            t1 = j["submissionTime"]
            t2 = j["completionTime"]
        except KeyError:
            continue
        from datetime import datetime
        f = "%Y-%m-%dT%H:%M:%S.%f"
        d1 = datetime.strptime(t1.replace("GMT", ""), f)
        d2 = datetime.strptime(t2.replace("GMT", ""), f)
        jw.append(((d2 - d1).total_seconds(), j["jobId"],
                   j.get("name", "")[:70]))
    jw.sort(reverse=True)
    print(f"job wall total={sum(w for w, _, _ in jw):.2f}s across {len(jw)} jobs")
    for w, jid, nm in jw[:20]:
        print(f"  job {jid:4d} wall={w:7.2f}s  {nm}")
    spark.stop()


if __name__ == "__main__":
    main()
