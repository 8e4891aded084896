#!/usr/bin/env python
"""Per-query profiling harness for the optimization rounds.

Runs a subset of the bench queries with the Spark UI enabled, then pulls
the REST API for per-job wall time (labelled via setJobDescription) and
per-stage shuffle/task metrics, so optimization work targets measured
cost, not guesses (spark_optimization_guide.md section 1).

Usage:
    python scripts/profile_bench.py name1,name2 [--explain-dir plans/r17] \
        [--suffix _before]

Prints one line per Spark job: description, duration, and for each query a
summary: wall seconds, number of jobs, number of stages, total shuffle
read/write bytes, total task time. With --explain-dir, also writes
<dir>/<name><suffix>.txt containing df.explain("formatted") output.

Not part of the driver contract; a developer tool only.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}") as r:
        return json.loads(r.read())


def main() -> None:
    names = [n for n in sys.argv[1].split(",") if n] if len(sys.argv) > 1 else []
    explain_dir = None
    suffix = "_before"
    if "--explain-dir" in sys.argv:
        explain_dir = sys.argv[sys.argv.index("--explain-dir") + 1]
    if "--suffix" in sys.argv:
        suffix = sys.argv[sys.argv.index("--suffix") + 1]

    os.environ.setdefault("SPARK_GRAFT_UI", "true")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from full_data_infrastructure_spark import queries as registry
    from full_data_infrastructure_spark.cache import release_persisted
    from full_data_infrastructure_spark.session import build_session

    spark = build_session(app_name="fdi-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    bench = registry.bench_queries()
    if not names:
        names = list(bench)
    unknown = set(names) - set(registry.REGISTRY)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")

    spark.range(1000).count()
    for t in ("lineitem", "documents", "events", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    summaries = {}
    for name in names:
        build = registry.REGISTRY[name].build
        # warmup (codegen) exactly like bench.py
        release_persisted()
        spark.sparkContext.setJobDescription(f"{name}: warmup")
        df = build(spark, sf_dir)
        df.count()
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(explain_dir, f"{name}{suffix}.txt"), "w") as fh:
                fh.write(plan)

        release_persisted()
        jobs_before = {j["jobId"] for j in rest(base, "/jobs")}
        spark.sparkContext.setJobDescription(f"{name}: timed")
        start = time.perf_counter()
        n = build(spark, sf_dir).count()
        wall = time.perf_counter() - start
        jobs = [j for j in rest(base, "/jobs") if j["jobId"] not in jobs_before]
        stages = rest(base, "/stages?status=complete")
        stage_ids = {s for j in jobs for s in j["stageIds"]}
        st = [s for s in stages if s["stageId"] in stage_ids]
        summaries[name] = {
            "wall_sec": round(wall, 3),
            "rows": n,
            "n_jobs": len(jobs),
            "n_stages": len(st),
            "n_tasks": sum(s["numCompleteTasks"] for s in st),
            "shuffle_read_mb": round(
                sum(s["shuffleReadBytes"] for s in st) / 1e6, 2
            ),
            "shuffle_write_mb": round(
                sum(s["shuffleWriteBytes"] for s in st) / 1e6, 2
            ),
            "task_time_sec": round(
                sum(s["executorRunTime"] for s in st) / 1e3, 2
            ),
        }
        print(f"== {name}: {summaries[name]}", file=sys.stderr)
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            t0 = j.get("submissionTime", "")
            dur = ""
            if j.get("completionTime") and j.get("submissionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                try:
                    dur = (
                        datetime.strptime(j["completionTime"], fmt)
                        - datetime.strptime(j["submissionTime"], fmt)
                    ).total_seconds()
                except ValueError:
                    dur = "?"
            print(
                f"   job {j['jobId']}: {dur}s stages={len(j['stageIds'])} "
                f"tasks={j['numTasks']} {j.get('description', '')[:90]}",
                file=sys.stderr,
            )
    print(json.dumps(summaries, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
