#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "groups": {family: subtotal_sec, ...},
"fold_sec": {name: sec, ...}, "sf": ...}.

Each query is fully materialized via a count-style action (the result rows
are collected to a noop aggregate so the measurement includes the complete
plan, not just the first stage).

Per-query timings are BEST-OF-3: run-to-run variance on a shared host was
measured at +/-30%..2x, and the first execution of a heavy-expression query
pays one-time Janino codegen — the minimum of three executions is the
steady-state number a long-running cluster sees. Plan-shape regressions
are caught by tests/test_plans.py; treat residual cross-run deltas as
noise.

Drift-adjudication history lives in BENCH_LEDGER.md (split out round 12,
VERDICT r11 note 3, when the in-docstring ledger neared 200 lines): every
band-breach print since round 6, the protocol run that adjudicated it
(idle best-of-5, worktree A/B, and — since r12 — the three-tree
alternating cycle for gaps that survive an isolated A/B), plus the
recording-condition annotations (BENCH_r10 CONTENDED, the pagerank 30x
single-JVM memory footnote, corpus_pipeline_full_lsh's scan-dominated
sf0.1 wall) and the bench-set growth history (21 entries r7, 23 r9).
Seven consecutive adjudications have ended "host drift, not regression";
a new breach enters that protocol, and its writeup goes in the ledger
file, not here.

Schema additions (round 6):
* "groups" — per-family subtotals (relational / dedup / ann / text /
  pipeline / streaming, derived from registry tags) so round-over-round
  comparison stays readable as the bench set grows past 16 entries.
* "fold_sec" — secondary metric for streaming entries: the sum of
  per-micro-batch addBatch durations (query.recentProgress) from the
  BEST-wall-time run, i.e. the merge-fold cost the bench exists to track,
  separated from the ~fixed replay harness overhead (checkpoint + trigger
  scheduling + snapshot IO) that dominates the wall number.

Schema additions (round 8):
* "median_sec" — per-query median-of-N beside the best-of-N: all three
  drift adjudications to date ended "host variance" only after an
  idle-host worktree re-run; the recorded best/median spread makes that
  call readable directly from consecutive BENCH files.
* "load_avg" — the host's 1/5/15-minute load averages at bench start.
  Every adjudication's conclusion was "slow host on recording day"; the
  recorded load makes that visible at recording time instead of being
  reconstructed a round later.

Local iteration: SPARK_GRAFT_BENCH_ONLY=name1,name2 runs a subset (the
driver never sets it; recorded rounds are always the full set).

Methodology fixes (round 18, both documented with before/after numbers in
OPTIMIZATION_r18.md; the driver contract — env vars, timed action,
best-of-N, the one JSON line — is unchanged):
* a global untimed warm-up SWEEP of the bench set runs before any timing,
  because the JVM's tiered JIT made recorded numbers depend on registry
  POSITION (same code: 10.66s at position 2 vs 2.09s at position 23);
  disable with SPARK_GRAFT_BENCH_SWEEP=0 to reproduce the old behavior;
* release_persisted() actually releases now (cache.py held weakrefs that
  were already dead, so the JVM CacheManager silently substituted the
  PREVIOUS run's cached intermediates into every repeat — best-of-N was
  partially cache-warm for every query with an operator-internal persist,
  in every round since those persists landed).  Numbers for the dedup/
  ANN/pipeline families are therefore HIGHER and honest from r18 on.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from full_data_infrastructure_spark import queries as registry
    from full_data_infrastructure_spark.session import build_session

    spark = build_session(app_name="fdi-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    load_avg = [round(x, 2) for x in os.getloadavg()]

    bench = registry.bench_queries()
    # Local-iteration subset: SPARK_GRAFT_BENCH_ONLY=name1,name2 runs just
    # those entries (the driver never sets it, so recorded rounds are
    # always the full set — "value" over a subset is not comparable).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").strip()
    if only:
        wanted = {w.strip() for w in only.split(",") if w.strip()}
        unknown = wanted - bench.keys()
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY names not benched: {sorted(unknown)}")
        bench = {k: v for k, v in bench.items() if k in wanted}
    timings: dict[str, float] = {}
    median_sec: dict[str, float] = {}
    fold_sec: dict[str, float] = {}

    def family(name: str) -> str:
        tags = set(registry.REGISTRY[name].tags)
        for tag, grp in (
            ("streaming", "streaming"),
            ("packing", "pipeline"),
            ("similarity", "ann"),
            ("dedup", "dedup"),
            ("text", "text"),
        ):
            if tag in tags:
                return grp
        return "relational"

    # Warm up the JVM/session AND the parquet read path (footer parsing,
    # vectorized-reader codegen, OS page cache for the bench inputs) so q1
    # isn't charged for one-time initialization — the numbers should
    # reflect steady-state execution, which is what a long-running cluster
    # sees. No query results are cached; every query still does its own IO.
    spark.range(1000).count()
    for t in ("lineitem", "documents", "events", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()

    from full_data_infrastructure_spark.cache import release_persisted

    # Global warm-up SWEEP (measurement fix, optimization round 18): one
    # untimed execution of every benched query BEFORE any timing.  The
    # per-query warmup below only compiles that query's generated code;
    # the JVM's tiered JIT keeps compiling Spark-core methods for minutes
    # after startup, and that global churn lands on whichever queries run
    # FIRST — measured on the r18 host: pagerank_parts best-of-5 was
    # 10.66s at bench position 2 and 2.09s at position 23 on IDENTICAL
    # code (flagship_benefits 0.76s vs 1.31s by position alone), so a
    # window rotation that reorders the registry changed recorded numbers
    # by 3-5x.  The sweep brings the whole JVM to the steady state the
    # docstring above already declares as the measurement target, making
    # per-query numbers independent of registry position.  Methodology is
    # otherwise UNCHANGED (same best-of-N of fresh builds, same action,
    # same release discipline); the sweep caches no data —
    # release_persisted() drops every operator-internal persist, so each
    # timed run still computes from the parquet inputs.
    if os.environ.get("SPARK_GRAFT_BENCH_SWEEP", "1") != "0":
        for name, build in bench.items():
            release_persisted()
            build(spark, sf_dir).count()

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    for name, build in bench.items():
        # One untimed execution first: Janino compiles each query's
        # generated code on its first run (hundreds of ms for the
        # heavy-expression queries), and best-of-N over runs that are all
        # still JIT-warming reports compiler time, not query time. The
        # warmup run caches no data (release_persisted below) — it only
        # brings codegen and the JVM's tiered JIT to steady state, which
        # is the regime a long-running cluster executes in.
        release_persisted()
        build(spark, sf_dir).count()
        from full_data_infrastructure_spark.streaming.replay import LAST_FOLD_SEC

        best, n = None, 0
        runs: list[float] = []
        for _ in range(repeats):
            # Each repeat rebuilds the query from scratch, so caches an
            # earlier repeat persisted are dead weight — release them
            # before timing, not during.
            release_persisted()
            start = time.perf_counter()
            df = build(spark, sf_dir)
            n = df.count()
            elapsed = time.perf_counter() - start
            runs.append(elapsed)
            if best is None or elapsed < best:
                best = elapsed
                if name in LAST_FOLD_SEC:
                    fold_sec[name] = LAST_FOLD_SEC[name]
        timings[name] = round(best, 3)
        # Median alongside best: every drift adjudication so far (minhash
        # r5, asof r6, survivors r7) concluded "host variance" only after
        # an idle-host worktree re-run; a recorded best/median pair lets
        # the next round read the spread directly — a drifted best with an
        # unchanged median (or a median far above best) is host noise, a
        # drifted median on an unchanged plan is worth a re-run.
        runs.sort()
        mid = len(runs) // 2
        med = runs[mid] if len(runs) % 2 else (runs[mid - 1] + runs[mid]) / 2
        median_sec[name] = round(med, 3)
        print(
            f"# {name}: {timings[name]}s best-of-{repeats} "
            f"(median {median_sec[name]}s, {n} rows)",
            file=sys.stderr,
        )

    total = round(sum(timings.values()), 3)
    groups: dict[str, float] = {}
    for name, sec in timings.items():
        grp = family(name)
        groups[grp] = round(groups.get(grp, 0.0) + sec, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "median_sec": median_sec,
                "groups": groups,
                "fold_sec": fold_sec,
                "load_avg": load_avg,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
