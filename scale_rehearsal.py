#!/usr/bin/env python
"""10x scale rehearsal (VERDICT r8 item 6) — run the heavy benched family
on an engine-side inflated corpus one order of magnitude past the largest
driver tier, and record wall times + any cliffs in SCALE.md.

/root/testdata caps at sf0.1 (read-only), and every 100 TB claim so far is
plan-shape + sf0.1 timings.  Scale reveals what plans don't: the sf0.1
parity tier caught PageRank's ROUND-on-double tie divergence that sf0.01
never hit; this tier exists to catch memory/AQE cliffs the same way.

The inflated corpus is a union of K hash-perturbed copies of sf0.1,
written once to a temp dir in load_table layout:

* ``documents``: doc_id shifted by copy * 10^9; each copy's text carries a
  copy tag token, so copies are NEAR-duplicates of each other — LSH/CC
  cluster sizes grow ~Kx, exactly the cluster-skew a web corpus shows.
* ``embeddings``: vec_id shifted; one dimension nudged by copy * 1e-3 so
  vectors are near- but not exactly equal (no degenerate cosine ties).
* ``lineitem``: l_orderkey and l_partkey shifted per copy — K disjoint
  co-purchase graphs, Kx nodes and edges for PageRank.
* ``events``: event_id and user_id shifted per copy (Kx keys).

Run (takes minutes; keep the host otherwise idle):

    python scale_rehearsal.py            # K=10, heavy family
    SPARK_GRAFT_REHEARSAL_K=3 python scale_rehearsal.py   # smaller sweep

Prints one JSON line: {"k": K, "rows": {...}, "queries": {name: sec},
"errors": {...}}.  Results are transcribed to SCALE.md, not auto-written.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HEAVY_FAMILY = (
    "dedup_minhash_lsh",
    "dedup_survivors_lsh",
    "dedup_semantic",
    "corpus_pipeline_lsh",
    "corpus_pipeline_full_lsh",
    "knn_ivfpq",
    "knn_bruteforce",
    "pagerank_parts",
)

INFLATED = ("documents", "embeddings", "lineitem", "events")


def inflate(spark, src_dir: str, dest_dir: str, k: int) -> dict[str, int]:
    """Write the K-copy perturbed union of sf tables into dest_dir."""
    from pyspark.sql import functions as F

    from full_data_infrastructure_spark.schemas import SYNTHETIC_TABLES
    from full_data_infrastructure_spark.sources.parquet import (
        load_table,
        table_path,
    )

    rows: dict[str, int] = {}
    for name in SYNTHETIC_TABLES:
        base = load_table(spark, src_dir, name)
        if name not in INFLATED:
            base.write.parquet(table_path(dest_dir, name))
            continue
        copies = []
        for i in range(k):
            c = base
            if name == "documents":
                c = c.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(i * 10**9)
                ).withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" rep{i}"))
                ).withColumn("n_chars", F.length("text").cast("bigint"))
            elif name == "embeddings":
                c = c.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(i * 10**9)
                ).withColumn(
                    "embedding",
                    F.concat(
                        F.array(
                            (
                                F.element_at("embedding", 1) + F.lit(i * 1e-3)
                            ).cast("float")
                        ),
                        F.slice(F.col("embedding"), 2, F.size("embedding") - 1),
                    ),
                )
            elif name == "lineitem":
                c = c.withColumn(
                    "l_orderkey", F.col("l_orderkey") + F.lit(i * 10**9)
                ).withColumn("l_partkey", F.col("l_partkey") + F.lit(i * 10**7))
            elif name == "events":
                c = c.withColumn(
                    "event_id", F.col("event_id") + F.lit(i * 10**9)
                ).withColumn("user_id", F.col("user_id") + F.lit(i * 10**7))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionAll(c)
        out.write.parquet(table_path(dest_dir, name))
        rows[name] = spark.read.parquet(table_path(dest_dir, name)).count()
    return rows


def main() -> None:
    k = int(os.environ.get("SPARK_GRAFT_REHEARSAL_K", "10"))
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from full_data_infrastructure_spark import queries as registry
    from full_data_infrastructure_spark.session import build_session

    spark = build_session(app_name="fdi-spark-scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    registry._ensure_loaded()

    dest = tempfile.mkdtemp(prefix="scale_rehearsal_")
    try:
        t0 = time.monotonic()
        rows = inflate(spark, src, dest, k)
        inflate_sec = round(time.monotonic() - t0, 1)
        print(f"# inflated K={k} in {inflate_sec}s: {rows}", file=sys.stderr)

        timings: dict[str, float] = {}
        errors: dict[str, str] = {}
        for name in HEAVY_FAMILY:
            build = registry.REGISTRY[name].build
            t0 = time.monotonic()
            try:
                n = build(spark, dest).count()
            except Exception as exc:  # a cliff IS the finding — record it
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
                continue
            timings[name] = round(time.monotonic() - t0, 1)
            print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

        print(
            json.dumps(
                {
                    "k": k,
                    "inflate_sec": inflate_sec,
                    "rows": rows,
                    "queries": timings,
                    "errors": errors,
                    "load_avg": [round(x, 2) for x in os.getloadavg()],
                }
            )
        )
    finally:
        shutil.rmtree(dest, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
