"""Named query surface — the engine's public, oracle-checked API.

Every operator family from SURVEY.md §2 (plus the LLM-data extensions) is
exposed here as a named query: a builder ``(spark, sf_dir) -> DataFrame`` and,
where SQL-expressible, an equivalent ANSI-SQL oracle that DuckDB runs on the
same parquet tables. The driver hash-compares the two at sf0.01
(row count + column names + order-insensitive value hash), so:

* every computed column is **aliased identically** on both sides;
* double-valued aggregates are **rounded** on both sides (cross-engine float
  sums differ in the last ulp; rounding to 2 decimals makes them comparable);
* no query depends on wall-clock, RNG, or row order (LIMIT always follows a
  total ORDER BY with a unique tiebreaker).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass
class EngineQuery:
    name: str
    build: QueryBuilder
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, EngineQuery] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryBuilder], QueryBuilder]:
    def wrap(fn: QueryBuilder) -> QueryBuilder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = EngineQuery(name, fn, oracle, doc, tags, bench)
        return fn

    return wrap


def queries() -> dict[str, QueryBuilder]:
    _ensure_loaded()
    return {name: q.build for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}


def bench_queries() -> dict[str, QueryBuilder]:
    _ensure_loaded()
    return {name: q.build for name, q in REGISTRY.items() if q.bench}


_LOADED = False

# The external verify driver attests exactly the FIRST 50 registered queries
# (dict insertion order), so the registry is explicitly re-ordered after
# loading and the window ROTATES each round: queries that already hold a
# green correctness row from an earlier round move past the cap (their rows
# persist as evidence) to make room for queries that have none yet.
#
# The rotation is COMPUTED, not hand-curated (VERDICT r5 item 2): the
# policy lives in full_data_infrastructure_spark/rotation.py — flagship
# queries first, every bench=True query pinned, then never-attested /
# force-refreshed / stalest-first by the committed CORRECTNESS_r*.json
# history, with a final repair pass guaranteeing every operator-family tag
# one window representative.  Regenerate this literal after each round's
# CORRECTNESS file lands with:
#
#     python -m full_data_infrastructure_spark.rotation
#
# tests/test_registry_order.py asserts the committed tuple equals the
# computed one, so the literal cannot silently drift from the policy.
# (Round 7 note: zero bench pins this round — all 21 benched queries
# (the 17 pre-r7 entries plus the round-7 additions tpch_q5_region_volume,
# pagerank_parts, streaming_scd2_snapshot, knn_ivfpq) hold r6 green rows,
# within rotation.EVIDENCE_STALE_AFTER — and tag repair
# forces nothing because every family has fresh standing evidence, so the
# 48 free slots drain the ENTIRE backlog: the 27 never-attested round-6
# queries, all 7 r1-stale, all 13 r2-stale, plus the stalest r3
# (activity_heatmap).  After this round's CORRECTNESS lands, no query's
# newest green row predates round 3 — the staleness SLA
# (tests/test_registry_order.py::test_staleness_sla) holds.)
DRIVER_WINDOW: tuple[str, ...] = (
    "flagship_benefits",
    "bu_salary_dashboard",
    "c4_quality_filters",
    "chunk_documents",
    "cohort_retention",
    "corpus_pipeline",
    "dedup_containment",
    "dedup_survivors",
    "dup_span_signal",
    "embedding_lang_drift",
    "exists_subquery",
    "funnel_conversion",
    "hypertable_rollup_hourly",
    "hypertable_rollup_merge",
    "mad_outliers",
    "mixture_sample",
    "multimodal_decode",
    "multimodal_payload_dedup",
    "ordered_limit",
    "pack_bin_stats",
    "pack_sequences",
    "rfm_segments",
    "validation_suite",
    "winsorize_values",
    "approx_count_distinct",
    "conditional_rate",
    "constraint_violations",
    "dedup_cluster_cc",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_incremental",
    "dedup_incremental_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_span_removal",
    "groupby_count_avg",
    "grouping_sets_counts",
    "histogram_buckets",
    "in_subquery",
    "knn_ivf",
    "knn_label_consistency",
    "knn_lsh",
    "multimodal_embed",
    "notnull_filter",
    "percentile_stats",
    "proportional_sample",
    "scalar_count",
    "select_prune_cast",
    "unpivot_lineitem",
    "anti_join",
)


def _reorder_for_driver_window() -> None:
    """Re-insert REGISTRY entries so DRIVER_WINDOW comes first, in order.

    Python dicts iterate in insertion order, which is exactly what the
    driver's 50-query cap consumes; the queries beyond the window keep
    their relative registration order.
    """
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names unregistered queries: {missing}")
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imported for their @register side effects.
    from full_data_infrastructure_spark.operators import (  # noqa: F401
        aggregates,
        curation,
        dedup,
        enrichment,
        generator,
        joins,
        layout,
        multimodal,
        packing,
        quality,
        relational,
        reshape,
        rollup,
        subqueries,
        similarity,
        text,
        windows,
    )
    from full_data_infrastructure_spark.functions import debezium  # noqa: F401
    from full_data_infrastructure_spark.plans import flagship_queries  # noqa: F401

    _reorder_for_driver_window()
    _LOADED = True
