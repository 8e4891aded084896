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
# (Round 8 note: zero bench pins again — all 21 benched queries hold r7
# green rows — and tag repair forces nothing, so the 48 free slots go to
# the three never-attested round-8 registrations (winnowing_fingerprint,
# mixture_sqrt_temperature, shard_manifest — the round's only new
# queries, within the VERDICT r6 growth freeze), the FORCE_REFRESH
# re-attestations of trend_by_event_type (its DECIMAL widening
# post-dates its r7 row) and pagerank_parts (its tie-exact integer
# quantization post-dates its r7 row — rotation.py), and then the stalest
# tail: the round-7
# backlog drained fully, so the fill is the r3-attested set.  The staleness SLA
# (tests/test_registry_order.py::test_staleness_sla) holds with every
# registered query either windowed or green within the last 3 rounds.)
DRIVER_WINDOW: tuple[str, ...] = (
    "flagship_benefits",
    "bu_salary_dashboard",
    "mixture_sqrt_temperature",
    "pagerank_parts",
    "shard_manifest",
    "trend_by_event_type",
    "winnowing_fingerprint",
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
