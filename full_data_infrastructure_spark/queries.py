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
        multimodal,
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

    _LOADED = True
