"""SQL subquery surface: scalar, correlated EXISTS / NOT EXISTS, and IN.

The reference's only SQL-surface query is the Superset CTE self-join
(``README.md:141-164``, covered by ``cte_self_join``); Trino's federated
SQL implies the full subquery family, so the engine pins it explicitly.
Each query here is ONE ANSI string executed verbatim by both Spark
(``spark.sql`` over temp views) and the DuckDB oracle — a parser/planner
parity check, not just a result check.

Catalyst rewrites these to joins (scalar subquery -> broadcast of a
1-row aggregate; EXISTS/IN -> left-semi; NOT EXISTS -> left-anti), so
the 100 TB plan is the same join the DataFrame API would build —
subqueries cost nothing extra. NOT IN is deliberately absent: its
three-valued NULL semantics make it a correctness trap; NOT EXISTS is
the null-safe spelling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from full_data_infrastructure_spark.queries import register
from full_data_infrastructure_spark.sources.parquet import register_temp_views

SCALAR_SQL = """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
"""

EXISTS_SQL = """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
"""

NOT_EXISTS_SQL = """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45
    )
"""

IN_SQL = """
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_custkey IN (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    )
"""


def _run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    register_temp_views(spark, sf_dir)
    return spark.sql(sql)


@register(
    "scalar_subquery_filter",
    SCALAR_SQL,
    doc="Scalar subquery in a predicate (orders above 2x the mean price). "
    "Catalyst broadcasts the 1-row aggregate; no per-row re-execution.",
    tags=("sql", "subquery"),
)
def _scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_sql(spark, sf_dir, SCALAR_SQL)


@register(
    "exists_subquery",
    EXISTS_SQL,
    doc="Correlated EXISTS — customers with a finalized order; planned as "
    "a left-semi join.",
    tags=("sql", "subquery"),
)
def _exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_sql(spark, sf_dir, EXISTS_SQL)


@register(
    "not_exists_subquery",
    NOT_EXISTS_SQL,
    doc="Correlated NOT EXISTS — suppliers with no heavy lineitem; planned "
    "as a left-anti join (the null-safe spelling of NOT IN).",
    tags=("sql", "subquery"),
)
def _not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_sql(spark, sf_dir, NOT_EXISTS_SQL)


@register(
    "in_subquery",
    IN_SQL,
    doc="IN subquery — orders from one market segment's customers; planned "
    "as a left-semi join.",
    tags=("sql", "subquery"),
)
def _in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_sql(spark, sf_dir, IN_SQL)
