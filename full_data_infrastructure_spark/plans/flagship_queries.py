"""Registers the flagship pipeline (and its SQL-surface variant) as queries."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from full_data_infrastructure_spark.plans.flagship import (
    FLAGSHIP_ORACLE_SQL,
    flagship_benefits,
)
from full_data_infrastructure_spark.queries import register


@register(
    "flagship_benefits",
    FLAGSHIP_ORACLE_SQL,
    doc=(
        "Reference batch join job (read_delta.py:234-294) + Superset benefits "
        "SQL (README.md:141-164) as one lazy chain: A1 agg, J1 inner join, "
        "J2 left join, prime/total projection (F4-F7, P11)."
    ),
    tags=("reference", "join", "aggregate"),
    bench=True,
)
def _flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    return flagship_benefits(spark, sf_dir)
