"""Reshape operators: pivot (long->wide), unpivot/melt (wide->long), and
NTILE quantile bucketing.

The reference's dashboards hand-shape these in Superset (per-BU breakdown
charts, ``README.md:167-172``); the engine exposes them as first-class
relational operators. Both pivots are expressed with explicit category
lists: an implicit ``pivot()`` without values forces an extra distinct
scan to discover columns AND makes the output schema data-dependent —
unacceptable at 100 TB (schema must be known before the job runs).

Scale notes: pivot with an explicit value list is one hash aggregate (the
conditional counts fold map-side); unpivot is a generator projection (no
shuffle); NTILE partitions by a bounded key so no global single-partition
sort sneaks in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from full_data_infrastructure_spark.queries import register
from full_data_infrastructure_spark.sources.parquet import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_event_counts",
    f"""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           {", ".join(
               f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
               for t in EVENT_TYPES
           )}
    FROM events
    GROUP BY 1
    """,
    doc="Pivot long->wide: daily event counts, one column per event type "
    "(explicit category list => static schema, single hash aggregate). "
    "The dashboard crosstab shape.",
    tags=("reshape", "events"),
)
def _pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(EVENT_TYPES))
    )


UNPIVOT_METRICS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "unpivot_lineitem",
    "\nUNION ALL\n".join(
        f"""
    SELECT l_orderkey, l_linenumber, '{m}' AS metric,
           CAST({m} AS DOUBLE) AS metric_value
    FROM lineitem WHERE l_linenumber <= 2
    """
        for m in UNPIVOT_METRICS
    ),
    doc="Unpivot/melt wide->long: four lineitem measures become "
    "(metric, metric_value) rows — the feed for generic metric stores "
    "and long-format chart inputs. Pure generator projection, no shuffle.",
    tags=("reshape",),
)
def _unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    casted = li.select(
        "l_orderkey",
        "l_linenumber",
        *[F.col(m).cast("double").alias(m) for m in UNPIVOT_METRICS],
    )
    return casted.unpivot(
        ["l_orderkey", "l_linenumber"],
        list(UNPIVOT_METRICS),
        "metric",
        "metric_value",
    )


@register(
    "ntile_price_quartiles",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber,
           ntile(4) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ) AS quartile
    FROM lineitem
    """,
    doc="NTILE(4) price quartiles per return flag — quantile bucketing as "
    "a window, deterministic via a unique (orderkey, linenumber) "
    "tiebreaker. Partitioned by a bounded key, so no global "
    "single-partition sort.",
    tags=("reshape", "window"),
)
def _ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.ntile(4).over(w).alias("quartile"),
    )
