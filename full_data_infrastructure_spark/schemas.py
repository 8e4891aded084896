"""Explicit StructType registry — the engine's schema system.

The reference declares schemas in three places: SQL DDL
(``init-scripts/init-db.sql:11-49``), an explicit stream StructType
(``spark/SaveDelta.scala:87-95``), and JDBC inference
(``airflow/config/read_delta.py:101``). We centralize: one registry keyed by
table name, used by sources for schema enforcement and by the cast-alignment
operator (``read_delta.py:130-161``'s defensive harmonization, re-expressed in
``operators/relational.py``).

Two families live here:

* the **reference domain** tables (employees / commute_validations /
  sport_activities and the Debezium envelope), used by the generator,
  streaming, and enrichment modules;
* the **driver synthetic** tables (TPC-H-ish; see TESTDATA.md) the
  correctness gate runs on.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-domain schemas (FIXTURES.md §1)
# ---------------------------------------------------------------------------

# employees — init-scripts/init-db.sql:11-23; xlsx ingest commute_validation.py:193-203
EMPLOYEES = T.StructType(
    [
        T.StructField("id_employee", T.IntegerType(), False),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("birthday", T.DateType(), True),
        T.StructField("hire_date", T.DateType(), True),
        T.StructField("business_unity", T.StringType(), True),
        T.StructField("gross_salary", T.IntegerType(), True),
        T.StructField("constract_type", T.StringType(), True),  # sic, reference spelling
        T.StructField("address", T.StringType(), True),
        T.StructField("transport_mode", T.StringType(), True),
        T.StructField("paid_leaved_days", T.IntegerType(), True),
    ]
)

# commute_validations — init-scripts/init-db.sql:26-35
COMMUTE_VALIDATIONS = T.StructType(
    [
        T.StructField("id_validate", T.LongType(), False),
        T.StructField("id_employee", T.IntegerType(), True),
        T.StructField("calculed_distance", T.DecimalType(10, 2), True),
        T.StructField("calculed_duration", T.DecimalType(10, 2), True),
        T.StructField("is_valid", T.BooleanType(), True),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# sport_activities — init-db.sql:38-49; stream schema SaveDelta.scala:87-95
# Note the deliberate type drift the reference carries: Postgres declares
# distance INT, the stream schema declares Double — we keep the stream view.
SPORT_ACTIVITIES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("id_employee", T.IntegerType(), True),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("start_datetime", T.TimestampType(), True),
        T.StructField("sport_type", T.StringType(), True),
        T.StructField("distance", T.DoubleType(), True),
        T.StructField("activity_duration", T.IntegerType(), True),
        T.StructField("comment", T.StringType(), True),
    ]
)

# Debezium change-event envelope for the sport_activities topic — the JSON
# value shape parsed field-by-field at SaveDelta.scala:140-147. Timestamps in
# `before`/`after` arrive as microseconds-since-epoch int64 (SaveDelta.scala:143).
_DEBEZIUM_ROW = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("id_employee", T.IntegerType(), True),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("start_datetime", T.LongType(), True),  # micro-epoch
        T.StructField("sport_type", T.StringType(), True),
        T.StructField("distance", T.DoubleType(), True),
        T.StructField("activity_duration", T.IntegerType(), True),
        T.StructField("comment", T.StringType(), True),
    ]
)

DEBEZIUM_ENVELOPE = T.StructType(
    [
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("before", _DEBEZIUM_ROW, True),
                    T.StructField("after", _DEBEZIUM_ROW, True),
                    T.StructField("op", T.StringType(), True),  # c|r|u|d
                    T.StructField("ts_ms", T.LongType(), True),
                    T.StructField(
                        "source",
                        T.StructType(
                            [
                                T.StructField("table", T.StringType(), True),
                                T.StructField("lsn", T.LongType(), True),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        )
    ]
)

# ---------------------------------------------------------------------------
# Driver synthetic tables (TESTDATA.md) — schema the engine *expects*; parquet
# files are the source of truth, these are used for validation and docs.
# ---------------------------------------------------------------------------

SYNTHETIC_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

REFERENCE_TABLES = {
    "employees": EMPLOYEES,
    "commute_validations": COMMUTE_VALIDATIONS,
    "sport_activities": SPORT_ACTIVITIES,
}
