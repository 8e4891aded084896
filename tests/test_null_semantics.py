"""Null-injected oracle parity — cross-engine NULL semantics, pinned.

The synthetic testdata is null-free, so the standard parity suite never
exercises three-valued logic; at 100 TB nulls are routine (failed parses,
optional fields, late enrichment). This suite clones the corpus with
deterministic ~10% NULLs injected into the non-key columns and re-runs
EVERY oracled query's DuckDB comparison on the null-injected tables, so
Spark's null handling must agree with ANSI semantics query by query —
not just "doesn't crash" (tests/test_totality.py covers that for empty
input; rows-only builders are execution-checked here too).

When introduced (round 8) this sweep caught, and its green state now
pins, five real bug classes:

* ``str(None)`` in a Pandas UDF smuggling the string 'None' into the
  lake (enrichment);
* three-valued ``!=`` silently dropping NULL-keyed rows (debezium
  tombstone filter, streaming sentinel filters);
* non-null-safe LAG comparison in SCD2 losing x -> NULL transitions AND
  breaking fold idempotence;
* engine-divergent float interpolation of even-count medians once nulls
  shift a group's parity (mad_outliers, now exact integer cents);
* Spark's NULLS FIRST vs ANSI NULLS LAST in a tiebreak ORDER BY
  (knn_label_consistency, now moot: unlabeled neighbors don't vote).
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from full_data_infrastructure_spark import queries as registry
from full_data_infrastructure_spark.schemas import SYNTHETIC_TABLES
from full_data_infrastructure_spark.sources.parquet import load_table, table_path
from tests.oracle_check import compare

registry._ensure_loaded()
WITH_ORACLE = [n for n in sorted(registry.REGISTRY) if registry.REGISTRY[n].oracle]
ROWS_ONLY = [n for n in sorted(registry.REGISTRY) if not registry.REGISTRY[n].oracle]

# Non-key columns that may plausibly be null in production; keys and
# timestamps stay non-null (they are the identity/order the operators'
# contracts require — e.g. scd2's tiebreak rides on event_id for exactly
# that reason).
NULLABLE = {
    "documents": ("text", "lang", "source"),
    "events": ("event_type", "value", "props"),
    "embeddings": ("label",),
    "orders": ("o_comment", "o_orderpriority", "o_clerk"),
    "lineitem": ("l_comment", "l_shipinstruct", "l_shipmode"),
    "customer": ("c_comment", "c_mktsegment"),
    "supplier": ("s_comment",),
    "part": ("p_comment", "p_type", "p_brand"),
    "nation": ("n_comment",),
    "region": ("r_comment",),
}


@pytest.fixture(scope="module")
def null_sf_dir(spark, sf_dir, tmp_path_factory):
    """Clone of sf_dir with deterministic ~10% NULLs: row selection is
    crc32(first_column | column_name) % 10 == 0, so the injection is
    reproducible and differs per column (a row rarely loses every
    field)."""
    root = str(tmp_path_factory.mktemp("sf_nulls"))
    for name in SYNTHETIC_TABLES:
        df = load_table(spark, sf_dir, name)
        key = df.columns[0]
        present = [c for c in NULLABLE.get(name, ()) if c in df.columns]
        for col in present:
            hit = (
                F.crc32(F.concat_ws("|", F.col(key).cast("string"), F.lit(col)))
                % 10
                == 0
            )
            df = df.withColumn(
                col, F.when(hit, F.lit(None)).otherwise(F.col(col))
            )
        df.write.parquet(table_path(root, name))
    return root


@pytest.fixture(scope="module")
def null_duck(null_sf_dir):
    con = duckdb.connect()
    for name in SYNTHETIC_TABLES:
        # Spark writes each table as a directory of part files.
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{table_path(null_sf_dir, name)}/*.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_null_oracle_parity(spark, null_sf_dir, null_duck, name):
    q = registry.REGISTRY[name]
    ok, msg = compare(
        q.build(spark, null_sf_dir),
        null_duck.sql(q.oracle),
        exact_cols=q.exact_float_cols,
    )
    assert ok, f"{name} (null-injected corpus): {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_null_rows_only_executes(spark, null_sf_dir, name):
    q = registry.REGISTRY[name]
    assert q.build(spark, null_sf_dir).count() >= 0
