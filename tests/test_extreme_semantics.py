"""Duplicate-saturated and extreme-values oracle parity.

Two more adversarial corpora alongside the NULL and unicode sweeps
(tests/test_null_semantics.py, tests/test_unicode_semantics.py):

* **Duplicate saturation** — 90% of documents collapse onto 3 canonical
  texts. A web-scale corpus is exactly this shape around boilerplate;
  every dedup/survivor/fingerprint operator's tie-breaking and
  cluster-collapse semantics must stay deterministic and cross-engine
  stable when nearly everything is a duplicate. Every documents-reading
  oracle is re-compared.

* **Extreme values** — events.value gets negated / scaled by 1e6 /
  pinned to 0.01 and 0.0 rows, orders.o_totalprice gets negated. Pins
  sign handling (negative medians/percentiles, ROUND away from zero),
  magnitude headroom (cents in BIGINT, DECIMAL money sums), and
  zero-value edges in every events/orders-reading oracle. When
  introduced (round 8) it caught winsorize_values' P5/P95 interpolation
  diverging in the last ulp on doubles right at a negative decimal tie
  (now integer-cents, the mad_outliers recipe).

Values stay 2-decimal throughout: that is the stored precision the
cents-based operators (mad_outliers, winsorize_values) document as
their contract.
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

DOC_ORACLED = [
    n
    for n in sorted(registry.REGISTRY)
    if registry.REGISTRY[n].oracle and "documents" in registry.REGISTRY[n].oracle
]
VALUE_ORACLED = [
    n
    for n in sorted(registry.REGISTRY)
    if registry.REGISTRY[n].oracle
    and (
        "events" in registry.REGISTRY[n].oracle
        or "orders" in registry.REGISTRY[n].oracle
    )
]

CANON = (
    "the quick brown fox jumps over the lazy dog again and again and again",
    "pack my box with five dozen liquor jugs for the corpus pipeline test",
    "sphinx of black quartz judge my vow across every deduplication stage",
)


def _write_corpus(spark, sf_dir, root, transform):
    for name in SYNTHETIC_TABLES:
        transform(name, load_table(spark, sf_dir, name)).write.parquet(
            table_path(root, name)
        )


def _duck_for(root):
    con = duckdb.connect()
    for name in SYNTHETIC_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{table_path(root, name)}/*.parquet'"
        )
    return con


@pytest.fixture(scope="module")
def dup_sf_dir(spark, sf_dir, tmp_path_factory):
    def transform(name, df):
        if name != "documents":
            return df
        canon = F.element_at(
            F.array(*[F.lit(s) for s in CANON]),
            (F.col("doc_id") % len(CANON) + 1).cast("int"),
        )
        return df.withColumn(
            "text",
            F.when(F.col("doc_id") % 10 != 0, canon).otherwise(F.col("text")),
        ).withColumn("n_chars", F.length("text").cast("bigint"))

    root = str(tmp_path_factory.mktemp("sf_dups"))
    _write_corpus(spark, sf_dir, root, transform)
    return root


@pytest.fixture(scope="module")
def extreme_sf_dir(spark, sf_dir, tmp_path_factory):
    def transform(name, df):
        if name == "events":
            v = (
                F.when(F.col("event_id") % 7 == 0, -F.col("value"))
                .when(F.col("event_id") % 7 == 1, F.col("value") * 1000000)
                .when(F.col("event_id") % 7 == 2, F.lit(0.01))
                .when(F.col("event_id") % 7 == 3, F.lit(0.0))
                .otherwise(F.col("value"))
            )
            return df.withColumn("value", F.round(v, 2))
        if name == "orders":
            p = F.when(
                F.col("o_orderkey") % 5 == 0, -F.col("o_totalprice")
            ).otherwise(F.col("o_totalprice"))
            return df.withColumn("o_totalprice", F.round(p, 2))
        return df

    root = str(tmp_path_factory.mktemp("sf_extreme"))
    _write_corpus(spark, sf_dir, root, transform)
    return root


@pytest.fixture(scope="module")
def dup_duck(dup_sf_dir):
    con = _duck_for(dup_sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def extreme_duck(extreme_sf_dir):
    con = _duck_for(extreme_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_ORACLED)
def test_duplicate_saturated_oracle_parity(spark, dup_sf_dir, dup_duck, name):
    q = registry.REGISTRY[name]
    ok, msg = compare(
        q.build(spark, dup_sf_dir),
        dup_duck.sql(q.oracle),
        exact_cols=q.exact_float_cols,
    )
    assert ok, f"{name} (duplicate-saturated corpus): {msg}"


@pytest.mark.parametrize("name", VALUE_ORACLED)
def test_extreme_values_oracle_parity(spark, extreme_sf_dir, extreme_duck, name):
    q = registry.REGISTRY[name]
    ok, msg = compare(
        q.build(spark, extreme_sf_dir),
        extreme_duck.sql(q.oracle),
        exact_cols=q.exact_float_cols,
    )
    assert ok, f"{name} (extreme-values corpus): {msg}"
