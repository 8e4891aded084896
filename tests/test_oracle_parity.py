"""The main correctness gate, run locally: every registered query with an
oracle must match DuckDB exactly (the driver performs the same comparison at
sf0.01). Rows-only queries must at least execute and return a stable schema.
"""

from __future__ import annotations

import pytest

from full_data_infrastructure_spark import queries as registry
from tests.oracle_check import compare, duckdb_conn

registry._ensure_loaded()
ALL = sorted(registry.REGISTRY)
WITH_ORACLE = [n for n in ALL if registry.REGISTRY[n].oracle is not None]
ROWS_ONLY = [n for n in ALL if registry.REGISTRY[n].oracle is None]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, duck, name):
    q = registry.REGISTRY[name]
    sdf = q.build(spark, sf_dir)
    rel = duck.sql(q.oracle)
    ok, msg = compare(sdf, rel)
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_emits_no_hugeint(duck, name):
    """DuckDB returns SUM(INTEGER) as HUGEINT, which pandas widens to
    float64 while Spark emits int64 — the driver's exact value hash then
    diverges on representation even when every value matches (the round-1
    ``decontaminate_overlap`` failure). This class of bug is invisible to
    the float-tolerant comparison above, so probe every oracle's declared
    output types (planning only, no execution) and demand a BIGINT cast.
    """
    q = registry.REGISTRY[name]
    rel = duck.sql(q.oracle)
    bad = [
        f"{c}: {t}"
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper() or "INT128" in str(t).upper()
    ]
    assert not bad, f"{name}: oracle emits {bad} — CAST(... AS BIGINT) in the SQL"


def test_repr_probe_catches_decimal_vs_float():
    """The round-2 hypertable_rollup hash-red: Spark materializes DECIMAL
    results as Python Decimal objects while DuckDB's widened DECIMAL(38,2)
    fetches as float64 — cell-equal, hash-different. The parity compare must
    reject that representation divergence, not paper over it."""
    import decimal

    import pandas as pd

    from tests.oracle_check import check_repr_parity

    spark_side = pd.DataFrame({"sum_value": [decimal.Decimal("119.69"), None]})
    duck_side = pd.DataFrame({"sum_value": [119.69, float("nan")]})
    err = check_repr_parity(spark_side, duck_side)
    assert err is not None and "sum_value" in err
    # Both-double is fine.
    assert check_repr_parity(duck_side, duck_side.copy()) is None
    # Both-decimal is fine too (driver hashes equal objects equally).
    assert check_repr_parity(spark_side, spark_side.copy()) is None


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_executes(spark, sf_dir, name):
    q = registry.REGISTRY[name]
    sdf = q.build(spark, sf_dir)
    n = sdf.count()
    assert n >= 0
    assert len(sdf.columns) > 0
