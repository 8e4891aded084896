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
    """Driver-replica parity: compare() is exact (rel_tol=0) on every
    float column since round 10 — the census measured all 161 oracled
    queries bit-identical on every float column on EVERY corpus the
    suite runs (standard at sf0.001/0.01/0.1 and all five adversarial
    sweeps) once the one genuine divergence was fixed
    (multimodal_embed's ``** 0.5`` pow -> math.sqrt). exact_cols passes
    the declared bit-identity set purely for its absent-name
    fail-loud."""
    q = registry.REGISTRY[name]
    sdf = q.build(spark, sf_dir)
    rel = duck.sql(q.oracle)
    ok, msg = compare(sdf, rel, exact_cols=q.exact_float_cols)
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


def test_exact_float_mode_has_teeth(spark):
    """Compare() is exact (rel_tol=0) on every float column since round
    10 — the faithful replica of the driver's value hash (the census
    measured zero genuine tolerance users on any corpus). Pin that a
    last-ulp divergence is rejected WITHOUT any declaration, that a
    bit-identical value passes, and that a typo'd exact_cols name is an
    error rather than a silently-vacuous claim."""
    import duckdb

    con = duckdb.connect()
    # 0.1 + 0.2 differs from the 0.3 literal by one ulp — classic IEEE.
    sdf = spark.createDataFrame([(1, 0.1 + 0.2)], ["id", "v"])
    ok, msg = compare(sdf, con.sql("SELECT 1 AS id, CAST(0.3 AS DOUBLE) AS v"))
    assert not ok and "v" in msg, f"default must reject a last-ulp diff: {msg}"
    ok, msg = compare(
        sdf,
        con.sql(
            "SELECT 1 AS id, CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE) AS v"
        ),
    )
    assert ok, msg
    ok, msg = compare(
        sdf,
        con.sql("SELECT 1 AS id, CAST(0.3 AS DOUBLE) AS v"),
        exact_cols=("no_such_col",),
    )
    assert not ok and "no_such_col" in msg, msg
    con.close()


def test_bit_identity_queries_declare_exact_cols():
    """Every query whose docstring claims bit-identity of a shipped FLOAT
    column must carry the exact_float_cols contract so every sweep
    enforces it (round 10 extended the original three with the four the
    bit-identity audit found undeclared: kmeans' rounded cosine, the
    histogram's IEEE bucket edges, tfidf's transcendental-free score,
    and the EMA's raw exact-in-binary doubles)."""
    assert registry.REGISTRY["mad_outliers"].exact_float_cols == (
        "median_value",
        "mad_value",
    )
    assert registry.REGISTRY["winsorize_values"].exact_float_cols == ("winsorized",)
    assert registry.REGISTRY["pagerank_parts"].exact_float_cols == ("pagerank",)
    assert registry.REGISTRY["embedding_kmeans"].exact_float_cols == ("cos",)
    assert registry.REGISTRY["cosine_threshold_histogram"].exact_float_cols == (
        "bucket_low",
    )
    assert registry.REGISTRY["tfidf_top_token"].exact_float_cols == ("score",)
    assert registry.REGISTRY["ema_by_user"].exact_float_cols == ("ema_value",)
    assert registry.REGISTRY["multimodal_embed"].exact_float_cols == ("value",)


def test_exact_cols_are_case_consistent(spark):
    """ADVICE r9 claimed compare() lowercases exact_cols but not the
    result columns, so an uppercase result column could never be declared
    exact. The code is actually case-consistent — result columns are
    lowercased (oracle_check.py compare, the ``spark_pdf.columns =``
    assignment) BEFORE the exact-membership sets are built — but nothing
    pinned it. Pin all three behaviours: an uppercase result column CAN
    be declared exact under any declaration casing, the exactness has
    teeth there (last-ulp rejection), and a genuinely absent column still
    fail-louds."""
    import duckdb

    con = duckdb.connect()
    sdf = spark.createDataFrame([(1, 0.1 + 0.2)], ["id", "SumQty"])
    for declared in ("SumQty", "sumqty", "SUMQTY"):
        ok, msg = compare(
            sdf,
            con.sql('SELECT 1 AS id, CAST(0.1 AS DOUBLE)+CAST(0.2 AS DOUBLE) AS "SumQty"'),
            exact_cols=(declared,),
        )
        assert ok, (declared, msg)
        ok, msg = compare(
            sdf,
            con.sql('SELECT 1 AS id, CAST(0.3 AS DOUBLE) AS "SumQty"'),
            exact_cols=(declared,),
        )
        assert not ok and "sumqty" in msg, (declared, msg)
    ok, msg = compare(
        sdf,
        con.sql('SELECT 1 AS id, CAST(0.1 AS DOUBLE)+CAST(0.2 AS DOUBLE) AS "SumQty"'),
        exact_cols=("SumQty_typo",),
    )
    assert not ok and "absent" in msg, msg
    con.close()
