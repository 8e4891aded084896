"""Session-timezone hostility — calendar semantics are UTC by contract.

Spark timestamps are instants; every calendar operation (``date_trunc``,
``window``, ``date_format``, RANGE frames over epoch arithmetic) renders
instants in the SESSION timezone, which defaults to the JVM/host zone on
a vanilla session. On a 1000-executor deployment the session TZ is
cluster config — ops changes it, hosts drift, a notebook inherits
whatever the gateway set — and a drifted TZ silently shifts every
day/hour bucket boundary while row counts stay plausible. The DuckDB
oracles read the same parquet as NAIVE timestamps (the stored UTC wall
clock), so any TZ leak is also a cross-engine divergence.

The engine's contract: ``load_table`` pins ``spark.sql.session.timeZone``
to UTC at every scan, the same way it pins the nanos legacy conf — so
query results are identical whatever the host or cluster default, even
on a vanilla session that never went through ``build_session`` (which
also pins UTC, but the verify driver does not use it).

This sweep drives every timestamp-reading oracled query with the session
TZ forced to ``Asia/Kathmandu`` (+05:45 — a half-hour-grid zone that
shifts EVERY hour bucket, not just day boundaries) immediately before
each build, and asserts the DuckDB hash still matches. A control test
pins that the hazard is real — the same corpus read WITHOUT the loader
diverges under the hostile TZ — so the sweep cannot silently go vacuous
if a future refactor drops the pin from the loader.
"""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from full_data_infrastructure_spark import queries as registry
from tests.oracle_check import compare, duckdb_conn

registry._ensure_loaded()

HOSTILE_TZ = "Asia/Kathmandu"

_TS_COLS = re.compile(r"\b(ts|o_orderdate|l_shipdate)\b")
TZ_SWEEP = [
    n
    for n in sorted(registry.REGISTRY)
    if registry.REGISTRY[n].oracle and _TS_COLS.search(registry.REGISTRY[n].oracle)
]


@pytest.fixture(scope="module")
def restore_tz(spark):
    original = spark.conf.get("spark.sql.session.timeZone")
    yield
    spark.conf.set("spark.sql.session.timeZone", original)


@pytest.fixture(scope="module")
def tz_duck(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", TZ_SWEEP)
def test_hostile_session_tz_oracle_parity(spark, sf_dir, tz_duck, restore_tz, name):
    # Forced before EVERY build: the loader inside the builder must pin it
    # back to UTC for the analysis of everything downstream.
    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    q = registry.REGISTRY[name]
    ok, msg = compare(
        q.build(spark, sf_dir),
        tz_duck.sql(q.oracle),
        exact_cols=q.exact_float_cols,
    )
    assert ok, f"{name} (session TZ {HOSTILE_TZ}): {msg}"


def test_loader_warns_when_clobbering_caller_tz(spark, sf_dir, restore_tz):
    """The UTC pin is session-global and survives past the engine query
    (calendar rendering happens at action time, so it must). ADVICE r8:
    the override must therefore be LOUD when it clobbers a TZ the caller
    chose deliberately, and silent when the session is already on UTC."""
    import warnings as w

    from full_data_infrastructure_spark.sources.parquet import load_table

    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        load_table(spark, sf_dir, "orders")
    msgs = [str(c.message) for c in caught if "timeZone" in str(c.message)]
    assert msgs and HOSTILE_TZ in msgs[0], msgs
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    # already-UTC session: no warning
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        load_table(spark, sf_dir, "orders")
    assert not [c for c in caught if "timeZone" in str(c.message)], caught


def test_tz_hazard_is_real_without_the_loader(spark, sf_dir, restore_tz):
    """Control: a raw ``spark.read`` (no load_table pin) under the hostile
    TZ truncates days on Kathmandu boundaries — off the UTC grid — so
    the sweep above is proving the loader's pin, not testing nothing."""
    import os

    spark.conf.set("spark.sql.session.timeZone", HOSTILE_TZ)
    raw = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    # DATE -> timestamp cast happens in session TZ; truncation then lands
    # on local midnight, whose UTC instant carries a -05:45 offset.
    local_midnight = (
        raw.select(
            F.date_format(
                F.date_trunc("day", F.col("o_orderdate").cast("timestamp")),
                "HH:mm",
            ).alias("hm")
        )
        .distinct()
        .collect()
    )
    assert {r.hm for r in local_midnight} == {"00:00"}, (
        "date_trunc no longer floors in session TZ — Spark semantics "
        "changed; re-evaluate whether the loader pin is still needed"
    )
    utc_instants = (
        raw.select(
            F.unix_timestamp(
                F.date_trunc("day", F.col("o_orderdate").cast("timestamp"))
            ).alias("s")
        )
        .distinct()
        .collect()
    )
    assert all(r.s % 86400 != 0 for r in utc_instants), (
        "hostile-TZ truncation landed on the UTC day grid — the control "
        "lost its teeth (did the session TZ pin leak into this test?)"
    )
