from __future__ import annotations

import os

import pytest

SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from full_data_infrastructure_spark.session import build_session

    session = build_session(app_name="fdi-spark-tests", shuffle_partitions=8)
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_TEST_DIR
