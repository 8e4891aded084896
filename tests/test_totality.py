"""Empty-corpus totality sweep.

At 100 TB an empty input is not an edge case — a partition-pruned read, a
quiet CDC topic, a filtered-to-nothing backfill window, or a brand-new
stream all hand an operator zero rows, and a pipeline stage that CRASHES
on them (instead of emitting an empty, schema-stable result) takes the
whole job down. This sweep drives every registered query builder against
a schema-correct but 0-row replica of the synthetic tables and asserts
none of them raises. It caught real bugs when introduced (round 8): the
streaming replay sentinel did ``None + timedelta`` on an empty source,
and the PCA projection aborted instead of projecting nothing.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from full_data_infrastructure_spark.schemas import SYNTHETIC_TABLES
from full_data_infrastructure_spark.sources.parquet import load_table, table_path


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """A scale-factor directory with every synthetic table present but
    empty — schemas cloned from the real testdata so loaders see the
    exact production column types (including events' normalized ts)."""
    root = str(tmp_path_factory.mktemp("sf_empty"))
    for name in SYNTHETIC_TABLES:
        load_table(spark, sf_dir, name).limit(0).write.parquet(
            table_path(root, name)
        )
    return root


def test_every_query_total_on_empty_corpus(spark, empty_sf_dir):
    failures = {}
    for name, build in entry_mod.queries().items():
        try:
            n = build(spark, empty_sf_dir).count()
        except Exception as ex:  # noqa: BLE001 — we aggregate and report all
            failures[name] = f"{type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
            continue
        # Scalar/manifest-style aggregates may legitimately emit summary
        # rows over nothing; anything else must simply be empty, never an
        # error. No assertion on n beyond being a real count.
        assert n >= 0, name
    assert not failures, failures
