"""Physical-layout invariance — every query result survives resharding.

On a 1000-executor cluster, on-disk row order and file count are
implementation details: compaction jobs rewrite partitions, ingest
parallelism decides file sizes, and a scan's split order is whatever the
scheduler produced that day. Any query whose result depends on physical
layout (an arbitrary-row-per-group pick, a per-partition seeded RNG, an
iteration order leaking into a tie-break) is silently nondeterministic
at scale even though it looks stable on a single test file.

This sweep rewrites the corpus with a hostile layout — every table
hash-repartitioned into 7 part-files and sorted within partitions by a
content hash, so both the file count and the row order differ from the
pristine single-file corpus — then asserts EVERY registered query
(oracled and rows-only alike) produces cell-identical results on both
layouts. Rows are compared sorted, so legitimate output-order freedom is
allowed; what must not change is the result *set*.

Why self-consistency rather than re-running the DuckDB oracles on the
resharded corpus: ``compare`` already sorts rows, and the standard suite
(tests/test_oracle_parity.py) pins Spark == DuckDB on the pristine
layout. Spark-resharded == Spark-pristine therefore implies
Spark-resharded == oracle on the same data; a second cross-engine sweep
would only re-test DuckDB's own scan order. Self-consistency is also the
ONLY possible layout check for the 16 rows-only queries (sketches,
ANN indexes, BPE) — which are exactly the ones most at risk, since no
oracle hash ever constrains them.

Float note: aggregation order over doubles is not associative, so a
resharded sum may legitimately move in the last ulp; cells compare with
the same 1e-9 relative tolerance the oracle gate uses.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from full_data_infrastructure_spark import queries as registry
from full_data_infrastructure_spark.schemas import SYNTHETIC_TABLES
from full_data_infrastructure_spark.sources.parquet import load_table, table_path
from tests.oracle_check import _cells_equal, normalize_frame

registry._ensure_loaded()
ALL_QUERIES = sorted(registry.REGISTRY)

N_FILES = 7


@pytest.fixture(scope="module")
def resharded_sf_dir(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sf_resharded"))
    for name in SYNTHETIC_TABLES:
        df = load_table(spark, sf_dir, name)
        cols = [F.col(c) for c in df.columns]
        # Hash-partition into 7 files and scramble in-file row order by a
        # content hash: deterministic, but unrelated to the pristine layout.
        (
            df.repartition(N_FILES, F.xxhash64(*cols))
            .sortWithinPartitions(F.xxhash64(*cols))
            .write.parquet(table_path(root, name))
        )
    return root


def _frames_match(a_pdf, b_pdf) -> tuple[bool, str]:
    if sorted(a_pdf.columns) != sorted(b_pdf.columns):
        return False, (
            f"schema drift: resharded={sorted(a_pdf.columns)} "
            f"pristine={sorted(b_pdf.columns)}"
        )
    if len(a_pdf) != len(b_pdf):
        return False, f"row count: resharded={len(a_pdf)} pristine={len(b_pdf)}"
    a_rows, b_rows = normalize_frame(a_pdf), normalize_frame(b_pdf)
    for i, (ar, br) in enumerate(zip(a_rows, b_rows)):
        for j, (av, bv) in enumerate(zip(ar, br)):
            if not _cells_equal(av, bv):
                col = sorted(a_pdf.columns)[j]
                return False, (
                    f"cell mismatch at sorted-row {i} col '{col}': "
                    f"resharded={av!r} pristine={bv!r}"
                )
    return True, "ok"


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_layout_invariance(spark, sf_dir, resharded_sf_dir, name):
    q = registry.REGISTRY[name]
    resharded = q.build(spark, resharded_sf_dir).toPandas()
    pristine = q.build(spark, sf_dir).toPandas()
    ok, msg = _frames_match(resharded, pristine)
    assert ok, f"{name} (resharded 7-file corpus vs pristine): {msg}"


def test_resharded_corpus_really_differs(spark, sf_dir, resharded_sf_dir):
    """The sweep is vacuous if the hostile layout isn't hostile: assert the
    resharded events table has multiple part-files AND a different
    first-row order than the pristine single file."""
    import glob
    import os

    parts = glob.glob(os.path.join(table_path(resharded_sf_dir, "events"), "part-*"))
    assert len(parts) == N_FILES, f"expected {N_FILES} part files, got {len(parts)}"
    pristine_head = [
        r.event_id for r in load_table(spark, sf_dir, "events").limit(50).collect()
    ]
    resharded_head = [
        r.event_id
        for r in load_table(spark, resharded_sf_dir, "events").limit(50).collect()
    ]
    assert pristine_head != resharded_head, "row order did not change"
