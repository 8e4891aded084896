"""Unicode-injected oracle parity — byte-vs-codepoint semantics, pinned.

The synthetic documents corpus is ASCII, where code points == UTF-8 bytes
and `length` == `octet_length`, so the standard parity suite can never
tell whether an operator (or its oracle) walks characters or bytes. A
real 100 TB web corpus is multibyte everywhere. This suite splices
deterministic multibyte snippets — accented Latin, CJK, RTL Arabic,
astral-plane emoji, combining marks, control characters, JSON-hostile
quotes/backslashes — into ~1/3 of the documents and re-runs the DuckDB
comparison for every oracled query that reads the documents table (plus
executes every rows-only builder).

When introduced (round 8) it caught the four multimodal feature oracles
summing CODE POINTS while the real mapInPandas UDFs sum UTF-8 BYTES —
equal on ASCII, divergent on the first multibyte document; the oracles
now expand text to its UTF-8 byte list in SQL (`_UTF8_BYTES_CTE`), and
this suite keeps the whole byte-level contract honest. It also pins that
the jsonl roundtrip survives JSON-escaping of every injected code point
and that shingle/fingerprint/token operators agree cross-engine on
code-point indexing.
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

# Only queries that actually read documents can be affected; the rest
# would re-test byte-identical tables.
DOC_ORACLED = [
    n
    for n in sorted(registry.REGISTRY)
    if registry.REGISTRY[n].oracle and "documents" in registry.REGISTRY[n].oracle
]
ROWS_ONLY = [n for n in sorted(registry.REGISTRY) if not registry.REGISTRY[n].oracle]

SNIPPETS = (
    " café naïve über ",
    " 日本語テスト 中文 ",
    " \U0001F600\U0001F680 emoji \U0001F1EB\U0001F1F7 ",
    " العربية rtl ",
    " tab\there\nnewline ",
    ' quote"back\\slash ',
    " combining é́ zalgo ",
)


@pytest.fixture(scope="module")
def unicode_sf_dir(spark, sf_dir, tmp_path_factory):
    """Clone of sf_dir with a deterministic multibyte snippet appended to
    every third document (snippet chosen by doc_id mod, n_chars
    recomputed so the metadata stays true)."""
    root = str(tmp_path_factory.mktemp("sf_unicode"))
    for name in SYNTHETIC_TABLES:
        df = load_table(spark, sf_dir, name)
        if name == "documents":
            snip = F.element_at(
                F.array(*[F.lit(s) for s in SNIPPETS]),
                (F.col("doc_id") % len(SNIPPETS) + 1).cast("int"),
            )
            df = df.withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 3 == 0, F.concat(F.col("text"), snip)
                ).otherwise(F.col("text")),
            ).withColumn("n_chars", F.length("text").cast("bigint"))
        df.write.parquet(table_path(root, name))
    return root


@pytest.fixture(scope="module")
def unicode_duck(unicode_sf_dir):
    con = duckdb.connect()
    for name in SYNTHETIC_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{table_path(unicode_sf_dir, name)}/*.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", DOC_ORACLED)
def test_unicode_oracle_parity(spark, unicode_sf_dir, unicode_duck, name):
    q = registry.REGISTRY[name]
    ok, msg = compare(
        q.build(spark, unicode_sf_dir),
        unicode_duck.sql(q.oracle),
        exact_cols=q.exact_float_cols,
    )
    assert ok, f"{name} (unicode-injected corpus): {msg}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_unicode_rows_only_executes(spark, unicode_sf_dir, name):
    q = registry.REGISTRY[name]
    assert q.build(spark, unicode_sf_dir).count() >= 0
