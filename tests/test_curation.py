"""Semantic tests for the corpus-curation operators (curation.py) and the
connected-components cluster resolution (dedup.py). Engine/oracle parity on
the synthetic corpus is covered by test_oracle_parity.py; these assert the
behaviors the synthetic data cannot exercise (real PII strings, known graph
shapes, split exhaustiveness).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from full_data_infrastructure_spark.operators.curation import (
    hash_bucket,
    pii_count,
    redact_pii,
)
from full_data_infrastructure_spark.operators.dedup import connected_components


def test_redact_pii_replaces_all_three_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@example.co.uk or +14155550123 now"),
            (2, "server at 10.0.255.7 logged jane@corp.io twice: jane@corp.io"),
            (3, "no pii here, just 1.2 released and versions 10.4"),
        ],
        "id int, text string",
    )
    out = {
        r["id"]: (r["clean"], r["n"])
        for r in df.select(
            "id",
            redact_pii("text").alias("clean"),
            pii_count("text").alias("n"),
        ).collect()
    }
    assert out[1] == ("contact <EMAIL> or <PHONE> now", 2)
    assert out[2] == ("server at <IP> logged <EMAIL> twice: <EMAIL>", 3)
    # dotted version numbers must NOT be eaten by the IPv4 rule
    assert out[3] == ("no pii here, just 1.2 released and versions 10.4", 0)


def test_hash_bucket_split_is_disjoint_and_exhaustive(spark, sf_dir):
    from full_data_infrastructure_spark.sources.parquet import load_table

    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = F.when(b < "cc", "train").when(b < "e6", "val").otherwise("test")
    counts = {
        r["split"]: r["n"]
        for r in docs.groupBy(split.alias("split"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = docs.count()
    assert sum(counts.values()) == total  # exhaustive, disjoint by CASE
    assert counts.get("train", 0) > counts.get("val", 0)
    assert counts.get("train", 0) > counts.get("test", 0)
    # determinism: second evaluation sees identical assignment
    again = {
        r["split"]: r["n"]
        for r in docs.groupBy(split.alias("split"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert counts == again


def test_connected_components_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a bigint, doc_b bigint",
    )
    labels = {
        r["id"]: r["cluster_id"]
        for r in connected_components(edges).collect()
    }
    assert labels == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_connected_components_long_chain_converges(spark):
    # worst case for min-label propagation: a path graph; the label must
    # walk the full diameter
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a bigint, doc_b bigint"
    )
    labels = connected_components(edges)
    assert labels.filter(F.col("cluster_id") != 0).count() == 0
    assert labels.count() == n + 1


def test_repetition_signals_hand_computed(spark, sf_dir, monkeypatch):
    import full_data_infrastructure_spark.operators.curation as cur

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "x y z w")], "doc_id bigint, text string"
    )
    monkeypatch.setattr(
        cur, "load_table", lambda _spark, _sf, _name: docs
    )
    out = {
        r["doc_id"]: r
        for r in cur._repetition_signals(spark, sf_dir).collect()
    }
    # doc 1: tokens [a,a,b] -> 2 distinct of 3; top 'a' 2/3; bigrams
    # ['a a','a b'] both distinct -> dup 0
    assert abs(out[1]["dup_token_frac"] - (1 - 2 / 3)) < 1e-12
    assert abs(out[1]["top_token_frac"] - 2 / 3) < 1e-12
    assert abs(out[1]["dup_bigram_frac"] - 0.0) < 1e-12
    # doc 2: all unique
    assert abs(out[2]["dup_token_frac"] - 0.0) < 1e-12
    assert abs(out[2]["top_token_frac"] - 0.25) < 1e-12
