"""Guard the driver-attestation window.

The external verify driver hash-checks exactly the FIRST 50 registered
queries in insertion order, so the registry's explicit DRIVER_WINDOW must
stay exactly 50 names, lead with the flagship queries, and keep at least
one representative of every operator family inside the window — otherwise
a family silently loses its correctness attestation.
"""

from full_data_infrastructure_spark import queries as registry

registry._ensure_loaded()

DRIVER_CAP = 50


def test_window_is_exactly_the_driver_cap():
    assert len(registry.DRIVER_WINDOW) == DRIVER_CAP
    assert len(set(registry.DRIVER_WINDOW)) == DRIVER_CAP


def test_registry_iterates_window_first():
    names = list(registry.REGISTRY)
    assert tuple(names[:DRIVER_CAP]) == registry.DRIVER_WINDOW
    # Nothing dropped: the rest of the registry follows the window.
    assert len(names) == len(set(names))
    assert set(names[DRIVER_CAP:]) == set(registry.REGISTRY) - set(
        registry.DRIVER_WINDOW
    )


def test_flagship_queries_lead_the_window():
    assert registry.DRIVER_WINDOW[0] == "flagship_benefits"
    assert registry.DRIVER_WINDOW[1] == "bu_salary_dashboard"


def test_every_family_tag_has_a_window_representative():
    window = set(registry.DRIVER_WINDOW)
    tags_in_window: set[str] = set()
    all_tags: set[str] = set()
    for name, q in registry.REGISTRY.items():
        all_tags.update(q.tags)
        if name in window:
            tags_in_window.update(q.tags)
    missing = all_tags - tags_in_window
    assert not missing, f"families with no driver-attested representative: {missing}"


def test_window_queries_are_oracle_checked_where_possible():
    """Inside the window, only the by-design rows-only queries may lack an
    oracle (approximate sketches whose output is engine-specific)."""
    rows_only_by_design = {
        "dedup_minhash_lsh",
        "dedup_survivors_lsh",
        "dedup_simhash",
        "dedup_incremental_lsh",
        "corpus_pipeline_lsh",
        "corpus_pipeline_full_lsh",
        "approx_count_distinct",  # HLL sketch values are engine-specific
        "knn_lsh",
        "knn_ivf",
        "knn_pq",  # PQ codes are engine-specific; recall pytest-asserted
        "knn_ivfpq",
        "rolling_hash_fingerprint",
        "validation_schema_check",  # V5 schema introspection: engine-specific
        "bpe_learn",  # merge table is trainer-specific; parity pytest-asserted
        "bpe_tokenize_counts",
        "embedding_pca_project",  # eigenvector sign/order; numpy-parity pytest
    }
    for name in registry.DRIVER_WINDOW:
        q = registry.REGISTRY[name]
        if q.oracle is None:
            assert name in rows_only_by_design, f"{name} lost its oracle"


def test_window_matches_computed_rotation():
    """The committed DRIVER_WINDOW literal must equal the window computed
    from the CORRECTNESS_r*.json history by the rotation policy — the
    hand-maintained rotation comment was the likeliest silent-mistake site
    (VERDICT r5 item 2), so the tuple is now generated, and this test
    keeps it from drifting.  Regenerate with:

        python -m full_data_infrastructure_spark.rotation
    """
    from full_data_infrastructure_spark import rotation

    computed = rotation.compute_from_repo()
    assert computed == registry.DRIVER_WINDOW, (
        "DRIVER_WINDOW is stale — regenerate with "
        "`python -m full_data_infrastructure_spark.rotation`"
    )


def test_rotation_prefers_never_attested_then_stalest():
    """Unit-check the pure policy on a synthetic registry: never-attested
    first, stalest next, bench pinned, tag repair evicts the freshest."""
    from full_data_infrastructure_spark.rotation import compute_driver_window

    order = [
        "flagship_benefits",
        "bu_salary_dashboard",
        "benched_fresh",
        "never_seen",
        "stale_r1",
        "fresh_r5",
        "lonely_family_r5",
    ]
    tags = {
        "flagship_benefits": ("dashboard",),
        "bu_salary_dashboard": ("dashboard",),
        "benched_fresh": ("agg",),
        "never_seen": ("agg",),
        "stale_r1": ("agg",),
        "fresh_r5": ("agg",),
        "lonely_family_r5": ("lonely",),
    }
    latest = {
        "flagship_benefits": 5,
        "bu_salary_dashboard": 5,
        "benched_fresh": 5,
        "stale_r1": 1,
        "fresh_r5": 5,
        "lonely_family_r5": 5,
    }
    window = compute_driver_window(
        names=order,
        bench_names=["benched_fresh"],
        tags_by_name=tags,
        latest_green=latest,
        cap=6,
        force_refresh=frozenset(),
    )
    # Flagship leads; the benched query is pinned; never_seen outranks
    # stale_r1 outranks fresh_r5; the lonely family's only member swaps
    # in by evicting the freshest non-pinned member (fresh_r5).
    assert window[:2] == ("flagship_benefits", "bu_salary_dashboard")
    assert set(window) == {
        "flagship_benefits",
        "bu_salary_dashboard",
        "benched_fresh",
        "never_seen",
        "stale_r1",
        "lonely_family_r5",
    }
    # Order after the flagship head: never-attested, then stalest-first.
    assert window[2] == "never_seen"
    assert window[3] == "stale_r1"


def test_surface_counts_match_coverage_doc():
    """COVERAGE.md's headline surface counts must equal the registry —
    the numbers drifted twice (commit 86d04f6, VERDICT r3 item 3), so
    they are now asserted instead of hand-maintained."""
    import re
    from pathlib import Path

    total = len(registry.REGISTRY)
    with_oracle = sum(1 for q in registry.REGISTRY.values() if q.oracle)
    rows_only = total - with_oracle
    # Resolve from this file, not the cwd — pytest may run from anywhere.
    text = (Path(__file__).resolve().parents[1] / "COVERAGE.md").read_text()
    m = re.search(
        r"(\d+) registered queries, (\d+) with DuckDB oracles \(the (\d+)",
        text,
    )
    assert m, "COVERAGE.md surface-size sentence missing or reworded"
    assert tuple(map(int, m.groups())) == (total, with_oracle, rows_only), (
        f"COVERAGE.md says {m.groups()}, registry has "
        f"({total}, {with_oracle}, {rows_only})"
    )


def test_load_latest_green_skips_errored_rows(tmp_path):
    """A query whose newest driver row ERRORED must re-enter the window as
    stale: only hash-green (err null) or completed rows-only
    (err == 'no_oracle' with a count) rows attest."""
    import json

    from full_data_infrastructure_spark.rotation import load_latest_green

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "good": {"err": None, "spark_rows": 5},
                "broke_later": {"err": None, "spark_rows": 5},
                "rows_only": {"err": "no_oracle", "spark_rows": 3},
                "never_ran": {"err": "AnalysisException: boom", "spark_rows": None},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "good": {"err": None, "spark_rows": 5},
                "broke_later": {"err": "timeout", "spark_rows": None},
            }
        )
    )
    latest = load_latest_green(tmp_path)
    assert latest["good"] == 2
    # the r2 error does not erase the r1 green row, but doesn't refresh it
    assert latest["broke_later"] == 1
    assert latest["rows_only"] == 1
    assert "never_ran" not in latest
