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
        "rolling_hash_fingerprint",
        "validation_schema_check",  # V5 schema introspection: engine-specific
    }
    for name in registry.DRIVER_WINDOW:
        q = registry.REGISTRY[name]
        if q.oracle is None:
            assert name in rows_only_by_design, f"{name} lost its oracle"


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
