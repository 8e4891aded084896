"""Guard the driver-attestation window.

The external verify driver hash-checks exactly the FIRST 50 registered
queries in insertion order, so the registry's explicit DRIVER_WINDOW must
stay exactly 50 names, lead with the flagship queries, and keep at least
one representative of every operator family inside the window — otherwise
a family silently loses its correctness attestation.
"""

import os
from pathlib import Path

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


def test_every_family_tag_has_fresh_evidence():
    """Every operator family must hold FRESH correctness evidence: a live
    window representative this round, or a member with a green driver row
    within the last rotation.EVIDENCE_STALE_AFTER rounds.  (Until round 6
    every tag demanded a live slot every round, which forced 11-13
    freshly-attested swap-ins per round and starved the stale tail —
    VERDICT r6 item 2.)"""
    from full_data_infrastructure_spark import rotation

    root = Path(__file__).resolve().parents[1]
    latest = rotation.load_latest_green(root)
    max_round = rotation.load_max_round(root)
    window = set(registry.DRIVER_WINDOW)
    fresh_tags: set[str] = set()
    all_tags: set[str] = set()
    for name, q in registry.REGISTRY.items():
        all_tags.update(q.tags)
        if name in window or latest.get(name, 0) > max_round - rotation.EVIDENCE_STALE_AFTER:
            fresh_tags.update(q.tags)
    missing = all_tags - fresh_tags
    assert not missing, f"families with no fresh correctness evidence: {missing}"


def test_staleness_sla():
    """No registered query's newest green driver row may be more than 4
    rounds old: each query is either in the current window (it gets a row
    this round) or its latest green round is >= newest_round - 3.  This is
    the enforcement half of the round-7 rotation policy (VERDICT r6 items
    2-3): the bench-pin and tag-repair relaxations freed the slots that
    drained the backlog, and this gate keeps it drained.

    ATOMIC-COMMIT REQUIREMENT (ADVICE r7): this test goes red the moment a
    new CORRECTNESS_r{N}.json is committed without regenerating
    DRIVER_WINDOW in the SAME commit — max_round advances, so queries that
    were fresh fall outside the old window.  Each round must land the
    driver's correctness file and the recomputed queries.py window
    together (the round-start regeneration step in COVERAGE.md)."""
    from full_data_infrastructure_spark import rotation

    root = Path(__file__).resolve().parents[1]
    latest = rotation.load_latest_green(root)
    max_round = rotation.load_max_round(root)
    window = set(registry.DRIVER_WINDOW)
    violations = {
        name: latest.get(name, 0)
        for name in registry.REGISTRY
        if name not in window and latest.get(name, 0) < max_round - 3
    }
    assert not violations, (
        f"queries outside the window with evidence older than "
        f"r{max_round - 3}: {violations}"
    )


def test_bench_set_is_the_graded_23():
    """The ``bench=True`` set IS the graded perf surface: it decides the
    keys of every ``BENCH_r*.json``, the judge's band history, and the
    rotation's pin set.  Nothing pinned it until round 13, so one flag
    accidentally flipped in a refactor would have silently shrunk the
    recorded bench.  Growing or shrinking the set must be deliberate:
    update this literal together with ``bench.py``'s group map and a
    BENCH_LEDGER.md bench-set-history note (as rounds 7 and 9 did)."""
    expected = {
        "asof_join",
        "corpus_pipeline_full_lsh",
        "corpus_pipeline_lsh",
        "decontaminate_overlap",
        "dedup_minhash_lsh",
        "dedup_semantic",
        "dedup_survivors_lsh",
        "flagship_benefits",
        "join_dim_snowflake",
        "knn_bruteforce",
        "knn_ivfpq",
        "multi_aggregate",
        "pagerank_parts",
        "paragraph_dedup",
        "quality_classifier",
        "streaming_scd2_bucketed_snapshot",
        "streaming_scd2_snapshot",
        "streaming_upsert_bucketed_snapshot",
        "streaming_upsert_snapshot",
        "text_stats",
        "topk_group_count",
        "tpch_q5_region_volume",
        "window_moving_avg",
    }
    actual = {n for n, q in registry.REGISTRY.items() if q.bench}
    assert actual == expected, (
        f"graded bench set changed: added={sorted(actual - expected)} "
        f"removed={sorted(expected - actual)} — if deliberate, update this "
        f"literal, bench.py's groups, and BENCH_LEDGER.md together"
    )


def test_projected_next_round_schedule_fits():
    """The NEXT round's window must fit the staleness SLA, projected
    mechanically: assume every query in the committed window attests
    green this round (historically always true — twelve rounds without a
    red row), recompute the window for the following round with forces
    cleared (they land with this round's rows), and assert zero queries
    would sit outside it with over-horizon evidence.

    This is the standing form of the by-hand simulation rounds 11-13 ran
    before landing oversubscribed windows (VERDICT r12 item 1): any
    FORCE_REFRESH addition, registry growth, or bench-pin change that
    would overflow the next round's schedule fails HERE, at commit time,
    instead of surfacing as a red SLA mid-round."""
    from full_data_infrastructure_spark import rotation

    root = Path(__file__).resolve().parents[1]
    latest = dict(rotation.load_latest_green(root))
    nxt = rotation.load_max_round(root) + 1
    for name in registry.DRIVER_WINDOW:
        latest[name] = nxt
    projected = set(
        rotation.compute_driver_window(
            names=registry.REGISTRY,
            bench_names=[n for n, q in registry.REGISTRY.items() if q.bench],
            tags_by_name={n: q.tags for n, q in registry.REGISTRY.items()},
            latest_green=latest,
            force_refresh=frozenset(),
            max_round=nxt,
        )
    )
    violations = {
        name: latest.get(name, 0)
        for name in registry.REGISTRY
        if name not in projected and latest.get(name, 0) < nxt - 3
    }
    assert not violations, (
        f"projected r{nxt + 1} window cannot absorb these over-horizon "
        f"queries — the current window/forces overcommit the schedule: "
        f"{violations}"
    )


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
    first, stalest next; a STALE benched query is pinned while a FRESH one
    is not; tag repair fires only for a family with no fresh evidence and
    evicts the freshest."""
    from full_data_infrastructure_spark.rotation import compute_driver_window

    order = [
        "flagship_benefits",
        "bu_salary_dashboard",
        "benched_fresh",
        "benched_stale",
        "never_seen",
        "stale_r1",
        "fresh_r5",
        "lonely_stale_family_r1",
        "lonely_fresh_family_r5",
    ]
    tags = {
        "flagship_benefits": ("dashboard",),
        "bu_salary_dashboard": ("dashboard",),
        "benched_fresh": ("agg",),
        "benched_stale": ("agg",),
        "never_seen": ("agg",),
        "stale_r1": ("agg",),
        "fresh_r5": ("agg",),
        "lonely_stale_family_r1": ("lonely_stale",),
        "lonely_fresh_family_r5": ("lonely_fresh",),
    }
    latest = {
        "flagship_benefits": 5,
        "bu_salary_dashboard": 5,
        "benched_fresh": 5,  # within the horizon -> NOT pinned
        "benched_stale": 2,  # beyond the horizon -> pinned
        "stale_r1": 1,
        "fresh_r5": 5,
        "lonely_stale_family_r1": 1,
        "lonely_fresh_family_r5": 5,
    }
    window = compute_driver_window(
        names=order,
        bench_names=["benched_fresh", "benched_stale"],
        tags_by_name=tags,
        latest_green=latest,
        cap=6,
        force_refresh=frozenset(),
        max_round=5,
    )
    # Flagship leads; benched_stale is pinned but benched_fresh is not;
    # never_seen outranks stale_r1; lonely_stale_family_r1 enters by
    # staleness; lonely_fresh_family_r5 needs no slot (fresh standing
    # row), so the last slot goes to benched_fresh... which is fresher
    # than lonely_stale_family_r1 — fill order: never_seen(0),
    # stale_r1(1), lonely_stale_family_r1(1), benched_stale pinned.
    assert window[:2] == ("flagship_benefits", "bu_salary_dashboard")
    assert set(window) == {
        "flagship_benefits",
        "bu_salary_dashboard",
        "benched_stale",
        "never_seen",
        "stale_r1",
        "lonely_stale_family_r1",
    }
    # Order after the flagship head: never-attested, then stalest-first
    # (name tiebreak).
    assert window[2] == "never_seen"
    assert window[3:5] == ("lonely_stale_family_r1", "stale_r1")


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


def test_load_latest_green_skips_errored_and_mismatched_rows(tmp_path):
    """A query whose newest driver row ERRORED or HASH-MISMATCHED must
    re-enter the window as stale: only value-green (err null AND
    hash_match AND rows_match) or completed rows-only (err == 'no_oracle'
    with a count) rows attest.  err:null alone is NOT attestation — the
    committed history has err:null rows with hash_match:false (ADVICE r6),
    and counting them green would rotate a broken query OUT of the window
    instead of re-checking it."""
    import json

    from full_data_infrastructure_spark.rotation import load_latest_green

    green = {"err": None, "hash_match": True, "rows_match": True, "spark_rows": 5}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "good": green,
                "broke_later": green,
                "rows_only": {"err": "no_oracle", "spark_rows": 3},
                "never_ran": {"err": "AnalysisException: boom", "spark_rows": None},
                "hash_mismatch": {
                    "err": None,
                    "hash_match": False,
                    "rows_match": True,
                    "spark_rows": 5,
                },
            }
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "good": green,
                "broke_later": {"err": "timeout", "spark_rows": None},
                "mismatched_later": {
                    "err": None,
                    "hash_match": False,
                    "rows_match": True,
                    "spark_rows": 5,
                },
            }
        )
    )
    latest = load_latest_green(tmp_path)
    assert latest["good"] == 2
    # the r2 error does not erase the r1 green row, but doesn't refresh it
    assert latest["broke_later"] == 1
    assert latest["rows_only"] == 1
    assert "never_ran" not in latest
    # err:null with hash_match:false is NOT green (ADVICE r6)
    assert "hash_mismatch" not in latest
    assert "mismatched_later" not in latest


def test_untracked_correctness_file_does_not_shift_the_window():
    """The driver drops each round's new CORRECTNESS file into the
    worktree UNTRACKED, and in rounds 8 and 9 that mid-transition state
    turned the three registry-order gates red at an otherwise-green tree
    (judge-adjudicated mechanical both times). Evidence now comes from
    git-TRACKED files only (rotation._correctness_paths): an untracked
    future-round file must affect neither max_round nor the computed
    window, while committed history keeps enforcing the atomic rotation
    protocol exactly as before. (In a non-git tree the loader falls back
    to the plain glob — exercised by the tmp_path test above.)"""
    import json
    import os

    from full_data_infrastructure_spark.rotation import (
        compute_from_repo,
        load_max_round,
    )

    root = Path(registry.__file__).resolve().parent.parent
    before_round = load_max_round(root)
    before_window = compute_from_repo()
    intruder = root / "CORRECTNESS_r99.json"
    assert not intruder.exists(), "stale r99 fixture left behind?"
    try:
        intruder.write_text(
            json.dumps(
                {
                    "flagship_benefits": {
                        "err": None,
                        "hash_match": True,
                        "rows_match": True,
                        "spark_rows": 1,
                    }
                }
            )
        )
        assert load_max_round(root) == before_round
        assert compute_from_repo() == before_window
    finally:
        os.unlink(intruder)


def test_deleted_committed_evidence_does_not_crash_the_rotation(tmp_path):
    """A committed CORRECTNESS file removed from the worktree with plain
    ``rm`` (no ``git rm``) used to crash load_latest_green with
    FileNotFoundError: ``git ls-files`` kept listing it (ADVICE r10).
    Evidence now comes from HEAD with a worktree-existence filter, so the
    deleted file simply stops counting; staged-but-uncommitted files are
    likewise excluded (the committed-only contract)."""
    import json
    import subprocess

    from full_data_infrastructure_spark.rotation import (
        _correctness_paths,
        load_latest_green,
        load_max_round,
    )

    def git(*args):
        subprocess.run(
            ["git", "-C", str(tmp_path), *args],
            check=True,
            capture_output=True,
            env={
                "GIT_AUTHOR_NAME": "t",
                "GIT_AUTHOR_EMAIL": "t@t",
                "GIT_COMMITTER_NAME": "t",
                "GIT_COMMITTER_EMAIL": "t@t",
                "GIT_CONFIG_NOSYSTEM": "1",  # /etc/gitconfig (gpgsign,
                "HOME": str(tmp_path),  # hooks) must not leak in
                "PATH": os.environ["PATH"],
            },
        )

    row = {"err": None, "hash_match": True, "rows_match": True, "spark_rows": 1}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"q_old": row}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"q_new": row}))
    git("init", "-q")

    # Unborn HEAD (repo initialized, nothing committed): a repo with zero
    # committed evidence — the files on disk are untracked and must NOT
    # count (the glob fallback is for non-repos only).
    assert _correctness_paths(tmp_path) == []
    assert load_max_round(tmp_path) == 0

    git("add", "CORRECTNESS_r01.json", "CORRECTNESS_r02.json")
    git("commit", "-qm", "evidence")

    # Baseline: both committed files count.
    assert load_max_round(tmp_path) == 2

    # Plain rm of a committed file: excluded, no crash.
    os.unlink(tmp_path / "CORRECTNESS_r02.json")
    assert [os.path.basename(p) for p in _correctness_paths(tmp_path)] == [
        "CORRECTNESS_r01.json"
    ]
    assert load_latest_green(tmp_path) == {"q_old": 1}
    assert load_max_round(tmp_path) == 1

    # Staged-but-uncommitted: not evidence until committed.
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({"q_staged": row}))
    git("add", "CORRECTNESS_r03.json")
    assert load_max_round(tmp_path) == 1
    git("commit", "-qm", "r03")
    assert load_max_round(tmp_path) == 3


def test_rotation_window_invariants_hold_on_random_registries():
    """Property-sweep compute_driver_window on synthetic registries — the
    rotation is the likeliest silent-mistake site in the repo (module
    docstring), and the function is pure, so hypothesis can check every
    structural invariant the hand-written cases above assume:

      1. flagship leads, in order;
      2. no duplicate names, and every non-flagship member is registered;
      3. the window size is min(cap, registry size);
      4. every STALE benched query is in the window (the pin contract);
      5. every operator-family tag is either represented in the window or
         holds fresh standing evidence (the tag-repair postcondition);
      6. the computation is deterministic.

    Overflow conditions (pinned set exceeding the cap; tag repair with no
    evictable slot) are allowed to raise ValueError — that is the
    documented loud-failure contract — but must not raise anything else.
    Pure Python, no Spark: hundreds of examples run in seconds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from full_data_infrastructure_spark.rotation import (
        EVIDENCE_STALE_AFTER,
        FLAGSHIP,
        compute_driver_window,
    )

    name_st = st.text(alphabet="abcdef", min_size=1, max_size=3)
    tag_st = st.sampled_from(["t1", "t2", "t3", "t4"])

    @settings(max_examples=300, deadline=None)
    @given(
        extra=st.dictionaries(
            name_st,
            st.tuples(
                st.lists(tag_st, min_size=0, max_size=2),  # tags
                st.integers(min_value=0, max_value=6),  # latest green round
                st.booleans(),  # benched?
            ),
            min_size=0,
            max_size=12,
        ),
        flag_tags=st.lists(tag_st, min_size=0, max_size=1),
        cap=st.integers(min_value=2, max_value=8),
        max_round=st.integers(min_value=0, max_value=6),
        forced=st.sets(name_st, max_size=3),
    )
    def check(extra, flag_tags, cap, max_round, forced):
        regs = {f: (tuple(flag_tags), max_round, False) for f in FLAGSHIP}
        for n, (tags, rnd, bench) in extra.items():
            if n not in regs:
                regs[n] = (tuple(tags), rnd, bench)
        names = list(regs)
        tags_by_name = {n: regs[n][0] for n in names}
        latest = {n: regs[n][1] for n in names if regs[n][1] > 0}
        bench = [n for n in names if regs[n][2]]
        kwargs = dict(
            names=names,
            bench_names=bench,
            tags_by_name=tags_by_name,
            latest_green=latest,
            cap=cap,
            force_refresh=frozenset(forced),
            max_round=max_round,
        )
        try:
            window = compute_driver_window(**kwargs)
        except ValueError:
            return  # documented overflow contract
        # 1. flagship leads
        assert window[: len(FLAGSHIP)] == FLAGSHIP
        # 2. unique, registered
        assert len(window) == len(set(window))
        assert set(window) <= set(names)
        # 3. exact size
        assert len(window) == min(cap, len(names))
        # 4. stale-bench pin contract
        for n in bench:
            stale = (0 if n in forced else latest.get(n, 0)) <= (
                max_round - EVIDENCE_STALE_AFTER
            )
            if stale:
                assert n in window, f"stale benched {n!r} not pinned"
        # 5. tag coverage postcondition
        covered = set()
        for n in window:
            covered.update(tags_by_name[n])
        for tag in {t for ts in tags_by_name.values() for t in ts}:
            fresh = any(
                latest.get(n, 0) > max_round - EVIDENCE_STALE_AFTER
                for n in names
                if tag in tags_by_name[n]
            )
            assert tag in covered or fresh, f"family {tag!r} unattested"
        # 6. determinism
        assert compute_driver_window(**kwargs) == window

    check()


def test_ls_tree_failure_with_valid_head_raises(monkeypatch, tmp_path):
    """ls-tree failing while HEAD verifies (corrupt object store, transient
    git error) must RAISE, not silently return zero committed evidence —
    returning [] there resets max_round to 0 and zeroes the rotation
    window (ADVICE r11).  Unborn HEAD and non-repo keep their documented
    behaviors (return [] / glob fallback, pinned by the tests above)."""
    import subprocess

    import pytest

    from full_data_infrastructure_spark.rotation import _correctness_paths

    real_run = subprocess.run

    def fake_run(cmd, **kwargs):
        if "ls-tree" in cmd:
            return subprocess.CompletedProcess(
                cmd, returncode=128, stdout="", stderr="fatal: bad tree object"
            )
        if "--verify" in cmd:
            return subprocess.CompletedProcess(cmd, returncode=0, stdout="", stderr="")
        return real_run(cmd, **kwargs)

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(RuntimeError, match="refusing to report zero committed"):
        _correctness_paths(tmp_path)
