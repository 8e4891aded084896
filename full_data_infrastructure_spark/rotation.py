"""Compute the driver-attestation window from the correctness history.

The external verify driver hash-checks exactly the FIRST 50 registered
queries each round, so which 50 lead the registry decides which queries get
fresh correctness evidence.  Until round 5 the rotation was a ~100-line
hand-maintained comment in ``queries.py`` — the likeliest silent-mistake
site in the repo (a stale query could be shadowed forever).  This module
makes the rotation mechanical:

* **Evidence** comes from the committed ``CORRECTNESS_r*.json`` files: a
  query's *latest green round* is the newest round whose row either
  hash-matched the DuckDB oracle (``err is null``) or, for by-design
  rows-only queries, completed with a row count (``err == "no_oracle"``).
  A round whose row errored does NOT count as attestation.
* **Pinned** in every window: the two flagship queries (always first, in
  order) and every ``bench=True`` query (the graded perf set must stay
  value-attested).
* **Priority** for the remaining slots: never-attested queries first
  (latest green round 0), then stalest-first; ties break alphabetically
  on the query name (registration order is module-IMPORT order, which
  test collection can permute — a name is import-order-proof).  Queries
  named in ``FORCE_REFRESH`` (builder or oracle changed since their last
  green row) are treated as never-attested.
* **Tag repair**: every operator-family tag must keep at least one window
  representative.  If the priority fill leaves a family uncovered, its
  stalest member swaps in and the *freshest* evictable window member whose
  tags remain covered by others swaps out.

The committed ``DRIVER_WINDOW`` tuple in ``queries.py`` is the output of
this computation (regenerate with ``python -m
full_data_infrastructure_spark.rotation``);
``tests/test_registry_order.py`` asserts they match, so the tuple can
never silently drift from the policy.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Iterable, Mapping

DRIVER_CAP = 50
FLAGSHIP: tuple[str, ...] = ("flagship_benefits", "bu_salary_dashboard")

# Queries whose builder or oracle changed since their last green driver row:
# they need a re-attestation even though an old row stands.  Reset to empty
# once the refreshed row lands.  (Round 6: profile_columns and
# event_cooccurrence_lift changed per ADVICE r5, but both are never-attested
# anyway, so nothing to force.)
FORCE_REFRESH: frozenset[str] = frozenset()

# Queries registered AFTER the current round's attestation payload froze
# (the VERDICT names the exact queries whose first driver rows are due this
# round): treated as freshly attested so they cannot displace that payload
# — registration order is module-import order, not chronology, so without
# this a new query in an early-importing module would silently evict a
# promised first-row from a late-importing one.  Reset each round once the
# new CORRECTNESS file lands; the listed queries then lead the next fill
# as never-attested.  (bench=True queries are pinned regardless.)
DEFER_TO_NEXT_ROUND: frozenset[str] = frozenset(
    {
        "fuzzy_match_suppliers",
        "weighted_sample_docs",
        "window_range_hour_sum",
        "correlation_matrix",
        "trend_by_event_type",
        "rare_bigram_quality",
        "tpch_q3_shipping_priority",
        "tpch_q5_region_volume",
        "pseudonymize_customers",
        "streaming_scd2_snapshot",
        "pagerank_parts",
        "session_overlap_pairs",
        "group_split_events",
        "benford_first_digit",
        "rolling_active_users",
        "cosine_threshold_histogram",
        "fulfillment_latency_sla",
        "corpus_datacard",
        "funnel_three_step",
        "window_percent_rank",
        "event_gap_histogram",
        "profile_by_key",
        "dup_cluster_size_histogram",
        "repeat_customer_rate",
        "max_staleness_by_user",
        "lang_confusion_matrix",
        "discount_band_quantity",
    }
)
_DEFER_ROUND = 10**6  # sorts after every real round


def load_latest_green(root: str | os.PathLike[str]) -> dict[str, int]:
    """Map each query ever attested to its newest green driver round.

    Green = the row hash-matched (``err is null``; the driver only writes
    ``err: null`` when the oracle comparison succeeded) or the query is
    rows-only and the row completed (``err == "no_oracle"`` with a row
    count).  Errored rows are skipped — a query whose newest rows all
    errored re-enters the window as if stale.
    """
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(str(root), "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)
        try:
            rnd = int(base.removeprefix("CORRECTNESS_r").removesuffix(".json"))
        except ValueError:
            continue
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            err = row.get("err")
            green = err is None or (
                err == "no_oracle" and row.get("spark_rows") is not None
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def compute_driver_window(
    names: Iterable[str],
    bench_names: Iterable[str],
    tags_by_name: Mapping[str, tuple[str, ...]],
    latest_green: Mapping[str, int],
    cap: int = DRIVER_CAP,
    force_refresh: frozenset[str] = FORCE_REFRESH,
) -> tuple[str, ...]:
    """Pure window computation (no IO) — see the module docstring for policy."""
    order = sorted(names)
    bench = set(bench_names)

    def staleness(name: str) -> tuple[int, str]:
        if name in force_refresh:
            rnd = 0
        elif name in DEFER_TO_NEXT_ROUND:
            rnd = _DEFER_ROUND
        else:
            rnd = latest_green.get(name, 0)
        return (rnd, name)

    pinned = set(FLAGSHIP) | bench
    if len(pinned) > cap:
        raise ValueError(f"pinned set ({len(pinned)}) exceeds the cap ({cap})")
    selected = set(pinned)
    for name in sorted((n for n in order if n not in selected), key=staleness):
        if len(selected) >= cap:
            break
        selected.add(name)

    # Tag repair: every family keeps a window representative.
    def uncovered_tags() -> list[str]:
        covered: set[str] = set()
        for n in selected:
            covered.update(tags_by_name.get(n, ()))
        all_tags: set[str] = set()
        for ts in tags_by_name.values():
            all_tags.update(ts)
        return sorted(all_tags - covered)

    for tag in uncovered_tags():
        # Re-check at swap time: an earlier repair's incoming may cover
        # several tags at once (e.g. one query tagged both sql and
        # subquery), and repairing an already-covered tag would evict a
        # staler representative for a fresher duplicate.
        covered_now: set[str] = set()
        for n in selected:
            covered_now.update(tags_by_name.get(n, ()))
        if tag in covered_now:
            continue
        members = [n for n in order if tag in tags_by_name.get(n, ())]
        incoming = min((n for n in members if n not in selected), key=staleness)
        # Evict the freshest non-pinned member whose tags stay covered.
        evictable = []
        for n in selected:
            if n in pinned:
                continue
            others = selected - {n} | {incoming}
            covered: set[str] = set()
            for m in others:
                covered.update(tags_by_name.get(m, ()))
            if set(tags_by_name.get(n, ())) <= covered:
                evictable.append(n)
        if not evictable:
            raise ValueError(f"cannot make room for family {tag!r}")
        outgoing = max(evictable, key=staleness)
        selected.remove(outgoing)
        selected.add(incoming)

    rest = sorted(selected - set(FLAGSHIP), key=staleness)
    return FLAGSHIP + tuple(rest)


def compute_from_repo() -> tuple[str, ...]:
    """Compute the window for the live registry + committed history."""
    from full_data_infrastructure_spark import queries as registry

    registry._ensure_loaded()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return compute_driver_window(
        names=registry.REGISTRY,
        bench_names=[n for n, q in registry.REGISTRY.items() if q.bench],
        tags_by_name={n: q.tags for n, q in registry.REGISTRY.items()},
        latest_green=load_latest_green(root),
    )


if __name__ == "__main__":
    window = compute_from_repo()
    print("DRIVER_WINDOW: tuple[str, ...] = (")
    for name in window:
        print(f'    "{name}",')
    print(")")
