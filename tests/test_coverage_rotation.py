"""Ledger-driven rotation invariants (ADVICE r03): the external driver
only correctness-checks the first 50 registered queries per round, so
these tests pin that (a) the priority list is well-formed, (b) the
reference-parity core never leaves the window, and (c) every registered
query either already has green driver evidence in a checked-in
CORRECTNESS artifact or sits inside the current window — i.e. no query
can permanently escape external verification."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark_unload_to_gcs_spark import registry
from tools.coverage_ledger import green_names, load_evidence

CORE = (
    "full_sync_non_null",
    "time_based_window",
    "scd_latest_order",
    "content_hash_lineitem",
    "content_hash_json",
    "row_count_guard",
    "cdc_change_mapping",
    "cdc_snapshot_diff",
)


def test_priority_names_all_registered():
    names = set(registry.queries().keys())
    missing = [n for n in registry._PRIORITY if n not in names]
    assert not missing, f"_PRIORITY references unregistered queries: {missing}"


def test_priority_exactly_fills_the_driver_window():
    assert len(registry._PRIORITY) == 50
    assert len(set(registry._PRIORITY)) == 50
    window = list(registry.queries().keys())[:50]
    assert window == list(registry._PRIORITY)
    # queries() and oracle_sql() must agree on ordering for the window
    owindow = [n for n in registry.oracle_sql() if n in set(window)]
    assert owindow == [n for n in window if n in registry.oracle_sql()]


def test_core_parity_names_stay_in_window():
    window = set(list(registry.queries().keys())[:50])
    assert set(CORE) <= window


def test_no_query_escapes_driver_verification():
    """Every registered query is ledger-green (some round's CORRECTNESS
    artifact shows a fully-green row — or a rows-only row for queries
    that are rows-only by contract) OR is inside the current first-50
    window awaiting this round's check."""
    evidence = load_evidence()
    green = green_names(evidence)
    names = list(registry.queries().keys())
    window = set(names[:50])
    escaped = [n for n in names if n not in green and n not in window]
    assert not escaped, (
        "queries with no driver evidence AND outside the checked window "
        f"(rotate them into registry._PRIORITY): {escaped}"
    )


def test_coverage_json_not_stale_vs_newest_correctness_artifact():
    """The checked-in COVERAGE.json must be regenerated after every
    driver drop (VERDICT r11 #3: it listed names green in
    CORRECTNESS_r11.json as never-checked for a round). Staleness
    test: no name with a row in the NEWEST correctness artifact may
    appear in COVERAGE.json's never_driver_checked list."""
    import glob
    import json

    import re

    repo = Path(__file__).resolve().parents[1]
    # sort on the round NUMBER — lexicographic order would rank r99
    # above r100 once rounds reach three digits; names the glob matches
    # but the strict pattern doesn't (stray backups) are ignored rather
    # than crashing the key function (review r12)
    matches = [
        (p, re.search(r"CORRECTNESS_r(\d+)\.json$", p))
        for p in glob.glob(str(repo / "CORRECTNESS_r*.json"))
    ]
    artifacts = sorted(
        (p for p, m in matches if m),
        key=lambda p: int(re.search(r"CORRECTNESS_r(\d+)\.json$", p).group(1)),
    )
    assert artifacts, "no CORRECTNESS artifacts checked in"
    with open(artifacts[-1]) as f:
        newest = set(json.load(f))
    with open(repo / "COVERAGE.json") as f:
        ledger = json.load(f)
    stale = sorted(newest & set(ledger["never_driver_checked"]))
    if stale:
        # The driver drops CORRECTNESS_r{N}.json AFTER the builder's session
        # closes, so a shipped tree can legitimately carry a COVERAGE.json one
        # round behind (NOTES.md convention). Detect that case from git commit
        # times: if the newest artifact was first committed AFTER COVERAGE.json
        # was last committed — or is not committed at ALL, which is exactly
        # what a just-dropped artifact looks like (VERDICT r14 "What's wrong"
        # #1: keying only on commit times made an untracked drop fall through
        # to the hard assert) — the staleness is by-design. The skip is
        # bounded to ONE round of lag (ADVICE r14): if any stale name also
        # sits in the SECOND-newest artifact, the ledger has escaped
        # regeneration for two or more driver drops and that is a real red.
        import subprocess

        def _commit_ts(path, first=False):
            args = ["git", "-C", str(repo), "log", "--format=%ct", "--", path]
            if not first:
                args.insert(4, "-1")
            out = subprocess.run(args, capture_output=True, text=True).stdout
            lines = [l for l in out.splitlines() if l.strip()]
            if not lines:
                return None
            return int(lines[-1] if first else lines[0])

        stale_beyond_newest: list[str] = []
        if len(artifacts) >= 2:
            with open(artifacts[-2]) as f:
                second = set(json.load(f))
            stale_beyond_newest = sorted(
                second & set(ledger["never_driver_checked"])
            )
        assert not stale_beyond_newest, (
            "COVERAGE.json lags TWO OR MORE driver drops — names green in "
            f"{Path(artifacts[-2]).name} still listed never_driver_checked; "
            "regenerate with `python tools/coverage_ledger.py` "
            f"(stale names: {stale_beyond_newest})"
        )
        newest_first = _commit_ts(artifacts[-1], first=True)
        coverage_last = _commit_ts(str(repo / "COVERAGE.json"))
        if newest_first is None or (
            coverage_last is not None and newest_first > coverage_last
        ):
            pytest.skip(
                "COVERAGE.json predates a post-session driver drop "
                f"({Path(artifacts[-1]).name} committed after it or not yet "
                "committed) — designed staleness, bounded to one round; "
                "regenerate with `python tools/coverage_ledger.py` at round "
                "open"
            )
    assert not stale, (
        "COVERAGE.json predates the newest driver drop — regenerate with "
        f"`python tools/coverage_ledger.py` (stale names: {stale})"
    )


def test_never_checked_queries_are_front_of_window():
    """Anything never driver-checked must be in the window NOW — waiting
    another round is exactly the failure mode the ledger exists to
    prevent."""
    evidence = load_evidence()
    names = list(registry.queries().keys())
    window = set(names[:50])
    never = [n for n in names if n not in evidence]
    outside = [n for n in never if n not in window]
    assert not outside, f"never-driver-checked queries outside window: {outside}"
