"""Driver-evidence coverage ledger (ADVICE r03).

The round driver's correctness pass only covers the FIRST 50 registered
queries, so registration order (registry._PRIORITY) decides which
operators get hard driver evidence each round. This tool derives, from
the checked-in CORRECTNESS_r*.json artifacts, which queries have ever
had a green driver row — and therefore which ones the next rotation MUST
put inside the window. tests/test_coverage_rotation.py enforces it, so
no oracle-backed query can permanently escape external verification.

Usage:
    python tools/coverage_ledger.py          # rewrite COVERAGE.json
    python tools/coverage_ledger.py --check  # print rotation summary
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_evidence(repo: str = REPO) -> dict[str, dict[str, str]]:
    """{query_name: {round_label: status}} from every CORRECTNESS_r*.json.

    status: 'pass' (rows+schema+hash all true), 'rows_only' (checked,
    no_oracle by contract), 'error' or 'fail'.
    """
    evidence: dict[str, dict[str, str]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_(r\d+)\.json$", path)
        if not m:
            continue
        rnd = m.group(1)
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("err") == "no_oracle":
                status = "rows_only"
            elif row.get("err"):
                status = "error"
            elif row.get("rows_match") and row.get("schema_match") and row.get("hash_match"):
                status = "pass"
            else:
                status = "fail"
            evidence.setdefault(name, {})[rnd] = status
    return evidence


def green_names(evidence: dict[str, dict[str, str]]) -> set[str]:
    """Queries with at least one fully-green driver row ('pass'; for
    rows-only-by-contract queries, a 'rows_only' row is their maximum
    attainable evidence and counts)."""
    out = set()
    for name, rounds in evidence.items():
        statuses = set(rounds.values())
        if "pass" in statuses or "rows_only" in statuses:
            out.add(name)
    return out


def summary() -> dict:
    sys.path.insert(0, REPO)
    from pyspark_unload_to_gcs_spark import registry

    evidence = load_evidence()
    green = green_names(evidence)
    names = list(registry.queries().keys())
    window = names[:50]
    oracle_bearing = set(registry.oracle_sql().keys())
    never = [n for n in names if n not in evidence]
    uncovered = [n for n in names if n not in green and n not in window]
    return {
        "n_registered": len(names),
        "n_oracle_bearing": len(oracle_bearing),
        "n_ever_driver_checked": len(evidence),
        "n_ever_green": len(green),
        "window_first_50": window,
        "never_driver_checked": never,
        "uncovered_and_outside_window": uncovered,
        "evidence": evidence,
    }


def main() -> None:
    s = summary()
    if "--check" in sys.argv:
        print(json.dumps({k: v for k, v in s.items() if k != "evidence"}, indent=2))
        return
    with open(os.path.join(REPO, "COVERAGE.json"), "w") as f:
        json.dump(s, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"COVERAGE.json: {s['n_registered']} registered, "
        f"{s['n_ever_green']} ever-green, "
        f"{len(s['never_driver_checked'])} never-checked "
        f"(all in window: {set(s['never_driver_checked']) <= set(s['window_first_50'])})"
    )


if __name__ == "__main__":
    main()
