"""Mechanical composition of the driver's 50-query check window.

The external driver hash-checks the FIRST 50 registered queries each
round (VERDICT r1), and ``queries/__init__.PRIORITY`` orders
registration.  Through r5 that tuple was hand-ordered prose; at 139+
registered queries the staleness accounting belongs in a tool
(VERDICT r5 #8).

Reads every ``CORRECTNESS_r0*.json`` in the repo root and prints:

1. the staleness ledger — last driver-checked round per registered
   query (a FAILED row counts as never-checked: the green row is the
   signal, not the attempt);
2. the proposed next window, by the fixed rotation policy:

   * the flagship first, always;
   * names passed via ``--changed`` (code touched this round — green
     history no longer vouches for them), in the given order;
   * registered-but-never-checked queries, registry order (new
     queries and any prior failures);
   * everything else oldest-checked-first (ties: registry order)
     until the window holds 50.

Usage:
    python tools/plan_window.py [--changed name1,name2,...]

Compare the output against the head of PRIORITY; they must match for
the shipped window to equal the planned one (pytest guards the
invariants of PRIORITY itself).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50
FLAGSHIP = "gi_scan_flagship"


def registry_order() -> list[str]:
    from pangenomesasgraphdatabases_spark.queries.registry import all_queries

    return list(all_queries())


def window_round() -> int:
    from pangenomesasgraphdatabases_spark.queries import WINDOW_ROUND

    return WINDOW_ROUND


def last_checked(max_round: int | None = None) -> dict[str, int]:
    """Max round with a fully-green row per query (0 = never).

    Ledgers from rounds >= ``max_round`` (default: the package's
    ``WINDOW_ROUND``, the round the shipped PRIORITY head was composed
    FOR) are ignored: the round-N window is planned from rounds < N,
    and the driver drops ``CORRECTNESS_r0N.json`` only after the freeze
    — counting it would retroactively move the proposal and redden the
    shipped-window guard (VERDICT r7 #1)."""
    if max_round is None:
        max_round = window_round()
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r0*(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if rnd >= max_round:
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )
            if green:
                out[name] = max(out.get(name, 0), rnd)
    return out


def propose_window(
    names: list[str], checked: dict[str, int], changed: list[str]
) -> list[str]:
    pos = {n: i for i, n in enumerate(names)}
    window: list[str] = [FLAGSHIP]
    for n in changed:
        if n in pos and n not in window:
            window.append(n)
    for n in names:  # never-checked, registry order
        if checked.get(n, 0) == 0 and n not in window:
            window.append(n)
    rest = sorted(
        (n for n in names if n not in window),
        key=lambda n: (checked.get(n, 0), pos[n]),
    )
    for n in rest:
        if len(window) >= WINDOW:
            break
        window.append(n)
    return window[:WINDOW]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated query names whose code changed this round",
    )
    ap.add_argument(
        "--queued",
        default="",
        help="comma-separated names added AFTER this round's window was "
        "frozen (locally verified, deferred to the next round's window)",
    )
    args = ap.parse_args()
    changed = [n for n in args.changed.split(",") if n]
    if not changed:
        # Changed-code slots are declared next to PRIORITY itself so
        # the shipped window equals the planned one by construction;
        # --changed overrides.
        from pangenomesasgraphdatabases_spark.queries import (
            CHANGED_THIS_ROUND,
        )

        changed = list(CHANGED_THIS_ROUND)
    queued = {n for n in args.queued.split(",") if n}
    if not queued:
        # The post-freeze queue is declared next to PRIORITY itself
        # (queries/__init__.QUEUED_AFTER_FREEZE) so the shipped window
        # equals the planned one by construction; --queued overrides.
        from pangenomesasgraphdatabases_spark.queries import (
            QUEUED_AFTER_FREEZE,
        )

        queued = set(QUEUED_AFTER_FREEZE)

    all_names = registry_order()
    names = [n for n in all_names if n not in queued]
    checked = last_checked()

    by_round: dict[int, list[str]] = {}
    for n in all_names:
        by_round.setdefault(checked.get(n, 0), []).append(n)
    print("# Staleness ledger (last green driver round; 0 = never)")
    for rnd in sorted(by_round):
        members = ", ".join(sorted(by_round[rnd]))
        print(f"r{rnd} ({len(by_round[rnd])}): {members}")
    print()

    window = propose_window(names, checked, changed)
    print(f"# Proposed next window ({len(window)})")
    for n in window:
        print(f'    "{n}",')

    current = [n for n in all_names if n not in queued][:WINDOW]
    if current == window:
        print("\n# PRIORITY head MATCHES the proposal")
    else:
        extra = [n for n in current if n not in window]
        missing = [n for n in window if n not in current]
        print("\n# PRIORITY head DIFFERS from the proposal")
        if missing:
            print(f"#   proposal-only: {', '.join(missing)}")
        if extra:
            print(f"#   head-only:     {', '.join(extra)}")


if __name__ == "__main__":
    main()
