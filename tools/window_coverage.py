"""Driver-window coverage report: which queries the 50-entry
correctness window has witnessed, when, and what the next rotation
should front-load.

Reads every CORRECTNESS_r*.json in the repo root and the live registry
order, then prints one line per registered query: its last witnessed
round, the verdict at that witness, and its position in the CURRENT
window (if any). The summary at the end is the rotation worklist the
registry docstring's policy prescribes — (a) never witnessed, (b) the
oldest-witnessed block — so planning the next round's _PRIORITY is a
read of this report instead of a by-hand sweep of nine JSON files.

Usage: python tools/window_coverage.py [--summary]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50  # the driver's per-round correctness budget


def witness_map() -> dict[str, tuple[int, str]]:
    """name -> (last witnessed round, verdict at that witness)."""
    last: dict[str, tuple[int, str]] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
    # sort by PARSED round, not filename: lexicographic order breaks the
    # moment padding changes (r10 vs r2), and last-write-wins below
    # depends on round order. Anchored regex so a name with stray digits
    # (CORRECTNESS_r10_sf0.01.json) is skipped, not misparsed as r10001.
    by_round = []
    for p in paths:
        m = re.search(r"_r(\d+)\.json$", os.path.basename(p))
        if m:
            by_round.append((int(m.group(1)), p))
    by_round.sort()
    for rnd, path in by_round:
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") is True:
                verdict = "green"
            elif row.get("err") == "no_oracle":
                verdict = "rows_only"
            else:
                verdict = "RED"
            last[name] = (rnd, verdict)
    return last


def main() -> int:
    import __spark_entry__ as entrymod  # noqa: PLC0415

    order = list(entrymod.queries())
    order_set = set(order)
    pos_of = {n: i for i, n in enumerate(order)}
    last = witness_map()
    summary_only = "--summary" in sys.argv

    never = [n for n in order if n not in last]
    stale = sorted(
        ((r, n) for n, (r, v) in last.items() if n in order_set),
        key=lambda t: (t[0], pos_of[t[1]]),
    )
    if not summary_only:
        for i, name in enumerate(order):
            rnd, verdict = last.get(name, (None, "never"))
            pos = f"window#{i + 1}" if i < WINDOW else "past-window"
            seen = f"r{rnd} {verdict}" if rnd else "NEVER WITNESSED"
            print(f"{name:40s} {pos:12s} {seen}")
        print()

    in_window = set(order[:WINDOW])
    print(f"registered: {len(order)}  witnessed ever: "
          f"{sum(1 for n in order if n in last)}  never: {len(never)}")
    reds = [n for n, (r, v) in last.items() if v == "RED" and n in order_set]
    print(f"red at last witness: {reds if reds else 'none'}")
    print(f"never witnessed (rotation category a): "
          f"{[n for n in never if n not in in_window] or 'all in current window'}")
    oldest = [n for r, n in stale if n not in in_window][:WINDOW]
    oldest_set = set(oldest)
    full = "--full" in sys.argv
    head_set = oldest_set if full else set(oldest[:15])
    rounds = sorted({r for r, n in stale if n in oldest_set})
    print(f"oldest-witnessed past-window block (category c, next {len(oldest)}): "
          f"rounds {rounds}")
    for r, n in stale:
        if n in head_set:
            print(f"  r{r} {n}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
