"""Suggest the next round's PRIORITY window.

The driver's correctness pass covers only the first 50 registered
queries per round, so registration order is evidence budget. This tool
reads every CORRECTNESS_r*.json in the repo root, unions the green
evidence across rounds, and prints a PRIORITY tuple that front-loads:

1. queries whose most recent row FAILED (fixes need re-proof),
2. queries with no driver row in any round (new or never reached),
3. backfill with the stalest green queries (oldest round first)
   up to the 50-slot window.

Stalest-first backfill also covers testdata regenerations (r4): a
green recorded before the regeneration attests results on data that
no longer exists, and those rows are by construction the stalest, so
they cycle back through the window first.

Paste the output over PRIORITY in hapiy_etl_spark/registry.py.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

WINDOW = 50


def main() -> None:
    from hapiy_etl_spark.registry import all_queries

    root = Path(__file__).resolve().parents[1]
    rounds = sorted(
        root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    # Structural errors (driver-side, not a verdict on the query): keep
    # the prior round's verdict. A hash_match:false row is a REAL
    # failure and must supersede an earlier green (failures re-enter
    # the front of the window for re-proof).
    STRUCTURAL = {"timeout", "driver_error", "oom", "skipped"}
    latest: dict[str, tuple[int, bool]] = {}  # name -> (round, green)
    for path in rounds:
        rnum = int(re.search(r"r(\d+)", path.name).group(1))
        for name, row in json.loads(path.read_text()).items():
            green = bool(row.get("hash_match")) or row.get("err") == "no_oracle"
            prev = latest.get(name)
            if prev is None or rnum > prev[0]:
                structural = row.get("err") in STRUCTURAL
                if structural and prev is not None:
                    latest[name] = (rnum, prev[1])
                else:
                    latest[name] = (rnum, green)

    names = list(all_queries())
    failed = [n for n in names if n in latest and not latest[n][1]]
    unchecked = [n for n in names if n not in latest]
    greens_stalest = sorted(
        (n for n in names if n in latest and latest[n][1]), key=lambda n: latest[n][0]
    )
    window = (failed + unchecked + greens_stalest)[:WINDOW]
    print(f"# rounds read: {[p.name for p in rounds]}")
    print(f"# failed={len(failed)} unchecked={len(unchecked)} window={len(window)}")
    print("PRIORITY: tuple[str, ...] = (")
    for n in window:
        print(f'    "{n}",')
    print(")")


if __name__ == "__main__":
    main()
