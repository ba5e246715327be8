"""Pre-flight guard for the verification-debt rotation.

The driver oracle-checks only the first WINDOW (50) entries of
``queries()`` per round; the registry orders itself by verification debt
(never-green first, then stalest-green — ``showcase/__init__.py``), so
every query should get a green row at least every ``ceil(n/WINDOW)`` = 3
rounds. This tool fails when that rotation is broken:

1. any never-green or stale (age >= MAX_AGE) query sits OUTSIDE the next
   window — it would NOT be re-checked next round despite being due;
2. more stale/never-green queries exist than one window can absorb — the
   backlog can only grow.

Run: python tools/debt_check.py   (exit 1 on violation)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50
MAX_AGE = 3  # rounds since last green before a query counts as stale


def last_green_rounds() -> tuple[dict[str, int], int]:
    """name -> newest round with a hash_match green row; plus newest round."""
    last: dict[str, int] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("hash_match"):
                last[name] = max(last.get(name, 0), rnd)
    return last, newest


def check() -> list[str]:
    from onetl_spark.showcase import all_queries

    names = list(all_queries())
    last, newest = last_green_rounds()
    current = newest + 1  # the round about to run

    problems: list[str] = []
    due = []  # queries that must be in the next window
    for pos, name in enumerate(names):
        green = last.get(name)
        age = current - green if green else None
        if green is None or age >= MAX_AGE:
            due.append((name, age, pos))
            if pos >= WINDOW:
                problems.append(
                    f"{name}: {'never green' if green is None else f'age {age}'} "
                    f"but at registry position {pos} (outside the {WINDOW}-query window)"
                )
    if len(due) > WINDOW:
        problems.append(
            f"{len(due)} queries are due (never-green or age >= {MAX_AGE}) but the "
            f"window only holds {WINDOW} — the backlog cannot drain"
        )

    ages = sorted(
        (current - g for g in (last.get(n) for n in names) if g), reverse=True
    )
    print(
        f"registry: {len(names)} queries; ever-green: {len([n for n in names if n in last])}; "
        f"due next round: {len(due)}; max green-age: {ages[0] if ages else 'n/a'}"
    )
    return problems


def main() -> None:
    problems = check()
    for p in problems:
        print(f"!! {p}")
    if problems:
        sys.exit(1)
    print("debt rotation healthy")


if __name__ == "__main__":
    main()
