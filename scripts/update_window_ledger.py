"""Regenerate WINDOW_LEDGER.json — the driver-window rotation ledger.

The external correctness driver differentials only the FIRST 50 entries
of ``queries()`` each round (``CORRECTNESS_WINDOW`` in
``plans/registry.py``). This script records, per registered query, the
rounds in which it actually received a driver correctness row (derived
from the committed ``CORRECTNESS_r*.json`` files), marks the current
window as the in-flight round, and schedules every not-yet-covered query
into future 50-slot windows so the whole registry cycles through the
standing hard gate within a bounded number of rounds.

Run from the repo root after editing CORRECTNESS_WINDOW or registering
new queries::

    python scripts/update_window_ledger.py

``tests/test_window_ledger.py`` asserts the checked-in ledger is
consistent with the registry and that no query falls outside the
history + current-window + schedule universe.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW_SIZE = 50


def build_ledger() -> dict:
    from data_quality_checks_in_relational_database_spark.plans.registry import (
        CORRECTNESS_WINDOW,
        REGISTRY,
    )

    history: dict[str, list[int]] = {}
    rounds_seen: list[int] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds_seen.append(rnd)
        with open(path) as f:
            for name in json.load(f):
                history.setdefault(name, []).append(rnd)

    current_round = (max(rounds_seen) if rounds_seen else 0) + 1
    names = list(REGISTRY)
    covered = set(history) | set(CORRECTNESS_WINDOW)
    backlog = [n for n in names if n not in covered]

    scheduled: dict[str, list[str]] = {}
    rnd = current_round + 1
    for i in range(0, len(backlog), WINDOW_SIZE):
        scheduled[str(rnd)] = backlog[i : i + WINDOW_SIZE]
        rnd += 1

    return {
        "window_size": WINDOW_SIZE,
        "current_round": current_round,
        "current_window": list(CORRECTNESS_WINDOW),
        "history": {n: history[n] for n in sorted(history)},
        "scheduled": scheduled,
    }


def main() -> None:
    ledger = build_ledger()
    out = os.path.join(REPO, "WINDOW_LEDGER.json")
    with open(out, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=False)
        f.write("\n")
    n_hist = len(ledger["history"])
    n_sched = sum(len(v) for v in ledger["scheduled"].values())
    print(
        f"wrote {out}: round {ledger['current_round']}, "
        f"{n_hist} with history, 50 in window, {n_sched} scheduled "
        f"across rounds {sorted(ledger['scheduled'])}"
    )


if __name__ == "__main__":
    main()
