"""Driver-window rotation coverage gate (r4 verdict items #1 and #9).

Fails when any registered query has never appeared in a committed
``CORRECTNESS_r*.json`` driver window AND is neither in the current
``CORRECTNESS_WINDOW`` nor scheduled in ``WINDOW_LEDGER.json`` within
the next three rounds — i.e. the whole registry must cycle through the
standing driver hard gate within ~4 rounds, and a newly registered
query must claim a window slot in the same commit that registers it.
"""

from __future__ import annotations

import glob
import json
import os
import re

from data_quality_checks_in_relational_database_spark.plans.registry import (
    CORRECTNESS_WINDOW,
    REGISTRY,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER_PATH = os.path.join(REPO, "WINDOW_LEDGER.json")


def _committed_history() -> tuple[dict[str, list[int]], int]:
    history: dict[str, list[int]] = {}
    rounds = [0]
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rounds.append(int(m.group(1)))
        with open(path) as f:
            for name in json.load(f):
                history.setdefault(name, []).append(int(m.group(1)))
    return history, max(rounds) + 1


def test_ledger_exists_and_matches_registry():
    assert os.path.exists(LEDGER_PATH), (
        "WINDOW_LEDGER.json missing — run scripts/update_window_ledger.py"
    )
    ledger = json.load(open(LEDGER_PATH))
    assert ledger["window_size"] == 50
    assert ledger["current_window"] == list(CORRECTNESS_WINDOW), (
        "ledger stale vs CORRECTNESS_WINDOW — rerun "
        "scripts/update_window_ledger.py"
    )
    # every ledger name must still be registered; every scheduled chunk
    # must fit a 50-slot window
    names = set(REGISTRY)
    for chunk in ledger["scheduled"].values():
        assert len(chunk) <= 50
        unknown = [n for n in chunk if n not in names]
        assert not unknown, f"scheduled names not registered: {unknown}"


def test_every_query_cycles_through_driver_window():
    history, current_round = _committed_history()
    ledger = json.load(open(LEDGER_PATH))
    assert ledger["current_round"] == current_round, (
        "ledger round stale — rerun scripts/update_window_ledger.py"
    )
    scheduled: dict[str, list[str]] = ledger["scheduled"]
    horizon = current_round + 3
    sched_round = {n: int(r) for r, chunk in scheduled.items() for n in chunk}
    uncovered = []
    for name in REGISTRY:
        if name in history:
            continue  # already has a committed driver row
        if name in set(CORRECTNESS_WINDOW):
            continue  # gets its driver row this round
        rnd = sched_round.get(name)
        if rnd is None or rnd > horizon:
            uncovered.append((name, rnd))
    assert not uncovered, (
        "queries with no driver row, no window slot, and no schedule "
        f"within round {horizon}: {uncovered} — add them to "
        "CORRECTNESS_WINDOW (new queries MUST claim a slot in the same "
        "commit) or rerun scripts/update_window_ledger.py"
    )


def test_new_queries_claim_window_slot_at_registration():
    """A query absent from every committed correctness file and from the
    ledger's schedule must be in the CURRENT window — this is what forces
    'add to CORRECTNESS_WINDOW in the same commit that registers it'."""
    history, _ = _committed_history()
    ledger = json.load(open(LEDGER_PATH))
    known = (
        set(history)
        | {n for chunk in ledger["scheduled"].values() for n in chunk}
        | set(ledger["current_window"])
    )
    brand_new = [n for n in REGISTRY if n not in known]
    missing = [n for n in brand_new if n not in set(CORRECTNESS_WINDOW)]
    assert not missing, (
        f"newly registered queries without a window slot: {missing}"
    )


def test_no_duplicate_registry_key_literals():
    """A duplicate key in the REGISTRY dict literal silently shadows the
    earlier entry (Python keeps the last), dropping a query from the
    surface with no error — exactly what happened to the fixed-quota
    ``stratified_sample`` in r5 until it was renamed
    ``stratified_fixed_n``. Scan the source for repeated key literals."""
    import ast
    import inspect

    from data_quality_checks_in_relational_database_spark.plans import registry as mod

    tree = ast.parse(inspect.getsource(mod))
    dupes = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [
                k.value for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
            seen: set[str] = set()
            for k in keys:
                if k in seen:
                    dupes.append(k)
                seen.add(k)
    assert not dupes, f"duplicate REGISTRY key literals (silent shadowing): {dupes}"
