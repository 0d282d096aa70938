"""Rotation-freshness invariant (VERDICT r3 "Next round" #2).

The driver's correctness harness only checks the FIRST 50 entries of
``queries()`` per round, so the exposure order decides which queries get a
fresh driver row. Round 3 hand-pinned that order and buried 8 never-checked
queries at the tail; the rotation is now COMPUTED from the driver's own
CORRECTNESS_r*.json ledgers. These tests pin the policy so a future edit
cannot re-introduce the bug: the head of the rotation must be exactly the
stalest queries (never-checked = infinitely stale, first), and the ordering
must be a permutation of the full registry.

No SparkSession needed — this is pure ledger arithmetic.
"""

import json
import pathlib
import re

from fasta_windows_spark import contract

ROOT = pathlib.Path(__file__).resolve().parent.parent
CAP = 50  # observed driver per-round row cap (CORRECTNESS_r01..r03)


def _ledger_rounds():
    latest = {}
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        rows = json.loads(p.read_text())
        for name in rows:
            latest[name] = max(latest.get(name, 0), int(m.group(1)))
    return latest


def test_rotation_is_permutation_of_registry():
    assert sorted(contract._ROTATION_FIRST) == sorted(contract.QUERIES)
    assert list(contract.queries()) == contract._ROTATION_FIRST
    assert list(contract.oracle_sql()) == [
        n for n in contract._ROTATION_FIRST if n in contract.ORACLES
    ]


def test_rotation_head_is_the_stalest_cap_queries():
    """_ROTATION_FIRST[:CAP] must be exactly the CAP stalest queries:
    never-checked first (age ∞), then ascending latest-driver-row round."""
    latest = _ledger_rounds()
    names = list(contract.QUERIES)
    idx = {n: i for i, n in enumerate(names)}
    expected = sorted(names, key=lambda n: (latest.get(n, -1), idx[n]))
    assert contract._ROTATION_FIRST == expected
    # the driver-visible window is the stalest CAP — set equality is the
    # invariant that matters (order within the window is all checked anyway)
    assert set(contract._ROTATION_FIRST[:CAP]) == set(expected[:CAP])


def test_never_checked_queries_lead():
    latest = _ledger_rounds()
    never = [n for n in contract.QUERIES if n not in latest]
    head = contract._ROTATION_FIRST[: len(never)]
    assert set(head) == set(never)
    # and they all fit inside the driver's row cap
    assert len(never) <= CAP, (
        f"{len(never)} never-checked queries exceed the {CAP}-row driver cap; "
        "some will not get a row this round"
    )
