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
    """Independent re-derivation of contract._driver_row_rounds:
    name -> (latest round, latest row failed)."""
    latest = {}
    for p in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", p.name)
        rno = int(m.group(1))
        rows = json.loads(p.read_text())
        for name, row in rows.items():
            failed = any(
                row.get(k) is False
                for k in ("rows_match", "schema_match", "hash_match")
            ) or (row.get("err") not in (None, "no_oracle"))
            if name not in latest or rno >= latest[name][0]:
                latest[name] = (rno, failed)
    return latest


def test_rotation_is_permutation_of_registry():
    assert sorted(contract._ROTATION_FIRST) == sorted(contract.QUERIES)
    assert list(contract.queries()) == contract._ROTATION_FIRST
    assert list(contract.oracle_sql()) == [
        n for n in contract._ROTATION_FIRST if n in contract.ORACLES
    ]


def test_rotation_head_is_the_stalest_cap_queries():
    """_ROTATION_FIRST[:CAP] must be exactly the CAP highest-priority
    queries: latest-row-FAILED absolutely first (a shipped red row must
    not starve behind a large never-checked backlog), then
    semantics-changed (a stale green row mis-evidences new behavior),
    then never-checked, then ascending latest-driver-row round."""
    latest = _ledger_rounds()
    names = list(contract.QUERIES)
    idx = {n: i for i, n in enumerate(names)}

    def key(n):
        row = latest.get(n)
        if row is not None and row[1] and n not in contract._SEMANTICS_CHANGED:
            return (0, row[0], idx[n])
        if n in contract._SEMANTICS_CHANGED:
            return (1, 0, idx[n])
        if row is None:
            return (2, 0, idx[n])
        return (3, row[0], idx[n])

    expected = sorted(names, key=key)
    assert contract._ROTATION_FIRST == expected
    # the driver-visible window is the stalest CAP — set equality is the
    # invariant that matters (order within the window is all checked anyway)
    assert set(contract._ROTATION_FIRST[:CAP]) == set(expected[:CAP])


def test_failed_rows_front_of_checked_set():
    """Any query whose LATEST ledger row failed must be inside the driver's
    next CAP-row window — UNCONDITIONALLY, even when a session registers
    more than CAP new queries (failed rows sort before never-checked, so
    the red backlog can never starve)."""
    latest = _ledger_rounds()
    failed = [n for n in contract.QUERIES if n in latest and latest[n][1]]
    assert len(failed) <= CAP, "red backlog alone exceeds driver cap"
    window = set(contract._ROTATION_FIRST[:CAP])
    for n in failed:
        assert n in window, f"failed query {n} not re-checked next round"


def test_rotation_order_synthetic_failure_fronting():
    """Policy unit test on an injected ledger: failed rows front the
    WHOLE order (before never-checked — they cannot starve behind a big
    new-query backlog); no_oracle rows are not failures."""
    names = ["a", "b", "c", "d", "e"]
    latest = {
        "b": (4, False),   # freshest green
        "c": (4, True),    # freshest but FAILED -> fronts after never-checked
        "d": (1, False),   # stalest green
        "e": (2, False),
    }
    order = contract._rotation_order(names, latest=latest)
    assert order == ["c", "a", "d", "e", "b"]
    # no_oracle is a declared rows-only check, not a failure
    assert not contract._row_failed(
        {"rows_match": None, "schema_match": None, "hash_match": None,
         "err": "no_oracle"}
    )
    assert contract._row_failed(
        {"rows_match": True, "schema_match": True, "hash_match": False,
         "err": None}
    )
    assert contract._row_failed(
        {"rows_match": None, "schema_match": None, "hash_match": None,
         "err": "boom"}
    )


def test_never_checked_queries_lead():
    """Never-checked queries occupy the positions right after the failed
    block. When a session registers more than the driver cap of new
    queries, the overflow waits — acceptable ONLY if every overflowing
    query is oracle-paired, i.e. the local contract gate
    (tests/test_contract.py) already runs the driver's own comparison on
    it at sf0.001; a rows-only query may never ship driver-unchecked."""
    latest = _ledger_rounds()
    failed = [
        n for n in contract.QUERIES
        if n in latest and latest[n][1] and n not in contract._SEMANTICS_CHANGED
    ]
    sem = [n for n in contract._SEMANTICS_CHANGED if n not in failed]
    never = [
        n for n in contract.QUERIES
        if n not in latest and n not in contract._SEMANTICS_CHANGED
    ]
    lead = len(failed) + len(sem)
    block = contract._ROTATION_FIRST[lead: lead + len(never)]
    assert set(block) == set(never)
    window = set(contract._ROTATION_FIRST[:CAP])
    overflow = [n for n in never if n not in window]
    for n in overflow:
        assert n in contract.ORACLES, (
            f"rows-only query {n} would ship with no driver row AND no "
            "oracle-paired local gate"
        )


def test_semantics_changed_queries_front():
    """A query whose params were retuned after its last green row must be
    re-checked next round — a stale green row does not evidence the new
    behavior (r5: emb_pq_reranked nprobe/shortlist retune)."""
    order = contract._rotation_order(
        ["a", "b", "c"],
        latest={"a": (4, False), "b": (1, False), "c": (2, False)},
        changed={"a"},
    )
    assert order == ["a", "b", "c"]
    for n in contract._SEMANTICS_CHANGED:
        assert n in contract.QUERIES
        assert n in contract._ROTATION_FIRST[:CAP]
