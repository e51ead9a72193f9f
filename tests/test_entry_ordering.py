"""The driver samples a ~50-query PREFIX of __spark_entry__.queries(),
so its ordering IS the policy for where each round's correctness
budget goes.  These tests pin the tier rules without touching Spark.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_tier_order_reds_then_new_then_stale_greens():
    names = ["g_old", "red", "g_new", "never_a", "never_b"]
    latest = {
        "g_old": (1, True),  # green, round 1 (least recent)
        "red": (2, False),  # latest driver row failed
        "g_new": (3, True),  # green, round 3 (most recent)
    }
    got = entry.order_for_sampling(names, latest)
    # stale-red first; never-verified next in registration order;
    # greens last, least-recently-verified first
    assert got == ["red", "never_a", "never_b", "g_old", "g_new"]


def test_red_precedes_never_verified_regardless_of_registration():
    # the r4/r5 process bug: new registrations flooded the budget and
    # stale-reds were never re-sampled.  Reds must win even when the
    # red query registered LAST.
    names = [f"new_{i}" for i in range(60)] + ["red"]
    latest = {"red": (0, False)}
    assert entry.order_for_sampling(names, latest)[0] == "red"


def test_green_rotation_is_least_recent_first():
    names = ["a", "b", "c"]
    latest = {"a": (5, True), "b": (2, True), "c": (4, True)}
    assert entry.order_for_sampling(names, latest) == ["b", "c", "a"]


def test_rows_only_none_hash_counts_green_and_false_counts_red():
    # mirrors load_driver_history's green rule on a synthetic row set
    rowsets = {
        "rows_only": {"rows_match": True, "schema_match": True,
                      "hash_match": None, "err": None},
        "hash_fail": {"rows_match": True, "schema_match": True,
                      "hash_match": False, "err": None},
        "errored": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": "boom"},
    }
    greens = {}
    for name, row in rowsets.items():
        greens[name] = (
            bool(row.get("rows_match"))
            and bool(row.get("schema_match"))
            and not row.get("err")
            and row.get("hash_match") is not False
        )
    assert greens == {
        "rows_only": True, "hash_fail": False, "errored": False
    }


def test_live_ordering_prefix_covers_all_unverified():
    """On the real committed history: the ordering policy's invariants
    hold against the driver's ~50-row budget.  (1) every STALE-RED
    query — a failed driver row with a fix since — sorts inside the
    budget unconditionally; (2) no already-green query occupies a
    budget slot while any unverified query waits outside it (greens
    only appear in the prefix once every unverified query is in it).
    The absolute count of never-verified queries may legitimately
    exceed the budget in a round that registers more than ~50 new
    queries; the policy then drains them over subsequent rounds in
    registration order — asserting a hard cap here would just forbid
    registry growth."""
    latest = entry.load_driver_history()
    names = list(entry.queries().keys())
    prefix = names[:50]
    stale_red = [n for n in names if n in latest and not latest[n][1]]
    missing_red = [n for n in stale_red if n not in set(prefix)]
    assert not missing_red, f"stale-red outside budget: {missing_red}"

    def is_unverified(n: str) -> bool:
        return n not in latest or not latest[n][1]

    n_unverified = sum(1 for n in names if is_unverified(n))
    greens_in_prefix = [n for n in prefix if not is_unverified(n)]
    if n_unverified >= len(prefix):
        # budget oversubscribed: every slot must go to unverified work
        assert not greens_in_prefix, (
            f"green queries occupy oversubscribed budget: {greens_in_prefix}"
        )
    else:
        # all unverified fit: they must ALL be inside the budget
        outside = [
            n for n in names[50:] if is_unverified(n)
        ]
        assert not outside, f"unverified outside roomy budget: {outside}"
