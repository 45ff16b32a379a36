"""The driver records ~50 correctness rows per round IN REGISTRY ORDER, so
the ordering contract is load-bearing: every query that needs a fresh row
(never-proven, or re-queued after a code/oracle change) must appear before
any already-proven query; the age-rotation tier (stale-but-valid proofs
being refreshed oldest-first, VERDICT r6 ask #3) sorts between them; and
the needs-a-row set must fit the cap. The r5 eighth review pass found
_REPROOF_LAST members sorting at the very END of the registry (past the
cap, stale proofs never refreshing) — this test pins the fixed contract.
The degeneracy-gate waiver list (VERDICT r6 ask #4) is pinned here too:
every waiver must name a real query and carry a non-trivial argument."""

from __future__ import annotations

from fluvii_spark.queries import (
    DEGENERACY_WAIVERS,
    _AGE_ROTATION,
    _DRIVER_PROVEN,
    _REPROOF_LAST,
    _UNPROVEN_ORDER,
    registry,
)

DRIVER_CAP = 50


def _prefix(name: str) -> str:
    return name.split("_", 1)[0]


def test_needs_a_row_tier_sorts_first_and_fits_cap():
    names = list(registry())
    prefixes = [_prefix(n) for n in names]
    needs_row = {
        p
        for p in prefixes
        if p not in _DRIVER_PROVEN or p in _REPROOF_LAST
    }
    rotation = {p for p in prefixes if p in _AGE_ROTATION} - needs_row
    # every needs-a-row query sorts before everything else
    first_other = next(
        i for i, p in enumerate(prefixes) if p not in needs_row
    )
    late = [
        (i, p)
        for i, p in enumerate(prefixes)
        if p in needs_row and i > first_other
    ]
    assert not late, f"needs-a-row queries sorted after others: {late}"
    # every rotation query sorts before every fresh-proven query
    first_fresh = next(
        i
        for i, p in enumerate(prefixes)
        if p not in needs_row and p not in rotation
    )
    late_rot = [
        (i, p)
        for i, p in enumerate(prefixes)
        if p in rotation and i > first_fresh
    ]
    assert not late_rot, f"rotation queries sorted after fresh ones: {late_rot}"
    # the needs-a-row tier fits the driver cap (rotation may exceed the
    # leftover budget — the driver refreshes the prefix that fits)
    assert len(needs_row) <= DRIVER_CAP, (
        f"{len(needs_row)} queries need driver rows but the cap is "
        f"~{DRIVER_CAP} — trim additions or stagger re-proofs"
    )


def test_explicit_orders_name_real_queries():
    prefixes = {_prefix(n) for n in registry()}
    for p in [*_UNPROVEN_ORDER, *_REPROOF_LAST, *_AGE_ROTATION]:
        assert p in prefixes, f"ordering lists unknown query prefix {p!r}"


def test_unproven_order_is_duplicate_free():
    combined = [*_UNPROVEN_ORDER, *_REPROOF_LAST, *_AGE_ROTATION]
    assert len(combined) == len(set(combined))


def test_degeneracy_waivers_name_real_queries_with_arguments():
    names = set(registry())
    for q, why in DEGENERACY_WAIVERS.items():
        assert q in names, f"waiver for unknown query {q!r}"
        assert len(why) >= 20, f"waiver for {q} needs a real argument"
    # a re-queued DEGENERACY fix must not ALSO be waived — the gate has to
    # re-check it. Intended-shape (_ONE_ROW-class) waivers are exempt:
    # they document a query's permanent single-row output contract (the
    # driver hash still pins every value), so a re-proof queued for an
    # UNRELATED expression change (e.g. q249's r9 NULLIF divide guards)
    # rightly keeps them — stripping the waiver would fail the ≥2-rows
    # rule on a correct result, not re-verify anything.
    from fluvii_spark.queries import _ONE_ROW

    for p in _REPROOF_LAST:
        for q in [q for q in DEGENERACY_WAIVERS if _prefix(q) == p]:
            assert DEGENERACY_WAIVERS[q].startswith(_ONE_ROW), (
                f"re-proof {p} carries a non-shape waiver — the gate must "
                f"re-check it: {DEGENERACY_WAIVERS[q]!r}"
            )


def test_degeneracy_check_rules():
    from tools.contract_common import degeneracy_check

    assert degeneracy_check(["a"], []) == "empty result"
    assert degeneracy_check(["a", "b"], [(1, 2)]) == "single-row result"
    assert "all-NULL" in degeneracy_check(
        ["a", "b"], [(1, None), (2, None)]
    )
    # one varying column beside a constant metric → degenerate
    assert "vary" in degeneracy_check(["k", "m"], [(1, 5), (2, 5), (3, 5)])
    # two varying columns → fine
    assert degeneracy_check(["k", "m"], [(1, 5), (2, 6)]) is None
    # single-column results need only their own variation
    assert degeneracy_check(["k"], [(1,), (2,)]) is None
