"""The driver records ~50 correctness rows per round IN REGISTRY ORDER, so
the ordering contract is load-bearing: every query that needs a fresh row
(never-proven, or re-queued after a code/oracle change) must appear before
any already-proven query, and the whole needs-a-row set must fit the cap.
The r5 eighth review pass found _REPROOF_LAST members sorting at the very
END of the registry (past the cap, stale proofs never refreshing) — this
test pins the fixed contract."""

from __future__ import annotations

from fluvii_spark.queries import (
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
    # every needs-a-row query sorts before every satisfied-proof query
    first_satisfied = next(
        i for i, p in enumerate(prefixes) if p not in needs_row
    )
    late = [
        (i, p) for i, p in enumerate(prefixes) if p in needs_row and i > first_satisfied
    ]
    assert not late, f"needs-a-row queries sorted after proven ones: {late}"
    # and the whole tier fits the driver cap
    assert len(needs_row) <= DRIVER_CAP, (
        f"{len(needs_row)} queries need driver rows but the cap is "
        f"~{DRIVER_CAP} — trim additions or stagger re-proofs"
    )


def test_explicit_orders_name_real_queries():
    prefixes = {_prefix(n) for n in registry()}
    for p in [*_UNPROVEN_ORDER, *_REPROOF_LAST]:
        assert p in prefixes, f"ordering lists unknown query prefix {p!r}"


def test_unproven_order_is_duplicate_free():
    combined = [*_UNPROVEN_ORDER, *_REPROOF_LAST]
    assert len(combined) == len(set(combined))
