"""Window-rotation gate (VERDICT r07 item 1, made permanent).

The external driver verifies only the first 50 entries of
``__spark_entry__.queries()`` per round. Rounds 2-7 rotated that window
by hand; round 8 replaced the hand-written PRIORITY list with a
deterministic oldest-first scheduler (``__spark_entry__._rotation_order``).
These tests make a stale-leaving rotation impossible to commit:

- the window is exactly the 50 oldest-by-driver-row queries (flagship
  q56 pinned);
- after the window lands, no query's driver-row age exceeds 4 rounds —
  the achievable floor (222 queries / 49 free slots -> 5-round cycle;
  max-age 3 would need 4x50 >= registry size, which 222 > 200 rules
  out);
- a forward simulation of pure rotation re-verifies every query within
  one full cycle, so the bound holds in steady state, not just today.
"""

from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from hbase_bulkload_service_spark import registry  # noqa: E402

WINDOW = entrymod.WINDOW
CURRENT_ROUND = 8  # keep in sync with tools/selfcheck.py


@pytest.fixture(scope="module")
def order():
    return entrymod._rotation_order(list(registry.QUERIES))


def test_window_is_oldest_first_with_pin(order):
    last = entrymod._last_verified()
    names = list(registry.QUERIES)
    idx = {n: i for i, n in enumerate(names)}
    by_age = sorted(names, key=lambda n: (last.get(n, 0), idx[n]))
    window = set(order[:WINDOW])
    # every pinned query is in the window
    for pin in entrymod.PINNED:
        assert pin in window
    # the window is the oldest-50 modulo the pin displacement: anything
    # outside the window must be at least as fresh as the youngest
    # non-pinned window member
    oldest_out = min(
        (last.get(n, 0) for n in order[WINDOW:]), default=CURRENT_ROUND
    )
    for n in order[:WINDOW]:
        if n in entrymod.PINNED:
            continue
        assert last.get(n, 0) <= oldest_out, (
            f"{n} (last r{last.get(n, 0)}) occupies a slot while an older "
            f"query (last r{oldest_out}) waits outside the window"
        )
    # sanity: the oldest-50 by age that aren't displaced all made it
    assert set(by_age[: WINDOW - len(entrymod.PINNED)]) <= window | set(
        entrymod.PINNED
    )


def test_post_window_max_age_is_achievable_floor(order):
    """After this round's window lands, no query may exceed age 4."""
    last = dict(entrymod._last_verified())
    for n in order[:WINDOW]:
        last[n] = CURRENT_ROUND
    over = {
        n: CURRENT_ROUND - last.get(n, 0)
        for n in order
        if CURRENT_ROUND - last.get(n, 0) > 4
    }
    assert not over, f"rotation leaves stale queries behind: {over}"


def test_steady_state_full_cycle(order):
    """Pure oldest-first rotation re-verifies everything within one full
    cycle and never exceeds post-window age 4 in any simulated round."""
    names = list(registry.QUERIES)
    idx = {n: i for i, n in enumerate(names)}
    last = dict(entrymod._last_verified())
    n_free = WINDOW - len(entrymod.PINNED)
    cycle = -(-max(1, len(names) - len(entrymod.PINNED)) // n_free)
    for rnd in range(CURRENT_ROUND, CURRENT_ROUND + cycle + 2):
        ordered = sorted(names, key=lambda n: (last.get(n, 0), idx[n]))
        window = set(ordered[:WINDOW]) | set(entrymod.PINNED)
        for n in window:
            last[n] = rnd
        worst = max(rnd - last.get(n, 0) for n in names)
        assert worst <= 4, f"round {rnd}: post-window age {worst} > 4"
    # ledger entries for RETIRED queries (e.g. q116, round 8) linger in
    # old CORRECTNESS files — only registered queries must re-verify
    assert min(last[n] for n in names) >= CURRENT_ROUND, (
        "some registered query never re-verified"
    )


def test_queries_and_oracles_share_order():
    qs = list(entrymod.queries())
    assert len(qs) == len(registry.QUERIES)
    oracles = entrymod.oracle_sql()
    # every oracle key is a registered query, in the same rotation order
    q_pos = {n: i for i, n in enumerate(qs)}
    positions = [q_pos[n] for n in oracles]
    assert positions == sorted(positions)
