"""Registry-window discipline: the grading driver hash-checks exactly
the first 50 ``queries()`` entries, so the window composition is pinned
here — a refactor that reorders imports or module dicts cannot silently
push an oracle-checked flagship query out of the window."""

from __future__ import annotations

from x17a5_spark.queries import DRIVER_WINDOW, WINDOW_ORDER, registry

# the only window entries without a SQL oracle (genuinely
# non-SQL-expressible; the driver records rows-only checks)
ROWS_ONLY = {"s2_lsh_ann"}


def test_window_order_is_exactly_the_driver_window():
    assert len(WINDOW_ORDER) == DRIVER_WINDOW
    assert len(set(WINDOW_ORDER)) == DRIVER_WINDOW


def test_registry_leads_with_window_order():
    queries, _ = registry()
    assert list(queries)[:DRIVER_WINDOW] == WINDOW_ORDER


def test_every_window_entry_is_hash_checkable():
    _, oracles = registry()
    missing = [n for n in WINDOW_ORDER if n not in oracles and n not in ROWS_ONLY]
    assert missing == []


def test_no_query_lost_by_reordering():
    queries, oracles = registry()
    assert len(queries) >= 85 - 7  # 78 round-1 queries + this round's additions
    assert set(oracles) <= set(queries)
