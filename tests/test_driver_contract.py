"""Meta-tests of the driver contract surface itself."""

from __future__ import annotations

import __spark_entry__ as E


def test_every_query_has_an_oracle():
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) == set(qs), (
        set(oracles) ^ set(qs))  # full value-checked coverage, both ways


def test_oracles_are_self_contained_sql():
    tables = {"region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"}
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
        # no unresolved python format placeholders leaked into the SQL
        # (literal braces inside Java template strings are fine)
        assert "{_sql" not in sql and "{dedup." not in sql, name


def test_queries_are_stateless_rebuilds():
    a, b = E.queries(), E.queries()
    assert set(a) == set(b)
    assert len(a) == 171


def test_driver_window_rotation():
    """The driver value-checks only the first ~50 queries() entries.

    Every query NOT covered by last round's CORRECTNESS window must be
    emitted first so it lands inside this round's window (VERDICT.md r3
    item 1).  The driver iterates queries() order and looks oracles up
    by key, so only queries() ordering is load-bearing.
    """
    q = list(E.queries())
    unchecked = [k for k in q if k not in E._PREV_DRIVER_CHECKED]
    # 51 unchecked this round: at most ONE designated overflow query may
    # sit past the ~50 window, and it must be the declared one (best
    # multi-round coverage) at the tail of the unchecked block
    assert len(unchecked) <= 50 + len(E._WINDOW_OVERFLOW), \
        "window rotation overflow — rotate set"
    assert q[:len(unchecked)] == unchecked
    if len(unchecked) > 50:
        assert tuple(unchecked[50:]) == E._WINDOW_OVERFLOW
