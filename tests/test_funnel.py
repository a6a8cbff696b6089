import datetime as dt

import pytest

from parallel_betweenness_centrality_using_bsp_spark.operators.funnel import funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)) for u, t, m in rows],
        "user_id long, event_type string, ts timestamp",
    )


def test_funnel_orders_and_counts(spark):
    rows = [
        # user 1: full ordered funnel
        (1, "view", 0), (1, "click", 5), (1, "purchase", 9),
        # user 2: clicks BEFORE viewing -> stops at view
        (2, "click", 0), (2, "view", 3),
        # user 3: view then click, no purchase
        (3, "view", 1), (3, "click", 2),
        # user 4: purchase first, then view+click (purchase not after click)
        (4, "purchase", 0), (4, "view", 1), (4, "click", 2),
        # user 5: noise only
        (5, "error", 0),
    ]
    got = {
        r["stage"]: (r["event_type"], r["users"])
        for r in funnel(_ev(spark, rows), ["view", "click", "purchase"]).collect()
    }
    assert got == {1: ("view", 4), 2: ("click", 3), 3: ("purchase", 1)}


def test_funnel_strictly_after_ties_dont_count(spark):
    rows = [(1, "view", 0), (1, "click", 0)]  # simultaneous: click not after
    got = {r["stage"]: r["users"] for r in funnel(_ev(spark, rows), ["view", "click"]).collect()}
    assert got == {1: 1, 2: 0}


def test_funnel_uses_earliest_previous_completion(spark):
    # second view at t=10 is irrelevant: click at t=4 is after FIRST view
    rows = [(1, "view", 0), (1, "view", 10), (1, "click", 4)]
    got = {r["stage"]: r["users"] for r in funnel(_ev(spark, rows), ["view", "click"]).collect()}
    assert got == {1: 1, 2: 1}


def test_funnel_empty_stages_raises(spark):
    with pytest.raises(ValueError):
        funnel(_ev(spark, [(1, "view", 0)]), [])
