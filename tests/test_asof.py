"""As-of join semantics: backward match, simultaneous-tie resolution,
no-match nulls, tolerance expiry, name-collision guard."""

from __future__ import annotations

import datetime as dt

import pytest

from elb_log_to_mysql_spark.operators.asof import asof_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def _frames(spark):
    trades = spark.createDataFrame(
        [(1, 101, _ts(10)), (1, 102, _ts(30)), (2, 201, _ts(20)), (3, 301, _ts(5))],
        "key int, trade_id int, t timestamp",
    )
    quotes = spark.createDataFrame(
        [
            (1, _ts(8), 99.0),
            (1, _ts(10), 100.0),   # simultaneous with trade 101 -> must match
            (1, _ts(25), 101.0),
            (2, _ts(19), 55.0),
            # key 3 has no quotes at all
        ],
        "key int, t timestamp, px double",
    )
    return trades, quotes


def test_backward_match_and_ties(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, ["key"], "t", "t", {"px": "quote_px"}
    )
    got = {r.trade_id: r.quote_px for r in out.collect()}
    assert got == {101: 100.0, 102: 101.0, 201: 55.0, 301: None}


def test_tolerance_expires_old_matches(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, ["key"], "t", "t", {"px": "quote_px"},
        tolerance_us=2_000_000,  # 2s
    )
    got = {r.trade_id: r.quote_px for r in out.collect()}
    # 102's best quote is 5s old, 201's is 1s old
    assert got == {101: 100.0, 102: None, 201: 55.0, 301: None}


def test_left_columns_preserved(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, ["key"], "t", "t", {"px": "quote_px"})
    assert set(out.columns) == {"key", "trade_id", "t", "quote_px"}
    assert out.count() == trades.count()


def test_output_name_collision_raises(spark):
    trades, quotes = _frames(spark)
    with pytest.raises(ValueError, match="collide"):
        asof_join(trades, quotes, ["key"], "t", "t", {"px": "trade_id"})


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Property check against pandas.merge_asof on randomized inputs
    (unique right timestamps per key, pandas's tie rules differ)."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    for trial in range(3):
        n_l, n_r = 40, 30
        lk = rng.randint(0, 4, n_l)
        rk = rng.randint(0, 4, n_r)
        lts = rng.choice(np.arange(0, 500), n_l, replace=False)
        rts = rng.choice(np.arange(0, 500), n_r, replace=False)
        left = pd.DataFrame(
            {"key": lk, "t": pd.to_datetime(lts, unit="s"), "lid": np.arange(n_l)}
        )
        right = pd.DataFrame(
            {"key": rk, "t": pd.to_datetime(rts, unit="s"),
             "px": rng.rand(n_r).round(3)}
        )
        expected = pd.merge_asof(
            left.sort_values("t"),
            right.sort_values("t"),
            on="t",
            by="key",
            direction="backward",
        ).set_index("lid")["px"]

        out = asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["key"],
            "t",
            "t",
            {"px": "quote_px"},
        ).collect()
        got = {r.lid: r.quote_px for r in out}
        for lid, exp in expected.items():
            g = got[lid]
            if pd.isna(exp):
                assert g is None, (trial, lid, g)
            else:
                assert g is not None and abs(g - exp) < 1e-12, (trial, lid, g, exp)


def test_forward_direction(spark):
    trades, quotes = _frames(spark)
    out = asof_join(
        trades, quotes, ["key"], "t", "t", {"px": "quote_px"},
        direction="forward",
    )
    got = {r.trade_id: r.quote_px for r in out.collect()}
    # forward: earliest quote at-or-after each trade
    assert got == {101: 100.0, 102: None, 201: None, 301: None}


def test_forward_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    lk, rk = rng.randint(0, 3, 30), rng.randint(0, 3, 25)
    lts = rng.choice(np.arange(0, 400), 30, replace=False)
    rts = rng.choice(np.arange(0, 400), 25, replace=False)
    left = pd.DataFrame(
        {"key": lk, "t": pd.to_datetime(lts, unit="s"), "lid": np.arange(30)}
    )
    right = pd.DataFrame(
        {"key": rk, "t": pd.to_datetime(rts, unit="s"), "px": rng.rand(25).round(3)}
    )
    expected = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"),
        on="t", by="key", direction="forward",
    ).set_index("lid")["px"]
    got = {
        r.lid: r.quote_px
        for r in asof_join(
            spark.createDataFrame(left), spark.createDataFrame(right),
            ["key"], "t", "t", {"px": "quote_px"}, direction="forward",
        ).collect()
    }
    for lid, exp in expected.items():
        if pd.isna(exp):
            assert got[lid] is None
        else:
            assert got[lid] is not None and abs(got[lid] - exp) < 1e-12
