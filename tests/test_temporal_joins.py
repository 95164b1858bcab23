"""AS-OF and binned RANGE joins (operators/temporal.py): the two
temporal operators Spark lacks as built-ins, expressed with zero UDFs —
union-tag running-last for as-of, explode-to-bins equi-join for range."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_table_store_spark.operators.temporal import (
    as_of_join,
    range_join_binned,
)


def _lr(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "L1"), (1, "2024-01-01 10:05:00", "L2"),
         (2, "2024-01-01 09:00:00", "L3"), (3, "2024-01-01 12:00:00", "L4")],
        "user_id bigint, ts string, lbl string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:58:00", 10.0), (1, "2024-01-01 10:05:00", 20.0),
         (2, "2024-01-01 09:30:00", 30.0)],
        "user_id bigint, ts string, px double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return left, right


def test_asof_backward_forward_tolerance(spark):
    left, right = _lr(spark)
    b = {r["lbl"]: (str(r["ts_right"]), r["px"])
         for r in as_of_join(left, right, "ts", by=["user_id"]).collect()}
    assert b["L1"] == ("2024-01-01 09:58:00", 10.0)
    assert b["L2"] == ("2024-01-01 10:05:00", 20.0)  # same instant visible
    assert b["L3"] == ("None", None)                 # right only later
    assert b["L4"] == ("None", None)                 # unseen key
    f = {r["lbl"]: (str(r["ts_right"]), r["px"])
         for r in as_of_join(
             left, right, "ts", by=["user_id"], direction="forward"
         ).collect()}
    assert f["L3"] == ("2024-01-01 09:30:00", 30.0)
    assert f["L1"] == ("2024-01-01 10:05:00", 20.0)
    assert f["L4"] == ("None", None)
    t = {r["lbl"]: r["px"]
         for r in as_of_join(
             left, right, "ts", by=["user_id"], tolerance_seconds=60
         ).collect()}
    assert t["L1"] is None and t["L2"] == 20.0       # 2-min gap voided

    # name collision: right payload sharing a left name gets _right
    right2 = right.withColumnRenamed("px", "lbl")
    cols = as_of_join(left, right2, "ts", by=["user_id"]).columns
    assert "lbl_right" in cols and cols.count("lbl") == 1

    # plan shape: one keyed window over the union, ZERO joins
    plan = as_of_join(left, right, "ts", by=["user_id"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan


@pytest.mark.slow
def test_range_join_binned_matches_theta(spark):
    L = spark.createDataFrame(
        [(1, 0.0, 25.0), (2, 90.0, 100.0), (3, 50.0, 40.0), (4, None, 5.0)],
        "lid bigint, lo double, hi double",
    )
    R = spark.createDataFrame(
        [(10, 10.0), (11, 95.0), (12, 45.0), (13, 25.0), (14, None)],
        "rid bigint, v double",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join_binned(L, R, "lo", "hi", "v", 10.0).collect()
    )
    # empty interval (3) and NULL bound (4) / NULL value (14) match none;
    # boundary 25.0 is inclusive
    assert got == [(1, 10), (1, 13), (2, 11)]
    theta = sorted(
        (r["lid"], r["rid"])
        for r in L.join(
            R, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    )
    assert got == theta
    # randomized parity sweep across bin widths (incl. widths that
    # misalign with the data) — the bin plan is an optimization, never
    # a semantics change
    import random

    rnd = random.Random(5)
    L2 = spark.createDataFrame(
        [(i, x, x + rnd.uniform(0, 30))
         for i, x in ((i, rnd.uniform(-50, 100)) for i in range(40))],
        "lid bigint, lo double, hi double",
    )
    R2 = spark.createDataFrame(
        [(i, rnd.uniform(-60, 140)) for i in range(60)],
        "rid bigint, v double",
    )
    want = sorted(
        (r["lid"], r["rid"])
        for r in L2.join(
            R2, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    )
    for width in (1.0, 7.3, 100.0):
        have = sorted(
            (r["lid"], r["rid"])
            for r in range_join_binned(
                L2, R2, "lo", "hi", "v", width
            ).collect()
        )
        assert have == want, width


def test_asof_random_parity_with_pandas_merge_asof(spark):
    """Randomized equivalence vs the reference implementation: pandas
    merge_asof (by key, backward and forward, with and without
    tolerance) on data with duplicate timestamps excluded (merge_asof
    tie behavior among equal right rows is positional, ours is
    value-deterministic — distinct timestamps make the semantics
    identical)."""
    import random

    import pandas as pd

    rnd = random.Random(17)
    n_l, n_r = 120, 80
    lts = rnd.sample(range(0, 10_000_000, 7), n_l)
    rts = rnd.sample(range(3, 10_000_000, 11), n_r)
    lpdf = pd.DataFrame({
        "k": [rnd.randint(0, 4) for _ in range(n_l)],
        "t": pd.to_datetime(lts, unit="s"),
        "lid": range(n_l),
    })
    rpdf = pd.DataFrame({
        "k": [rnd.randint(0, 4) for _ in range(n_r)],
        "t": pd.to_datetime(rts, unit="s"),
        "px": [round(rnd.uniform(0, 100), 3) for _ in range(n_r)],
    })
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    for direction, tol in [("backward", None), ("forward", None),
                           ("backward", 50_000), ("forward", 3_600)]:
        want = pd.merge_asof(
            lpdf.sort_values("t"),
            rpdf.sort_values("t"),
            on="t", by="k", direction=direction,
            tolerance=pd.Timedelta(seconds=tol) if tol else None,
        ).set_index("lid")["px"]
        got = {
            r["lid"]: r["px"]
            for r in as_of_join(
                left, right, "t", by=["k"], direction=direction,
                tolerance_seconds=tol,
            ).collect()
        }
        for lid in range(n_l):
            w = want.loc[lid]
            g = got[lid]
            assert (pd.isna(w) and g is None) or (g is not None and abs(w - g) < 1e-9), (
                direction, tol, lid, w, g,
            )


def test_funnel_ordered_matching(spark):
    """Hand-checked funnel: order matters (a click BEFORE the first
    view doesn't count), the window anchors at step 1, and summary
    conversion fractions come out right."""
    from flink_table_store_spark.operators.temporal import (
        funnel,
        funnel_summary,
    )

    rows = [
        # user 1 completes all three in order
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:10:00"),
        # user 2: click precedes the first view -> funnel stops at view
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 09:30:00"),
        # user 3: click in order but purchase outside the 1h window
        (3, "view", "2024-01-01 08:00:00"),
        (3, "click", "2024-01-01 08:20:00"),
        (3, "purchase", "2024-01-01 09:30:00"),
        # user 4 never views -> absent entirely
        (4, "purchase", "2024-01-01 12:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = funnel(
        ev, ["view", "click", "purchase"], within_seconds=3600
    )
    got = {r["user_id"]: (r["step_1_ts"] is not None,
                          r["step_2_ts"] is not None,
                          r["step_3_ts"] is not None)
           for r in out.collect()}
    assert got == {
        1: (True, True, True),
        2: (True, False, False),
        3: (True, True, False),
    }
    summary = {r["step"]: (r["n_users"], r["conversion"])
               for r in funnel_summary(out).collect()}
    assert summary == {1: (3, 1.0), 2: (2, round(2 / 3, 6)), 3: (1, round(1 / 3, 6))}


def test_retention_cohorts(spark):
    """Hand-checked weekly triangle: cohort size at offset 0, gaps in
    activity leave holes, distinct users count once per week."""
    from flink_table_store_spark.operators.temporal import (
        retention_cohorts,
    )

    rows = [
        # two users cohort in week of Mon 2024-01-01
        (1, "2024-01-02 10:00:00"), (1, "2024-01-03 10:00:00"),  # same wk
        (1, "2024-01-09 10:00:00"),                              # wk +1
        (2, "2024-01-04 10:00:00"),
        (2, "2024-01-16 10:00:00"),                              # wk +2
        # one user cohorts the next week
        (3, "2024-01-10 10:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (str(r["cohort"])[:10], r["periods_since"]): r["n_users"]
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }
    import pytest as _pytest

    # quarter/year are supported since ADVICE r10; sub-day units are not
    with _pytest.raises(ValueError, match="unsupported period"):
        retention_cohorts(ev, period="hour")


def test_asof_null_timestamps_never_match(spark):
    """NULL-time right rows are excluded; NULL-time left rows match
    nothing — in BOTH directions (sort placement must not hand them
    arbitrary matches)."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", "L1"), (1, None, "LN")],
        "user_id bigint, ts string, lbl string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, "2024-01-01 11:00:00", 7.0)],
        "user_id bigint, ts string, px double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    for direction, want_l1 in [("backward", None), ("forward", 7.0)]:
        got = {r["lbl"]: r["px"]
               for r in as_of_join(
                   left, right, "ts", by=["user_id"], direction=direction
               ).collect()}
        assert got["LN"] is None, direction
        assert got["L1"] == want_l1, direction


def test_asof_awkward_column_names(spark):
    """ADVICE r10 (low): payload/time names that need backtick quoting
    (spaces, dashes, dots) used to break the NULL-struct cast because it
    went through dataType.simpleString() — an unparseable DDL string.
    The cast now uses the StructType object itself."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "user_id bigint, `event time` string"
    ).withColumn("event time", F.col("`event time`").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", 5.0, "x")],
        "user_id bigint, `event time` string, `px-mid` double, `a.b` string",
    ).withColumn("event time", F.col("`event time`").cast("timestamp"))
    got = as_of_join(left, right, "event time", by=["user_id"]).collect()
    assert len(got) == 1
    assert got[0]["px-mid"] == 5.0 and got[0]["a.b"] == "x"


def test_retention_quarter_and_year(spark):
    """ADVICE r10 (low): quarter/year periods (months_between / 3, / 12)
    now work as the docstring always promised."""
    from flink_table_store_spark.operators.temporal import retention_cohorts

    events = spark.createDataFrame(
        [
            (1, "2023-02-10"),  # cohort 2023-Q1 / 2023
            (1, "2023-08-01"),  # +2 quarters, same year
            (1, "2024-03-01"),  # +4 quarters, +1 year
            (2, "2023-11-05"),  # cohort 2023-Q4 / 2023
        ],
        "user_id bigint, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    q = {
        (str(r["cohort"])[:10], r["periods_since"]): r["n_users"]
        for r in retention_cohorts(events, period="quarter").collect()
    }
    assert q == {
        ("2023-01-01", 0): 1,
        ("2023-01-01", 2): 1,
        ("2023-01-01", 4): 1,
        ("2023-10-01", 0): 1,
    }
    y = {
        (str(r["cohort"])[:10], r["periods_since"]): r["n_users"]
        for r in retention_cohorts(events, period="year").collect()
    }
    assert y == {("2023-01-01", 0): 2, ("2023-01-01", 1): 1}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported period"):
        retention_cohorts(events, period="hour").collect()
