"""Temporal joins (operators/temporal.py): bucketed range join, as-of."""

from pyspark.sql import functions as F

from hoover_snoop2_spark.operators.temporal import asof_join, range_join_bucketed


def test_range_join_interval_spanning_buckets(spark):
    facts = spark.createDataFrame(
        [(1, 150), (2, 250), (3, 999), (4, 1000)], "fact_id long, t long"
    )
    # one interval [100, 1000) spanning 10 buckets of 100
    iv = spark.createDataFrame([(7, 100, 1000)], "iv_id long, s long, e long")
    got = sorted(
        r["fact_id"]
        for r in range_join_bucketed(facts, iv, "t", "s", "e", 100).collect()
    )
    assert got == [1, 2, 3]  # 1000 excluded (half-open)


def test_range_join_no_duplicate_matches(spark):
    facts = spark.createDataFrame([(1, 500)], "fact_id long, t long")
    iv = spark.createDataFrame(
        [(1, 0, 1000), (2, 400, 600)], "iv_id long, s long, e long"
    )
    rows = range_join_bucketed(facts, iv, "t", "s", "e", 100).collect()
    assert sorted(r["iv_id"] for r in rows) == [1, 2]
    assert len(rows) == 2  # once per (fact, interval), never per bucket


def test_range_join_plan_is_equi_join(spark):
    facts = spark.createDataFrame([(1, 500)], "fact_id long, t long")
    iv = spark.createDataFrame([(1, 0, 1000)], "iv_id long, s long, e long")
    plan = (
        range_join_bucketed(facts, iv, "t", "s", "e", 100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_latest_prior_and_equal_ts_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 300), (4, 99, 50)],
        "event_id long, user_id long, epoch long",
    )
    right = spark.createDataFrame(
        [(10, 100, 1.0), (10, 200, 2.0), (10, 205, 3.0)],
        "user_id long, epoch long, value double",
    )
    got = {
        r["event_id"]: (r["asof_value"], r["asof_epoch"])
        for r in asof_join(
            left, right, "user_id", "epoch", right_cols=["value"]
        ).collect()
    }
    assert got[1] == (1.0, 100)    # equal ts matches (inclusive)
    assert got[2] == (3.0, 205)
    assert got[3] == (3.0, 205)    # carried past the last right row
    assert got[4] == (None, None)  # no right rows for user 99


def test_asof_plan_has_no_join(spark):
    left = spark.createDataFrame([(1, 10, 100)], "event_id long, user_id long, epoch long")
    right = spark.createDataFrame([(10, 50, 1.0)], "user_id long, epoch long, value double")
    plan = (
        asof_join(left, right, "user_id", "epoch", right_cols=["value"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan  # union + window, not a join node
    assert "Window" in plan
