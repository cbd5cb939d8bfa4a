"""AS-OF and RANGE joins (operators/temporal.py) against hand-computed
expectations: inclusive-tie semantics, no-prior nulls, multi-key
isolation, multi-bucket intervals matched exactly once, boundary
inclusivity."""

from pyspark.sql import functions as F

from medcat_spark.operators.temporal import asof_join, range_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("A", 5, "e1"), ("A", 10, "e2"), ("A", 20, "e3"),
         ("B", 10, "e4"), ("B", 9, "e5")],
        "k string, ts long, eid string")
    right = spark.createDataFrame(
        [("A", 10, 1.5), ("A", 15, 2.5), ("B", 10, 9.0)],
        "k string, ts long, thr double")
    got = {r["eid"]: r["thr"]
           for r in asof_join(left, right, on="k", left_ts="ts",
                              right_ts="ts", value_cols="thr").collect()}
    assert got == {
        "e1": None,    # before any snapshot
        "e2": 1.5,     # inclusive tie at ts=10
        "e3": 2.5,     # latest <= 20
        "e4": 9.0,     # B's own snapshot, not A's
        "e5": None,    # B before its snapshot
    }


def test_asof_join_multiple_value_cols_and_left_cols_survive(spark):
    left = spark.createDataFrame([("A", 7, 42)], "k string, ts long, x long")
    right = spark.createDataFrame([("A", 3, 1.0, "v1")],
                                  "k string, ts long, a double, b string")
    row = asof_join(left, right, on="k", left_ts="ts", right_ts="ts",
                    value_cols=["a", "b"]).collect()[0]
    assert (row["k"], row["ts"], row["x"], row["a"], row["b"]) == \
        ("A", 7, 42, 1.0, "v1")


def test_range_join_buckets_and_boundaries(spark):
    events = spark.createDataFrame(
        [(1, 100), (2, 250), (3, 399), (4, 400), (5, 401), (6, 99)],
        "event_id long, ts long")
    # interval spans buckets 1..4 at width 100: must match each event
    # exactly once; boundaries inclusive both ends
    win = spark.createDataFrame([(7, 100, 400)],
                                "window_id long, s long, e long")
    got = (range_join(events, win, ts_col="ts", start_col="s",
                      end_col="e", bucket_width=100)
           .groupBy("window_id")
           .agg(F.count("*").alias("n"),
                F.collect_set("event_id").alias("ids"))
           .collect()[0])
    assert got["n"] == 4
    assert sorted(got["ids"]) == [1, 2, 3, 4]   # 99 and 401 excluded
