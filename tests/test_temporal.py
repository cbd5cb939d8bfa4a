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


def test_funnel_steps_hand_sequence(spark):
    from medcat_spark.functions.timeline import funnel_steps

    rows = [
        # u1 completes in order with the EARLIEST valid completion
        ("u1", "view", 10), ("u1", "click", 20), ("u1", "purchase", 30),
        ("u1", "click", 15),                     # earlier click also ok
        # u2: purchase BEFORE click -> stops at click stage
        ("u2", "view", 10), ("u2", "purchase", 12), ("u2", "click", 20),
        # u3: only views
        ("u3", "view", 5), ("u3", "view", 6),
        # u4: click before any view -> never enters the funnel at step2
        ("u4", "click", 1), ("u4", "view", 2), ("u4", "purchase", 3),
    ]
    ev = spark.createDataFrame(
        [(u, t, f"2024-01-01 00:00:{s:02d}") for u, t, s in rows],
        "user_id string, event_type string, ts_s string"
    ).select("user_id", "event_type",
             F.col("ts_s").cast("timestamp_ntz").alias("ts"))
    got = {r["step"]: (r["n_users"], r["avg_lag_sec"])
           for r in funnel_steps(
               ev, ["view", "click", "purchase"]).collect()}
    # step1: u1..u4 all have views; step2 needs click AFTER first view:
    # u1 (ts15), u2 (ts20); u4's click precedes its view
    assert got["1_view"][0] == 4
    assert got["2_click"][0] == 2
    # step3 needs purchase after that click: only u1 (30 > 15);
    # u2's purchase (12) precedes its click (20)
    assert got["3_purchase"][0] == 1
    assert got["3_purchase"][1] == 20.0       # 30 - first view at 10
