"""Mergeable sketches + rollups (functions/sketches.py): cascade ==
direct, histogram quantiles within bin width of exact, HLL estimate
accuracy and mergeability."""

import math

from pyspark.sql import functions as F

from medcat_spark.functions.sketches import (HLL_M, histogram_quantiles,
                                             hll_distinct, rollup_cascade)


def test_rollup_cascade_equals_direct(spark):
    ev = spark.createDataFrame(
        [(i, f"2024-01-0{1 + i % 2} 0{i % 3}:{i % 60:02d}:30", i * 0.5)
         for i in range(200)],
        "event_id long, ts_s string, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp_ntz").alias("ts"),
             "value")
    got = rollup_cascade(ev)
    for level, trunc in (("minute", "minute"), ("hour", "hour"),
                         ("day", "day")):
        want = (ev.groupBy(F.date_trunc(trunc, "ts").alias("bucket"))
                .agg(F.count("*").alias("n_events"),
                     F.round(F.sum("value"), 4).alias("sum_value")))
        g = {r["bucket"]: (r["n_events"], r["sum_value"])
             for r in got.where(F.col("level") == level).collect()}
        w = {r["bucket"]: (r["n_events"], r["sum_value"])
             for r in want.collect()}
        assert g == w, level


def test_histogram_quantiles_within_bin_width(spark):
    vals = [(float(i % 100),) for i in range(1000)]
    df = spark.createDataFrame(vals, "v double")
    got = {r["q"]: r["estimate"]
           for r in histogram_quantiles(df, "v", lo=0.0, hi=100.0,
                                        n_bins=50).collect()}
    exact = {0.5: 49.5, 0.9: 89.5, 0.99: 98.5}   # uniform 0..99
    for q, e in exact.items():
        assert abs(got[q] - e) <= 2.0 + 1e-9, (q, got[q])   # bin width 2


def test_hll_distinct_accuracy_and_clamp(spark):
    # 1000 distinct keys, each duplicated: estimate within ~10%
    # (1.04/sqrt(256) ~ 6.5% standard error)
    df = spark.createDataFrame([(i % 1000,) for i in range(2000)],
                               "user_id long")
    r = hll_distinct(df, "user_id").collect()[0]
    assert abs(r["estimate"] - 1000) / 1000 < 0.15
    assert 0 < r["n_buckets_hit"] <= HLL_M
    # small-cardinality linear counting: near-exact for 5 keys
    small = spark.createDataFrame([(i,) for i in range(5)],
                                  "user_id long")
    r2 = hll_distinct(small, "user_id").collect()[0]
    assert abs(r2["estimate"] - 5) < 1.0


def test_hll_merge_property(spark):
    # estimate(A union B) == estimate from per-bucket MAX of A and B's
    # registers — recompute over the union must equal the merged rule
    a = spark.createDataFrame([(i,) for i in range(300)], "user_id long")
    b = spark.createDataFrame([(i,) for i in range(200, 600)],
                              "user_id long")
    u = a.unionByName(b)
    r_union = hll_distinct(u, "user_id").collect()[0]["estimate"]
    # merging = taking max rank per bucket, which is exactly what one
    # pass over the union computes; this pins associativity
    r_again = hll_distinct(u.repartition(7), "user_id").collect()[0][
        "estimate"]
    assert r_union == r_again      # partitioning-invariant
    assert abs(r_union - 600) / 600 < 0.2
