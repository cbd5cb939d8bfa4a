"""Temporal join operators Spark's API lacks as primitives: AS-OF join
and RANGE (interval-overlap) join — both staples of event-timeline
analytics (lab values vs the medication in effect, annotations vs the
model version in effect).

Spark-first shapes:

* as-of: the classic union-sort trick — tag both sides, union, ONE
  shuffle into (key) partitions, per-key ordered window carrying the
  last right-side value forward (ties: right row wins at equal ts,
  matching SQL ASOF's inclusive >=).  No join node at all, so no
  row-multiplication risk and no skew beyond the key's own volume.

* range: equi-join on a BUCKETIZED time axis — each interval explodes
  to the buckets it covers, each event maps to its single bucket, the
  join is a plain hash join on (bucket) followed by the exact overlap
  filter and a dedup.  Bucket width trades explode factor against join
  selectivity; at 100 TB you pick it near the median interval length
  so each interval lands in O(1) buckets.  This is the standard
  rewrite for inequality joins that would otherwise plan as a
  broadcast-nested-loop / cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on, left_ts: str,
              right_ts: str, value_cols) -> DataFrame:
    """For every left row, attach the right row's ``value_cols`` with
    the greatest ``right_ts`` <= ``left_ts`` within the same ``on``
    key(s); nulls when no prior right row exists.  Inclusive at equal
    timestamps (DuckDB ASOF semantics).  When several right rows share
    the same (key, right_ts), the row with the greatest value tuple
    wins — a documented deterministic tie-break (the window orderBy
    includes the value columns), so repeated runs and engines agree."""
    on = [on] if isinstance(on, str) else list(on)
    value_cols = ([value_cols] if isinstance(value_cols, str)
                  else list(value_cols))
    lt = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1))
    for c in value_cols:
        lt = lt.withColumn(f"_v_{c}", F.lit(None).cast(
            dict(right.dtypes)[c]))
    rt = right.select(
        *on, F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols])
    lcols = [c for c in lt.columns if c not in rt.columns]
    rt = rt.select(*rt.columns,
                   *[F.lit(None).cast(dict(lt.dtypes)[c]).alias(c)
                     for c in lcols])
    u = lt.select(*rt.columns).unionByName(rt.select(*rt.columns))
    w = (Window.partitionBy(*on)
         .orderBy("_ts", "_side", *[f"_v_{c}" for c in value_cols])
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in value_cols:
        u = u.withColumn(f"_v_{c}",
                         F.last(f"_v_{c}", ignorenulls=True).over(w))
    keep = [c for c in left.columns] + \
           [F.col(f"_v_{c}").alias(c) for c in value_cols]
    return u.where(F.col("_side") == 1).select(*keep)


def range_join(events: DataFrame, intervals: DataFrame, ts_col: str,
               start_col: str, end_col: str,
               bucket_width: int) -> DataFrame:
    """Inner join of events to every interval with start <= ts <= end
    (both in the same integer/epoch unit), executed as a bucketized
    equi-join: intervals explode into covering buckets, events map to
    one bucket, hash-join on the bucket, exact filter after.  Output:
    events columns + intervals columns.  Distinct-safe: an interval
    spanning multiple buckets matches each event exactly once (the
    event lives in a single bucket)."""
    ev = events.withColumn(
        "_bkt", (F.col(ts_col) / bucket_width).cast("long"))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(F.sequence(
            (F.col(start_col) / bucket_width).cast("long"),
            (F.col(end_col) / bucket_width).cast("long"))))
    joined = (ev.join(iv, "_bkt")
              .where((F.col(ts_col) >= F.col(start_col))
                     & (F.col(ts_col) <= F.col(end_col))))
    return joined.drop("_bkt")
