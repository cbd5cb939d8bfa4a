"""Mergeable summary structures + hierarchical rollups — the
aggregation patterns that matter at 100 TB because every one is a
map-side-combinable groupBy (partial aggregation on every executor,
tiny merged state), never a sort or a collect:

* rollup_cascade: minute→hour→day continuous aggregates where each
  level is derived from the PREVIOUS level's partials (count/sum merge
  losslessly), so refreshing a day touches 24 hour-rows, not 86M raw
  events — the hypertable continuous-aggregate shape.
* histogram_quantiles: fixed-boundary bin counts → quantile estimates
  by linear interpolation within the containing bin.  Mergeable
  (bin-count vectors add), deterministic, and exactly replayable in
  SQL — unlike sample- or t-digest-based sketches whose estimates
  depend on arrival order.
* hll_distinct: a HyperLogLog built on md5 bits (both engines compute
  identical hashes, so the estimate is bit-reproducible): bucket =
  first 8 hash bits, rank = leading zeros of the next 32 + 1, estimate
  = alpha·m²/Σ2^-rank with the small-range linear-counting correction.
  State is m=256 small ints — mergeable with MAX per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_M = 256                      # 2^8 buckets
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_RANK_BITS = 32


def rollup_cascade(events: DataFrame, ts_col: str = "ts",
                   value_col: str = "value") -> DataFrame:
    """Cascading time rollup: minute partials from raw, hours from
    minutes, days from hours — one row per (level, bucket_start) with
    n_events and sum_value.  count/sum merge losslessly, so the
    cascade equals direct aggregation at every level (the oracle
    checks exactly that)."""
    minute = (events
              .groupBy(F.date_trunc("minute", F.col(ts_col))
                       .alias("bucket"))
              .agg(F.count("*").alias("n_events"),
                   F.sum(value_col).alias("sv")))
    hour = (minute
            .groupBy(F.date_trunc("hour", "bucket").alias("bucket"))
            .agg(F.sum("n_events").alias("n_events"),
                 F.sum("sv").alias("sv")))
    day = (hour
           .groupBy(F.date_trunc("day", "bucket").alias("bucket"))
           .agg(F.sum("n_events").alias("n_events"),
                F.sum("sv").alias("sv")))
    out = None
    for name, df in (("minute", minute), ("hour", hour), ("day", day)):
        lv = df.select(F.lit(name).alias("level"), "bucket", "n_events",
                       F.round("sv", 4).alias("sum_value"))
        out = lv if out is None else out.unionByName(lv)
    return out


def histogram_quantiles(df: DataFrame, value_col: str,
                        lo: float, hi: float, n_bins: int,
                        qs=(0.5, 0.9, 0.99)) -> DataFrame:
    """Quantiles from a fixed-boundary histogram: ONE map-side-
    combinable groupBy builds the bin counts (values clamped into
    [lo, hi]), then the tiny bin relation is scanned cumulatively and
    each requested quantile is linearly interpolated inside its
    containing bin.  Estimates are deterministic and within one
    bin-width of exact."""
    from pyspark.sql import Window

    w = (hi - lo) / n_bins
    binc = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), F.floor(
        (F.col(value_col) - lo) / w).cast("int")))
    # NULL values would otherwise flow into a NULL bin that still
    # counts toward cum/total (and Spark sorts NULL bins first while
    # DuckDB sorts them last) — exclude them from the histogram
    bins = (df.where(F.col(value_col).isNotNull())
            .groupBy(binc.alias("bin")).agg(F.count("*").alias("n")))
    cum = bins.withColumn(
        "cum", F.sum("n").over(Window.orderBy("bin")
                               .rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("total", F.sum("n").over(
        Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)))
    out = None
    for q in qs:
        tgt = F.ceil(F.col("total") * q)
        hit = (cum.where(F.col("cum") >= tgt)
               .orderBy("bin").limit(1)
               .select(F.lit(float(q)).alias("q"),
                       F.round(F.lit(lo) + (F.col("bin")
                               + (tgt - (F.col("cum") - F.col("n")))
                               / F.col("n")) * w, 6).alias("estimate")))
        out = hit if out is None else out.unionByName(hit)
    return out


def _hll_parts(col):
    """(bucket, rank) from md5: first 2 hex chars = bucket, next 8 hex
    chars = a 32-bit word whose leading zeros (+1) are the rank —
    identical integer results in Spark and DuckDB."""
    h = F.md5(col.cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    word = F.conv(F.substring(h, 3, 8), 16, 10).cast("long")
    return bucket, word


def _rank_expr(word):
    # leading zeros of a 32-bit word + 1 = 33 - bit_length(word);
    # bit_length via length(bin(word)) — exact integer string op, no
    # floor(log2) float hazard across engines; word==0 -> 33
    return F.when(word == 0, HLL_RANK_BITS + 1).otherwise(
        F.lit(HLL_RANK_BITS + 1) - F.length(F.bin(word)))


def hll_distinct(df: DataFrame, col: str) -> DataFrame:
    """Bit-reproducible HyperLogLog distinct-count estimate (Flajolet
    et al. 2007): per-bucket MAX rank (mergeable), harmonic-mean
    estimate, linear-counting correction below 2.5m.  Returns one row
    (n_buckets_hit, estimate)."""
    bucket, word = _hll_parts(F.col(col))
    regs = (df.select(bucket.alias("bucket"), word.alias("word"))
            .withColumn("rank", _rank_expr(F.col("word")))
            .groupBy("bucket").agg(F.max("rank").alias("mx")))
    agg = regs.agg(
        F.count("*").alias("hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("mx"))).alias("s"))
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / (
        F.col("s") + F.lit(float(HLL_M)) - F.col("hit"))
    # linear counting when the raw estimate is small and zeros remain
    lc = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / (F.lit(float(HLL_M)) - F.col("hit")))
    est = F.when((raw <= 2.5 * HLL_M) & (F.col("hit") < HLL_M), lc) \
        .otherwise(raw)
    return agg.select(F.col("hit").alias("n_buckets_hit"),
                      F.round(est, 4).alias("estimate"))
