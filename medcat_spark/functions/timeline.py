"""Patient-level concept streams (reference
medcat/datasets/patient_concept_stream.py — the only reference dataset
module with no analogue until round 4).

The reference consumes ``{patient_id: [(cui, cnt_for_patient,
first_ts, age_years), ...]}`` (time-ordered) and generates per-patient
token streams where the patient age (in years, stringified) is injected
whenever it increases, followed by the concept CUIs
(patient_concept_stream.py:81-96) — the input format for downstream
disease-trajectory / Foresight-style models.

Spark-first shape: annotations ⨝ patient metadata, ONE groupBy
(patient, cui) with map-side partial aggregation, one groupBy patient
with ``sort_array(collect_list(struct(...)))``, and the age-marker
injection as a JVM-side ``F.aggregate`` fold over the sorted array — no
Python UDF anywhere, so the stream assembly whole-stage-codegens and
scales linearly in annotations.  At 10^12 docs the only shuffles are
the two groupBys, both keyed on (patient[, cui]) — AQE handles hot
patients.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def patient_concept_streams(ann: DataFrame, doc_meta: DataFrame) -> DataFrame:
    """Per-patient time-ordered concept stream.

    Args:
        ann: annotations with (doc_id, cui).
        doc_meta: (doc_id, patient_id, ts, age) — ts any orderable type,
            age integer years at ts.

    Returns:
        (patient_id, stream: array<struct<first_ts, cui, cnt, age>>)
        where cnt is the patient's total count for the cui, first_ts
        the first time it appears for the patient, age the patient age
        at first_ts; sorted by (first_ts, cui).
    """
    per_cui = (ann.select("doc_id", "cui")
               .join(doc_meta, "doc_id")
               .groupBy("patient_id", "cui")
               .agg(F.count(F.lit(1)).alias("cnt"),
                    F.min("ts").alias("first_ts"),
                    F.min_by("age", "ts").alias("age")))
    return (per_cui
            .groupBy("patient_id")
            .agg(F.sort_array(F.collect_list(
                F.struct("first_ts", "cui", "cnt", "age"))).alias("stream")))


def patient_stream_tokens(streams: DataFrame) -> DataFrame:
    """The reference's example generator (_generate_examples:81-96): the
    sorted stream folded into tokens, the stringified age injected each
    time it increases.  Pure ``F.aggregate`` — no UDF."""
    folded = F.aggregate(
        "stream",
        F.struct(F.array().cast("array<string>").alias("toks"),
                 F.lit(-1).alias("yr")),
        lambda acc, x: F.struct(
            F.when(x["age"] > acc["yr"],
                   F.concat(acc["toks"],
                            F.array(x["age"].cast("string"), x["cui"])))
            .otherwise(F.concat(acc["toks"], F.array(x["cui"])))
            .alias("toks"),
            F.greatest(acc["yr"], x["age"]).alias("yr")),
        lambda acc: acc["toks"])
    return streams.select("patient_id", folded.alias("stream_tokens"))


def funnel_steps(events: DataFrame, steps, user_col: str = "user_id",
                 type_col: str = "event_type",
                 ts_col: str = "ts") -> DataFrame:
    """Ordered-sequence (funnel) detection — the MATCH_RECOGNIZE-style
    pattern query: for each user, the earliest completion of
    step1 < step2 < ... < stepN (strictly increasing timestamps).
    Returns one row per step with the surviving-user count and, for
    the final step, the average seconds from first to last step.

    Set-based, no UDF, no per-user window scan: stage k is
    events-of-type-k equi-joined on user to stage k-1's frontier with
    a ts > prev filter and a min() re-aggregate — each stage is one
    hash join + one partial-aggregated groupBy, monotone-shrinking
    input, the standard scalable funnel plan."""
    steps = list(steps)
    frontier = (events.where(F.col(type_col) == steps[0])
                .groupBy(user_col)
                .agg(F.min(ts_col).alias("t1")))
    counts = [("1_" + steps[0], frontier)]
    for k, st in enumerate(steps[1:], start=2):
        nxt = (events.where(F.col(type_col) == st)
               .join(frontier, user_col)
               .where(F.col(ts_col) > F.col(f"t{k - 1}"))
               .groupBy(user_col,
                        *[f"t{j}" for j in range(1, k)])
               .agg(F.min(ts_col).alias(f"t{k}")))
        frontier = nxt
        counts.append((f"{k}_{st}", frontier))
    out = None
    last = len(steps)
    for name, df in counts:
        row = df.agg(
            F.lit(name).alias("step"),
            F.count("*").alias("n_users"),
            (F.round(F.avg(F.unix_micros(F.col(f"t{last}")
                                         .cast("timestamp"))
                           - F.unix_micros(F.col("t1")
                                           .cast("timestamp")))
                     / 1e6, 3)
             if name == counts[-1][0] and last > 1
             else F.lit(-1.0)).alias("avg_lag_sec"))
        out = row if out is None else out.unionByName(row)
    return out
