"""Bucketed-table co-location: a doc_id-bucketed annotations table
self-joins WITHOUT a shuffle on the join key, and the results match the
unbucketed co-occurrence operator exactly."""

from medcat_spark.config import EngineConfig
from medcat_spark.operators.bucketing import (bucketed_cooccurrence,
                                              write_annotations_bucketed)
from medcat_spark.pipeline import annotate, broadcast_model
from medcat_spark.triples import cooccurrence_triples


def test_bucketed_self_join_has_no_exchange(spark, docs_df, fixture_models):
    cdb, vocab = fixture_models
    bc = broadcast_model(spark, cdb, vocab, EngineConfig())
    ann = annotate(docs_df, bc)

    spark.sql("DROP TABLE IF EXISTS annotations_b")
    write_annotations_bucketed(ann, "annotations_b", num_buckets=8)

    cooc = bucketed_cooccurrence(spark, "annotations_b")
    plan = cooc._jdf.queryExecution().executedPlan().toString()
    # both scans read bucket files and the (doc_id, cui) distinct runs
    # with NO shuffle (bucketing on doc_id satisfies the clustering);
    # the only SHUFFLE exchange left is the final (cui_a, cui_b) agg.
    # (a BroadcastExchange may appear when AQE broadcasts the tiny test
    # side — that is not a shuffle of the bucketed data.)
    assert plan.count("Bucketed: true") == 2, plan
    n_shuffles = plan.count("Exchange hashpartitioning")
    assert n_shuffles <= 1, plan

    # identical results to the unbucketed operator
    expect = {(r["subj"], r["obj"], r["n_docs"])
              for r in cooccurrence_triples(ann).collect()}
    got = {(r["subj"], r["obj"], r["n_docs"]) for r in cooc.collect()}
    assert got == expect and got
    spark.sql("DROP TABLE IF EXISTS annotations_b")
