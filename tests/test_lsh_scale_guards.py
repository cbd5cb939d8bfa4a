"""LSH scale guards (VERDICT r01 item 8): multi-probe ANN recall vs the
exact baseline, and the mega-bucket cap on LSH candidate pairs."""

import numpy as np
import pytest

from medcat_spark.functions import dedup as ddp
from medcat_spark.functions import similarity as simf
from medcat_spark.functions.similarity import probe_buckets


def test_probe_buckets_hamming_sets():
    assert probe_buckets("1010", 0) == ["1010"]
    p1 = probe_buckets("1010", 1)
    assert "1010" in p1 and len(p1) == 5
    assert set(p1) == {"1010", "0010", "1110", "1000", "1011"}
    assert len(probe_buckets("1010", 2)) == 1 + 4 + 6


@pytest.fixture(scope="module")
def clustered_embeddings(spark):
    rng = np.random.RandomState(7)
    centers = rng.uniform(-1, 1, (10, 8))
    rows = []
    for i in range(300):
        c = centers[i % 10]
        v = c + rng.normal(0, 0.15, 8)
        rows.append((i, [float(x) for x in v], f"c{i % 10}"))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string")


def test_multiprobe_recall_beats_single_probe(spark, clustered_embeddings):
    emb = clustered_embeddings.cache()
    qv = emb.where("vec_id = 0").first()["embedding"]
    exact = {r["vec_id"] for r in
             simf.cosine_topk(emb, qv, k=20).collect()}

    def recall(n_flips):
        got = {r["vec_id"] for r in simf.cosine_topk_lsh(
            emb, qv, k=20, probe_dims=4, n_flips=n_flips).collect()}
        return len(got & exact) / len(exact)

    r0, r1, r2 = recall(0), recall(1), recall(2)
    assert r1 >= r0
    assert r2 >= r1
    assert r1 >= 0.9, (r0, r1, r2)
    # full-probe degenerates to exact
    assert recall(4) == 1.0
    emb.unpersist()


def test_pairwise_lsh_covers_high_sim_pairs(spark, clustered_embeddings):
    emb = clustered_embeddings
    exact = {(r["id_a"], r["id_b"]) for r in simf.pairwise_cosine_within(
        emb.selectExpr("vec_id", "embedding", "'all' AS g"), "g",
        min_sim=0.95).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in simf.pairwise_cosine_lsh(
        emb, probe_dims=4, n_flips=1, min_sim=0.95).collect()}
    assert lsh <= exact  # never invents pairs
    assert exact, "fixture must produce high-sim pairs"
    assert len(lsh & exact) / len(exact) >= 0.9, \
        (len(lsh), len(exact))


def test_lsh_bucket_cap_drops_mega_bucket(spark):
    # 40 identical docs -> one mega-bucket (780 pairs uncapped);
    # 3 distinct near-dup docs stay pairable
    rows = [(str(i), "the same boilerplate text repeated") for i in range(40)]
    rows += [("d90", "alpha beta gamma delta"),
             ("d91", "alpha beta gamma delta"),
             ("d92", "unrelated content entirely different")]
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    uncapped = ddp.lsh_candidate_pairs(docs).count()
    capped = ddp.lsh_candidate_pairs(docs, max_bucket_size=10)
    rows_c = capped.collect()
    assert uncapped >= 40 * 39 // 2
    # mega-bucket skipped entirely; the small bucket survives
    pairs = {(r["doc_a"], r["doc_b"]) for r in rows_c}
    assert ("d90", "d91") in pairs
    assert all(not (a.isdigit() and b.isdigit()) for a, b in pairs)
    # the exact-dup pass still catches the identical docs
    groups = ddp.exact_dup_groups(docs)
    mega = [r for r in groups.collect() if r["group_size"] == 40]
    assert len(mega) == 40


def test_ivf_topk_recall(spark, clustered_embeddings):
    emb = clustered_embeddings.cache()
    qv = emb.where("vec_id = 0").first()["embedding"]
    exact = {r["vec_id"] for r in simf.cosine_topk(emb, qv, k=20).collect()}

    def recall(n_probe):
        got = {r["vec_id"] for r in simf.cosine_topk_ivf(
            emb, qv, k=20, n_centroids=10, n_probe=n_probe,
            train_sample=300).collect()}
        return len(got & exact) / len(exact)

    r1, r2 = recall(1), recall(2)
    assert r2 >= r1
    assert r2 >= 0.9, (r1, r2)
    # probing all clusters degenerates to exact
    assert recall(10) == 1.0
    emb.unpersist()


def test_kmeans_centroids_deterministic():
    import numpy as np

    from medcat_spark.functions.similarity import kmeans_centroids
    rng = np.random.RandomState(1)
    X = rng.uniform(-1, 1, (100, 8))
    a = kmeans_centroids(X, 4, seed=7)
    b = kmeans_centroids(list(X), 4, seed=7)
    assert np.array_equal(a, b)
    assert a.shape == (4, 8)


def test_ivf_partitioned_probe_prunes_partitions(spark, clustered_embeddings,
                                                 tmp_path):
    """write_ivf_partitioned + cosine_topk_ivf_pruned: the probe reads
    only the probed clusters' partition directories (PartitionFilters on
    the cluster column, fewer input files) and returns exactly what the
    recompute-per-query path returns."""
    import numpy as np

    emb = clustered_embeddings.cache()
    qv = emb.where("vec_id = 0").first()["embedding"]
    sample = [r["embedding"] for r in
              emb.orderBy("vec_id").limit(300).collect()]
    cen = simf.kmeans_centroids(np.asarray(sample), 10, seed=7)

    path = str(tmp_path / "ivf_idx")
    simf.write_ivf_partitioned(emb, cen, path)

    pruned = simf.cosine_topk_ivf_pruned(spark, path, qv, cen, k=20,
                                         n_probe=2)
    # plan: the cluster filter is a PARTITION filter, not a data filter
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cluster" in plan, plan
    # pruning is real: rows actually scanned come ONLY from the probed
    # clusters' directories (input_file_name reflects post-pruning scan)
    from pyspark.sql import functions as F
    probes = [int(i) for i in np.argsort(
        np.round(((cen - np.asarray(qv, dtype=np.float64)) ** 2)
                 .sum(axis=1), 9), kind="stable")[:2]]
    scanned_dirs = {f.split("ivf_cluster=")[1].split("/")[0]
                    for f in (r[0] for r in spark.read.parquet(path)
                              .where(F.col("ivf_cluster").isin(probes))
                              .select(F.input_file_name())
                              .distinct().collect())}
    all_dirs = {r["ivf_cluster"] for r in spark.read.parquet(path)
                .select("ivf_cluster").distinct().collect()}
    assert scanned_dirs == {str(p) for p in probes}
    assert len(all_dirs) > len(probes)

    # identical results to the per-query assignment path
    expect = [(r["vec_id"], r["sim"]) for r in
              simf.cosine_topk_ivf(emb, qv, k=20, centroids=cen,
                                   n_probe=2).collect()]
    got = [(r["vec_id"], r["sim"]) for r in pruned.collect()]
    assert got == expect and got
    emb.unpersist()


def test_pairwise_within_group_size_guard(spark):
    """max_group_size drops mega-groups from the quadratic all-pairs
    path (LSH max_bucket_size analogue); small groups are unaffected."""
    rows = [(f"m{i}", "mega", [1.0, 0.0, 0.0]) for i in range(20)]
    rows += [("s1", "small", [0.0, 1.0, 0.0]), ("s2", "small", [0.0, 1.0, 0.1])]
    df = spark.createDataFrame(
        rows, "vec_id string, label string, embedding array<double>")
    uncapped = simf.pairwise_cosine_within(df, "label", min_sim=0.5)
    capped = simf.pairwise_cosine_within(df, "label", min_sim=0.5,
                                         max_group_size=10)
    assert uncapped.count() == 20 * 19 // 2 + 1
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {("s1", "s2")}
