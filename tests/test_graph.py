"""Graph analytics over materialized co-occurrence triples
(functions/graph.py): degree, 2-hop neighborhoods, weighted PageRank —
each checked against hand-computed values on a small fixed graph, plus
structural properties (hub cap, rank-mass conservation)."""

import math

import pytest
from pyspark.sql import functions as F

from medcat_spark.functions.graph import (concept_degree, pagerank,
                                          two_hop_neighbors)

# undirected weighted graph (A<B triple convention):
#   A-B w=3, A-C w=1, B-C w=2, C-D w=4   (D is a leaf off C; A-D, B-D
#   are the non-adjacent 2-hop pairs, both through C)
EDGES = [("A", "B", 3), ("A", "C", 1), ("B", "C", 2), ("C", "D", 4)]


@pytest.fixture(scope="module")
def cooc(spark):
    return spark.createDataFrame(
        [(a, "cooccurs_with", b, n) for a, b, n in EDGES],
        "subj string, pred string, obj string, n_docs long")


def test_concept_degree(cooc):
    got = {r["node"]: (r["degree"], r["weighted_degree"])
           for r in concept_degree(cooc).collect()}
    assert got == {"A": (2, 4), "B": (2, 5), "C": (3, 7), "D": (1, 4)}


def test_two_hop_exact(cooc):
    got = {(r["node_a"], r["node_b"]): r["n_paths"]
           for r in two_hop_neighbors(cooc).collect()}
    # A-D and B-D via C only; A-B/A-C/B-C/C-D are direct (excluded)
    assert got == {("A", "D"): 1, ("B", "D"): 1}


def test_two_hop_hub_cap(cooc):
    # cap below C's degree (3) removes C from the middle position —
    # no 2-hop pairs remain (every 2-path in this graph routes via C)
    assert two_hop_neighbors(cooc, max_degree=2).count() == 0
    # cap at 3 keeps everything
    got = two_hop_neighbors(cooc, max_degree=3).count()
    assert got == 2


def _expected_pagerank(iters=3, d=0.85):
    nodes = ["A", "B", "C", "D"]
    w = {}
    for a, b, n in EDGES:
        w.setdefault(a, {})[b] = n
        w.setdefault(b, {})[a] = n
    wdeg = {u: sum(vs.values()) for u, vs in w.items()}
    pr = {u: 1.0 for u in nodes}
    for _ in range(iters):
        pr = {v: (1 - d) + d * sum(pr[u] * w[u][v] / wdeg[u]
                                   for u in w if v in w[u])
              for v in nodes}
    return pr


def test_pagerank_matches_hand_rolled(cooc):
    exp = _expected_pagerank()
    got = {r["node"]: r["pr"] for r in pagerank(cooc).collect()}
    assert set(got) == set(exp)
    for n in exp:
        assert math.isclose(got[n], round(exp[n], 6), abs_tol=1e-6), n


def test_pagerank_mass_conserved(cooc):
    # unnormalized update: total rank stays N (each node emits its full
    # rank scaled by d plus the (1-d) source) — a partitioning-invariant
    # check that the contribution join drops nothing
    total = (pagerank(cooc, iterations=4)
             .agg(F.sum("pr").alias("s")).first()["s"])
    # returned pr is rounded to 6 dp (oracle contract): 4 nodes x 5e-7
    assert math.isclose(total, 4.0, abs_tol=4e-6)


def test_pagerank_weight_sensitivity(spark):
    # C-D carries 10x the weight of A-B: D must outrank A and B even
    # though all three have degree 1 in this star-ish graph
    cooc = spark.createDataFrame(
        [("A", "cooccurs_with", "C", 1), ("B", "cooccurs_with", "C", 1),
         ("C", "cooccurs_with", "D", 10)],
        "subj string, pred string, obj string, n_docs long")
    got = {r["node"]: r["pr"] for r in pagerank(cooc).collect()}
    assert got["D"] > got["A"] and got["D"] > got["B"]


# ---------------------------------------------------------------------------
# triangle census + clustering coefficient
# ---------------------------------------------------------------------------

def test_triangle_counts_hand_graph(cooc):
    # one triangle A-B-C; D is a pendant off C
    from medcat_spark.functions.graph import triangle_counts
    got = {r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
           for r in triangle_counts(cooc).collect()}
    assert got == {"A": (2, 1, 1.0), "B": (2, 1, 1.0),
                   "C": (3, 1, round(2 * 1 / (3 * 2), 6)),
                   "D": (1, 0, 0.0)}


def test_triangle_counts_vs_bruteforce(spark):
    """Degree-ordered enumeration equals the O(n^3) definition on a
    deterministic pseudo-random graph (hash-gated edges, incl. hubs)."""
    from itertools import combinations
    from medcat_spark.functions.graph import triangle_counts
    nodes = [f"n{i:02d}" for i in range(14)]
    edges = [(a, b) for a, b in combinations(nodes, 2)
             if (hash((a, b)) & 7) < 3]            # ~3/8 density
    adj = set(edges)
    brute = {n: 0 for n in nodes}
    for x, y, z in combinations(nodes, 3):
        if {(x, y), (x, z), (y, z)} <= adj:
            for n in (x, y, z):
                brute[n] += 1
    cooc = spark.createDataFrame(
        [(a, "cooccurs_with", b, 1) for a, b in edges],
        "subj string, pred string, obj string, n_docs long")
    got = {r["node"]: r["n_triangles"]
           for r in triangle_counts(cooc).collect()}
    touched = {n for e in edges for n in e}
    assert got == {n: brute[n] for n in touched}


# ---------------------------------------------------------------------------
# bounded BFS distances
# ---------------------------------------------------------------------------

def test_bfs_distances_default_seed(cooc):
    # default seed = MIN(subj) = 'A': A0, B1, C1, D2
    from medcat_spark.functions.graph import bfs_distances
    got = {r["node"]: r["dist"] for r in bfs_distances(cooc).collect()}
    assert got == {"A": 0, "B": 1, "C": 1, "D": 2}


def test_bfs_distances_hop_bound_and_seed_set(spark, cooc):
    from medcat_spark.functions.graph import bfs_distances
    # path graph A-B, B-C, C-D seeded at D with max_hops=2: A unreachable
    path = spark.createDataFrame(
        [("A", "p", "B", 1), ("B", "p", "C", 1), ("C", "p", "D", 1)],
        "subj string, pred string, obj string, n_docs long")
    seeds = spark.createDataFrame([("D",)], "node string")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(path, seeds, max_hops=2).collect()}
    assert got == {"D": 0, "C": 1, "B": 2}
    # two seeds: distances are the min over the seed set
    seeds2 = spark.createDataFrame([("A",), ("D",)], "node string")
    got2 = {r["node"]: r["dist"]
            for r in bfs_distances(path, seeds2, max_hops=4).collect()}
    assert got2 == {"A": 0, "D": 0, "B": 1, "C": 1}


def test_link_prediction_hand_graph(spark):
    from medcat_spark.functions.graph import link_prediction

    # path graph A-B-C-D plus edge B-E: non-adjacent pairs with common
    # neighbors: (A,C) via B, (C,E) via B, (A,E) via B, (B,D) via C
    tri = spark.createDataFrame(
        [("A", "affinity", "B"), ("B", "affinity", "C"),
         ("C", "affinity", "D"), ("B", "affinity", "E")],
        "subj string, pred string, obj string")
    got = {(r["node_a"], r["node_b"]):
           (r["common_neighbors"], r["jaccard"], r["adamic_adar"])
           for r in link_prediction(tri).collect()}
    # degrees: A=1 B=3 C=2 D=1 E=1; middle degrees: B=3, C=2
    aa_b = round(1 / math.log(3), 6)
    aa_c = round(1 / math.log(2), 6)
    assert got == {
        ("A", "C"): (1, round(1 / (1 + 2 - 1), 6), aa_b),
        ("C", "E"): (1, round(1 / (2 + 1 - 1), 6), aa_b),
        ("A", "E"): (1, round(1 / (1 + 1 - 1), 6), aa_b),
        ("B", "D"): (1, round(1 / (3 + 1 - 1), 6), aa_c),
    }


def test_link_prediction_hub_cap(spark):
    from medcat_spark.functions.graph import link_prediction

    # star around H: without the cap every leaf pair is a candidate;
    # capping middle degree below 4 removes H as a wedge middle
    tri = spark.createDataFrame(
        [("H", "affinity", x) for x in ("A", "B", "C", "D")],
        "subj string, pred string, obj string")
    assert link_prediction(tri).count() == 6      # C(4,2) leaf pairs
    assert link_prediction(tri, max_degree=3).count() == 0


def test_triple_belief_noisy_or(spark):
    from medcat_spark.functions.graph import triple_belief

    # doc1: X(.8), Y(.5) -> conf .4 ; doc2: X(.9), Y(.2), Z(-.3 -> 0)
    # X,Y belief = 1-(1-.4)(1-.18) = .508; pairs with Z get conf 0
    rows = [("d1", "X", 0.8), ("d1", "Y", 0.5), ("d1", "X", 0.6),
            ("d2", "X", 0.9), ("d2", "Y", 0.2), ("d2", "Z", -0.3)]
    disamb = spark.createDataFrame(rows, "doc_id string, cui string, sim double")
    got = {(r["subj"], r["obj"]): r for r in
           triple_belief(disamb).collect()}
    xy = got[("cui:X", "cui:Y")]
    assert xy["n_evidence"] == 2
    assert abs(xy["belief"] - round(1 - 0.6 * 0.82, 6)) < 1e-9
    assert abs(xy["neg_log_miss"]
               - round(-(math.log(0.6) + math.log(0.82)), 6)) < 1e-9
    xz = got[("cui:X", "cui:Z")]
    assert xz["belief"] == 0.0 and xz["n_evidence"] == 1
    assert got[("cui:Y", "cui:Z")]["belief"] == 0.0


def test_triple_belief_saturation_cap(spark):
    from medcat_spark.functions.graph import triple_belief

    # conf product 1.0*1.0 would make ln(1-conf) = -inf without the cap
    rows = [("d%d" % i, c, 1.0) for i in range(3) for c in ("X", "Y")]
    disamb = spark.createDataFrame(rows, "doc_id string, cui string, sim double")
    r = triple_belief(disamb).collect()[0]
    assert r["belief"] == 1.0
    assert abs(r["neg_log_miss"]
               - round(-3 * math.log(1 - 0.999999), 6)) < 1e-6


def test_label_propagation_two_cliques_bridge(spark):
    from medcat_spark.functions.graph import label_propagation

    # two triangles joined by one bridge edge C-D: LPA keeps them as
    # two communities (connected components would merge them)
    tri = spark.createDataFrame(
        [("A", "affinity", "B"), ("A", "affinity", "C"),
         ("B", "affinity", "C"),
         ("D", "affinity", "E"), ("D", "affinity", "F"),
         ("E", "affinity", "F"),
         ("C", "affinity", "D")],
        "subj string, pred string, obj string")
    got = {r["node"]: r["label"]
           for r in label_propagation(tri, iterations=3).collect()}
    assert len(set(got.values())) == 2
    assert got["A"] == got["B"] == got["C"]
    assert got["D"] == got["E"] == got["F"]
    assert got["A"] != got["D"]


def test_label_propagation_matches_hand_rolled_sync(spark):
    from medcat_spark.functions.graph import label_propagation

    edges = [("A", "B"), ("B", "C"), ("C", "D"), ("B", "D")]
    tri = spark.createDataFrame(
        [(a, "affinity", b) for a, b in edges],
        "subj string, pred string, obj string")

    # independent synchronous reference: most-frequent neighbor label,
    # min-label tie-break
    from collections import Counter
    nbr = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    lab = {n: n for n in nbr}
    for _ in range(3):
        new = {}
        for n in nbr:
            c = Counter(lab[m] for m in nbr[n])
            top = max(c.values())
            new[n] = min(l for l, k in c.items() if k == top)
        lab = new
    got = {r["node"]: r["label"]
           for r in label_propagation(tri, iterations=3).collect()}
    assert got == lab


def test_fastrp_embeddings_match_numpy_reference(spark):
    import hashlib

    import numpy as np

    from medcat_spark.functions.graph import fastrp_embeddings

    edges = [("A", "B", 3), ("A", "C", 1), ("B", "C", 2), ("C", "D", 4)]
    cooc = spark.createDataFrame(
        [(a, "cooccurs_with", b, n) for a, b, n in edges],
        "subj string, pred string, obj string, n_docs long")
    got = {(r["node"], r["d"]): r["val"]
           for r in fastrp_embeddings(cooc, dim=4).collect()}

    # independent numpy recompute
    nodes = sorted({x for a, b, _ in edges for x in (a, b)})
    idx = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((4, 4))
    for a, b, w in edges:
        A[idx[a], idx[b]] += w
        A[idx[b], idx[a]] += w
    P = A / A.sum(axis=1, keepdims=True)     # row-normalized
    E0 = np.zeros((4, 4))
    for n in nodes:
        for d in range(4):
            h = hashlib.md5(f"{n}:{d}".encode()).hexdigest()
            b_ = int(h[:2], 16) % 6
            E0[idx[n], d] = 1.0 if b_ == 0 else (-1.0 if b_ == 1 else 0.0)
    # propagation: E_k+1[v] = sum_u P[u, v] * E_k[u]  ->  P.T @ E
    E1 = P.T @ E0
    E2 = P.T @ E1
    emb = 0.5 * E1 + 0.5 * E2
    for n in nodes:
        for d in range(4):
            assert abs(got[(n, d)] - round(emb[idx[n], d], 6)) < 1e-9, \
                (n, d)


def test_transe_matches_numpy_reference_and_learns(spark):
    import hashlib

    import numpy as np

    from medcat_spark.functions.graph import transe_train

    edges = [("cui:A", "cui:B"), ("cui:B", "cui:C"),
             ("cui:A", "cui:C"), ("cui:C", "cui:D")]
    cooc = spark.createDataFrame(
        [(a, "cooccurs_with", b, 1) for a, b in edges],
        "subj string, pred string, obj string, n_docs long")
    got = {(r["kind"], r["name"], r["d"]): r["val"]
           for r in transe_train(cooc, dim=4, iterations=2).collect()}

    # independent numpy recompute of the exact contract
    ents = sorted({x for e in edges for x in e})
    neg = {ents[i]: ents[(i + 1) % len(ents)] for i in range(len(ents))}
    dim, lr, margin = 4, 0.1, 1.0

    def init(prefix, name):
        v = np.zeros(dim)
        for d in range(dim):
            h = hashlib.md5(f"{prefix}{name}:{d}".encode()).hexdigest()
            v[d] = (int(h[:2], 16) % 15 - 7) / 7.0
        return v

    E = {n: init("ent:", n) for n in ents}
    for n in ents:
        nrm = np.linalg.norm(E[n])
        if nrm:
            E[n] = E[n] / nrm
    R = init("rel:", "cooccurs_with")

    def epoch(E, R):
        gE = {n: np.zeros(dim) for n in ents}
        gR = np.zeros(dim)
        for h, t in edges:
            tn = neg[t]
            dp = E[h] + R - E[t]
            dn = E[h] + R - E[tn]
            distp, distn = np.linalg.norm(dp), np.linalg.norm(dn)
            if distp + margin > distn:
                gp = dp / max(distp, 1e-9)
                gn = dn / max(distn, 1e-9)
                gE[h] += gp - gn
                gE[t] += -gp
                gE[tn] += gn
                gR += gp - gn
        E2 = {}
        for n in ents:
            v = E[n] - lr * gE[n]
            nrm = np.linalg.norm(v)
            E2[n] = v / nrm if nrm else v
        return E2, R - lr * gR

    for _ in range(2):
        E, R = epoch(E, R)
    for n in ents:
        for d in range(dim):
            assert abs(got[("entity", n, d)] - round(E[n][d], 6)) < 1e-9
    for d in range(dim):
        assert abs(got[("relation", "cooccurs_with", d)]
                   - round(R[d], 6)) < 1e-9

    # learning signal: trained embeddings separate positives from the
    # deterministic negatives better than the init does
    def sep(Emb, Rv):
        s = 0.0
        for h, t in edges:
            s += (np.linalg.norm(Emb[h] + Rv - Emb[neg[t]])
                  - np.linalg.norm(Emb[h] + Rv - Emb[t]))
        return s
    E0 = {n: init("ent:", n) for n in ents}
    for n in ents:
        nrm = np.linalg.norm(E0[n])
        if nrm:
            E0[n] = E0[n] / nrm
    assert sep(E, R) > sep(E0, init("rel:", "cooccurs_with"))


def test_personalized_pagerank_mass_concentrates_at_seed(spark, cooc):
    from medcat_spark.functions.graph import personalized_pagerank

    import numpy as np

    got = {r["node"]: r["pr"]
           for r in personalized_pagerank(cooc, iterations=3).collect()}
    assert all(v > 0 for v in got.values())

    # independent numpy recompute: pr_{k+1} = 0.15 e + 0.85 P^T pr_k
    nodes = sorted(got)
    idx = {n: i for i, n in enumerate(nodes)}
    W = np.zeros((4, 4))
    for a, b, w in EDGES:
        W[idx[a], idx[b]] += w
        W[idx[b], idx[a]] += w
    P = W / W.sum(axis=1, keepdims=True)
    e = np.zeros(4)
    e[idx["A"]] = 1.0            # seed = smallest subject
    pr = e.copy()
    for _ in range(3):
        pr = 0.15 * e + 0.85 * (P.T @ pr)
    for n in nodes:
        assert abs(got[n] - round(pr[idx[n]], 6)) < 1e-9, n

    # re-seeding moves the restart mass: D's score strictly rises
    seeds = spark.createDataFrame([("D",)], "node string")
    got_d = {r["node"]: r["pr"] for r in
             personalized_pagerank(cooc, seeds=seeds,
                                   iterations=3).collect()}
    assert got_d["D"] > got["D"]


def test_kcore_peels_tail(spark):
    from medcat_spark.functions.graph import kcore

    # triangle A-B-C with a pendant chain C-D-E: 2-core = the triangle;
    # D's degree-2 only holds while E survives, so peeling cascades
    tri = spark.createDataFrame(
        [("A", "p", "B", 1), ("A", "p", "C", 1), ("B", "p", "C", 1),
         ("C", "p", "D", 1), ("D", "p", "E", 1)],
        "subj string, pred string, obj string, n_docs long")
    got = {r["node"]: r["core_degree"]
           for r in kcore(tri, k=2, rounds=4).collect()}
    assert got == {"A": 2, "B": 2, "C": 2}


def test_modularity_two_cliques(spark):
    from medcat_spark.functions.graph import label_propagation, modularity

    # two triangles + bridge (the LPA test graph): the 2-community
    # split has the textbook positive modularity
    tri = spark.createDataFrame(
        [("A", "affinity", "B"), ("A", "affinity", "C"),
         ("B", "affinity", "C"),
         ("D", "affinity", "E"), ("D", "affinity", "F"),
         ("E", "affinity", "F"),
         ("C", "affinity", "D")],
        "subj string, pred string, obj string")
    labels = label_propagation(tri, iterations=3)
    row = modularity(tri, labels).collect()[0]
    assert row["n_communities"] == 2
    # hand computation: 2m=14, within=12, degree fractions (7/14)^2*2
    assert abs(row["modularity"] - round(12 / 14 - 2 * 0.25, 6)) < 1e-9

    # everything-in-one-community scores 0 by definition
    one = labels.select("node").withColumn("label", F.lit("x"))
    assert modularity(tri, one).collect()[0]["modularity"] == 0.0


def test_linkpred_auc_separates_perfect_graph(spark):
    from medcat_spark.functions.graph import link_prediction_auc

    # two dense 4-cliques joined by one bridge: any held-out intra-
    # clique edge gets high common-neighbor support on the kept graph,
    # cross-clique candidates get none -> positives outrank negatives
    cl1 = ["A", "B", "C", "D"]
    cl2 = ["E", "F", "G", "H"]
    from itertools import combinations
    edges = (list(combinations(cl1, 2)) + list(combinations(cl2, 2))
             + [("D", "E"), ("A", "H")])   # two bridges: candidates on
    aff = spark.createDataFrame(           # both sides of the gate
        [(a, "affinity", b) for a, b in edges],
        "subj string, pred string, obj string")
    row = link_prediction_auc(aff, holdout_mod=4).collect()[0]
    assert row["n_pos"] == 4 and row["n_neg"] == 4
    assert row["auc"] == 0.75       # held intra-clique edges outrank
                                    # the cross-clique candidates


def test_linkpred_auc_empty_holdout_sentinel(spark):
    from medcat_spark.functions.graph import link_prediction_auc

    # a 3-path: whichever side the gate lands on, pos or neg can be
    # empty; the sentinel path must not crash and must flag -1.0 when
    # the AUC is undefined (empty cross product)
    aff = spark.createDataFrame(
        [("A", "affinity", "B")], "subj string, pred string, obj string")
    row = link_prediction_auc(aff, holdout_mod=4).collect()[0]
    assert row["auc"] == -1.0       # nothing scorable on a single edge


def test_linkpred_auc_no_cartesian_plan(spark):
    """The rank-sum AUC must plan without a pos x neg cross product
    (the pre-r6 shape materialized |pos|*|neg| rows)."""
    from itertools import combinations

    from medcat_spark.functions.graph import link_prediction_auc

    cl1 = ["A", "B", "C", "D"]
    cl2 = ["E", "F", "G", "H"]
    edges = (list(combinations(cl1, 2)) + list(combinations(cl2, 2))
             + [("D", "E"), ("A", "H")])
    aff = spark.createDataFrame(
        [(a, "affinity", b) for a, b in edges],
        "subj string, pred string, obj string")
    plan = (link_prediction_auc(aff, holdout_mod=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
