"""Graph analytics over the materialized KG triples (north_star
"graph tables" consumer side): degree centrality, 2-hop neighborhoods,
and fixed-iteration PageRank over the entity co-occurrence graph.

The reference stops at emitting per-doc entity dicts; its downstream
consumers (CogStack pipelines) run exactly these queries against the
triple store.  Implemented DataFrame-first so every step is a
shuffle-aware aggregation/join Catalyst can plan:

  * degree:   one groupBy over the symmetrized edge list — map-side
    partial aggregation, no joins.
  * 2-hop:    edge⋈edge on the shared middle node + left_anti against
    direct edges.  The join key is the MIDDLE node, so hot concepts
    (the documented co-occurrence skew) are exactly the AQE skew-join
    case; `max_degree` caps the blow-up the same way the LSH
    `max_bucket_size` cap does — a node of degree d contributes d²
    paths, and production graphs prune stop-concept hubs first.
  * pagerank: the classic unnormalized update
    pr = (1-d) + d·Σ pr(in)/out_deg(in), a fixed number of
    join+groupBy rounds.  The edge table is cached once; each
    iteration's rank relation is 1 row/node (tiny next to the doc
    corpus), and lineage is cut per round with localCheckpoint like
    functions/dedup.connected_components so the plan depth stays
    constant at scale.  An undirected co-occurrence graph has no
    dangling nodes (every node has an edge), so no dangling-mass term
    is needed and the per-node values are oracle-reproducible in
    chained SQL CTEs (one per iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(cooc: DataFrame) -> DataFrame:
    """(subj, obj[, n_docs]) A<B triples → both-direction edge list.

    Explode of both directions — ONE scan of the input; the former
    two-branch union executed an uncached upstream (e.g. a live
    annotate→cooccurrence chain) twice."""
    w = F.col("n_docs") if "n_docs" in cooc.columns else F.lit(1).cast("long")
    return (cooc.select(F.explode(F.array(
        F.struct(F.col("subj").alias("src"), F.col("obj").alias("dst"),
                 w.alias("w")),
        F.struct(F.col("obj").alias("src"), F.col("subj").alias("dst"),
                 w.alias("w")))).alias("e"))
        .select("e.src", "e.dst", "e.w"))


def concept_degree(cooc: DataFrame) -> DataFrame:
    """Per-concept degree + co-occurrence-weighted degree.

    One shuffle (the groupBy), partial-aggregated map-side; linear in
    the edge count at any scale."""
    return (_symmetrize(cooc)
            .groupBy(F.col("src").alias("node"))
            .agg(F.count("*").alias("degree"),
                 F.sum("w").alias("weighted_degree")))


def two_hop_neighbors(cooc: DataFrame,
                      max_degree: int | None = None) -> DataFrame:
    """Concept pairs reachable in exactly 2 hops (not adjacent, not
    self) with the number of distinct middle concepts.

    ``max_degree`` drops hub nodes ABOVE the cap from the middle
    position before the self-join — at production scale a degree-10⁵
    stop-concept would otherwise contribute 10¹⁰ paths.  The cap is a
    first-class knob, not a silent default: None means exact."""
    edges = _symmetrize(cooc).select("src", "dst")
    a = edges.select(F.col("src").alias("node_a"), F.col("dst").alias("mid"))
    b = edges.select(F.col("src").alias("mid"), F.col("dst").alias("node_b"))
    if max_degree is not None:
        # the MIDDLE node's degree is what blows up the self-join —
        # restrict the mid position to nodes at or under the cap
        # (degree relation: 1 row/node, broadcast)
        ok = (edges.groupBy("src").agg(F.count("*").alias("d"))
              .where(F.col("d") <= max_degree)
              .select(F.col("src").alias("mid")))
        a = a.join(F.broadcast(ok), "mid")
        b = b.join(F.broadcast(ok), "mid")
    paths = (a.join(b, "mid")
             .where(F.col("node_a") < F.col("node_b"))
             .groupBy("node_a", "node_b")
             .agg(F.countDistinct("mid").alias("n_paths")))
    direct = edges.select(F.col("src").alias("node_a"),
                          F.col("dst").alias("node_b"))
    return paths.join(direct, ["node_a", "node_b"], "left_anti")


def knn_graph(cooc: DataFrame, k: int = 2) -> DataFrame:
    """Sparse concept-affinity graph: each node keeps its top-k
    strongest co-occurrence partners (by doc count, partner name as the
    deterministic tie-break), union-of-directions so the result is the
    usual mutualized kNN graph as canonical A<B triples.

    This is the standard densification guard for similarity graphs: a
    raw co-occurrence graph over a small vocabulary (or with hub
    stop-concepts) approaches completeness, where neighborhood queries
    degenerate; top-k keeps the edge count ≤ k·|V| at ANY corpus scale.
    One window (partitioned by node — map-side sortable) + one
    distinct."""
    from pyspark.sql import Window
    e = _symmetrize(cooc)
    w = Window.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst"))
    top = (e.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") <= k))
    return (top.select(F.least("src", "dst").alias("subj"),
                       F.greatest("src", "dst").alias("obj"))
            .distinct()
            .select("subj", F.lit("affinity").alias("pred"), "obj"))


def pagerank(cooc: DataFrame, iterations: int = 3,
             damping: float = 0.85, checkpoint: bool = True) -> DataFrame:
    """Fixed-iteration WEIGHTED PageRank over the undirected
    co-occurrence graph: pr₀ = 1, prₖ₊₁(v) = (1-d) + d·Σ_{u→v}
    prₖ(u)·w(u,v)/wdeg(u), where w is the co-occurrence doc count and
    wdeg the node's total outgoing weight (Xing & Ghorbani 2004 shape).
    Weighting matters: on a near-complete small-vocabulary graph the
    unweighted variant collapses to the uniform vector, while edge
    weights carry the actual concept-affinity signal.  Returned pr is
    rounded to 6 dp (oracle contract: chained per-iteration SQL CTEs).

    Shape at scale: the edge list shuffles ONCE into the (src)
    partitioning and is cached; each round is join(edges, ranks) +
    groupBy(dst) — both on the same key space, and the rank relation
    is 1 row per node.  localCheckpoint per round keeps the physical
    plan flat (same policy as dedup.connected_components); hot-concept
    in-degree skew lands on AQE's skew-join splitter."""
    edges = _symmetrize(cooc)
    wdeg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    withdeg = edges.join(wdeg, "src").cache()
    ranks = wdeg.select(F.col("src").alias("node"),
                        F.lit(1.0).alias("pr"))
    for _ in range(iterations):
        contribs = (withdeg.join(ranks, withdeg["src"] == ranks["node"])
                    .select(F.col("dst").alias("node"),
                            (F.col("pr") * F.col("w") / F.col("wdeg"))
                            .alias("c")))
        ranks = (contribs.groupBy("node")
                 .agg((F.lit(1.0 - damping)
                       + F.lit(damping) * F.sum("c")).alias("pr")))
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.round("pr", 6).alias("pr"))


def triangle_counts(cooc: DataFrame) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient
    over the undirected co-occurrence graph.

    Degree-ordered orientation (the node-iterator++ / compact-forward
    scheme): every undirected edge points from its lower-(degree, name)
    endpoint to the higher, wedges are enumerated only at each
    triangle's lowest-ordered corner, and the closing edge is matched
    with ONE equi-join back against the oriented edge list.  The
    orientation is what makes this survive hubs at scale: out-degree
    after orienting is O(sqrt(m)) no matter how skewed the raw degrees,
    so a degree-10⁵ stop-concept contributes sqrt-bounded wedges
    instead of 10¹⁰ — the same blow-up the two_hop max_degree cap
    guards, solved here without dropping any node.

    Returns EVERY node: (node, degree, n_triangles, clustering) with
    clustering = 2T / (d(d-1)) rounded to 6 dp, 0.0 when d < 2 — the
    oracle contract (values are join-order independent)."""
    und = (cooc.select(F.col("subj").alias("a"), F.col("obj").alias("b"))
           .distinct())
    deg = (_symmetrize(cooc).select("src", "dst").distinct()
           .groupBy(F.col("src").alias("node"))
           .agg(F.count("*").alias("degree")))
    # total order (degree, name) as a comparable struct; 1 row/node →
    # both rank joins broadcast under AQE
    r = deg.select("node", F.struct("degree", "node").alias("r"))
    ra = r.select(F.col("node").alias("a"), F.col("r").alias("r_a"))
    rb = r.select(F.col("node").alias("b"), F.col("r").alias("r_b"))
    lo_first = F.col("r_a") < F.col("r_b")
    oriented = (und.join(ra, "a").join(rb, "b")
                .select(F.when(lo_first, F.col("a")).otherwise(F.col("b"))
                        .alias("src"),
                        F.when(lo_first, F.col("b")).otherwise(F.col("a"))
                        .alias("dst"),
                        F.when(lo_first, F.col("r_b")).otherwise(F.col("r_a"))
                        .alias("r_dst")))
    e1 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                         F.col("r_dst").alias("r_v"))
    e2 = oriented.select(F.col("src").alias("u"), F.col("dst").alias("w"),
                         F.col("r_dst").alias("r_w"))
    wedges = (e1.join(e2, "u").where(F.col("r_v") < F.col("r_w"))
              .select("u", "v", "w"))
    close = oriented.select(F.col("src").alias("v"),
                            F.col("dst").alias("w"))
    tri = wedges.join(close, ["v", "w"])  # one row per triangle
    per_node = (tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
                .groupBy("node")
                .agg(F.count("*").alias("n_triangles")))
    t = F.coalesce(F.col("n_triangles"), F.lit(0).cast("long"))
    d = F.col("degree")
    return (deg.join(per_node, "node", "left")
            .select("node", "degree", t.alias("n_triangles"),
                    F.round(F.when(d >= 2, F.lit(2.0) * t / (d * (d - 1)))
                            .otherwise(F.lit(0.0)), 6).alias("clustering")))


def bfs_distances(cooc: DataFrame, seeds: DataFrame | None = None,
                  max_hops: int = 4) -> DataFrame:
    """Minimum hop distance from a seed set, bounded at ``max_hops``
    (BFS over the undirected co-occurrence graph) — the n-hop
    generalization of the reference's filter_by_cui 2-hop subset
    (/root/reference/medcat/cdb.py most-similar neighbourhood uses the
    same reachability notion).

    ``seeds``: DataFrame with a ``node`` column; default is the
    lexicographically smallest subject (deterministic, shared with the
    SQL oracle).  Each round is frontier ⋈ edges + one anti-join
    against the settled set; both relations are 1 row/node, so every
    round is broadcast-sized next to the edge list, and lineage is cut
    per round with localCheckpoint (connected_components policy).
    Unreached nodes are absent from the result (dist would be ∞)."""
    edges = _symmetrize(cooc).select("src", "dst").distinct()
    if seeds is None:
        seeds = cooc.select(F.min("subj").alias("node"))
    known = seeds.select("node").distinct() \
        .withColumn("dist", F.lit(0))
    frontier = known.select("node")
    for h in range(1, max_hops + 1):
        nxt = (edges.join(frontier.withColumnRenamed("node", "src"),
                          "src")
               .select(F.col("dst").alias("node")).distinct()
               .join(known.select("node"), "node", "left_anti")
               .withColumn("dist", F.lit(h))
               .localCheckpoint(eager=True))
        if not nxt.take(1):
            break
        known = known.unionByName(nxt)
        frontier = nxt.select("node")
    return known


def link_prediction(affinity: DataFrame,
                    max_degree: int | None = None) -> DataFrame:
    """KG-completion candidate scoring over a canonical A<B edge list
    (the mutual-kNN affinity graph from knn_graph): every NON-adjacent
    pair sharing ≥1 common neighbor, scored by common-neighbor count,
    Jaccard |N∩|/|N∪| and Adamic-Adar Σ 1/ln(deg(m)) (Liben-Nowell &
    Kleinberg 2003) — the classic missing-edge proposers run against
    triple stores after construction.

    Shape at scale: one symmetrize + distinct, degrees as a 1-row/node
    relation (broadcast), wedge join keyed on the MIDDLE node — the
    same skew case as two_hop_neighbors, so hot middles either hit
    AQE's skew splitter or the explicit ``max_degree`` hub cap (a
    middle of degree d emits d² wedges; capping stop-concept hubs is
    the production norm before pair generation).  Adamic-Adar is safe:
    any common neighbor has degree ≥ 2, so ln(deg) > 0."""
    e2 = (affinity.select(F.explode(F.array(
        F.struct(F.col("subj").alias("src"), F.col("obj").alias("dst")),
        F.struct(F.col("obj").alias("src"), F.col("subj").alias("dst"))))
        .alias("e")).select("e.src", "e.dst"))
    deg = e2.groupBy("src").agg(F.count("*").alias("deg"))
    if max_degree is not None:
        mid = deg.where(F.col("deg") <= max_degree)
        e2m = e2.join(F.broadcast(mid.select("src")), "src")
    else:
        e2m = e2
    # wedges keyed on the middle node: (a)-(m)-(b), a < b
    a = e2m.select(F.col("dst").alias("node_a"), F.col("src").alias("m"))
    b = e2m.select(F.col("dst").alias("node_b"), F.col("src").alias("m"))
    wedges = (a.join(b, "m")
              .where(F.col("node_a") < F.col("node_b"))
              .join(F.broadcast(deg.withColumnRenamed("src", "m")
                                .withColumnRenamed("deg", "deg_m")), "m"))
    scored = (wedges.groupBy("node_a", "node_b")
              .agg(F.count("*").alias("common_neighbors"),
                   F.sum(1.0 / F.log("deg_m")).alias("aa")))
    # drop already-adjacent pairs, attach endpoint degrees for Jaccard
    adj = affinity.select(F.col("subj").alias("node_a"),
                          F.col("obj").alias("node_b"))
    da = F.broadcast(deg.select(F.col("src").alias("node_a"),
                                F.col("deg").alias("deg_a")))
    db = F.broadcast(deg.select(F.col("src").alias("node_b"),
                                F.col("deg").alias("deg_b")))
    return (scored.join(adj, ["node_a", "node_b"], "left_anti")
            .join(da, "node_a").join(db, "node_b")
            .select("node_a", "node_b", "common_neighbors",
                    F.round(F.col("common_neighbors")
                            / (F.col("deg_a") + F.col("deg_b")
                               - F.col("common_neighbors")), 6)
                    .alias("jaccard"),
                    F.round("aa", 6).alias("adamic_adar")))


def triple_belief(disamb: DataFrame, cap: float = 0.999999) -> DataFrame:
    """Knowledge-Vault-style evidence fusion: per-document confidence
    for a concept pair = product of the two mentions' (clamped) context
    similarities, fused across documents by noisy-OR
    belief = 1 - Π_d (1 - conf_d)  (Dong et al. 2014's independent-
    evidence combiner).  Input: (doc_id, cui, sim) mention rows from
    the disambiguation stage.

    Computed as 1 - exp(Σ ln(1 - conf_d)) so the fuse is a single
    map-side-combinable aggregation — no per-pair collect, no UDF.
    conf is capped below 1 so ln stays finite; negative similarities
    clamp to 0 (no evidence, not anti-evidence)."""
    per_doc = (disamb.groupBy("doc_id", "cui")
               .agg(F.max(F.greatest(F.col("sim"), F.lit(0.0)))
                    .alias("conf")))
    a = per_doc.select("doc_id", F.col("cui").alias("cui_a"),
                       F.col("conf").alias("conf_a"))
    b = per_doc.select("doc_id", F.col("cui").alias("cui_b"),
                       F.col("conf").alias("conf_b"))
    ev = (a.join(b, "doc_id")
          .where(F.col("cui_a") < F.col("cui_b"))
          .select("cui_a", "cui_b",
                  F.least(F.col("conf_a") * F.col("conf_b"),
                          F.lit(cap)).alias("conf")))
    return (ev.groupBy("cui_a", "cui_b")
            .agg(F.count("*").alias("n_evidence"),
                 F.round(1.0 - F.exp(F.sum(F.log(1.0 - F.col("conf")))),
                         6).alias("belief"),
                 # the un-saturated evidence mass: belief rounds to 1.0
                 # once enough docs agree, -Σ ln(1-conf) never does, so
                 # it keeps certifying the per-doc confidences
                 F.round(-F.sum(F.log(1.0 - F.col("conf"))), 6)
                 .alias("neg_log_miss"))
            .select(F.concat(F.lit("cui:"), "cui_a").alias("subj"),
                    F.lit("co_occurs_with").alias("pred"),
                    F.concat(F.lit("cui:"), "cui_b").alias("obj"),
                    "n_evidence", "belief", "neg_log_miss"))


def label_propagation(affinity: DataFrame, iterations: int = 3,
                      checkpoint: bool = True) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007) over a canonical A<B edge list: every node starts as its
    own label; each round it adopts the most frequent label among its
    neighbors, ties broken by the smallest label — the deterministic
    synchronous variant, so a SQL oracle can unroll the rounds exactly
    (the classic async/random variant is not reproducible).  Unlike
    connected components (one label per connected region), LPA splits
    dense regions joined by thin bridges into separate communities.

    Shape at scale: edges symmetrized once and cached; each round is
    join(edges, labels 1-row/node) + groupBy(node, label) + one window
    over the per-node label histogram (rows = degree(node), map-side
    sortable); lineage cut per round (connected_components policy)."""
    from pyspark.sql import Window

    e2 = (affinity.select(F.explode(F.array(
        F.struct(F.col("subj").alias("src"), F.col("obj").alias("dst")),
        F.struct(F.col("obj").alias("src"), F.col("subj").alias("dst"))))
        .alias("e")).select("e.src", "e.dst").cache())
    labels = (e2.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")))
    w = Window.partitionBy("node").orderBy(F.col("n").desc(),
                                           F.col("label").asc())
    for _ in range(iterations):
        hist = (e2.join(labels.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"), "label")
                .agg(F.count("*").alias("n")))
        labels = (hist.withColumn("rn", F.row_number().over(w))
                  .where(F.col("rn") == 1)
                  .select("node", "label"))
        if checkpoint:
            labels = labels.localCheckpoint(eager=False)
    return labels


def fastrp_embeddings(cooc: DataFrame, dim: int = 8,
                      weights=(0.5, 0.5)) -> DataFrame:
    """FastRP node embeddings (Chen et al. 2019): iterated sparse
    random projection — E₀ is a deterministic sparse ±1 matrix (md5
    bits, density 1/3, the very-sparse RP of Li et al. 2006), each
    iteration propagates through the degree-normalized adjacency
    (Eₖ₊₁[v] = Σ_u w(u,v)/wdeg(u) · Eₖ[u]), and the embedding is the
    weighted sum of iterates.  Every step is an edge join + groupBy —
    no training loop, no driver state — and, because the base matrix
    comes from md5 bits both engines compute identically, the whole
    algorithm is SQL-replayable.

    Output exploded as (node, d, val) with val rounded 6 dp, one row
    per node×dimension (the oracle-hash-friendly shape)."""
    e2 = _symmetrize(cooc)
    wdeg = e2.groupBy("src").agg(F.sum("w").alias("wdeg"))
    norm = (e2.join(wdeg, "src")
            .select("src", "dst",
                    (F.col("w") / F.col("wdeg")).alias("p"))
            .cache())
    nodes = e2.select(F.col("src").alias("node")).distinct()

    def base_val(node_col, d):
        # md5(node || ':' || d) first 2 hex chars mod 6:
        # 0 -> +1, 1 -> -1, else 0   (E[v]=0, density 1/3)
        h = F.md5(F.concat(node_col, F.lit(f":{d}")))
        b = F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % 6
        return (F.when(b == 0, 1.0).when(b == 1, -1.0)
                .otherwise(0.0))

    cur = nodes.select(
        "node", *[base_val(F.col("node"), d).alias(f"x{d}")
                  for d in range(dim)])
    acc = None
    for w_k in weights:
        nxt = (norm.join(cur.withColumnRenamed("node", "src"), "src")
               .groupBy(F.col("dst").alias("node"))
               .agg(*[F.sum(F.col("p") * F.col(f"x{d}")).alias(f"x{d}")
                      for d in range(dim)])
               .localCheckpoint(eager=False))
        cur = nxt
        term = nxt.select(
            F.col("node").alias("n2"),
            *[(F.lit(w_k) * F.col(f"x{d}")).alias(f"y{d}")
              for d in range(dim)])
        if acc is None:
            acc = term.select(F.col("n2").alias("node"),
                              *[F.col(f"y{d}").alias(f"x{d}")
                                for d in range(dim)])
        else:
            acc = (acc.join(term, acc["node"] == term["n2"])
                   .select("node",
                           *[(F.col(f"x{d}") + F.col(f"y{d}"))
                             .alias(f"x{d}") for d in range(dim)]))
    exploded = acc.select(
        "node",
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("d"),
                     F.round(f"x{d}", 6).alias("val"))
            for d in range(dim)])).alias("e")
    ).select("node", F.col("e.d").alias("d"), F.col("e.val").alias("val"))
    return exploded


def transe_train(cooc: DataFrame, dim: int = 4, iterations: int = 2,
                 lr: float = 0.1, margin: float = 1.0) -> DataFrame:
    """TransE knowledge-graph embeddings (Bordes et al. 2013) trained
    IN-ENGINE with deterministic full-batch gradient descent, so the
    whole training loop is SQL-replayable (the quality-classifier
    precedent applied to graph ML):

    * init: md5-seeded vectors (val = (hexbyte % 15 - 7)/7), entities
      L2-normalized, one relation vector;
    * negatives: deterministic corruption — the tail is replaced by the
      lexicographically NEXT entity (cyclic), so both engines corrupt
      identically;
    * epoch: hinge on margin + ||h+r-t|| - ||h+r-t'||; for violating
      triples the unit-direction gradients flow to h, r, t, t'
      (distances floored at 1e-9 before division); entities
      re-normalized after each step — all as joins + groupBys over the
      exploded (name, d, val) relation, per-epoch lineage cuts.

    Returns (kind, name, d, val) rows — 'entity' rows per node×dim plus
    'relation' rows — rounded 6 dp."""
    from pyspark.sql import Window

    trip = cooc.select(F.col("subj").alias("h"), F.col("obj").alias("t"))
    ents = (trip.select(F.col("h").alias("name"))
            .unionByName(trip.select(F.col("t").alias("name")))
            .distinct())
    rk = Window.orderBy("name")
    ranked = ents.withColumn("rk", F.row_number().over(rk))
    n_ents = ranked.count()
    neg_map = ranked.select(
        F.col("name").alias("t"),
        F.col("rk").alias("_r")).join(
        ranked.select(F.col("name").alias("t_neg"),
                      F.col("rk").alias("_r2")),
        F.col("_r2") == (F.col("_r") % n_ents) + 1).select("t", "t_neg")
    trip = trip.join(F.broadcast(neg_map), "t").localCheckpoint(
        eager=True)

    dims = list(range(dim))

    def init_val(name_col, prefix):
        def one(d):
            h = F.md5(F.concat(F.lit(prefix), name_col, F.lit(f":{d}")))
            b = F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % 15
            return ((b - 7) / F.lit(7.0)).alias(f"x{d}")
        return [one(d) for d in dims]

    def normalize(df):
        nrm = F.sqrt(sum((F.col(f"x{d}") * F.col(f"x{d}") for d in dims),
                         start=F.lit(0.0)))
        return df.select(
            "name", *[(F.when(nrm == 0, F.col(f"x{d}"))
                       .otherwise(F.col(f"x{d}") / nrm)).alias(f"x{d}")
                      for d in dims])

    E = normalize(ents.select("name", *init_val(F.col("name"), "ent:")))
    R_row = (cooc.select(F.lit("cooccurs_with").alias("name")).limit(1)
             .select("name", *init_val(F.col("name"), "rel:")))

    for _ in range(iterations):
        ha = E.select(F.col("name").alias("h"),
                      *[F.col(f"x{d}").alias(f"h{d}") for d in dims])
        ta = E.select(F.col("name").alias("t"),
                      *[F.col(f"x{d}").alias(f"t{d}") for d in dims])
        na = E.select(F.col("name").alias("t_neg"),
                      *[F.col(f"x{d}").alias(f"n{d}") for d in dims])
        rv = R_row.select(*[F.col(f"x{d}").alias(f"r{d}") for d in dims])
        tr = (trip.join(F.broadcast(ha), "h").join(F.broadcast(ta), "t")
              .join(F.broadcast(na), "t_neg").crossJoin(F.broadcast(rv)))
        for d in dims:
            tr = tr.withColumn(
                f"dp{d}", F.col(f"h{d}") + F.col(f"r{d}") - F.col(f"t{d}"))
            tr = tr.withColumn(
                f"dn{d}", F.col(f"h{d}") + F.col(f"r{d}") - F.col(f"n{d}"))
        distp = F.sqrt(sum((F.col(f"dp{d}") * F.col(f"dp{d}")
                            for d in dims), start=F.lit(0.0)))
        distn = F.sqrt(sum((F.col(f"dn{d}") * F.col(f"dn{d}")
                            for d in dims), start=F.lit(0.0)))
        tr = (tr.withColumn("ap", F.greatest(distp, F.lit(1e-9)))
              .withColumn("an", F.greatest(distn, F.lit(1e-9)))
              .withColumn("act", (distp + margin > distn)
                          .cast("double")))
        for d in dims:
            tr = tr.withColumn(f"gp{d}",
                               F.col("act") * F.col(f"dp{d}") / F.col("ap"))
            tr = tr.withColumn(f"gn{d}",
                               F.col("act") * F.col(f"dn{d}") / F.col("an"))
        tr = tr.localCheckpoint(eager=False)
        # per-entity gradient sums: head gets gp-gn, tail -gp, neg +gn
        gh = tr.groupBy(F.col("h").alias("name")).agg(
            *[F.sum(F.col(f"gp{d}") - F.col(f"gn{d}")).alias(f"g{d}")
              for d in dims])
        gt = tr.groupBy(F.col("t").alias("name")).agg(
            *[F.sum(-F.col(f"gp{d}")).alias(f"g{d}") for d in dims])
        gn_ = tr.groupBy(F.col("t_neg").alias("name")).agg(
            *[F.sum(F.col(f"gn{d}")).alias(f"g{d}") for d in dims])
        grads = (gh.unionByName(gt).unionByName(gn_)
                 .groupBy("name")
                 .agg(*[F.sum(f"g{d}").alias(f"g{d}") for d in dims]))
        E = normalize(
            E.join(grads, "name", "left")
            .select("name",
                    *[(F.col(f"x{d}")
                       - lr * F.coalesce(F.col(f"g{d}"), F.lit(0.0)))
                      .alias(f"x{d}") for d in dims])
        ).localCheckpoint(eager=False)
        gr = tr.agg(*[F.sum(F.col(f"gp{d}") - F.col(f"gn{d}"))
                      .alias(f"g{d}") for d in dims])
        R_row = (R_row.crossJoin(F.broadcast(gr))
                 .select("name",
                         *[(F.col(f"x{d}") - lr * F.col(f"g{d}"))
                           .alias(f"x{d}") for d in dims])
                 .localCheckpoint(eager=False))

    def explode_kind(df, kind):
        return df.select(
            F.lit(kind).alias("kind"), "name",
            F.explode(F.array(*[
                F.struct(F.lit(d).alias("d"),
                         F.round(f"x{d}", 6).alias("val"))
                for d in dims])).alias("e")
        ).select("kind", "name", F.col("e.d").alias("d"),
                 F.col("e.val").alias("val"))

    return explode_kind(E, "entity").unionByName(
        explode_kind(R_row, "relation"))


def personalized_pagerank(cooc: DataFrame, seeds: DataFrame | None = None,
                          iterations: int = 3, damping: float = 0.85,
                          checkpoint: bool = True) -> DataFrame:
    """Personalized (seeded) PageRank — concept relatedness to a seed
    set: prₖ₊₁(v) = (1-d)·e(v) + d·Σ prₖ(u)·w/wdeg(u), where e is the
    uniform distribution over the seeds (1/|seeds| each, 0 elsewhere).
    Same join+groupBy round shape as pagerank; seeds default to the
    lexicographically smallest subject (the bfs_distances convention,
    shared with the SQL oracle)."""
    edges = _symmetrize(cooc)
    wdeg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    withdeg = edges.join(wdeg, "src").cache()
    if seeds is None:
        seeds = cooc.select(F.min("subj").alias("node"))
    seeds = seeds.select("node").distinct()
    n_seeds = seeds.count()
    # a supplied seed absent from the graph would silently dilute the
    # restart mass (e restricted to graph nodes below, but 1/n_seeds
    # counts every seed) — fail loudly instead of returning a wrong pr
    n_in_graph = seeds.join(
        wdeg.select(F.col("src").alias("node")), "node", "left_semi"
    ).count()
    if n_in_graph != n_seeds:
        raise ValueError(
            f"{n_seeds - n_in_graph} of {n_seeds} personalized-pagerank "
            "seeds are not nodes of the graph")
    e_vec = seeds.withColumn("e", F.lit(1.0 / n_seeds))
    nodes = wdeg.select(F.col("src").alias("node"))
    base = nodes.join(F.broadcast(e_vec), "node", "left") \
        .select("node", F.coalesce("e", F.lit(0.0)).alias("e"))
    ranks = base.select("node", F.col("e").alias("pr"))
    for _ in range(iterations):
        contribs = (withdeg.join(ranks, withdeg["src"] == ranks["node"])
                    .select(F.col("dst").alias("node"),
                            (F.col("pr") * F.col("w") / F.col("wdeg"))
                            .alias("c")))
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (base.join(summed, "node", "left")
                 .select("node",
                         (F.lit(1.0 - damping) * F.col("e")
                          + F.lit(damping)
                          * F.coalesce("s", F.lit(0.0))).alias("pr")))
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.round("pr", 6).alias("pr"))


def kcore(cooc: DataFrame, k: int = 2, rounds: int = 6) -> DataFrame:
    """k-core decomposition membership: iteratively peel nodes of
    degree < k until stable (``rounds`` synchronous peels — at
    diameter-bounded small graphs this converges well inside the
    default; the SQL oracle unrolls the same fixed rounds).  Returns
    the surviving (node, degree-within-core) rows.

    Each peel is one groupBy (degrees) + one semi-join (edge
    restriction) over a monotone-shrinking edge set, lineage cut per
    round."""
    edges = _symmetrize(cooc).select("src", "dst").distinct()
    for _ in range(rounds):
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.where(F.col("deg") >= k).select("src")
        edges = (edges.join(F.broadcast(keep), "src")
                 .join(F.broadcast(keep.withColumnRenamed("src", "dst")),
                       "dst")
                 .localCheckpoint(eager=False))
    return (edges.groupBy(F.col("src").alias("node"))
            .agg(F.count("*").alias("core_degree")))


def modularity(cooc: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity of a node→community assignment over the
    weighted co-occurrence graph: Q = Σ_ij [A_ij - k_i·k_j/2m]·δ(c_i,
    c_j) / 2m — the standard community-quality score.  Computed from
    the symmetric edge list as (within-community weight fraction) -
    Σ_c (community degree fraction)²: two broadcast label joins + two
    tiny aggregations, no per-community loop.  Returns one row
    (n_communities, modularity 6 dp)."""
    e2 = _symmetrize(cooc)
    la = F.broadcast(labels.select(F.col("node").alias("src"),
                                   F.col("label").alias("c_src")))
    lb = F.broadcast(labels.select(F.col("node").alias("dst"),
                                   F.col("label").alias("c_dst")))
    tagged = e2.join(la, "src").join(lb, "dst").localCheckpoint(
        eager=False)
    tm = tagged.agg(F.sum("w").cast("double").alias("two_m"))
    w_in = (tagged.where(F.col("c_src") == F.col("c_dst"))
            .agg(F.coalesce(F.sum("w"), F.lit(0)).cast("double")
                 .alias("w_in")))
    degs = (tagged.groupBy("c_src").agg(F.sum("w").alias("kc"))
            .crossJoin(F.broadcast(tm))
            .agg(F.sum(F.pow(F.col("kc") / F.col("two_m"), 2))
                 .alias("p")))
    n_comm = (labels.select("label").distinct()
              .agg(F.count("*").alias("n_communities")))
    return (n_comm.crossJoin(F.broadcast(w_in))
            .crossJoin(F.broadcast(tm))
            .crossJoin(F.broadcast(degs))
            .select("n_communities",
                    F.round(F.col("w_in") / F.col("two_m")
                            - F.col("p"), 6).alias("modularity")))


def link_prediction_auc(affinity: DataFrame,
                        holdout_mod: int = 4) -> DataFrame:
    """KG-completion evaluation: hold out a deterministic slice of the
    affinity edges (md5(subj|obj) hex % holdout_mod == 0 — both engines
    gate identically), score the remaining graph's non-adjacent pairs
    with link_prediction, and report the Adamic-Adar AUC: the fraction
    of (held-out positive, negative) pairs ranked correctly (ties at
    0.5).  One row: (n_pos, n_neg, auc) — the standard offline eval for
    missing-edge proposers.

    The AUC is the rank-sum (Mann-Whitney U) form:
    ``(Σ avg-rank of positives − n_pos(n_pos+1)/2) / (n_pos·n_neg)`` —
    algebraically identical to the pairwise comparison (every term is a
    multiple of ½, exact in doubles, so the rounded value matches the
    oracle's cross-product form bit-for-bit) but O(n log n): one
    aggregation per distinct score + one cumulative window, instead of
    materializing |pos|·|neg| rows through a CartesianProduct."""
    from pyspark.sql.window import Window

    if not 1 <= holdout_mod <= 16:
        # the gate reads ONE hex digit (0-15); a larger modulus would
        # silently behave like mod 16 (e.g. 32 holds out ~1/16)
        raise ValueError(f"holdout_mod must be in 1..16, got {holdout_mod}")
    gate = (F.conv(F.substring(
        F.md5(F.concat("subj", F.lit("|"), "obj")), 1, 1), 16, 10)
        .cast("int") % holdout_mod == 0)
    held = (affinity.where(gate)
            .select(F.col("subj").alias("node_a"),
                    F.col("obj").alias("node_b")))
    kept = affinity.where(~gate)
    scored = link_prediction(kept).select("node_a", "node_b",
                                          "adamic_adar")
    pos = scored.join(held, ["node_a", "node_b"], "left_semi") \
        .select(F.col("adamic_adar").alias("s"), F.lit(1).alias("is_pos"))
    neg = scored.join(held, ["node_a", "node_b"], "left_anti") \
        .select(F.col("adamic_adar").alias("s"), F.lit(0).alias("is_pos"))
    per_s = (pos.unionByName(neg)
             .groupBy("s")
             .agg(F.sum("is_pos").alias("np_s"), F.count("*").alias("nt_s")))
    w = (Window.orderBy("s")
         .rowsBetween(Window.unboundedPreceding, -1))
    ranked = per_s.withColumn(
        "cum_before", F.coalesce(F.sum("nt_s").over(w), F.lit(0)))
    agg = ranked.agg(
        F.sum(F.col("np_s") * (F.col("cum_before")
                               + (F.col("nt_s") + 1) / 2.0)).alias("rs"),
        F.coalesce(F.sum("np_s"), F.lit(0)).alias("n_pos"),
        F.coalesce(F.sum("nt_s"), F.lit(0)).alias("n_tot"))
    n_pos = F.col("n_pos")
    n_neg = F.col("n_tot") - n_pos
    return agg.select(
        n_pos.alias("n_pos"), n_neg.alias("n_neg"),
        F.coalesce(
            F.round((F.col("rs") - n_pos * (n_pos + 1) / 2.0)
                    / (n_pos * n_neg), 6),
            F.lit(-1.0)).alias("auc"))
