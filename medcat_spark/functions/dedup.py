"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Spark-first design notes (100 TB posture):
  * everything below is built-in expressions (JVM, codegen) — no Python;
  * MinHash signatures are ONE groupBy over exploded shingles with N
    min() aggregates (map-side partial agg does the heavy lifting);
  * LSH candidate generation is a self-equi-join on band values — a
    shuffle join on a high-cardinality key, AQE-skew-safe;
  * verified Jaccard joins only candidate pairs, never the full corpus
    cross-product.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: every doc with its group size and
    rank (rank 1 = keeper)."""
    fp = docs.select("doc_id", F.md5(F.col(text_col)).alias("fp"))
    from pyspark.sql.window import Window
    w = Window.partitionBy("fp")
    return (fp
            .withColumn("group_size", F.count("*").over(w))
            .withColumn("dup_rank", F.row_number().over(
                w.orderBy(F.col("doc_id"))).cast("long")))


def shingles(docs: DataFrame, k: int = 3, text_col: str = "text",
             distinct: bool = True) -> DataFrame:
    """(doc_id, shingle): distinct k-gram token shingles, space-joined.

    Docs shorter than k tokens contribute their whole text as the single
    shingle so they still participate in signatures.

    ``distinct=False`` skips the dedup shuffle for consumers whose
    aggregate is duplicate-invariant (MinHash: min() over a multiset
    equals min() over its set) — set semantics (Jaccard) need the
    default.
    """
    arr = F.split(F.col(text_col), " ")
    n = F.size(arr)
    # O(n) shifted-array zip (k-1 zips per doc) instead of n slices per
    # doc (O(n^2) interpreted higher-order exprs — 10x slower measured)
    sh = arr
    for i in range(1, k):
        shifted = F.slice(arr, i + 1, n - i)
        sh = F.zip_with(sh, shifted,
                        lambda x, y: F.concat_ws(" ", x, y))
    sh = F.slice(sh, 1, F.greatest(n - (k - 1), F.lit(0)))
    sh = F.when(n >= k, sh).otherwise(F.array(F.col(text_col)))
    out = docs.select("doc_id", F.explode(sh).alias("shingle"))
    return out.distinct() if distinct else out


def minhash_signatures(docs: DataFrame, k: int = 3, n_hashes: int = 4,
                       text_col: str = "text",
                       sh: Optional[DataFrame] = None) -> DataFrame:
    """(doc_id, h0..h{n-1}): MinHash via min(md5(seed || ':' || shingle)).

    md5 hex strings order lexicographically, so min() over them is a
    valid min-hash; md5 is identical across engines, which makes the
    signatures oracle-checkable bit-for-bit.  ``sh`` lets a composite
    (dedup_clusters) reuse one cached shingle relation across stages.
    """
    if sh is None:
        # no distinct: min(md5) is duplicate-invariant, so the dedup
        # shuffle before the signature groupBy is pure overhead
        sh = shingles(docs, k, text_col, distinct=False)
    aggs = [F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle"))))
            .alias(f"h{j}") for j in range(n_hashes)]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(docs: DataFrame, k: int = 3, n_hashes: int = 4,
                        bands: int = 2, text_col: str = "text",
                        max_bucket_size: int | None = None,
                        sh: Optional[DataFrame] = None) -> DataFrame:
    """(doc_a, doc_b, band): pairs sharing at least one LSH band bucket.

    Band value = md5 of the band's concatenated signature rows.

    ``max_bucket_size`` guards the self-join against degenerate
    mega-buckets (boilerplate / empty docs hashing identically):
    buckets larger than the cap are dropped BEFORE the join, turning a
    quadratic blow-up into a skipped bucket.  At 100 TB a 1M-doc bucket
    would otherwise emit 5·10^11 pairs from one partition; capped, those
    docs are handled by the exact-dup pass (identical text ⇒
    exact_dup_groups catches them far cheaper than pair enumeration).
    """
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    sig = minhash_signatures(docs, k, n_hashes, text_col, sh=sh)
    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.md5(F.concat(*[F.col(f"h{b * rows + r}")
                                  for r in range(rows)])).alias("bucket"))
        for b in range(bands)]
    buckets = (sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bb"))
               .select("doc_id", F.col("bb.band").alias("band"),
                       F.col("bb.bucket").alias("bucket")))
    if max_bucket_size is not None:
        oversized = (buckets.groupBy("band", "bucket")
                     .agg(F.count("*").alias("n"))
                     .where(F.col("n") > max_bucket_size)
                     .select("band", "bucket"))
        buckets = buckets.join(oversized, ["band", "bucket"], "left_anti")
    a = buckets.alias("a")
    b = buckets.alias("b")
    # no trailing distinct: each doc holds exactly ONE bucket per band,
    # so a (doc_a, doc_b, band) row can only be produced once by the
    # equi-join — the dedup was a no-op shuffle of the pair set
    return (a.join(b, ["band", "bucket"])
            .where(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"), "band"))


def ngram_jaccard_pairs(docs: DataFrame, k: int = 3,
                        group_col: Optional[str] = "source",
                        min_jaccard: float = 0.0,
                        text_col: str = "text") -> DataFrame:
    """(doc_a, doc_b, inter, size_a, size_b, jaccard) over doc pairs
    within the same ``group_col`` (blocking key to avoid the full
    cross-product; pass candidate pairs from LSH for the unblocked path).
    """
    sh = shingles(docs, k, text_col)
    if group_col:
        sh = sh.join(docs.select("doc_id", group_col), "doc_id")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("size"))
    a = sh.alias("a")
    b = sh.alias("b")
    on = [F.col("a.shingle") == F.col("b.shingle")]
    if group_col:
        on.append(F.col(f"a.{group_col}") == F.col(f"b.{group_col}"))
    inter = (a.join(b, on)
             .where(F.col("a.doc_id") < F.col("b.doc_id"))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("inter")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("size").alias("size_b"))
    j = (inter.join(sa, "doc_a").join(sb, "doc_b")
         .withColumn("jaccard", F.round(
             F.col("inter") /
             (F.col("size_a") + F.col("size_b") - F.col("inter")), 6)))
    return j.where(F.col("jaccard") >= min_jaccard) \
            .select("doc_a", "doc_b", "inter", "size_a", "size_b", "jaccard")


def jaccard_on_pairs(docs: DataFrame, pairs: DataFrame, k: int = 3,
                     min_jaccard: float = 0.0,
                     text_col: str = "text",
                     sh: Optional[DataFrame] = None) -> DataFrame:
    """(doc_a, doc_b, jaccard) for exactly the CANDIDATE pairs given —
    the verify stage of LSH dedup.  Work is bounded by
    |pairs| x shingles-per-doc, never the corpus cross-product: the
    shingle join fans out only rows that came in as candidates.
    """
    if sh is None:
        sh = shingles(docs, k, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("size"))
    pa = pairs.select("doc_a", "doc_b").distinct()
    inter = (pa
             .join(sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
             .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
                   ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter")))
    if min_jaccard > 0.0:
        # zero-intersection pairs have jaccard 0 < min_jaccard and can
        # never survive the filter — skip the candidate left join that
        # only exists to emit their 0.0 rows
        base = inter
    else:
        base = (pa.join(inter, ["doc_a", "doc_b"], "left")
                .na.fill({"inter": 0}))
    j = (base
         .join(sizes.select(F.col("doc_id").alias("doc_a"),
                            F.col("size").alias("size_a")), "doc_a")
         .join(sizes.select(F.col("doc_id").alias("doc_b"),
                            F.col("size").alias("size_b")), "doc_b")
         .withColumn("jaccard", F.round(
             F.col("inter") /
             (F.col("size_a") + F.col("size_b") - F.col("inter")), 6)))
    return (j.where(F.col("jaccard") >= min_jaccard)
            .select("doc_a", "doc_b", "jaccard"))


def connected_components(pairs: DataFrame, src: str = "doc_a",
                         dst: str = "doc_b",
                         max_iter: int = 25,
                         driver_edge_limit: int = 200_000) -> DataFrame:
    """(doc_id, component) for every node in ``pairs``; component = the
    MINIMUM node id reachable through the pair graph (duplicate-cluster
    canonical id).

    Distributed min-label propagation with pointer jumping: each round
    every node takes the least of (its label, its neighbours' labels,
    its label's label).  The third term — treating the current labelling
    as extra edges — is classic pointer doubling, so convergence is
    O(log diameter) rounds instead of O(diameter); near-dup clusters
    are dense (diameter 2-3) so 2-3 rounds is typical.  Each round is
    two shuffles on the LABEL relation (one row per node — tiny next to
    the corpus), lineage truncated per round with localCheckpoint, and
    the driver only ever sees a changed-row COUNT, never data.  This is
    the standard alternating-algorithm shape for MapReduce connected
    components (Kiveris et al., "Connected Components in MapReduce and
    Beyond") restricted to min-propagation, which suffices at dedup
    diameters.
    """
    # symmetrize with ONE scan of ``pairs`` (explode of both
    # directions), not a two-branch union: the union shape executed the
    # whole upstream candidate+verify chain twice — measured 43 s vs
    # 27 s for the full dedup at the 10x corpus.  No distinct here:
    # directions cannot collide while doc_a < doc_b, union-find is
    # idempotent under duplicates, and the distributed loop dedups once
    # before iterating.
    edges = (pairs.select(F.explode(F.array(
        F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
        F.struct(F.col(dst).alias("u"), F.col(src).alias("v"))))
        .alias("e"))
        .select("e.u", "e.v")
        .localCheckpoint())
    # Small-graph fast path: after Jaccard verification the duplicate
    # graph is usually a sparse set of small clusters.  Below the gate
    # (default 200k directed edges ≈ a few MB) a driver union-find
    # replaces ~4 Spark jobs PER ROUND of the distributed loop — at
    # bench scale that is most of the operator's wall-clock, all of it
    # scheduling latency, not compute.  The gate keeps the distributed
    # O(log d) pointer-jumping loop for corpus-scale graphs; both paths
    # produce the identical min-reachable-node labelling.
    n_edges = edges.count()
    if n_edges <= driver_edge_limit:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]   # path halving
                x = parent[x]
            return x

        for row in edges.collect():
            u, v = row["u"], row["v"]
            for n in (u, v):
                if n not in parent:
                    parent[n] = n
            ru, rv = find(u), find(v)
            if ru != rv:
                # union by MIN id so the root IS the component label
                lo, hi = (ru, rv) if ru < rv else (rv, ru)
                parent[hi] = lo
        rows = [(n, find(n)) for n in parent]
        spark = pairs.sparkSession
        schema = edges.select(F.col("u").alias("doc_id"),
                              F.col("v").alias("component")).schema
        return spark.createDataFrame(rows, schema)
    edges = edges.distinct().localCheckpoint()
    # seed each label with min(node, min neighbour): the first
    # neighbour-propagation round fused into the init aggregation (one
    # groupBy instead of a distinct + a full loop round; every node
    # appears as ``u`` because edges are symmetric).  Same fixed point —
    # labels only ever decrease toward the component minimum.
    labels = (edges.groupBy("u")
              .agg(F.least(F.col("u"), F.min("v")).alias("label"))
              .select(F.col("u").alias("node"), "label")
              .localCheckpoint())
    for _ in range(max_iter):
        nbr = (edges.join(labels.withColumnRenamed("node", "v"), "v")
               .groupBy(F.col("u").alias("node"))
               .agg(F.min("label").alias("nbr_label")))
        hop = labels.select(F.col("node").alias("jl_node"),
                            F.col("label").alias("jl_parent"))
        # the changed flag rides inside the checkpointed relation, so
        # convergence detection is a scan of cached partitions instead
        # of an extra join job per round
        new = (labels
               .join(nbr, "node", "left")
               .join(hop, F.col("label") == F.col("jl_node"), "left")
               .select("node", F.least(
                   "label",
                   F.coalesce("nbr_label", "label"),
                   F.coalesce("jl_parent", "label")).alias("new_label"),
                   F.col("label").alias("old_label"))
               .select("node", F.col("new_label").alias("label"),
                       (F.col("new_label") != F.col("old_label"))
                       .alias("changed"))
               .localCheckpoint())
        changed = new.where("changed").count()
        labels = new.drop("changed")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"),
                         F.col("label").alias("component"))


def dedup_clusters(docs: DataFrame, k: int = 3, n_hashes: int = 4,
                   bands: int = 2, min_jaccard: float = 0.2,
                   text_col: str = "text",
                   max_bucket_size: int | None = None) -> DataFrame:
    """End-to-end fuzzy-dedup: (doc_id, cluster_id, cluster_size,
    is_keeper) for EVERY doc.  LSH candidates -> Jaccard verify ->
    connected components -> canonical keeper (min doc_id per cluster).

    This is the operator a 100 TB training-data pipeline actually runs:
    pairs alone don't dedup (near-dup is transitive only through
    clustering), and the keeper flag is the drop decision.  Docs in no
    verified pair form singleton clusters of themselves.
    """
    # ONE shingle pass feeds signature building, verify intersections,
    # and sizes (3x shingle recompute measured as the composite's cost
    # driver at sf0.1); localCheckpoint = cache + lineage cut, released
    # after the components materialize
    sh = shingles(docs, k, text_col).localCheckpoint()
    cand = lsh_candidate_pairs(docs, k, n_hashes, bands, text_col,
                               max_bucket_size=max_bucket_size, sh=sh)
    verified = jaccard_on_pairs(docs, cand, k, min_jaccard, text_col, sh=sh)
    comp = connected_components(verified)
    # cluster sizes come from the COMPONENT relation, not a window over
    # the whole corpus: every member of a multi-doc cluster is in
    # ``comp`` (it has an edge), so docs absent from comp are exactly
    # the singletons (size 1).  One tiny groupBy + join on comp
    # replaces a full-corpus cluster_id shuffle.
    csize = comp.groupBy("component").agg(F.count("*").alias("_csize"))
    cmap = comp.join(csize, "component")
    return (docs.select("doc_id")
            .join(cmap, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("component", F.col("doc_id"))
                    .alias("cluster_id"),
                    F.coalesce("_csize", F.lit(1).cast("long"))
                    .alias("cluster_size"))
            .withColumn("is_keeper",
                        F.col("doc_id") == F.col("cluster_id")))


def simhash32(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 32-bit SimHash over tokens (duplicates count).

    Token hash = engine-portable ``conv(substr(md5(t),1,8),16,10)``;
    simhash bit b = 1 iff more tokens set bit b than not (ties -> 0).
    One explode + one groupBy with 32 conditional sums — map-side
    partial aggregation keeps the shuffle tiny (one row per doc).
    """
    # hash projected BEFORE the groupBy: referencing the md5 expression
    # inside all 32 aggregates would evaluate it per aggregate
    t = (docs.select("doc_id",
                     F.explode(F.split(F.col(text_col), " ")).alias("tok"))
         .select("doc_id",
                 F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10)
                 .cast("long").alias("hv")))
    hv = F.col("hv")
    aggs = [F.sum(F.when(F.shiftright(hv, b) % 2 == 1, 1).otherwise(-1))
            .alias(f"b{b}") for b in range(32)]
    g = t.groupBy("doc_id").agg(*aggs)
    sim = None
    for b in range(32):
        term = F.when(F.col(f"b{b}") > 0,
                      F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return g.select("doc_id", sim.alias("simhash"))


def lsh_bucket_index(docs: DataFrame, k: int = 3, n_hashes: int = 4,
                     bands: int = 2, text_col: str = "text",
                     sh: Optional[DataFrame] = None) -> DataFrame:
    """(band, bucket, doc_id): the corpus's LSH bucket membership — the
    persistent index incremental dedup probes.  Write it partitioned by
    ``band`` (2-4 partitions of ~n_docs rows each) next to the cluster
    table; a daily ingest then joins ONLY its new docs' buckets against
    it instead of re-shingling the historical corpus.
    """
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    sig = minhash_signatures(docs, k, n_hashes, text_col, sh=sh)
    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.md5(F.concat(*[F.col(f"h{b * rows + r}")
                                  for r in range(rows)])).alias("bucket"))
        for b in range(bands)]
    return (sig.select("doc_id",
                       F.explode(F.array(*band_cols)).alias("bb"))
            .select(F.col("bb.band").alias("band"),
                    F.col("bb.bucket").alias("bucket"), "doc_id"))


def assign_to_clusters(new_docs: DataFrame, index: DataFrame,
                       clusters: DataFrame, corpus: DataFrame,
                       k: int = 3, n_hashes: int = 4, bands: int = 2,
                       min_jaccard: float = 0.2,
                       text_col: str = "text") -> DataFrame:
    """Incremental dedup: place NEW documents into an EXISTING
    clustering without re-clustering the corpus.

    ``index``    — (band, bucket, doc_id) from :func:`lsh_bucket_index`
    ``clusters`` — (doc_id, cluster_id, ...) from :func:`dedup_clusters`
    ``corpus``   — the historical (doc_id, text) table (only candidate
                   matches' shingles are recomputed, via semi-join)

    Each new doc LSH-probes the index; candidate (new, old) pairs are
    Jaccard-verified (bounded by bucket membership), and a verified
    match adopts the matched doc's cluster_id (min cluster over matches
    — deterministic).  Unmatched new docs become their own clusters.
    New docs are NOT matched against each other here — run
    dedup_clusters on the batch first if intra-batch duplication
    matters (daily batches are corpus-fraction-sized, so the
    corpus-probe dominates).

    → (doc_id, cluster_id, is_new_cluster) for the NEW docs only.
    """
    new_sh = shingles(new_docs, k, text_col).localCheckpoint()
    new_buckets = lsh_bucket_index(new_docs, k, n_hashes, bands,
                                   text_col, sh=new_sh)
    cand = (new_buckets.alias("n")
            .join(index.alias("i"), ["band", "bucket"])
            .select(F.col("n.doc_id").alias("doc_a"),
                    F.col("i.doc_id").alias("doc_b"))
            .where(F.col("doc_a") != F.col("doc_b"))
            .distinct())
    # shingles for exactly the matched old docs (semi-join keeps the
    # historical scan candidate-bounded)
    old_ids = cand.select(F.col("doc_b").alias("doc_id")).distinct()
    old_sh = shingles(corpus.join(old_ids, "doc_id"), k, text_col)
    sizes_new = new_sh.groupBy("doc_id").agg(F.count("*").alias("size"))
    sizes_old = old_sh.groupBy("doc_id").agg(F.count("*").alias("size"))
    inter = (cand
             .join(new_sh.withColumnRenamed("doc_id", "doc_a"), "doc_a")
             .join(old_sh.select(F.col("doc_id").alias("doc_b"),
                                 "shingle"), ["doc_b", "shingle"])
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter")))
    verified = (inter
                .join(sizes_new.select(F.col("doc_id").alias("doc_a"),
                                       F.col("size").alias("size_a")),
                      "doc_a")
                .join(sizes_old.select(F.col("doc_id").alias("doc_b"),
                                       F.col("size").alias("size_b")),
                      "doc_b")
                .where(F.col("inter")
                       / (F.col("size_a") + F.col("size_b")
                          - F.col("inter")) >= min_jaccard))
    adopted = (verified
               .join(clusters.select(F.col("doc_id").alias("doc_b"),
                                     "cluster_id"), "doc_b")
               .groupBy(F.col("doc_a").alias("doc_id"))
               .agg(F.min("cluster_id").alias("cluster_id")))
    return (new_docs.select("doc_id")
            .join(adopted, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
                    F.col("cluster_id").isNull().alias("is_new_cluster")))


def paragraph_dedup(docs: DataFrame, sep: str = "\n",
                    text_col: str = "text") -> DataFrame:
    """Cross-document duplicate-passage removal at paragraph
    granularity (the scalable approximation of Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" — their
    ExactSubstr dedup drops repeated spans wherever they recur; Dolma /
    RefinedWeb apply it at paragraph level exactly like this): every
    paragraph keeps only its FIRST occurrence corpus-wide (min
    (doc_id, position) wins, deterministic), later occurrences are
    dropped and each doc's text is rebuilt from its surviving
    paragraphs in order.

    Scale shape: one shuffle keyed by paragraph hash (the window — the
    payload is (hash, doc_id, pos) plus the paragraph once), one
    groupBy(doc_id) to rebuild.  Both partition cleanly; no driver
    state.  Returns (doc_id, clean_text, n_paras, n_dropped).
    """
    from pyspark.sql.window import Window

    paras = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"))
    w = Window.partitionBy(F.md5(F.col("para"))).orderBy("doc_id", "pos")
    ranked = paras.withColumn("rk", F.row_number().over(w))
    return (ranked
            .groupBy("doc_id")
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(
                             F.when(F.col("rk") == 1,
                                    F.struct("pos", "para")))),
                         lambda s: s["para"]),
                     sep).alias("clean_text"),
                 F.count("*").alias("n_paras"),
                 F.sum((F.col("rk") > 1).cast("long")).alias("n_dropped")))
