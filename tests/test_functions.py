"""Property/behavior tests for the training-data-pipeline operators:
dedup (exact, minhash/LSH, jaccard, simhash), similarity search (LSH
recall vs brute force), text analysis, media plumbing, meta-annotation."""

import pytest
from pyspark.sql import functions as F

from medcat_spark.functions import dedup as ddp
from medcat_spark.functions import similarity as simf
from medcat_spark.functions import text as txt
from medcat_spark.functions.media import fake_decode, media_features
from medcat_spark.functions.meta import meta_annotations


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        ("a1", base),
        ("a2", base),                                   # exact dup of a1
        ("a3", base.replace("kappa", "lambda")),        # near dup (1 token)
        ("b1", "one two three four five six seven eight nine ten"),
        ("b2", "cold warm hot cool mild dry wet damp icy snowy"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_exact_dup_groups(dup_docs):
    r = {x["doc_id"]: x for x in ddp.exact_dup_groups(dup_docs).collect()}
    assert r["a1"]["group_size"] == 2 and r["a2"]["group_size"] == 2
    assert {r["a1"]["dup_rank"], r["a2"]["dup_rank"]} == {1, 2}
    assert r["a3"]["group_size"] == 1


def test_minhash_identical_docs_identical_signatures(dup_docs):
    sig = {r["doc_id"]: (r["h0"], r["h1"], r["h2"], r["h3"])
           for r in ddp.minhash_signatures(dup_docs).collect()}
    assert sig["a1"] == sig["a2"]
    assert sig["a1"] != sig["b1"]
    # near-dup shares most shingles -> most minhashes agree
    agree = sum(a == b for a, b in zip(sig["a1"], sig["a3"]))
    assert agree >= 2


def test_lsh_pairs_find_dups_not_distinct_docs(dup_docs):
    pairs = {(r["doc_a"], r["doc_b"])
             for r in ddp.lsh_candidate_pairs(dup_docs).collect()}
    assert ("a1", "a2") in pairs
    assert ("b1", "b2") not in pairs


def test_ngram_jaccard_exact_and_near(dup_docs, spark):
    docs = dup_docs.withColumn("source", F.lit("s"))
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"]
         for r in ddp.ngram_jaccard_pairs(docs, min_jaccard=0.0).collect()}
    assert j[("a1", "a2")] == 1.0
    assert 0.5 < j[("a1", "a3")] < 1.0
    assert ("a1", "b1") not in j  # zero shared shingles -> no inter row


def test_connected_components_chain_and_pointer_jumping(spark):
    # a 6-node path (diameter 5) exercises >1 propagation round and the
    # pointer-jumping shortcut; plus a separate pair and self-loop noise
    pairs = spark.createDataFrame(
        [("n1", "n2"), ("n2", "n3"), ("n3", "n4"), ("n4", "n5"),
         ("n5", "n6"), ("x1", "x2"), ("x1", "x1")],
        "doc_a string, doc_b string")
    cc = {r["doc_id"]: r["component"]
          for r in ddp.connected_components(pairs).collect()}
    assert cc == {f"n{i}": "n1" for i in range(1, 7)} | {"x1": "x1",
                                                         "x2": "x1"}


def test_connected_components_driver_and_distributed_paths_agree(spark):
    # the r6 small-graph driver union-find must label identically to
    # the distributed pointer-jumping loop (force it with gate=0)
    pairs = spark.createDataFrame(
        [("n1", "n2"), ("n2", "n3"), ("n3", "n4"), ("n4", "n5"),
         ("n5", "n6"), ("x1", "x2"), ("x1", "x1"), ("z9", "z1")],
        "doc_a string, doc_b string")
    fast = sorted(map(tuple, ddp.connected_components(pairs).collect()))
    dist = sorted(map(tuple, ddp.connected_components(
        pairs, driver_edge_limit=0).collect()))
    assert fast == dist


def test_dedup_clusters_transitive_keeper(dup_docs, spark):
    # a1==a2 exactly, a3 near-dups both -> one cluster of 3 via
    # transitivity; b1/b2 are singletons of themselves
    out = {r["doc_id"]: r for r in
           ddp.dedup_clusters(dup_docs, min_jaccard=0.2).collect()}
    assert [out[d]["cluster_id"] for d in ("a1", "a2", "a3")] == ["a1"] * 3
    assert out["a1"]["cluster_size"] == 3
    assert out["a1"]["is_keeper"] and not out["a2"]["is_keeper"]
    for d in ("b1", "b2"):
        assert (out[d]["cluster_id"], out[d]["cluster_size"],
                out[d]["is_keeper"]) == (d, 1, True)
    # jaccard_on_pairs is bounded by its candidate list: an empty pair
    # set verifies nothing even for identical docs
    empty = spark.createDataFrame([], "doc_a string, doc_b string")
    assert ddp.jaccard_on_pairs(dup_docs, empty).count() == 0


def test_simhash_hamming(dup_docs):
    sh = {r["doc_id"]: r["simhash"] for r in ddp.simhash32(dup_docs).collect()}
    assert sh["a1"] == sh["a2"]
    ham_near = bin(sh["a1"] ^ sh["a3"]).count("1")
    ham_far = bin(sh["a1"] ^ sh["b2"]).count("1")
    assert ham_near < ham_far


def test_lsh_ann_recall_vs_brute_force(spark):
    from medcat_spark.fixtures import det_vec
    rows = [(i, [float(x) for x in det_vec(f"v{i}", 16)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qv = rows[7][1]
    exact = [r["vec_id"] for r in simf.cosine_topk(emb, qv, k=5).collect()]
    approx = [r["vec_id"] for r in
              simf.cosine_topk_lsh(emb, qv, k=5, probe_dims=2).collect()]
    assert exact[0] == 7 and approx[0] == 7  # the query itself
    # bucket filter keeps only matching sign patterns; recall is partial
    # but the probe scans a fraction of the corpus
    assert len(set(exact) & set(approx)) >= 2


def test_text_quality_and_fingerprint(spark):
    docs = spark.createDataFrame(
        [("d1", "the cat and the hat"), ("d2", "cat hat the and the")],
        "doc_id string, text string")
    q = {r["doc_id"]: r for r in txt.text_quality(docs).collect()}
    assert q["d1"]["n_tokens"] == 5 and q["d1"]["n_types"] == 4
    assert q["d1"]["stopword_ratio"] == pytest.approx(3 / 5)
    fp = {r["doc_id"]: r for r in txt.fingerprint(docs).collect()}
    assert fp["d1"]["fp_exact"] != fp["d2"]["fp_exact"]
    assert fp["d1"]["fp_bag"] == fp["d2"]["fp_bag"]  # same token set


def test_media_features_deterministic(spark):
    docs = spark.createDataFrame(
        [("m1", [{"kind": "text", "text": "x", "media_ref": None, "offset": 0},
                 {"kind": "image", "text": None,
                  "media_ref": "img://m1", "offset": 2}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    rows = media_features(docs).collect()
    assert len(rows) == 1
    want = fake_decode("img://m1")
    assert rows[0]["width"] == want["width"]
    assert rows[0]["phash"] == want["phash"]
    assert rows[0]["span_idx"] == 1


def test_meta_negation_window(spark):
    docs = spark.createDataFrame(
        [("n1", "patient shows no sign of fever today"),
         ("n2", "patient presented with fever yesterday")],
        "doc_id string, text string")
    # fever at char offset: compute via annotate-free path — give ann rows
    ann = spark.createDataFrame(
        [("n1", docs.collect()[0]["text"].index("fever"), "C0010"),
         ("n2", docs.collect()[1]["text"].index("fever"), "C0010")],
        "doc_id string, start int, cui string")
    m = {r["doc_id"]: r for r in
         meta_annotations(ann, docs, cues=["no", "not"]).collect()}
    assert m["n1"]["value"] == "negated" and m["n1"]["n_cues"] == 1
    assert m["n2"]["value"] == "present"


def test_media_resize_and_frame_sample(spark):
    from medcat_spark.functions.media import (fake_duration_ms, frame_sample,
                                              media_features, media_resize)
    docs = spark.createDataFrame(
        [("d1", [{"kind": "text", "text": "x", "media_ref": None,
                  "offset": 0},
                 {"kind": "image", "text": None,
                  "media_ref": "img://a", "offset": 2},
                 {"kind": "video", "text": None,
                  "media_ref": "vid://b", "offset": 12}])],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>")
    feats = media_features(docs)
    rs = {r["media_ref"]: r for r in media_resize(feats, 224, 224).collect()}
    for ref, r in rs.items():
        # aspect preserved within rounding; bounded by the target box
        assert r["out_w"] <= 224 and r["out_h"] <= 224
        assert max(r["out_w"], r["out_h"]) in (223, 224) or \
            r["scale"] >= 1.0  # upscaling allowed when smaller
    frames = frame_sample(docs, interval_ms=1000, max_frames=16).collect()
    per_ref = {}
    for r in frames:
        per_ref.setdefault(r["media_ref"], []).append(r)
    for ref, rows in per_ref.items():
        dur = fake_duration_ms(ref)
        expect_n = min(dur // 1000 + 1, 16)
        assert len(rows) == expect_n
        idx = sorted(r["frame_idx"] for r in rows)
        assert idx == list(range(expect_n))
        assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in rows)
        assert all(r["frame_ref"] == f"{ref}#f{r['frame_idx']}"
                   for r in rows)


def _png_bytes(w, h):
    import struct
    import zlib
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
    chunk += struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    return b"\x89PNG\r\n\x1a\n" + chunk


def _jpeg_bytes(w, h):
    import struct
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + \
        struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + dqt + sof + b"\xff\xd9"


def _gif_bytes(w, h):
    import struct
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def test_real_decode_png_jpeg_gif_headers():
    import pytest as _pytest

    from medcat_spark.functions.media import real_decode

    assert real_decode(_png_bytes(640, 480)) == {
        "format": "png", "width": 640, "height": 480,
        "phash": real_decode(_png_bytes(640, 480))["phash"]}
    j = real_decode(_jpeg_bytes(1920, 1080))
    assert (j["format"], j["width"], j["height"]) == ("jpeg", 1920, 1080)
    g = real_decode(_gif_bytes(32, 16))
    assert (g["format"], g["width"], g["height"]) == ("gif", 32, 16)
    # video/unknown stays an honest stub
    with _pytest.raises(NotImplementedError):
        real_decode(b"\x00\x01\x02RIFFnotanimage")
    with _pytest.raises(ValueError):
        real_decode(b"\xff\xd8\xff\xe0\x00\x04\x00\x00")  # SOF-less JPEG


def test_media_features_from_bytes_spark(spark):
    from medcat_spark.functions.media import media_features_from_bytes

    rows = [("d1", "s3://img/a.png", _png_bytes(100, 50)),
            ("d2", "s3://img/b.jpg", _jpeg_bytes(10, 20)),
            ("d3", "s3://img/c.gif", _gif_bytes(7, 9)),
            ("d4", "s3://img/d.mp4", b"\x00\x00\x00 ftypisom")]
    df = spark.createDataFrame(
        rows, "doc_id string, media_ref string, media_bytes binary")
    got = {r["doc_id"]: r for r in media_features_from_bytes(df).collect()}
    assert (got["d1"]["format"], got["d1"]["width"],
            got["d1"]["height"]) == ("png", 100, 50)
    assert (got["d2"]["format"], got["d2"]["width"],
            got["d2"]["height"]) == ("jpeg", 10, 20)
    assert (got["d3"]["format"], got["d3"]["width"],
            got["d3"]["height"]) == ("gif", 7, 9)
    # corrupt/unsupported rows survive as 'unknown', batch doesn't fail
    assert got["d4"]["format"] == "unknown"
    assert got["d4"]["width"] is None and got["d4"]["phash"]


def test_incremental_cluster_assignment(dup_docs, spark):
    """assign_to_clusters: a new near-dup adopts the existing cluster,
    a novel doc founds its own, and the historical corpus is only
    consulted for candidate matches."""
    clusters = ddp.dedup_clusters(dup_docs, min_jaccard=0.2)
    index = ddp.lsh_bucket_index(dup_docs)
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    new = spark.createDataFrame(
        [("n1", base.replace("alpha", "omega")),     # near-dup of a-group
         ("n2", "entirely novel content nothing shared with corpus docs x")],
        "doc_id string, text string")
    out = {r["doc_id"]: (r["cluster_id"], r["is_new_cluster"])
           for r in ddp.assign_to_clusters(new, index, clusters,
                                           dup_docs).collect()}
    assert out["n1"] == ("a1", False)     # adopted the a1/a2/a3 cluster
    assert out["n2"] == ("n2", True)      # novel -> own cluster


def test_connected_components_random_graphs_vs_union_find(spark):
    """Property check: distributed min-label propagation == driver-side
    union-find on seeded random graphs (varied density incl. isolated
    pairs, triangles, long chains)."""
    import random

    def union_find_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    for seed, n_nodes, n_edges in [(1, 30, 15), (2, 40, 60), (3, 25, 8),
                                   (4, 50, 49)]:
        rng = random.Random(seed)
        nodes = [f"v{i:03d}" for i in range(n_nodes)]
        edges = [(rng.choice(nodes), rng.choice(nodes))
                 for _ in range(n_edges)]
        expect = union_find_components(edges)
        # min-root canonicalisation for the union-find reference
        roots = {}
        for n, r in expect.items():
            roots.setdefault(r, []).append(n)
        want = {n: min(mem) for r, mem in roots.items() for n in mem}
        pairs = spark.createDataFrame(edges, "doc_a string, doc_b string")
        got = {r["doc_id"]: r["component"]
               for r in ddp.connected_components(pairs).collect()}
        assert got == want, (seed, {k: (got.get(k), want.get(k))
                                    for k in set(got) | set(want)
                                    if got.get(k) != want.get(k)})


# --- SemDeDup (semantic_dedup) ---------------------------------------------

@pytest.fixture(scope="module")
def sem_embeddings(spark):
    # cluster 0 is three mutual near-dups at graded distances from the
    # centroid; cluster 1 is a singleton
    rows = [
        (1, [1.0, 0.0]),       # exactly on centroid 0
        (2, [0.98, 0.05]),     # near-dup of 1, slightly off-centroid
        (3, [0.95, 0.12]),     # near-dup, furthest from centroid
        (4, [0.0, 1.0]),       # alone in cluster 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_keeps_furthest_from_centroid(sem_embeddings):
    from medcat_spark.functions.similarity import semantic_dedup
    out = {r["vec_id"]: r.asDict()
           for r in semantic_dedup(sem_embeddings,
                                   centroids=[[1.0, 0.0], [0.0, 1.0]],
                                   eps=0.9).collect()}
    # 1,2,3 one component in cluster 0; 4 a singleton in cluster 1
    assert out[1]["cluster"] == 0 and out[4]["cluster"] == 1
    assert out[1]["component"] == out[2]["component"] == out[3]["component"]
    assert out[4]["component"] == 4
    # SemDeDup keeper = LOWEST centroid similarity (vec 3)
    keepers = [v for v, r in out.items() if r["is_keeper"]]
    assert sorted(keepers) == [3, 4]
    assert out[3]["centroid_sim"] < out[2]["centroid_sim"] < out[1]["centroid_sim"]


def test_semantic_dedup_transitive_component(spark):
    # chain a~b (sim>eps), b~c (sim>eps) but a~c below eps: still one
    # component through transitivity
    from medcat_spark.functions.similarity import semantic_dedup
    rows = [(1, [1.0, 0.0]), (2, [0.92, 0.39]), (3, [0.71, 0.70])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["component"]
           for r in semantic_dedup(df, centroids=[[1.0, 0.2]],
                                   eps=0.92).collect()}
    assert out[1] == out[2] == out[3]


def test_semantic_dedup_every_row_returned_once(sem_embeddings):
    from medcat_spark.functions.similarity import semantic_dedup
    out = semantic_dedup(sem_embeddings,
                         centroids=[[1.0, 0.0], [0.0, 1.0]],
                         eps=0.99999).collect()
    assert sorted(r["vec_id"] for r in out) == [1, 2, 3, 4]
    # at an impossible eps nothing pairs: all keepers
    assert all(r["is_keeper"] for r in out)


def test_semantic_dedup_max_cluster_size_guard(sem_embeddings):
    from medcat_spark.functions.similarity import semantic_dedup
    # cluster 0 has 3 members > cap 2 -> its pairs are dropped, every
    # row survives as its own singleton component
    out = semantic_dedup(sem_embeddings,
                         centroids=[[1.0, 0.0], [0.0, 1.0]],
                         eps=0.9, max_cluster_size=2).collect()
    assert all(r["is_keeper"] for r in out)


# --- DSIR data selection ----------------------------------------------------

def test_dsir_target_docs_score_highest(spark):
    from medcat_spark.functions.selection import dsir_scores, dsir_select
    rows = (
        [(i, "heart attack acute myocardial infarction") for i in range(4)]
        + [(i, "lorem ipsum dolor sit amet consectetur") for i in range(4, 12)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where("doc_id < 4")
    out = {r["doc_id"]: r["dsir_score"]
           for r in dsir_scores(docs, target, n_buckets=64).collect()}
    # every medical doc outranks every lorem doc
    assert min(out[i] for i in range(4)) > max(out[i] for i in range(4, 12))
    sel = dsir_select(docs, target, k=4, n_buckets=64).collect()
    assert sorted(r["doc_id"] for r in sel) == [0, 1, 2, 3]


def test_dsir_identical_distributions_score_zero(spark):
    from medcat_spark.functions.selection import dsir_scores
    docs = spark.createDataFrame(
        [(i, "same text every time") for i in range(6)],
        "doc_id long, text string")
    out = dsir_scores(docs, docs, n_buckets=32).collect()
    # target == raw -> log ratio identically 0 for every feature
    assert all(r["dsir_score"] == 0.0 for r in out)
    # 4 unigrams + 3 bigrams
    assert all(r["n_feats"] == 7 for r in out)


def test_dsir_single_word_doc_has_no_bigrams(spark):
    from medcat_spark.functions.selection import hashed_ngram_features
    docs = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    assert hashed_ngram_features(docs).count() == 1


def test_dsir_length_normalized_select(spark):
    from medcat_spark.functions.selection import dsir_select
    # doc 2 contains the target phrase but diluted by noise: the
    # per-feature (normalized) ranking must prefer the pure doc 1
    rows = [(1, "heart attack"),
            (2, "heart attack lorem ipsum dolor sit amet consectetur "
                "adipiscing elit sed do eiusmod tempor incididunt"),
            (3, "lorem ipsum dolor")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    target = docs.where("doc_id = 1")
    top = dsir_select(docs, target, k=1, n_buckets=64,
                      length_normalize=True).collect()
    assert top[0]["doc_id"] == 1


def test_png_codec_roundtrip_all_filters_and_channels():
    import numpy as np

    from medcat_spark.functions.media import png_decode_pixels, png_encode

    rng = np.random.RandomState(7)
    shapes = [(5, 9), (5, 9, 3), (4, 7, 4)]
    for shape in shapes:
        px = rng.randint(0, 256, size=shape).astype(np.uint8)
        for ft in range(5):
            back = png_decode_pixels(png_encode(px, filter_type=ft))
            assert back.shape == px.shape, (shape, ft)
            assert (back == px).all(), (shape, ft)


def test_png_decode_rejects_unsupported():
    import numpy as np
    import pytest as _pt

    from medcat_spark.functions.media import png_decode_pixels, png_encode

    with _pt.raises(ValueError):
        png_decode_pixels(b"not a png at all")
    import struct
    import zlib

    def patch(offset, value):
        blob = bytearray(png_encode(np.zeros((2, 2), np.uint8)))
        blob[offset] = value
        blob[29:33] = struct.pack(">I", zlib.crc32(bytes(blob[12:29])))
        return bytes(blob)

    # spec-invalid bit depth 3 raises honestly; flipping the interlace
    # flag on a progressive stream leaves mismatched pass data, which
    # the Adam7 path rejects as a malformed stream
    with _pt.raises(NotImplementedError):
        png_decode_pixels(patch(24, 3))    # IHDR bit depth field
    with _pt.raises(ValueError):
        png_decode_pixels(patch(28, 1))    # IHDR interlace flag


def test_media_pixel_stats_spark(spark):
    from medcat_spark.functions.media import (media_pixel_stats,
                                              synth_png_column)

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    rows = {r["doc_id"]: r
            for r in media_pixel_stats(synth_png_column(docs)).collect()}
    assert len(rows) == 12
    for i in range(12):           # gradient mean derives in closed form
        want_sum = sum((j + i) % 256 for j in range(48))
        r = rows[str(i)]
        assert (r["width"], r["height"]) == (8, 6)
        assert r["px_sum"] == want_sum
        assert abs(r["mean_px"] - round(want_sum / 48.0, 6)) < 1e-9


def test_wav_codec_roundtrip_and_chunk_walk():
    import struct

    import numpy as np
    import pytest as _pt

    from medcat_spark.functions.media import wav_decode, wav_encode

    mono = ((np.arange(480) * 5) % 2001 - 1000).astype(np.int16)
    back, rate = wav_decode(wav_encode(mono))
    assert rate == 16000 and back.shape == (480, 1)
    assert (back[:, 0] == mono).all()

    stereo = ((np.arange(100)[:, None] * np.array([3, 7])) % 2001
              - 1000).astype(np.int16)
    back2, r2 = wav_decode(wav_encode(stereo, 8000))
    assert r2 == 8000 and (back2 == stereo).all()

    # tolerate an extra (odd-length, word-padded) chunk before data
    blob = wav_encode(mono)
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    patched = blob[:12] + extra + blob[12:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8) + patched[8:]
    back3, _ = wav_decode(patched)
    assert (back3[:, 0] == mono).all()

    with _pt.raises(ValueError):
        wav_decode(b"RIFFxxxxJUNK")
    # IEEE-float format tag -> honest NotImplementedError
    bad = bytearray(wav_encode(mono))
    bad[20:22] = struct.pack("<H", 3)
    with _pt.raises(NotImplementedError):
        wav_decode(bytes(bad))


def test_media_audio_stats_spark(spark):
    import numpy as np

    from medcat_spark.functions.media import (media_audio_stats,
                                              synth_wav_column)

    docs = spark.createDataFrame([(i,) for i in (0, 5, 58)], "doc_id long")
    rows = {r["doc_id"]: r
            for r in media_audio_stats(synth_wav_column(docs)).collect()}
    for i in (0, 5, 58):
        v = (np.arange(480, dtype=np.int64) * (i % 97 + 3)) % 2001 - 1000
        sgn = np.where(v > 0, 1, np.where(v < 0, -1, 0))
        for k in range(1, len(sgn)):
            if sgn[k] == 0:
                sgn[k] = sgn[k - 1]
        r = rows[str(i)]
        assert (r["sample_rate"], r["n_samples"], r["duration_ms"]) == \
            (16000, 480, 30)
        assert r["zero_crossings"] == int((sgn[1:] * sgn[:-1] < 0).sum())
        assert abs(r["rms"]
                   - round(float(np.sqrt((v.astype(float) ** 2).mean())),
                           6)) < 1e-9


def test_gif_lzw_roundtrip_width_growth_and_reset():
    import numpy as np

    from medcat_spark.functions.media import lzw_decode, lzw_encode

    rng = np.random.RandomState(11)
    for mcs in (2, 3, 8):
        seq = rng.randint(0, 1 << mcs, size=30000).tolist()
        assert lzw_decode(lzw_encode(seq, mcs), mcs) == seq
    # worst-case distinct-pair stream forces a 4096-entry table reset
    seq = [(i * 7 + (i >> 5)) % 256 for i in range(20000)]
    assert lzw_decode(lzw_encode(seq, 8), 8) == seq


def test_gif_decode_interlace_subrect_transparency():
    import struct

    import numpy as np

    from medcat_spark.functions.media import (gif_decode_frames, gif_encode,
                                              lzw_encode)

    pal = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    f0 = (np.arange(48).reshape(6, 8) % 4).astype(np.uint8)
    blob = bytearray(gif_encode([f0], pal, delays_ms=[50]))

    # hand-append a 2x2 sub-rect frame at (3,1) with index 2 transparent:
    # pixel grid [[1, 2], [2, 3]] -> only the 1 and 3 composite
    gce = b"\x21\xf9\x04" + struct.pack("<BHB", 0x05, 7, 2) + b"\x00"
    sub = np.array([[1, 2], [2, 3]], dtype=np.uint8)
    comp = lzw_encode(sub.reshape(-1), 2)
    desc = b"\x2c" + struct.pack("<HHHHB", 3, 1, 2, 2, 0) + bytes([2])
    body = bytes([len(comp)]) + comp + b"\x00"
    assert blob[-1] == 0x3B
    blob = blob[:-1] + gce + desc + body + b"\x3b"

    frames = gif_decode_frames(bytes(blob))
    assert len(frames) == 2 and frames[1]["delay_ms"] == 70
    want = np.stack([f0 * 85] * 3, axis=-1).astype(np.uint8)
    assert (frames[0]["pixels"] == want).all()
    want2 = want.copy()
    want2[1, 3] = 85           # top-left of sub-rect
    want2[2, 4] = 255          # bottom-right; the two 2s stay transparent
    assert (frames[1]["pixels"] == want2).all()

    # interlaced variant of frame 0 must decode to the same canvas:
    # reorder rows into pass order and set the interlace flag
    passes = [0, 4, 2, 1, 3, 5]   # 6 rows: pass1 {0}, pass2 {4}, pass3 {2}, pass4 {1,3,5}
    inter = f0[passes]
    blob_i = bytearray(gif_encode([inter], pal))
    idx = bytes(blob_i).index(b"\x2c")
    blob_i[idx + 9] |= 0x40
    got = gif_decode_frames(bytes(blob_i))[0]["pixels"]
    assert (got == want).all()


def test_media_gif_frames_spark(spark):
    from medcat_spark.functions.media import (media_gif_frames,
                                              synth_gif_column)

    docs = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    rows = media_gif_frames(synth_gif_column(docs)).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert {k: len(v) for k, v in by_doc.items()} == {
        str(i): i % 3 + 1 for i in range(7)}
    for i in range(7):
        for f, r in enumerate(sorted(by_doc[str(i)],
                                     key=lambda x: x["frame_idx"])):
            want_mean = sum(((j + f + i) % 4) * 85 for j in range(48)) / 48.0
            assert r["ts_ms"] == 100 * f * (f + 1) // 2
            assert r["delay_ms"] == (f + 1) * 100
            assert abs(r["mean_px"] - round(want_mean, 6)) < 1e-9


def test_pq_encode_argmin_and_ties(spark):
    import numpy as np

    from medcat_spark.functions.similarity import pq_encode

    # m=2 subspaces of 2 dims, k=2 entries each; vector halves sit
    # exactly on known centroids
    cbs = np.array([[[0.0, 0.0], [1.0, 1.0]],
                    [[2.0, 2.0], [-1.0, -1.0]]])
    emb = spark.createDataFrame(
        [(0, [0.9, 1.1, -0.9, -1.1]),   # sub0 -> cb1, sub1 -> cb1
         (1, [0.1, -0.1, 2.0, 1.9]),    # sub0 -> cb0, sub1 -> cb0
         (2, [0.5, 0.5, 0.5, 0.5])],    # BOTH subspaces tie (dist 0.5
        "vec_id long, embedding array<double>")  # and 4.5) -> lowest j
    got = {r["vec_id"]: list(r["pq_code"])
           for r in pq_encode(emb, cbs).collect()}
    assert got == {0: [1, 1], 1: [0, 0], 2: [0, 0]}


def test_pq_trained_topk_beats_random(spark):
    import numpy as np

    from medcat_spark.functions.similarity import (pq_topk,
                                                   train_pq_codebooks)

    rng = np.random.RandomState(5)
    centers = rng.randn(4, 16) * 3
    X = np.vstack([c + rng.randn(25, 16) * 0.3 for c in centers])
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>")
    cbs = train_pq_codebooks(X, m=4, k=8, iters=5)
    assert cbs.shape == (4, 8, 4)
    qv = X[0]
    got = [r["vec_id"] for r in pq_topk(emb, qv, cbs, k=10).collect()]
    # exact nearest by L2: the 25 members of cluster 0
    exact = np.argsort(((X - qv) ** 2).sum(axis=1))[:10]
    # PQ top-10 should recover most of the exact top-10's cluster
    assert 0 in got
    assert len(set(got) & set(int(i) for i in exact)) >= 5
    assert all(0 <= c < 8
               for r in
               __import__("medcat_spark.functions.similarity",
                          fromlist=["pq_encode"])
               .pq_encode(emb, cbs).select("pq_code").first()["pq_code"]
               for c in [r])


def test_pq_topk_ivf_prunes_and_scores(spark):
    import numpy as np

    from medcat_spark.functions.similarity import (ivf_assign, pq_topk,
                                                   pq_topk_ivf,
                                                   train_pq_codebooks)
    from pyspark.sql import functions as F

    rng = np.random.RandomState(9)
    centers = rng.randn(4, 16) * 4
    X = np.vstack([c + rng.randn(20, 16) * 0.2 for c in centers])
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>")
    cen = np.round(centers, 6)
    cbs = train_pq_codebooks(X, m=4, k=8, iters=5)
    qv = X[0]
    got = pq_topk_ivf(emb, qv, cen, cbs, k=10, n_probe=1)
    ids = [r["vec_id"] for r in got.collect()]
    # with n_probe=1 every result lives in the query's own cluster
    assign = {r["vec_id"]: r["c"] for r in
              emb.select("vec_id",
                         ivf_assign(F.col("embedding"), cen).alias("c"))
              .collect()}
    qc = assign[0]
    assert ids and all(assign[i] == qc for i in ids)
    # and matches unpruned PQ restricted to that cluster
    full = [r["vec_id"] for r in pq_topk(
        emb.where(ivf_assign(F.col("embedding"), cen) == qc),
        qv, cbs, k=10).collect()]
    assert ids == full


def test_gif_decode_max_frames_budget():
    import numpy as np
    import pytest as _pt

    from medcat_spark.functions.media import gif_decode_frames, gif_encode

    pal = [(0, 0, 0), (255, 255, 255)]
    blob = gif_encode([np.zeros((2, 2), np.uint8)] * 5, pal)
    assert len(gif_decode_frames(blob)) == 5
    with _pt.raises(ValueError, match="max_frames"):
        gif_decode_frames(blob, max_frames=3)


def test_ima_adpcm_decode_matches_step_recompute():
    import numpy as np

    from medcat_spark.functions.media import (adpcm_encode_nibbles,
                                              ima_adpcm_step, wav_decode)

    nibs = [(i * 7 + 3) % 16 for i in range(64)]
    smp, rate = wav_decode(adpcm_encode_nibbles(nibs, 8000))
    assert rate == 8000 and smp.shape == (65, 1)
    pred, idx = 0, 0
    want = [0]
    for n in nibs:
        pred, idx = ima_adpcm_step(pred, idx, n)
        want.append(pred)
    assert smp[:, 0].tolist() == want
    # clamp paths: all-magnitude nibbles drive pred to the int16 rails
    smp2, _ = wav_decode(adpcm_encode_nibbles([7] * 200))
    assert smp2.max() == 32767
    smp3, _ = wav_decode(adpcm_encode_nibbles([15] * 200))
    assert smp3.min() == -32768


def test_ima_adpcm_multiblock_and_rejections():
    import struct

    import pytest as _pt

    from medcat_spark.functions.media import (adpcm_encode_nibbles,
                                              wav_decode)

    # two blocks: concatenate two encoded data sections under one RIFF
    one = adpcm_encode_nibbles([5] * 8, predictor=100, index=10)
    # find the data chunk and duplicate its payload
    di = one.index(b"data")
    (ln,) = struct.unpack("<I", one[di + 4:di + 8])
    payload = one[di + 8:di + 8 + ln]
    two = (one[:di + 4] + struct.pack("<I", ln * 2) + payload * 2)
    two = two[:4] + struct.pack("<I", len(two) - 8) + two[8:]
    smp, _ = wav_decode(two)
    assert smp.shape == (18, 1)
    assert smp[0, 0] == 100 and smp[9, 0] == 100   # header predictors

    # stereo ADPCM: honest rejection
    blob = bytearray(adpcm_encode_nibbles([5] * 8))
    fi = bytes(blob).index(b"fmt ")
    blob[fi + 10:fi + 12] = struct.pack("<H", 2)   # nChannels
    with _pt.raises(NotImplementedError):
        wav_decode(bytes(blob))


def test_media_adpcm_stats_spark(spark):
    from medcat_spark.functions.media import (ima_adpcm_step,
                                              media_adpcm_stats,
                                              synth_adpcm_column)

    docs = spark.createDataFrame([(i,) for i in (0, 9, 42)], "doc_id long")
    rows = {r["doc_id"]: r
            for r in media_adpcm_stats(synth_adpcm_column(docs)).collect()}
    for d in (0, 9, 42):
        pred, idx = 0, 0
        samples = [0]
        for k in range(64):
            pred, idx = ima_adpcm_step(pred, idx, (k * 7 + d) % 16)
            samples.append(pred)
        r = rows[str(d)]
        assert (r["n_samples"], r["sample_rate"]) == (65, 16000)
        assert r["sum_samples"] == sum(samples)
        assert (r["min_sample"], r["max_sample"]) == (min(samples),
                                                      max(samples))
