"""ExactSubstr span dedup (Lee et al. 2022): unit semantics the
sf-scale SQL gates can't isolate — interval merging at exact-L gaps,
within-doc repeats, first-occurrence survivorship, short/empty docs —
each checked against a naive pure-Python reference."""
import re


def _toks(t):
    return [x for x in re.split(r"[^a-z0-9]+", t.lower()) if x]


def _naive(rows, L, min_count=2):
    """Reference implementation: gram multiset counts, interval union,
    first-occurrence-kept stripping."""
    toks = {d: _toks(t) for d, t in rows}
    occ = {}
    for d, t in sorted(rows):
        tl = toks[d]
        for p in range(len(tl) - L + 1):
            occ.setdefault(tuple(tl[p:p + L]), []).append((d, p))
    dup_starts = {d: set() for d, _ in rows}
    removed_starts = {d: set() for d, _ in rows}
    for g, sites in occ.items():
        if len(sites) >= min_count:
            for d, p in sites:
                dup_starts[d].add(p)
            for d, p in sorted(sites)[1:]:
                removed_starts[d].add(p)
    stats, stripped = {}, {}
    for d, _ in rows:
        tl = toks[d]
        cov = set()
        for p in dup_starts[d]:
            cov.update(range(p, p + L))
        spans = 0
        prev = None
        for q in sorted(cov):
            if prev is None or q != prev + 1:
                spans += 1
            prev = q
        stats[d] = (len(cov), spans, len(tl))
        rm = set()
        for p in removed_starts[d]:
            rm.update(range(p, p + L))
        kept = [tl[q] for q in range(len(tl)) if q not in rm]
        stripped[d] = (" ".join(kept), len(kept))
    return stats, stripped


def _check(spark, rows, L):
    from datapipe.dedup import duplicated_spans, strip_duplicate_spans
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats, stripped = _naive(rows, L)
    got = {r["doc_id"]: r for r in duplicated_spans(df, min_len=L).collect()}
    assert set(got) == {d for d, _ in rows}
    for d, (cov, spans, n) in stats.items():
        r = got[d]
        assert (r["dup_tokens"], r["dup_spans"], r["n_tokens"]) == \
            (cov, spans, n), (d, dict(r.asDict()))
    got2 = {r["doc_id"]: r for r in
            strip_duplicate_spans(df, min_len=L).collect()}
    for d, (txt, kept) in stripped.items():
        r = got2[d]
        assert (r["clean_text"], r["kept_tokens"]) == (txt, kept), d


def test_cross_doc_dup_and_merge(spark):
    shared = "alpha beta gamma delta epsilon"
    rows = [
        (0, f"start {shared} tail one"),
        (1, f"other prefix {shared} closing words here"),
        (2, "completely unrelated tokens only once"),
        (3, ""),                       # empty doc
        (4, "tiny"),                   # shorter than L
    ]
    _check(spark, rows, L=5)


def test_within_doc_repeat_counts(spark):
    # the same 3-gram twice INSIDE one doc → globally duplicated, and
    # strip keeps only the first occurrence
    rows = [(0, "x y z pad pad x y z trailer"),
            (1, "nothing shared at all")]
    _check(spark, rows, L=3)


def test_adjacent_and_overlapping_windows_merge(spark):
    # doc 0/1 share an 8-token run → starts 0..4 at L=4 overlap into ONE
    # span covering 8 tokens, not 5 disjoint spans
    run = "r1 r2 r3 r4 r5 r6 r7 r8"
    rows = [(0, f"{run} u0"), (1, f"v0 {run}")]
    _check(spark, rows, L=4)
    from datapipe.dedup import duplicated_spans
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = {x["doc_id"]: x for x in
         duplicated_spans(df, min_len=4).collect()}
    assert r[0]["dup_spans"] == 1 and r[0]["dup_tokens"] == 8


def test_two_separated_spans(spark):
    a, b = "s1 s2 s3 s4", "t1 t2 t3 t4"
    rows = [(0, f"{a} gapgap middle filler {b}"),
            (1, f"{a} unrelated middle2 words2 {b}")]
    from datapipe.dedup import duplicated_spans
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = {x["doc_id"]: x for x in
         duplicated_spans(df, min_len=4).collect()}
    assert r[0]["dup_spans"] == 2 and r[0]["dup_tokens"] == 8
    _check(spark, rows, L=4)


def test_strip_first_occurrence_survives(spark):
    shared = "k1 k2 k3 k4 k5"
    rows = [(0, f"{shared} a b"), (1, f"c d {shared}")]
    from datapipe.dedup import strip_duplicate_spans
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = {x["doc_id"]: x for x in
         strip_duplicate_spans(df, min_len=5).collect()}
    # doc 0 is the (doc_id, p)-first site → untouched; doc 1 loses it
    assert r[0]["clean_text"] == f"{shared} a b"
    assert r[1]["clean_text"] == "c d"
    _check(spark, rows, L=5)


def test_randomized_vs_naive(spark):
    import numpy as np
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    phrases = [" ".join(rng.choice(vocab, 6)) for _ in range(4)]
    rows = []
    for d in range(40):
        parts = list(rng.choice(vocab, rng.integers(0, 25)))
        if rng.random() < 0.5:
            parts.insert(int(rng.integers(0, len(parts) + 1)),
                         phrases[int(rng.integers(0, 4))])
        rows.append((d, " ".join(parts)))
    _check(spark, rows, L=5)


def test_clean_corpus_composition(spark):
    from datapipe.curate import clean_corpus
    shared = " ".join(f"p{i}" for i in range(10))
    rows = [
        (0, f"unique words here only once and plenty of them to keep"),
        (1, f"{shared} trailing tail tokens here now extra filler"),
        (2, f"{shared} trailing tail tokens here now extra filler"),  # exact dup of 1
        (3, f"lead in {shared} more words beyond the duplicate span"),
        (4, "tiny"),                                    # < min_tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in clean_corpus(df, min_tokens=5).collect()}
    # doc 2 is an exact duplicate -> removed BEFORE span counting, so
    # doc 1 (first survivor) keeps its text intact unless doc 3 also
    # shares the 10-gram — which it does, so doc 3 loses the span
    assert 2 not in got and 4 not in got
    assert set(got) == {0, 1, 3}
    assert got[1]["clean_text"].startswith("p0 p1")
    assert shared not in got[3]["clean_text"]
    assert got[3]["kept_tokens"] < 10 + 7
