"""Prefix / wildcard / fuzzy term queries (VERDICT r6 next #1-2): the
ES multi-term query DSL over the term-sorted dictionary — pushed range
scan expansion + the unchanged scoring kernels — rank-identical to a
brute-force full-vocabulary-scan oracle on every surface (distributed,
local/serving, CombinedIndex base+delta)."""
import numpy as np
import pandas as pd
import pytest

from sparkfts import BuildConfig, FTSIndex, build_index
from sparkfts.fixtures import make_transcripts
from sparkfts.oracle import BM25Oracle

SEED = 42
N_CONVS = 40


@pytest.fixture(scope="module")
def corpus():
    return (make_transcripts(N_CONVS, seed=SEED)
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))


@pytest.fixture(scope="module")
def oracle(corpus):
    return BM25Oracle(np.arange(len(corpus), dtype=np.int64),
                      corpus["text"])


@pytest.fixture(scope="module")
def index(spark, corpus, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_mt"))
    sdf = spark.createDataFrame(make_transcripts(N_CONVS, seed=SEED))
    build_index(spark, sdf, root, order_cols=["conv_id", "turn_idx"],
                cfg=BuildConfig(num_shards=4, partitions=8))
    return FTSIndex(spark, root)


# patterns chosen against the fixture vocabulary: prefixes with
# several expansions, a wildcard with middle literal, fuzzy with
# neighbors; plus absent patterns
PREFIXES = ["re", "c", "in", "zzz_absent"]
WILDCARDS = ["re*", "*ild", "c*ck*", "r?build", "zz*q"]
FUZZY = [("rebuild", 2, 0), ("index", 1, 0), ("chekpoint", 2, 1),
         ("zzzzzz", 1, 0)]


def test_expansion_matches_bruteforce_vocab_scan(index, oracle):
    for p in PREFIXES:
        exp = oracle.expand(p, "prefix")
        assert index.expand_terms(p, "prefix") == exp
        assert index.expand_terms(p, "prefix", distributed=True) == exp
    for w in WILDCARDS:
        exp = oracle.expand(w, "wildcard")
        assert index.expand_terms(w, "wildcard") == exp
        assert index.expand_terms(w, "wildcard",
                                  distributed=True) == exp
    for q, d, pl in FUZZY:
        exp = oracle.expand(q, "fuzzy", fuzziness=d, prefix_length=pl)
        got_l = index.expand_terms(q, "fuzzy", fuzziness=d,
                                   prefix_length=pl)
        got_d = index.expand_terms(q, "fuzzy", fuzziness=d,
                                   prefix_length=pl, distributed=True)
        assert got_l == exp, (q, got_l, exp)
        assert got_d == exp, (q, got_d, exp)


def test_expansion_cap_is_deterministic_topdf(index, oracle):
    """Capped expansion keeps the HIGHEST-df terms (Lucene top_terms_N
    selection), deterministically."""
    full = index.expand_terms("c", "prefix")
    assert len(full) > 3
    capped = index.expand_terms("c", "prefix", max_expansions=3)
    by_df = sorted(full, key=lambda t: (-oracle.df.get(t, 0), t))[:3]
    assert capped == sorted(by_df)
    assert capped == index.expand_terms("c", "prefix", max_expansions=3,
                                        distributed=True)


def _check_rank_identical(got: pd.DataFrame, exp: pd.DataFrame):
    assert got["docid"].tolist() == exp["docid"].tolist()
    assert np.allclose(got["score"].to_numpy(),
                       exp["score"].to_numpy(), rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("kind,pat,kw", [
    ("prefix", "re", {}),
    ("prefix", "c", {}),
    ("prefix", "zzz_absent", {}),
    ("wildcard", "re*", {}),
    ("wildcard", "c*ck*", {}),
    ("fuzzy", "rebuild", {"fuzziness": 2}),
    ("fuzzy", "chekpoint", {"fuzziness": 2, "prefix_length": 1}),
])
def test_pattern_topk_rank_identical_to_oracle(index, oracle, kind,
                                               pat, kw):
    exp_terms = oracle.expand(pat, kind, kw.get("fuzziness", 2),
                              kw.get("prefix_length", 0))
    exp = oracle.topk_terms(exp_terms, k=10)
    got_d = index.pattern_topk(pat, kind, k=10, **kw).toPandas()
    got_l = index.pattern_topk_local(pat, kind, k=10, **kw)
    _check_rank_identical(got_d, exp)
    _check_rank_identical(got_l, exp)


def test_pattern_constant_score(index, oracle):
    """rewrite=constant_score: every matching doc scores 1.0; top-k is
    the first k matching docids (the ES 1.x prefix default)."""
    exp_terms = oracle.expand("re", "prefix")
    match = sorted(set(
        oracle.tf[oracle.tf["term"].isin(exp_terms)]["docid"]))[:10]
    got = index.pattern_topk("re", "prefix", k=10,
                             rewrite="constant_score").toPandas()
    assert got["docid"].tolist() == match
    assert (got["score"] == 1.0).all()
    got_l = index.pattern_topk_local("re", "prefix", k=10,
                                     rewrite="constant_score")
    assert got_l["docid"].tolist() == match


def test_pattern_topk_cursor_pagination(index, oracle):
    """after= composes: page 2 by cursor equals oracle rows 11-20."""
    exp_terms = oracle.expand("c", "prefix")
    exp = oracle.topk_terms(exp_terms, k=20)
    p1 = index.pattern_topk_local("c", "prefix", k=10)
    cur = (float(p1["score"].iloc[-1]), int(p1["docid"].iloc[-1]))
    p2l = index.pattern_topk_local("c", "prefix", k=10, after=cur)
    p2d = index.pattern_topk("c", "prefix", k=10, after=cur).toPandas()
    _check_rank_identical(p2l, exp.iloc[10:20].reset_index(drop=True))
    _check_rank_identical(p2d, exp.iloc[10:20].reset_index(drop=True))


def test_bad_kind_and_rewrite_raise(index):
    with pytest.raises(ValueError):
        index.expand_terms("x", "glob")
    with pytest.raises(ValueError):
        index.pattern_topk("x", "prefix", rewrite="top_terms_7")
    with pytest.raises(ValueError):
        index.pattern_topk_local("x", "prefix", rewrite="nope")


@pytest.fixture(scope="module")
def combined(spark, tmp_path_factory):
    """Base + two deltas; union oracle."""
    from sparkfts.streaming import CombinedIndex, make_batch_indexer
    cfg = BuildConfig(num_shards=2, partitions=2)
    root = str(tmp_path_factory.mktemp("mt_base"))
    base = make_transcripts(12, seed=SEED)
    b1 = make_transcripts(4, seed=101)
    b2 = make_transcripts(3, seed=202)
    build_index(spark, spark.createDataFrame(base), root,
                order_cols=["conv_id", "turn_idx"], cfg=cfg)
    idxer = make_batch_indexer(root, cfg=cfg)
    idxer(spark.createDataFrame(b1), batch_id=0)
    idxer(spark.createDataFrame(b2), batch_id=1)
    union = (list(base.sort_values(["conv_id", "turn_idx"])["text"])
             + list(b1.sort_values(["conv_id", "turn_idx"])["text"])
             + list(b2.sort_values(["conv_id", "turn_idx"])["text"]))
    oracle = BM25Oracle(np.arange(len(union), dtype=np.int64),
                        pd.Series(union))
    return CombinedIndex(spark, root), oracle


def test_combined_pattern_topk(combined):
    """CombinedIndex legs: union-summed expansion + union-global idf ==
    monolithic oracle, distributed and zero-job local."""
    ci, oracle = combined
    for kind, pat, kw in [("prefix", "re", {}),
                          ("wildcard", "re*", {}),
                          ("fuzzy", "rebuild", {"fuzziness": 2})]:
        exp_terms = oracle.expand(pat, kind, kw.get("fuzziness", 2), 0)
        assert ci.expand_terms(pat, kind, **kw) == exp_terms
        exp = oracle.topk_terms(exp_terms, k=10)
        _check_rank_identical(ci.pattern_topk(pat, kind, k=10, **kw),
                              exp)
        _check_rank_identical(
            ci.pattern_topk_local(pat, kind, k=10, **kw), exp)


def test_combined_pattern_respects_tombstones(combined):
    """Deleting the top hit removes it from pattern results on both
    rewrites (in-kernel exclusion, no k+T over-fetch)."""
    ci, oracle = combined
    exp_terms = oracle.expand("re", "prefix")
    before = ci.pattern_topk_local("re", "prefix", k=5)
    assert len(before) > 1
    victim = int(before["docid"].iloc[0])
    ci.delete_docs([victim])
    try:
        after = ci.pattern_topk_local("re", "prefix", k=5)
        assert victim not in set(after["docid"])
        exp = oracle.topk_terms(exp_terms, k=6)
        exp = exp[exp["docid"] != victim].head(5).reset_index(drop=True)
        _check_rank_identical(after, exp)
        cs = ci.pattern_topk_local("re", "prefix", k=100,
                                   rewrite="constant_score")
        assert victim not in set(cs["docid"])
    finally:
        # leave the module-scoped fixture clean for other tests
        import glob
        import os
        from sparkfts.streaming import _tombstone_dir
        for f in glob.glob(os.path.join(_tombstone_dir(ci.base_root), "*")):
            os.remove(f)


def test_regex_literal_prefix_is_sound():
    """The pushed range-scan key must be a prefix of EVERY match —
    quantifiers make the previous char optional, alternation voids it."""
    from sparkfts.multiterm import regex_literal_prefix as rlp
    assert rlp("scan") == "scan"          # pure literal
    assert rlp("c.*nt") == "c"
    assert rlp("sc?an") == "s"            # 'c' optional
    assert rlp("sc*an") == "s"
    assert rlp("sc{0,2}an") == "s"
    assert rlp("zz+q") == "zz"            # one-or-more keeps the char
    assert rlp("sc?an|in.*") == ""        # top-level alternation
    assert rlp("a(b|c)d") == ""           # conservative on any '|'
    assert rlp("ab\\.c") == "ab"          # escape stops the scan
    assert rlp("re(build)?") == "re"
    # soundness property against the stdlib engine on a toy vocab
    import re
    vocab = ["san", "scan", "scccan", "in", "int", "zzq", "zzzq",
             "abc", "ab.c", "rebuild", "re"]
    for pat in ["scan", "c.*nt", "sc?an", "sc*an", "sc{0,2}an",
                "zz+q", "sc?an|in.*", "a(b|c)d", "ab\\.c",
                "re(build)?", "s[ck]an|slo."]:
        p = rlp(pat)
        rx = re.compile(pat)
        for t in vocab:
            if rx.fullmatch(t):
                assert t.startswith(p), (pat, p, t)


def test_regexp_kind(index, oracle):
    """kind='regexp' (ES regexp query; Lucene whole-term semantics):
    literal-prefix pushed range scan + anchored full-match verify,
    identical expansion local/distributed and rank-identical scoring."""
    for pat in ["re(build|sume)", "c.*nt", "sc?an|in.*", "zz+q"]:
        exp = oracle.expand(pat, "regexp")
        assert index.expand_terms(pat, "regexp") == exp, pat
        assert index.expand_terms(pat, "regexp",
                                  distributed=True) == exp, pat
    exp_terms = oracle.expand("re(build|sume)", "regexp")
    assert exp_terms  # non-degenerate
    want = oracle.topk_terms(exp_terms, k=10)
    _check_rank_identical(
        index.pattern_topk("re(build|sume)", "regexp", k=10).toPandas(),
        want)
    _check_rank_identical(
        index.pattern_topk_local("re(build|sume)", "regexp", k=10),
        want)
    # invalid regex raises at expansion time, loudly
    import re as _re
    with pytest.raises(_re.error):
        index.expand_terms("re(", "regexp")
