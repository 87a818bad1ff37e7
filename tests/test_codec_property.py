"""Property-based codec tests (hypothesis): encode→decode identity and
block-max upper-bound soundness over arbitrary posting shapes."""
import numpy as np
from hypothesis import given, settings, strategies as st

from sparkfts import codec


posting_lists = st.lists(
    st.tuples(st.integers(min_value=1, max_value=1 << 30),   # gap
              st.integers(min_value=1, max_value=1000),      # tf
              st.integers(min_value=1, max_value=5000)),     # dl
    min_size=1, max_size=600)


@settings(max_examples=60, deadline=None)
@given(posting_lists)
def test_roundtrip_identity(items):
    gaps = np.array([g for g, _, _ in items], dtype=np.int64)
    docids = np.cumsum(gaps)
    tfs = np.array([t for _, t, _ in items], dtype=np.int64)
    dls = np.array([l for _, _, l in items], dtype=np.int64)
    enc = codec.encode_postings(docids, tfs, dls)
    d, t, l = codec.decode_postings(enc["blob"], enc["block_off"],
                                    enc["block_n"])
    np.testing.assert_array_equal(d, docids)
    np.testing.assert_array_equal(t, tfs)
    np.testing.assert_array_equal(l, dls)
    assert enc["df"] == len(items)
    assert enc["cf"] == int(tfs.sum())


@settings(max_examples=60, deadline=None)
@given(posting_lists, st.floats(min_value=0.5, max_value=500))
def test_blockmax_is_sound_upper_bound(items, avgdl):
    gaps = np.array([g for g, _, _ in items], dtype=np.int64)
    docids = np.cumsum(gaps)
    tfs = np.array([t for _, t, _ in items], dtype=np.int64)
    dls = np.array([l for _, _, l in items], dtype=np.int64)
    enc = codec.encode_postings(docids, tfs, dls)
    partial = codec.bm25_partial(tfs, dls, avgdl)
    for i, (off, n) in enumerate(zip(enc["block_off"], enc["block_n"])):
        lo = i * codec.BLOCK
        hi = lo + int(n)
        # every true partial is dominated by partial(max_tf, min_dl)
        # under ANY avgdl (hypothesis draws it)
        ub = codec.bm25_partial(np.array([enc["block_max_tf"][i]]),
                                np.array([enc["block_min_dl"][i]]),
                                avgdl)[0]
        assert (partial[lo:hi] <= ub + 1e-15).all()
        assert enc["block_first"][i] <= enc["block_last"][i]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1),
                min_size=0, max_size=300))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    out, end = codec.varint_decode(codec.varint_encode(arr), len(arr))
    np.testing.assert_array_equal(out, arr)
