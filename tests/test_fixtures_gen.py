"""Round-8 optimization pins: the vectorized fixture generator must be
value-identical to the original row-at-a-time reference implementation
(same RNG draw sequence, same strings), and the inverse-CDF token draw
must equal numpy's rng.choice exactly."""
import numpy as np
import pandas as pd
import pytest

from sparkfts.fixtures import make_transcripts, vocabulary


def _reference_make_transcripts(n_convs: int, seed: int) -> pd.DataFrame:
    """The pre-optimization generator, kept verbatim as the oracle."""
    import uuid
    from sparkfts.fixtures import EPOCH, ROLES, SHARED_PHRASES, TOOLS
    rng = np.random.default_rng(seed)
    vocab = vocabulary()
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    conv_lens = rng.integers(1, 41, size=n_convs)
    total = int(conv_lens.sum())
    conv_idx = np.repeat(np.arange(n_convs), conv_lens)
    turn_idx = np.concatenate(
        [np.arange(l) for l in conv_lens]).astype(np.int32)
    conv_ids = np.array([str(uuid.UUID(int=int(seed) * 10_000_019 + c))
                         for c in range(n_convs)])
    roles = ROLES[rng.integers(0, 4, size=total)]
    n_tokens = rng.integers(3, 81, size=total)
    flat = vocab[rng.choice(len(vocab), size=int(n_tokens.sum()),
                            p=probs)]
    bounds = np.cumsum(n_tokens)[:-1]
    texts = [" ".join(chunk) for chunk in np.split(flat, bounds)]
    punct = rng.random(total)
    phrase_pick = rng.integers(0, len(SHARED_PHRASES), size=total)
    for i in range(total):
        if punct[i] < 0.05:
            texts[i] = (texts[i] + ". "
                        + SHARED_PHRASES[phrase_pick[i]] + "!")
        elif punct[i] < 0.08:
            texts[i] = texts[i].replace(" ", ", ", 1) + "?"
    tool = np.where(roles == "tool",
                    TOOLS[rng.integers(0, len(TOOLS), size=total)], None)
    ts = EPOCH + (conv_idx * 3_600_000_000).astype("timedelta64[us]") \
        + (turn_idx.astype(np.int64) * 60_000_000).astype("timedelta64[us]")
    return pd.DataFrame({
        "conv_id": conv_ids[conv_idx],
        "turn_idx": turn_idx,
        "role": roles,
        "text": texts,
        "tool": tool,
        "ts": pd.Series(ts),
    })


@pytest.mark.parametrize("n_convs,seed", [(20, 42), (250, 42), (60, 7),
                                          (100, 43)])
def test_vectorized_generator_value_identical(n_convs, seed):
    a = _reference_make_transcripts(n_convs, seed)
    b = make_transcripts(n_convs, seed)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        assert a[c].tolist() == b[c].tolist(), c
    assert [str(d) for d in a.dtypes] == [str(d) for d in b.dtypes]


def test_inverse_cdf_equals_rng_choice():
    """The token draw replicates numpy Generator.choice(p=...) exactly:
    cumsum-normalized CDF + random(size) + searchsorted-right. If a
    numpy upgrade changes choice()'s internals this fails loudly (the
    fixture would silently change otherwise)."""
    v = 2000
    ranks = np.arange(1, v + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()
    r1 = np.random.default_rng(99)
    r2 = np.random.default_rng(99)
    a = r1.choice(v, size=200_000, p=probs)
    cdf = probs.cumsum()
    cdf /= cdf[-1]
    b = cdf.searchsorted(r2.random(200_000), side="right")
    assert np.array_equal(a, b)


def test_parquet_writer_matches_pandas_table(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from sparkfts.fixtures import write_transcripts_parquet
    p = str(tmp_path / "t.parquet")
    n = write_transcripts_parquet(p, 120, seed=5)
    got = pq.read_table(p)
    assert n == got.num_rows
    pdf = make_transcripts(120, seed=5)
    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("role", pa.string()), ("text", pa.string()),
        ("tool", pa.string()), ("ts", pa.timestamp("us")),
    ])
    ref = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    assert ref.equals(got)


def test_chunked_assembly_boundary_identical(monkeypatch):
    """The pyarrow text assembly is chunked by rows at large scale;
    chunk boundaries must not change any value."""
    import sparkfts.fixtures as fx
    ref = make_transcripts(200, seed=11)
    monkeypatch.setattr(fx, "_GEN_ROWS_PER_CHUNK", 37)
    got = fx.make_transcripts(200, seed=11)
    for c in ref.columns:
        assert ref[c].tolist() == got[c].tolist(), c
