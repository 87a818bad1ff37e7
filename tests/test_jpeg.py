"""Baseline JPEG codec: bit-exact on block-constant fixtures, bounded
error on arbitrary images, restart markers, color path, declared-subset
errors, and the Spark decode_stats path against the generator math.

Encoder and decoder share only the public Annex K constant tables —
DCT/quantization/Huffman run in opposite directions through separate
code, so round-trip agreement is evidence, not an echo."""
import numpy as np
import pytest


def test_jpeg_block_constant_bit_exact():
    from datapipe.jpeg import decode_jpeg, encode_jpeg
    for d in (0, 7, 123, 255):
        h, w = 24, 32
        bv = ((d * 29 + np.add.outer(np.arange(h // 8) * 5,
                                     np.arange(w // 8) * 3)) % 256)
        px = np.repeat(np.repeat(bv, 8, 0), 8, 1).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(px))
        assert np.array_equal(out, np.repeat(px[:, :, None], 3, 2)), d


def test_jpeg_random_gray_bounded_error():
    from datapipe.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.default_rng(21)
    px = rng.integers(0, 256, (16, 40)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px))[:, :, 0].astype(int)
    assert np.abs(out - px.astype(int)).max() <= 4
    # all three channels equal for grayscale input
    full = decode_jpeg(encode_jpeg(px))
    assert np.array_equal(full[:, :, 0], full[:, :, 1])


def test_jpeg_rgb_444_bounded_error():
    from datapipe.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.default_rng(22)
    px = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(px)).astype(int)
    assert np.abs(out - px.astype(int)).max() <= 6


def test_jpeg_restart_markers():
    from datapipe.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.default_rng(23)
    px = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    with_rst = encode_jpeg(px, restart_interval=3)
    without = encode_jpeg(px)
    assert with_rst != without
    a = decode_jpeg(with_rst)
    b = decode_jpeg(without)
    assert np.array_equal(a, b)      # RST segmentation is transparent


def test_jpeg_coarse_quant_roundtrip():
    from datapipe.jpeg import decode_jpeg, encode_jpeg
    rng = np.random.default_rng(24)
    px = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    q = np.full(64, 16, np.int64)
    q[0] = 8
    out = decode_jpeg(encode_jpeg(px, quant=q))[:, :, 0].astype(int)
    # coarse quant: bounded by quantization step energy, still an image
    assert np.abs(out - px.astype(int)).mean() < 16


def test_jpeg_declared_subset_errors():
    from datapipe.jpeg import decode_jpeg, encode_jpeg
    px = np.zeros((8, 8), np.uint8)
    good = bytearray(encode_jpeg(px))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x00")
    # flip SOF0 -> SOF2 (progressive): declared unsupported
    i = good.find(b"\xff\xc0")
    prog = bytes(good[:i + 1]) + b"\xc2" + bytes(good[i + 2:])
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(prog)
    # truncated scan
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good[:i]))


def test_jpeg_decode_image_dispatch():
    from datapipe.jpeg import encode_jpeg
    from datapipe.multimodal import decode_image
    px = np.full((8, 8), 77, np.uint8)
    payload = encode_jpeg(px)
    out = decode_image(payload, 0, 0)          # auto-detects JPEG
    assert out.shape == (8, 8, 3) and (out == 77).all()


def test_jpeg_decode_stats_spark(spark):
    """Spark path: stats computed from REALLY decoded JPEG bytes match
    the block-value generator arithmetic (the dp_mm_jpeg_decode gate's
    oracle, evaluated in numpy here)."""
    from datapipe.multimodal import decode_stats, synth_jpeg_media
    docs = spark.createDataFrame([(4,), (9,), (17,)], "doc_id long")
    got = {r["doc_id"]: r for r in
           decode_stats(synth_jpeg_media(docs)).collect()}
    for d in (4, 9, 17):
        w, h = 16 + (d % 3) * 8, 16 + (d % 2) * 8
        bv = ((d * 29 + np.add.outer(np.arange(h // 8) * 5,
                                     np.arange(w // 8) * 3)) % 256)
        px = np.repeat(np.repeat(bv, 8, 0), 8, 1)
        v = np.repeat(px[:, :, None], 3, 2).ravel()
        assert got[d]["width"] == w and got[d]["height"] == h
        assert got[d]["mean_px_r"] == round(float(v.mean()), 6)
        assert got[d]["max_px"] == int(v.max())
