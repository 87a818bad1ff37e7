"""Real PNG codec: pixel-exact round trips across all five scanline
filters, non-RGB color types decoded from hand-built files, integrity
errors, and the Spark decode_stats path against the generator math.

The encoder filters forward with vectorized predictions over ORIGINAL
bytes; the decoder reconstructs sequentially from decoded neighbors —
two independent implementations of the filter algebra, so agreement is
evidence, not an echo."""
import struct
import zlib

import numpy as np
import pytest


def _chunk(typ: bytes, data: bytes) -> bytes:
    # independent chunk writer (not the library's) for hand-built files
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _hand_png(w, h, depth, ctype, raw_rows: bytes, plte: bytes = b"",
              interlace=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(raw_rows)) \
        + _chunk(b"IEND", b"")


def test_png_roundtrip_every_filter():
    from datapipe.multimodal import decode_png, encode_png
    rng = np.random.default_rng(11)
    for f in range(5):
        px = rng.integers(0, 256, (9, 13, 3)).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(px, filters=[f])),
                              px), f"filter {f}"


def test_png_roundtrip_mixed_filters_random_sizes():
    from datapipe.multimodal import decode_png, encode_png
    rng = np.random.default_rng(12)
    for _ in range(25):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        px = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        filt = [int(x) for x in rng.integers(0, 5, h)]
        assert np.array_equal(decode_png(encode_png(px, filters=filt)),
                              px)


def test_png_multi_idat_and_split_stream():
    """Decoders must concatenate multiple IDAT chunks (spec-legal and
    common in the wild) before inflating."""
    from datapipe.multimodal import decode_png
    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, (6, 8, 3)).astype(np.uint8)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(6))
    comp = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 8, 6, 8, 2, 0, 0, 0)
    payload = (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", comp[:7]) + _chunk(b"IDAT", comp[7:])
               + _chunk(b"IEND", b""))
    assert np.array_equal(decode_png(payload), px)


def test_png_color_types_expand_to_rgb():
    from datapipe.multimodal import decode_png
    # grayscale (ct 0): value replicated across channels
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(3))
    out = decode_png(_hand_png(4, 3, 8, 0, raw))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))
    # gray+alpha (ct 4): alpha dropped
    ga = np.dstack([g, np.full((3, 4), 200, np.uint8)])
    raw = b"".join(b"\x00" + ga[y].tobytes() for y in range(3))
    out = decode_png(_hand_png(4, 3, 8, 4, raw))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))
    # RGBA (ct 6): alpha dropped
    rng = np.random.default_rng(14)
    rgba = rng.integers(0, 256, (3, 4, 4)).astype(np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(3))
    out = decode_png(_hand_png(4, 3, 8, 6, raw))
    assert np.array_equal(out, rgba[:, :, :3])
    # palette (ct 3): PLTE lookup
    plte = bytes(range(30))                       # 10 RGB entries
    idx = np.array([[0, 3, 9, 2]], dtype=np.uint8)
    raw = b"\x00" + idx.tobytes()
    out = decode_png(_hand_png(4, 1, 8, 3, raw, plte=plte))
    exp = np.frombuffer(plte, np.uint8).reshape(10, 3)[idx[0]]
    assert np.array_equal(out[0], exp)


def test_png_integrity_errors():
    from datapipe.multimodal import decode_png, encode_png
    px = np.zeros((2, 2, 3), np.uint8)
    good = encode_png(px)
    bad = bytearray(good)
    bad[-5] ^= 0x01                               # IEND crc — harmless
    bad[20] ^= 0x01                               # inside IHDR data
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\x89PNG\r\n\x1a\x00" + good[8:])
    # interlaced → declared unsupported, loud
    raw = b"\x00" + bytes(6)
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(_hand_png(2, 1, 8, 2, raw, interlace=1))
    # truncated pixel data
    with pytest.raises(ValueError, match="length mismatch"):
        decode_png(_hand_png(3, 2, 8, 2, b"\x00" + bytes(9)))
    # 16-bit depth → declared unsupported
    with pytest.raises(NotImplementedError):
        decode_png(_hand_png(1, 1, 16, 2, b"\x00" + bytes(6)))


def test_png_decode_image_dispatch_and_stub():
    from datapipe.multimodal import decode_image, encode_png
    rng = np.random.default_rng(15)
    px = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    payload = encode_png(px)
    assert np.array_equal(decode_image(payload, 0, 0), px)        # auto
    assert np.array_equal(decode_image(payload, 0, 0, real=True), px)
    # JPEG now routes to the real baseline decoder (malformed → loud)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0\x00\x04ab", 4, 4, real=True)
    # genuinely codec-less formats stay a declared stub
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBP", 4, 4, real=True)


def test_png_decode_stats_spark(spark):
    """Spark path: stats computed from REALLY decoded PNG bytes (all
    five filters in play) match the pixel-generator arithmetic."""
    from datapipe.multimodal import decode_stats, synth_png_media
    docs = spark.createDataFrame([(3,), (8,), (21,)], "doc_id long")
    got = {r["doc_id"]: r for r in
           decode_stats(synth_png_media(docs)).collect()}
    for d in (3, 8, 21):
        w, h = 16 + d % 8, 12 + d % 5
        i = np.arange(w * h * 3)
        v = (d * 11 + i * 17) % 256
        assert got[d]["width"] == w and got[d]["height"] == h
        assert got[d]["mean_px_r"] == round(float(v.mean()), 6)
        assert got[d]["mean_red_r"] == round(float(v[i % 3 == 0].mean()), 6)
        assert got[d]["max_px"] == int(v.max())
