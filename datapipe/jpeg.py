"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy + stdlib.

A REAL decoder: marker parse (SOI/APPn/DQT/SOF0/DHT/DRI/SOS/EOI),
byte-unstuffing of the entropy-coded segment, canonical Huffman decode
of DC categories and AC run/size pairs, zigzag + dequantization, exact
orthonormal 2-D IDCT (matrix form), restart-marker DC-predictor resets,
and JFIF YCbCr→RGB. Supported subset (declared, loud): 8-bit baseline
(SOF0), grayscale or 3-component 4:4:4 (all sampling factors 1).
Progressive (SOF2), subsampled chroma, arithmetic coding, and 12-bit
raise NotImplementedError.

The encoder exists to fabricate test payloads: standard Annex K
luminance Huffman tables (published in the JPEG spec itself), caller-
supplied quantization table, forward DCT + round. Encoder and decoder
share only the constant tables — filtering/entropy directions are
independent implementations, so round-trip agreement is evidence.

Exactness property used by the correctness gate: for an image that is
CONSTANT within each 8x8 block, every AC coefficient is exactly 0 and
the DC coefficient is exactly 8*(v-128); with quant[0] == 1 the
round-trip is bit-exact for any v, so a SQL oracle can recompute the
decoded-pixel statistics from the block-value generator arithmetic with
no decoder on its side.

Reference note: the reference engine (elasticsearch-lambda) has no
media path at all; this file serves SURVEY §2B's training-data
multimodal track (decode stage), replacing the former declared stub.
"""
from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: zigzag_order[k] = (row, col) flat index of the k-th
# scanned coefficient (T.81 Figure 5)
_ZZ = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# orthonormal 8-point DCT-II basis: A @ x = dct(x); x = A.T @ X
_A = np.array([[np.sqrt((1 if k == 0 else 2) / 8.0)
                * np.cos((2 * n + 1) * k * np.pi / 16.0)
                for n in range(8)] for k in range(8)])

# Annex K.3 "typical" luminance Huffman tables (published in T.81).
# bits[i] = number of codes of length i+1; vals = symbols in code order.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]


def _canonical_codes(bits: list[int], vals: list[int]):
    """(symbol → (code, length)) and (length, code) → symbol maps from
    the BITS/HUFFVAL canonical-code construction (T.81 Annex C)."""
    enc, dec, code, k = {}, {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            sym = vals[k]
            enc[sym] = (code, ln)
            dec[(ln, code)] = sym
            code += 1
            k += 1
        code <<= 1
    return enc, dec


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:                      # byte stuffing
                self.out.append(0x00)
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)      # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self.n = 0


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_coeff_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _decode_coeff_bits(raw: int, cat: int) -> int:
    if cat == 0:
        return 0
    return raw if raw >= (1 << (cat - 1)) else raw - (1 << cat) + 1


def encode_jpeg(px: np.ndarray, quant: np.ndarray | None = None,
                restart_interval: int = 0) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB, stored 4:4:4) uint8 as
    baseline JFIF, Annex K luminance Huffman tables for every component.
    H and W must be multiples of 8 (fixture encoder — no edge padding)."""
    if quant is None:
        quant = np.ones(64, dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64).reshape(64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    assert h % 8 == 0 and w % 8 == 0, "fixture encoder needs 8-multiples"
    if gray:
        comps = [px.astype(np.float64)]
    else:
        rgb = px.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1]
             + 0.114 * rgb[..., 2])
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        comps = [y, cb, cr]
    dc_enc, _ = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_enc, _ = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    pred = [0] * len(comps)
    qzz = quant                                   # zigzag-order table
    mcu = 0
    chunks: list[bytes] = []
    for by in range(h // 8):
        for bx in range(w // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                chunks.append(bw.flush())
                chunks.append(bytes([0xFF,
                                     0xD0 + (mcu // restart_interval - 1) % 8]))
                bw = _BitWriter()
                pred = [0] * len(comps)
            for ci, comp in enumerate(comps):
                blk = comp[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] - 128.0
                coef = _A @ blk @ _A.T            # forward DCT
                zz = coef.reshape(64)[_ZZ]
                q = np.round(zz / qzz).astype(np.int64)
                diff = int(q[0]) - pred[ci]
                pred[ci] = int(q[0])
                cat = _category(diff)
                bw.put(*dc_enc[cat])
                if cat:
                    bw.put(_encode_coeff_bits(diff, cat), cat)
                nz = np.nonzero(q[1:])[0]
                run_from = 1
                for idx in nz + 1:
                    run = int(idx) - run_from
                    while run > 15:
                        bw.put(*ac_enc[0xF0])     # ZRL
                        run -= 16
                    cat = _category(int(q[idx]))
                    bw.put(*ac_enc[(run << 4) | cat])
                    bw.put(_encode_coeff_bits(int(q[idx]), cat), cat)
                    run_from = int(idx) + 1
                if run_from < 64:
                    bw.put(*ac_enc[0x00])         # EOB
            mcu += 1
    chunks.append(bw.flush())
    scan = b"".join(chunks)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    nc = len(comps)
    out = b"\xff\xd8"                              # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(int(x) for x in qzz))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])            # 1x1 sampling, qtab 0
    out += seg(0xC0, sof)
    out += seg(0xC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0x00])
                                 for ci in range(nc)) + b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    return out + scan + b"\xff\xd9"                # EOI


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode baseline JFIF to HxWx3 uint8 (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos, n = 2, len(payload)
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        # spec-legal 0xFF fill bytes may pad the space before any
        # marker code (ITU T.81 B.1.1.2) — skip the run, keeping one
        # 0xFF as the marker prefix
        while pos + 2 <= n and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            break
        marker = payload[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (TEM, RSTn) carry no length segment
            pos += 2
            continue
        if marker == 0xD9:                          # EOI
            break
        if pos + 4 > n:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2:pos + 4])
        body = payload[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:                          # DQT
            b = body
            while b:
                prec, tid = b[0] >> 4, b[0] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant table")
                qtabs[tid] = np.frombuffer(b[1:65], np.uint8) \
                    .astype(np.int64)
                b = b[65:]
        elif marker == 0xC4:                        # DHT
            b = body
            while b:
                cls, tid = b[0] >> 4, b[0] & 0x0F
                bits = list(b[1:17])
                nv = sum(bits)
                vals = list(b[17:17 + nv])
                _, dec = _canonical_codes(bits, vals)
                htabs[(cls, tid)] = dec
                b = b[17 + nv:]
        elif marker == 0xC0:                        # SOF0 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for ci in range(nc):
                cid, samp, qid = body[6 + 3 * ci:9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError(
                        "subsampled chroma (only 4:4:4/grayscale)")
                comps.append((cid, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF {marker - 0xC0})")
        elif marker == 0xDD:                        # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                        # SOS — scan follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            nc = body[0]
            sel = {}
            for ci in range(nc):
                cid, tt = body[1 + 2 * ci], body[2 + 2 * ci]
                sel[cid] = (tt >> 4, tt & 0x0F)
            return _decode_scan(payload, pos, frame, sel, qtabs, htabs,
                                restart)
        # APPn / COM / others: skipped
    raise ValueError("JPEG has no scan data")


def _decode_scan(payload, pos, frame, sel, qtabs, htabs, restart):
    fh, fw, comps = frame
    # entropy segment runs to the next non-RST marker; unstuff FF00 and
    # split on restart markers
    segments: list[bytes] = []
    cur = bytearray()
    i, n = pos, len(payload)
    while i < n:
        b = payload[i]
        if b == 0xFF:
            m = payload[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:                   # restart marker
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break                                   # EOI or next marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    bw_h = -(-fw // 8)
    bw_v = -(-fh // 8)
    planes = [np.zeros((bw_v * 8, bw_h * 8)) for _ in comps]
    dehuff = []
    for cid, qid in comps:
        dcc, acc = sel[cid]
        dehuff.append((htabs[(0, dcc)], htabs[(1, acc)],
                       qtabs[qid].astype(np.float64)))

    def read_sym(br: _BitReader, table: dict) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | br.bit()
            ln += 1
            s = table.get((ln, code))
            if s is not None:
                return s
        raise ValueError("invalid JPEG Huffman code")

    seg_idx = 0
    br = _BitReader(segments[0])
    pred = [0] * len(comps)
    mcu = 0
    total = bw_v * bw_h
    while mcu < total:
        if restart and mcu and mcu % restart == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("JPEG missing restart segment")
            br = _BitReader(segments[seg_idx])
            pred = [0] * len(comps)
        by, bx = divmod(mcu, bw_h)
        for ci, (dct, act, q) in enumerate(dehuff):
            zz = np.zeros(64)
            cat = read_sym(br, dct)
            diff = _decode_coeff_bits(br.bits(cat), cat) if cat else 0
            pred[ci] += diff
            zz[0] = pred[ci]
            k = 1
            while k < 64:
                rs = read_sym(br, act)
                run, cat = rs >> 4, rs & 0x0F
                if cat == 0:
                    if run == 15:                   # ZRL
                        k += 16
                        continue
                    break                           # EOB
                k += run
                if k > 63:
                    raise ValueError("JPEG AC index overflow")
                zz[k] = _decode_coeff_bits(br.bits(cat), cat)
                k += 1
            coef = np.zeros(64)
            coef[_ZZ] = zz * q
            blk = _A.T @ coef.reshape(8, 8) @ _A + 128.0
            planes[ci][by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = blk
        mcu += 1
    planes = [p[:fh, :fw] for p in planes]
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
