"""Baseline JPEG (ITU-T T.81) codec in pure stdlib + numpy — no codec
libraries. Closes the last image-codec stub in ``multimodal.decode_image``
(H.264 video remains the one declared boundary).

Scope: baseline sequential DCT, 8-bit, 4:4:4 (no chroma subsampling),
grayscale (1 component) or YCbCr (3 components), the Annex K quantization
and Huffman tables, IJG quality scaling, restart-marker-free scans. That
is a complete, spec-conformant encoder and a decoder for everything the
encoder emits plus any baseline 4:4:4 / grayscale JFIF stream.

Exactness contract used by the ``mm_jpeg_stats`` driver key: JPEG is
lossy, but an image whose every 8×8 block is a CONSTANT color has only DC
energy — the AC coefficients are mathematically zero (cosine sums over a
constant cancel; float64 residue ~1e-13 rounds to 0) — so at quality 100
(all-ones quantization, per the IJG formula) the roundtrip reduces to the
exact integer/float chain  rgb → ycbcr (float) → dc = floor(8·(ycc−128)
+ 0.5) → ycc' = dc/8 + 128 → rgb' = clamp(floor(inv·ycc' + 0.5))  which a
SQL oracle replays bit-for-bit. Rounding is explicit floor(x+0.5)
everywhere — numpy's banker's rounding and SQL ROUND disagree at .5.

Reference parity note: the reference repo has no multimedia surface; this
module exists for the LLM-training-pipeline axis (multimodal columns) the
build brief adds on top of the reference's operators.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# ---------------------------------------------------------------- tables
# ITU-T T.81 Annex K.1 — luminance / chrominance quantization tables
QTBL_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QTBL_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag order: ZIGZAG[i] = natural index of the i-th zigzag coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthogonal 8-point DCT-II basis, T[u, x] = 0.5 * C(u) * cos((2x+1)uπ/16)
# so that F = T @ f @ T.T matches the T.81 FDCT (constant v ⇒ F[0,0] = 8v)
_T = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _T[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5) — the explicit rounding both codec halves and the
    SQL oracle share (numpy's round() is banker's; SQL ROUND is not)."""
    return np.floor(x + 0.5).astype(np.int32)


def _scaled_qtbl(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100; 50 = Annex K verbatim; 100 = all-ones
    (the lossless-DC regime the exactness oracle uses)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    tbl = (base * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int32)


# ------------------------------------------------------------- bit writer
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _build_codes(bits, vals):
    """(BITS, HUFFVAL) → {symbol: (code, length)} canonical Huffman."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple:
    """(category, bits) per T.81 F.1.2.1: bits are v if v>0 else v-1 in
    category-width two's complement."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_block(bw, block, qtbl, dc_codes, ac_codes, pred):
    coef = _T @ block @ _T.T
    q = _round_half_up(coef.flatten() / qtbl.astype(np.float64))
    zz = q[ZIGZAG]
    diff = int(zz[0]) - pred
    cat, bits = _magnitude(diff)
    code, ln = dc_codes[cat]
    bw.write(code, ln)
    bw.write(bits, cat)
    run = 0
    last_nz = 0
    for i in range(1, 64):
        if zz[i]:
            last_nz = i
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(bits, cat)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(_round_half_up(rgb), 0, 255).astype(np.uint8)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _dht_body(tc_th: int, bits, vals) -> bytes:
    return bytes([tc_th]) + bytes(bits) + bytes(vals)


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """uint8 pixels → baseline JFIF bytes. (H, W) / (H, W, 1) encodes as
    grayscale, (H, W, 3) as YCbCr 4:4:4. Dimensions are padded to 8 by
    edge replication (standard practice; the decoder crops back via the
    SOF dimensions). quality follows the IJG scale; 100 = all-ones quant
    tables (the DC-exact regime)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ncomp = px.shape
    if ncomp not in (1, 3):
        raise ValueError(f"JPEG encode: {ncomp} components unsupported")
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.empty((ph, pw, ncomp), dtype=np.uint8)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1 : w]

    if ncomp == 3:
        planes = _rgb_to_ycbcr(padded.astype(np.float64))
    else:
        planes = padded.astype(np.float64)

    qy = _scaled_qtbl(QTBL_LUMA, quality)
    qc = _scaled_qtbl(QTBL_CHROMA, quality)
    dc_y = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes(qy.flatten()[ZIGZAG].astype(np.uint8)))
    if ncomp == 3:
        out += _seg(
            0xDB, b"\x01" + bytes(qc.flatten()[ZIGZAG].astype(np.uint8))
        )
    comps = b""
    for ci in range(ncomp):
        comps += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    out += _seg(0xC4, _dht_body(0x00, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xC4, _dht_body(0x10, AC_LUMA_BITS, AC_LUMA_VALS))
    if ncomp == 3:
        out += _seg(0xC4, _dht_body(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += _seg(0xC4, _dht_body(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * ncomp
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for ci in range(ncomp):
                block = planes[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, ci]
                block = block - 128.0
                qtbl = qy if ci == 0 else qc
                dc = dc_y if ci == 0 else dc_c
                ac = ac_y if ci == 0 else ac_c
                preds[ci] = _encode_block(
                    bw, block, qtbl.flatten().astype(np.float64), dc, ac,
                    preds[ci],
                )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- bit reader
class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad past end per spec
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker: stop consuming, pad with 1s
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def peek16(self) -> int:
        self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF


def _build_decode_table(bits, vals):
    """(BITS, HUFFVAL) → 16-bit-peek lookup {prefix: (symbol, length)}
    packed as two arrays for O(1) decode."""
    lut_sym = np.full(1 << 16, -1, dtype=np.int32)
    lut_len = np.zeros(1 << 16, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            prefix = code << (16 - length)
            span = 1 << (16 - length)
            lut_sym[prefix : prefix + span] = vals[k]
            lut_len[prefix : prefix + span] = length
            code += 1
            k += 1
        code <<= 1
    return lut_sym, lut_len


def _extend(v: int, cat: int) -> int:
    if cat == 0:
        return 0
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → RGB (H, W, 3) uint8 (grayscale replicated).
    Supports what a conformant baseline 4:4:4 / grayscale stream carries:
    multiple DQT/DHT segments, restart intervals, APPn/COM skip. Raises
    NotImplementedError for progressive (SOF2), 12-bit, subsampled, or
    arithmetic-coded streams; ValueError for malformed data."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables = {}
    dc_tabs, ac_tabs = {}, {}
    sof = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker code — skip them rather than parsing the next two bytes
        # as a bogus segment length
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(payload):
            break
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are standalone (length-less) markers
            pos += 2
            continue
        if pos + 4 > len(payload):
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = body
            while b:
                if len(b) < 65:
                    raise ValueError("truncated DQT segment")
                pq, tq = b[0] >> 4, b[0] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(b[1:65], dtype=np.uint8)
                qtables[tq] = tbl
                b = b[65:]
        elif marker == 0xC4:  # DHT
            b = body
            while b:
                if len(b) < 17:
                    raise ValueError("truncated DHT segment")
                tc, th = b[0] >> 4, b[0] & 0xF
                bits = list(b[1:17])
                n = sum(bits)
                vals = list(b[17 : 17 + n])
                if len(vals) < n:
                    raise ValueError("truncated DHT value list")
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_decode_table(
                    bits, vals
                )
                b = b[17 + n :]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if len(body) < 6:
                raise ValueError("truncated SOF segment")
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for i in range(ncomp):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                hs, vs = samp >> 4, samp & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factors {hs}x{vs} (only 1-2 supported)"
                    )
                comps.append((cid, hs, vs, tq))
            sof = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            if len(body) < 1 or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated SOS segment")
            ns = body[0]
            if ns != len(sof[2]):
                # spec-legal baseline streams may carry one scan per
                # component (non-interleaved); _decode_scan assumes a
                # single fully-interleaved scan — fail loud, not wrong
                raise NotImplementedError(
                    f"non-interleaved baseline scan ({ns} of "
                    f"{len(sof[2])} components)"
                )
            scan_tabs = []
            for i in range(ns):
                cid, tsel = body[1 + 2 * i], body[2 + 2 * i]
                scan_tabs.append((cid, tsel >> 4, tsel & 0xF))
            for cid, td, ta in scan_tabs:
                if td not in dc_tabs or ta not in ac_tabs:
                    raise ValueError(f"SOS references missing DHT {td}/{ta}")
                if not any(c[0] == cid for c in sof[2]):
                    raise ValueError(f"SOS references unknown component {cid}")
            for _cid, _hs, _vs, tq in sof[2]:
                if tq not in qtables:
                    raise ValueError(f"SOF references missing DQT {tq}")
            data = payload[pos:]
            return _decode_scan(
                sof, qtables, dc_tabs, ac_tabs, scan_tabs, data,
                restart_interval,
            )
        # APPn / COM / others: skipped
    raise ValueError("JPEG stream has no SOS")


def _decode_scan(sof, qtables, dc_tabs, ac_tabs, scan_tabs, data,
                 restart_interval):
    h, w, comps = sof
    ncomp = len(comps)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # one plane per component at ITS resolution (MCU-padded)
    planes = [
        np.zeros((mcuy * 8 * vs, mcux * 8 * hs), dtype=np.float64)
        for (_cid, hs, vs, _tq) in comps
    ]
    # map scan component order onto SOF components
    order = []
    for cid, td, ta in scan_tabs:
        for ci, (scid, hs, vs, tq) in enumerate(comps):
            if scid == cid:
                order.append((ci, hs, vs, tq, td, ta))
    br = _BitReader(data)
    preds = [0] * ncomp
    mcu = 0
    idct = _T.T  # F = T f T' ⇒ f = T' F T

    def read_block(td, ta, tq, pred):
        sym_d, len_d = dc_tabs[td]
        sym_a, len_a = ac_tabs[ta]
        zz = np.zeros(64, dtype=np.float64)
        p = br.peek16()
        cat, ln = int(sym_d[p]), int(len_d[p])
        if ln == 0:
            raise ValueError("bad DC Huffman code")
        br.read(ln)
        diff = _extend(br.read(cat), cat)
        dc = pred + diff
        zz[0] = dc
        i = 1
        while i < 64:
            p = br.peek16()
            rs, ln = int(sym_a[p]), int(len_a[p])
            if ln == 0:
                raise ValueError("bad AC Huffman code")
            br.read(ln)
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                i += 16
                continue
            run, cat = rs >> 4, rs & 0xF
            i += run
            if i > 63:
                raise ValueError("AC run past block end")
            zz[i] = _extend(br.read(cat), cat)
            i += 1
        coef = np.zeros(64, dtype=np.float64)
        coef[ZIGZAG] = zz * qtables[tq].astype(np.float64)[ZIGZAG]
        block = idct @ coef.reshape(8, 8) @ _T
        return dc, block

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-align and consume the RSTn marker
                br.nbits = 0
                br.acc = 0
                while (
                    br.pos + 1 < len(br.data)
                    and br.data[br.pos] == 0xFF
                    and 0xD0 <= br.data[br.pos + 1] <= 0xD7
                ):
                    br.pos += 2
                preds = [0] * ncomp
            for ci, hs, vs, tq, td, ta in order:
                for bv in range(vs):
                    for bh in range(hs):
                        preds[ci], block = read_block(td, ta, tq, preds[ci])
                        y0 = (my * vs + bv) * 8
                        x0 = (mx * hs + bh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block + 128.0
            mcu += 1
    # upsample each component to full resolution (nearest-neighbor — the
    # spec-legal baseline; libjpeg's "fancy" upsampling is a filter choice)
    full = np.empty((mcuy * 8 * vmax, mcux * 8 * hmax, ncomp), np.float64)
    for ci, (_cid, hs, vs, _tq) in enumerate(comps):
        p = planes[ci]
        if hs != hmax or vs != vmax:
            p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        full[:, :, ci] = p
    if ncomp == 3:
        img = _ycbcr_to_rgb(full)
    else:
        gray = np.clip(_round_half_up(full[:, :, 0]), 0, 255).astype(np.uint8)
        img = np.repeat(gray[:, :, None], 3, axis=2)
    return img[:h, :w]
