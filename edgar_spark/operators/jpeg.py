"""JPEG (ITU-T T.81) codec in pure stdlib + numpy — no codec libraries.
Closes the image-codec stubs in ``multimodal.decode_image`` (H.264 video
remains the one declared boundary).

Scope: 8-bit sequential baseline AND progressive (SOF2: spectral
selection + successive approximation, EOB runs, per-spec DC arithmetic /
AC magnitude point transforms), grayscale (1 component) or YCbCr
(3 components), 4:4:4 and 4:2:0 chroma subsampling on both encode and
decode, the Annex K quantization and Huffman tables, IJG quality scaling,
restart intervals on decode. The progressive encoder uses the libjpeg
default scan script but pins EOB runs to one block, so the Annex K AC
tables (which lack EOBn symbols) stay sufficient; the decoder handles
arbitrary conformant scan scripts with full EOBn runs.

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


def _quant_blocks(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Level-shifted (H, W) float plane (multiples of 8) → (H/8, W/8, 64)
    int32 quantized coefficients in ZIGZAG order. FDCT is one broadcast
    matmul over all blocks, not a per-block Python loop."""
    h, w = plane.shape
    nbh, nbw = h // 8, w // 8
    blocks = plane.reshape(nbh, 8, nbw, 8).transpose(0, 2, 1, 3)
    coef = _T @ blocks @ _T.T
    q = _round_half_up(coef.reshape(nbh, nbw, 64) / qtbl.astype(np.float64))
    return q[..., ZIGZAG]


def _emit_block_zz(bw, zz, dc_codes, ac_codes, pred):
    """Baseline entropy coding of one block from its zigzag int coefs."""
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


def _prepare_components(px, quality, subsampling):
    """Pad, color-convert, subsample, and quantize every component.

    Returns (coefs, comps, geom): per-component (bh, bw, 64) int32 zigzag
    coefficient grids over the MCU-padded canvas, SOF component tuples
    (cid, hs, vs, tq), and (h, w, hmax, vmax, mcux, mcuy)."""
    h, w, ncomp = px.shape
    sub420 = ncomp == 3 and subsampling == "420"
    hmax = vmax = 2 if sub420 else 1
    ph = (h + 8 * vmax - 1) // (8 * vmax) * 8 * vmax
    pw = (w + 8 * hmax - 1) // (8 * hmax) * 8 * hmax
    padded = np.empty((ph, pw, ncomp), dtype=np.uint8)
    padded[:h, :w] = px
    padded[h:, :w] = px[h - 1 : h, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1 : w]
    ycc = (
        _rgb_to_ycbcr(padded.astype(np.float64))
        if ncomp == 3
        else padded.astype(np.float64)
    )
    qy = _scaled_qtbl(QTBL_LUMA, quality)
    qc = _scaled_qtbl(QTBL_CHROMA, quality)
    coefs, comps = [], []
    for ci in range(ncomp):
        hs = vs = hmax if ci == 0 else 1
        plane = ycc[:, :, ci]
        if hs != hmax or vs != vmax:  # chroma 2x2 box downsample
            plane = plane.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        qtbl = qy if ci == 0 else qc
        coefs.append(_quant_blocks(plane - 128.0, qtbl))
        comps.append((ci + 1, hs, vs, 0 if ci == 0 else 1))
    geom = (h, w, hmax, vmax, pw // (8 * hmax), ph // (8 * vmax))
    return coefs, comps, (qy, qc), geom


def _headers(progressive, h, w, comps, qy, qc):
    ncomp = len(comps)
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes(qy.flatten()[ZIGZAG].astype(np.uint8)))
    if ncomp == 3:
        out += _seg(
            0xDB, b"\x01" + bytes(qc.flatten()[ZIGZAG].astype(np.uint8))
        )
    cb = b""
    for cid, hs, vs, tq in comps:
        cb += bytes([cid, (hs << 4) | vs, tq])
    out += _seg(
        0xC2 if progressive else 0xC0,
        struct.pack(">BHHB", 8, h, w, ncomp) + cb,
    )
    out += _seg(0xC4, _dht_body(0x00, DC_LUMA_BITS, DC_LUMA_VALS))
    out += _seg(0xC4, _dht_body(0x10, AC_LUMA_BITS, AC_LUMA_VALS))
    if ncomp == 3:
        out += _seg(0xC4, _dht_body(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += _seg(0xC4, _dht_body(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS))
    return out


def _comp_grid(h, w, hs, vs, hmax, vmax):
    """Non-interleaved block grid (T.81 A.2.2): ceil over the component's
    OWN sample dimensions, not the MCU-padded canvas."""
    cw = (w * hs + hmax - 1) // hmax
    ch = (h * vs + vmax - 1) // vmax
    return (ch + 7) // 8, (cw + 7) // 8


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    progressive: bool = False,
) -> bytes:
    """uint8 pixels → JFIF bytes. (H, W) / (H, W, 1) encodes as grayscale,
    (H, W, 3) as YCbCr — 4:4:4 or 4:2:0 per ``subsampling``. Dimensions
    pad to the MCU by edge replication (the decoder crops back via SOF).
    quality follows the IJG scale; 100 = all-ones quant tables (the
    DC-exact regime). ``progressive=True`` emits SOF2 with the libjpeg
    default scan script (DC Al=1 → AC spectral bands → successive-
    approximation refinements), one EOB per block."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] not in (1, 3):
        raise ValueError(f"JPEG encode: {px.shape[2]} components unsupported")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w, ncomp = px.shape
    coefs, comps, (qy, qc), geom = _prepare_components(
        px, quality, subsampling
    )
    out = _headers(progressive, h, w, comps, qy, qc)
    if progressive:
        out += _emit_progressive_scans(coefs, comps, geom)
    else:
        _, _, hmax, vmax, mcux, mcuy = geom
        dc_t = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + [
            _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        ] * (ncomp - 1)
        ac_t = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS)] + [
            _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
        ] * (ncomp - 1)
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
        sos += b"\x00\x3f\x00"
        out += _seg(0xDA, sos)
        bw = _BitWriter()
        preds = [0] * ncomp
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (_cid, hs, vs, _tq) in enumerate(comps):
                    for bv in range(vs):
                        for bu in range(hs):
                            zz = coefs[ci][my * vs + bv, mx * hs + bu]
                            preds[ci] = _emit_block_zz(
                                bw, zz, dc_t[ci], ac_t[ci], preds[ci]
                            )
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------- progressive encoder
def _scan_script(ncomp):
    """libjpeg's default progressive scan script: ("dc", cis, ah, al) and
    ("ac", ci, ss, se, ah, al) steps. ah=0 ⇒ first pass, else refinement
    (ah must equal al+1)."""
    if ncomp == 1:
        return [
            ("dc", [0], 0, 1),
            ("ac", 0, 1, 5, 0, 2),
            ("ac", 0, 6, 63, 0, 2),
            ("ac", 0, 1, 63, 2, 1),
            ("dc", [0], 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    return [
        ("dc", [0, 1, 2], 0, 1),
        ("ac", 0, 1, 5, 0, 2),
        ("ac", 2, 1, 63, 0, 1),
        ("ac", 1, 1, 63, 0, 1),
        ("ac", 0, 6, 63, 0, 2),
        ("ac", 0, 1, 63, 2, 1),
        ("dc", [0, 1, 2], 1, 0),
        ("ac", 2, 1, 63, 1, 0),
        ("ac", 1, 1, 63, 1, 0),
        ("ac", 0, 1, 63, 1, 0),
    ]


def _emit_progressive_scans(coefs, comps, geom):
    h, w, hmax, vmax, mcux, mcuy = geom
    ncomp = len(comps)
    dc_codes = [
        _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
        if ci == 0
        else _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
        for ci in range(ncomp)
    ]
    ac_codes = [
        _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        if ci == 0
        else _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
        for ci in range(ncomp)
    ]
    out = bytearray()
    for step in _scan_script(ncomp):
        bw = _BitWriter()
        if step[0] == "dc":
            _, cis, ah, al = step
            hdr = bytes([len(cis)])
            for ci in cis:
                hdr += bytes([comps[ci][0], (0 if ci == 0 else 1) << 4])
            hdr += bytes([0, 0, (ah << 4) | al])
            preds = {ci: 0 for ci in cis}
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in cis:
                        _cid, hs, vs, _tq = comps[ci]
                        for bv in range(vs):
                            for bu in range(hs):
                                dc = int(
                                    coefs[ci][my * vs + bv, mx * hs + bu, 0]
                                )
                                if ah:  # refinement: one raw bit
                                    bw.write((dc >> al) & 1, 1)
                                else:
                                    v = dc >> al  # arithmetic shift (spec)
                                    cat, bits = _magnitude(v - preds[ci])
                                    preds[ci] = v
                                    code, ln = dc_codes[ci][cat]
                                    bw.write(code, ln)
                                    bw.write(bits, cat)
        else:
            _, ci, ss, se, ah, al = step
            _cid, hs, vs, _tq = comps[ci]
            hdr = bytes(
                [1, comps[ci][0], 0 if ci == 0 else 1, ss, se, (ah << 4) | al]
            )
            nbh, nbw = _comp_grid(h, w, hs, vs, hmax, vmax)
            emit = _emit_ac_refine_block if ah else _emit_ac_first_block
            for by in range(nbh):
                for bx in range(nbw):
                    emit(bw, coefs[ci][by, bx], ss, se, al, ac_codes[ci])
        bw.flush()
        out += _seg(0xDA, hdr)
        out += bw.out
    return out


def _emit_ac_first_block(bw, zz, ss, se, al, ac):
    """AC spectral-selection first pass: magnitude point transform
    (sign · (|v| >> al)), ZRL for 16-runs, EOB pinned to this block."""
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15:
            code, ln = ac[0xF0]
            bw.write(code, ln)
            r -= 16
        if v < 0:
            t = -t
        cat, bits = _magnitude(t)
        code, ln = ac[(r << 4) | cat]
        bw.write(code, ln)
        bw.write(bits, cat)
        r = 0
    if r:
        code, ln = ac[0x00]  # EOB0
        bw.write(code, ln)


def _emit_ac_refine_block(bw, zz, ss, se, al, ac):
    """AC successive-approximation refinement (T.81 G.1.2.3 / libjpeg
    encode_mcu_AC_refine): runs count zero-HISTORY positions; positions
    already significant contribute buffered correction bits, flushed
    after each emitted symbol; trailing state folds into this block's
    EOB. EOB runs are pinned to one block (Annex K tables lack EOBn)."""
    vals = [int(zz[k]) for k in range(ss, se + 1)]
    sh = [abs(v) >> al for v in vals]
    eob = -1
    for i, t in enumerate(sh):
        if t == 1:
            eob = i
    r, pending = 0, []
    for i, t in enumerate(sh):
        if t == 0:
            r += 1
            continue
        while r > 15 and i <= eob:
            code, ln = ac[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in pending:
                bw.write(b, 1)
            pending = []
        if t > 1:  # already significant: buffer the next magnitude bit
            pending.append(t & 1)
            continue
        code, ln = ac[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if vals[i] > 0 else 0, 1)  # sign of the new ±1<<al
        for b in pending:
            bw.write(b, 1)
        pending = []
        r = 0
    if r > 0 or pending:
        code, ln = ac[0x00]  # EOB0 absorbs trailing zeros + corrections
        bw.write(code, ln)
        for b in pending:
            bw.write(b, 1)


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


def _next_marker(payload: bytes, pos: int) -> int:
    """Skip entropy-coded bytes from ``pos`` to the next true marker
    (stuffed FF00, fill FFs, and RSTn are entropy content, not markers)."""
    n = len(payload)
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            pos += 1
        elif payload[pos + 1] == 0x00:
            pos += 2
        elif payload[pos + 1] == 0xFF:
            pos += 1
        elif 0xD0 <= payload[pos + 1] <= 0xD7:
            pos += 2
        else:
            return pos
    return n


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF bytes → RGB (H, W, 3) uint8 (grayscale replicated). Supports
    conformant sequential-baseline (SOF0/1) and progressive (SOF2)
    streams — gray/4:4:4/4:2:0, spectral selection, successive
    approximation, EOB runs, multiple DQT/DHT segments, restart
    intervals, APPn/COM skip. Raises NotImplementedError for 12-bit,
    arithmetic-coded, lossless/hierarchical, or >2x sampling-factor
    streams; ValueError for malformed data."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables = {}
    dc_tabs, ac_tabs = {}, {}
    sof = None
    progressive = False
    prog_coefs = None
    prog_geom = None
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
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
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
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
            ns = body[0] if body else 0
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS segment")
            scan_tabs = []
            for i in range(ns):
                cid, tsel = body[1 + 2 * i], body[2 + 2 * i]
                scan_tabs.append((cid, tsel >> 4, tsel & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            for cid, _td, _ta in scan_tabs:
                if not any(c[0] == cid for c in sof[2]):
                    raise ValueError(f"SOS references unknown component {cid}")
            if not progressive:
                if ns != len(sof[2]):
                    # spec-legal baseline streams may carry one scan per
                    # component (non-interleaved); _decode_scan assumes a
                    # single fully-interleaved scan — fail loud, not wrong
                    raise NotImplementedError(
                        f"non-interleaved baseline scan ({ns} of "
                        f"{len(sof[2])} components)"
                    )
                for _cid, td, ta in scan_tabs:
                    if td not in dc_tabs or ta not in ac_tabs:
                        raise ValueError(
                            f"SOS references missing DHT {td}/{ta}"
                        )
                for _cid, _hs, _vs, tq in sof[2]:
                    if tq not in qtables:
                        raise ValueError(f"SOF references missing DQT {tq}")
                data = payload[pos:]
                return _decode_scan(
                    sof, qtables, dc_tabs, ac_tabs, scan_tabs, data,
                    restart_interval,
                )
            if prog_coefs is None:
                prog_geom = _prog_geometry(sof)
                _h, _w, _hm, _vm, mcux, mcuy = prog_geom
                prog_coefs = [
                    np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32)
                    for (_cid, hs, vs, _tq) in sof[2]
                ]
            br = _BitReader(payload[pos:])
            _decode_prog_scan(
                br, sof, prog_geom, prog_coefs, dc_tabs, ac_tabs,
                scan_tabs, ss, se, ah, al, restart_interval,
            )
            pos = _next_marker(payload, pos + br.pos)
        # APPn / COM / others: skipped
    if progressive and prog_coefs is not None:
        for _cid, _hs, _vs, tq in sof[2]:
            if tq not in qtables:
                raise ValueError(f"SOF references missing DQT {tq}")
        return _finalize_prog(sof, qtables, prog_coefs, prog_geom)
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
    return _planes_to_image(planes, comps, h, w, hmax, vmax, mcux, mcuy)


def _planes_to_image(planes, comps, h, w, hmax, vmax, mcux, mcuy):
    """Upsample per-component planes to full resolution (nearest-neighbor
    — the spec-legal baseline; libjpeg's "fancy" upsampling is a filter
    choice), color-convert, crop to the SOF dimensions."""
    ncomp = len(comps)
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


# ------------------------------------------------- progressive decoder
def _prog_geometry(sof):
    h, w, comps = sof
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return (h, w, hmax, vmax, mcux, mcuy)


def _skip_rst(br):
    """Byte-align and consume restart markers at the reader position."""
    br.nbits = 0
    br.acc = 0
    while (
        br.pos + 1 < len(br.data)
        and br.data[br.pos] == 0xFF
        and 0xD0 <= br.data[br.pos + 1] <= 0xD7
    ):
        br.pos += 2


def _dc_first_block(br, dc_tab, blk, pred, al):
    sym_d, len_d = dc_tab
    p = br.peek16()
    cat, ln = int(sym_d[p]), int(len_d[p])
    if ln == 0:
        raise ValueError("bad DC Huffman code")
    br.read(ln)
    pred += _extend(br.read(cat), cat)
    blk[0] = pred << al
    return pred


def _ac_first_block(br, ac_tab, blk, ss, se, al, eobrun):
    """Spectral-selection first pass (T.81 G.1.2.2 decode): EOBn runs
    span whole blocks; new coefficients arrive point-transformed."""
    if eobrun > 0:
        return eobrun - 1
    sym_a, len_a = ac_tab
    k = ss
    while k <= se:
        p = br.peek16()
        rs, ln = int(sym_a[p]), int(len_a[p])
        if ln == 0:
            raise ValueError("bad AC Huffman code")
        br.read(ln)
        r, s = rs >> 4, rs & 0xF
        if s:
            k += r
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(br.read(s), s) << al
            k += 1
        else:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read(r)
                return eobrun
            k += 16  # ZRL
    return 0


def _ac_refine_block(br, ac_tab, blk, ss, se, al, eobrun):
    """Successive-approximation refinement (T.81 G.1.2.3 decode): runs
    count zero-history positions; every nonzero-history position passed
    consumes one correction bit; EOB absorbs the rest of the band."""
    sym_a, len_a = ac_tab
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            p = br.peek16()
            rs, ln = int(sym_a[p]), int(len_a[p])
            if ln == 0:
                raise ValueError("bad AC Huffman code")
            br.read(ln)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s:
                if s != 1:
                    raise ValueError("refinement magnitude != 1")
                val = p1 if br.read(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.read(r)
                break
            while k <= se:
                c = int(blk[k])
                if c != 0:
                    if br.read(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("refinement run past band end")
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c != 0 and br.read(1) and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(br, sof, geom, coefs, dc_tabs, ac_tabs, scan_tabs,
                      ss, se, ah, al, restart_interval):
    h, w, hmax, vmax, mcux, mcuy = geom
    comps = sof[2]
    if ah not in (0, al + 1):
        raise ValueError(f"invalid successive approximation Ah={ah} Al={al}")
    order = []
    for cid, td, ta in scan_tabs:
        for ci, (scid, hs, vs, _tq) in enumerate(comps):
            if scid == cid:
                order.append((ci, hs, vs, td, ta))
    if len(order) != len(scan_tabs):
        raise ValueError("SOS references unknown component")

    if ss == 0:  # DC scan (first or refinement)
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        preds = {ci: 0 for ci, *_ in order}
        if ah == 0:
            for ci, _hs, _vs, td, _ta in order:
                if td not in dc_tabs:
                    raise ValueError(f"SOS references missing DC DHT {td}")

        def dc_unit(ci, by, bx, td):
            blk = coefs[ci][by, bx]
            if ah:
                if br.read(1):
                    blk[0] = int(blk[0]) | (1 << al)
            else:
                preds[ci] = _dc_first_block(br, dc_tabs[td], blk, preds[ci], al)

        if len(order) > 1:  # interleaved MCU walk
            unit = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and unit and unit % restart_interval == 0:
                        _skip_rst(br)
                        preds = {ci: 0 for ci, *_ in order}
                    for ci, hs, vs, td, _ta in order:
                        for bv in range(vs):
                            for bu in range(hs):
                                dc_unit(ci, my * vs + bv, mx * hs + bu, td)
                    unit += 1
        else:  # non-interleaved: the component's own ceil grid
            ci, hs, vs, td, _ta = order[0]
            nbh, nbw = _comp_grid(h, w, hs, vs, hmax, vmax)
            unit = 0
            for by in range(nbh):
                for bx in range(nbw):
                    if restart_interval and unit and unit % restart_interval == 0:
                        _skip_rst(br)
                        preds = {ci: 0}
                    dc_unit(ci, by, bx, td)
                    unit += 1
        return

    # AC scan: spec requires non-interleaved (one component)
    if len(order) != 1:
        raise ValueError("interleaved progressive AC scan")
    if se > 63 or ss > se:
        raise ValueError(f"bad spectral band {ss}..{se}")
    ci, hs, vs, _td, ta = order[0]
    if ta not in ac_tabs:
        raise ValueError(f"SOS references missing AC DHT {ta}")
    nbh, nbw = _comp_grid(h, w, hs, vs, hmax, vmax)
    decode = _ac_refine_block if ah else _ac_first_block
    eobrun = 0
    unit = 0
    for by in range(nbh):
        for bx in range(nbw):
            if restart_interval and unit and unit % restart_interval == 0:
                _skip_rst(br)
                eobrun = 0
            eobrun = decode(
                br, ac_tabs[ta], coefs[ci][by, bx], ss, se, al, eobrun
            )
            unit += 1


def _finalize_prog(sof, qtables, coefs, geom):
    """Dequantize + IDCT the accumulated coefficient grids (one broadcast
    matmul per component) and assemble the image."""
    h, w, comps = sof
    _h, _w, hmax, vmax, mcux, mcuy = geom
    planes = []
    for ci, (_cid, _hs, _vs, tq) in enumerate(comps):
        qz = qtables[tq].astype(np.float64)[ZIGZAG]
        zz = coefs[ci].astype(np.float64) * qz
        nat = np.zeros_like(zz)
        nat[..., ZIGZAG] = zz
        nbh, nbw = nat.shape[:2]
        blocks = _T.T @ nat.reshape(nbh, nbw, 8, 8) @ _T
        planes.append(
            blocks.transpose(0, 2, 1, 3).reshape(nbh * 8, nbw * 8) + 128.0
        )
    return _planes_to_image(planes, comps, h, w, hmax, vmax, mcux, mcuy)
