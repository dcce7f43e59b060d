"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, partition-friendly
UDF signatures) is real and tested. Decode is REAL for the formats
decodable with stdlib ``struct``/``zlib`` + numpy alone — uncompressed
24/32-bpp BMP, 8-bit gray/RGB/RGBA PNG (all five scanline filters),
JPEG — baseline sequential AND progressive SOF2, gray/4:4:4/4:2:0
(``operators/jpeg.py``) — 16-bit PCM WAV, and MJPEG video in RIFF/AVI
(container walk + per-frame JPEG decode, below). The remaining honest
``NotImplementedError`` boundary is H.264 video (an AVI carrying an
H264 fccHandler raises it as a typed error); swap ``decode_image`` for
PIL/torchvision on a real cluster if that matters.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """RGB (H, W, 3) uint8 top-down → standard 24-bpp bottom-up BMP bytes
    (BITMAPFILEHEADER + BITMAPINFOHEADER, BGR, 4-byte row padding)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (stride - len(row))
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def encode_wav(samples: "np.ndarray", rate: int = 8000, n_channels: int = 1) -> bytes:
    """int16 samples (channel-interleaved, 1-D) → 16-bit PCM WAV bytes —
    the encoder twin of ``decode_wav`` (RIFF + fmt + data chunks)."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    block = n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, rate, rate * block, block, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _decode_bmp(payload: bytes) -> "np.ndarray":
    """Uncompressed 24/32-bpp BMP → RGB (H, W, 3) uint8 top-down."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (_, _, _, _, data_off) = struct.unpack_from("<2sIHHI", payload, 0)
    (hdr_sz, w, h, _planes, bpp, compression) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_sz < 40 or compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP variant not supported (header={hdr_sz}, bpp={bpp}, "
            f"compression={compression}); only uncompressed 24/32-bpp"
        )
    top_down = h < 0
    h = abs(h)
    ch = bpp // 8
    stride = (w * ch + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * ch].reshape(h, w, ch)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, 2::-1].copy()  # BGR(A) → RGB, drop alpha


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """16-bit PCM WAV → (sample_rate, float32 samples in [-1, 1), channels
    interleaved as (n_frames, n_channels))."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, n_ch, fmt_ok, data = 12, None, None, False, None
    while pos + 8 <= len(payload):
        cid, sz = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            audio_fmt, n_ch, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            fmt_ok = audio_fmt == 1 and bits == 16
            if not fmt_ok:
                raise NotImplementedError(
                    f"WAV variant not supported (fmt={audio_fmt}, bits={bits}); "
                    "only 16-bit PCM"
                )
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if not fmt_ok or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    return rate, samples.reshape(-1, n_ch)


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # grayscale, truecolor, truecolor+alpha


def _paeth_predict(a: "np.ndarray", b: "np.ndarray", c: "np.ndarray"):
    """Vectorized Paeth predictor (PNG spec §9.4): per byte lane, pick
    whichever of left/up/up-left is closest to a+b-c, ties a > b > c."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: "np.ndarray") -> bytes:
    """uint8 pixels → 8-bit PNG bytes. (H, W) or (H, W, 1) encodes as
    grayscale (color type 0), (H, W, 3) as truecolor (2), (H, W, 4) as
    truecolor+alpha (6). The scanline filter is ``y % 5`` so every stream
    of ≥5 rows exercises all five filters (None/Sub/Up/Average/Paeth) —
    the roundtrip oracle keys and the fuzz tests therefore cover each
    unfilter path, not just the easy ones. Filtering is whole-row numpy
    (forward filters read RAW neighbors, so there is no recurrence)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[ch]
    raw = px.reshape(h, w * ch).astype(np.int16)
    zero = np.zeros(ch, dtype=np.int16)
    prev = np.zeros(w * ch, dtype=np.int16)
    stream = bytearray()
    for y in range(h):
        row = raw[y]
        left = np.concatenate([zero, row[:-ch]])
        upleft = np.concatenate([zero, prev[:-ch]])
        ft = y % 5
        if ft == 0:
            f = row
        elif ft == 1:
            f = row - left
        elif ft == 2:
            f = row - prev
        elif ft == 3:
            f = row - ((left + prev) >> 1)
        else:
            f = row - _paeth_predict(left, prev, upleft)
        stream.append(ft)
        stream += (f % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(stream)))
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> "np.ndarray":
    """8-bit gray/RGB/RGBA PNG → RGB (H, W, 3) uint8 (gray replicated,
    alpha dropped — same contract as the 32-bpp BMP lane). Stdlib zlib +
    numpy only: chunk walk with CRC verification, one ``zlib.decompress``,
    then per-row unfiltering of all five filter types. None/Up are whole-
    row vector ops; Sub is an exact per-lane cumsum mod 256 (the
    recurrence recon[x] = filt[x] + recon[x-bpp] telescopes); Average and
    Paeth carry a true horizontal recurrence, so those rows walk pixels
    with the channel lanes still vectorized."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or comp or filt or interlace:
        raise NotImplementedError(
            f"PNG variant not supported (depth={depth}, color={color}, "
            f"interlace={interlace}); only 8-bit gray/RGB/RGBA, no interlace"
        )
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    data = zlib.decompress(bytes(idat))
    if len(data) != h * (stride + 1):
        raise ValueError(
            f"PNG scanline stream is {len(data)} bytes, want {h * (stride + 1)}"
        )
    arr = np.frombuffer(data, dtype=np.uint8).reshape(h, stride + 1)
    ftypes, rows = arr[:, 0], arr[:, 1:].astype(np.int64)
    recon = np.zeros((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    zero = np.zeros(ch, dtype=np.int64)
    for y in range(h):
        f, row = int(ftypes[y]), rows[y]
        if f == 0:
            cur = row
        elif f == 1:  # Sub: per-lane prefix sum, exact under mod 256
            cur = (row.reshape(w, ch).cumsum(axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f == 3:  # Average: left-recurrence, lanes vectorized
            cur = np.empty(stride, dtype=np.int64)
            left = zero
            for x in range(w):
                sl = slice(x * ch, (x + 1) * ch)
                left = (row[sl] + ((left + prev[sl]) >> 1)) % 256
                cur[sl] = left
        elif f == 4:  # Paeth: left-recurrence, lanes vectorized
            cur = np.empty(stride, dtype=np.int64)
            left, upleft = zero, zero
            for x in range(w):
                sl = slice(x * ch, (x + 1) * ch)
                up = prev[sl]
                left = (row[sl] + _paeth_predict(left, up, upleft)) % 256
                cur[sl] = left
                upleft = up
        else:
            raise ValueError(f"PNG filter type {f} is invalid")
        recon[y] = cur
        prev = cur
    img = recon.astype(np.uint8).reshape(h, w, ch)
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    return img[:, :, :3].copy()


def decode_image(payload: bytes) -> "np.ndarray":
    """binary → RGB (H, W, 3) uint8. BMP (uncompressed 24/32-bpp), PNG
    (8-bit gray/RGB/RGBA, all five filters), and JPEG (8-bit baseline
    sequential + progressive SOF2, gray/4:4:4/4:2:0 —
    operators/jpeg.py) are decoded for real in stdlib struct/zlib +
    numpy. 12-bit/arithmetic/lossless JPEG raises inside the JPEG
    module; everything else lands here."""
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from edgar_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "image decode: only BMP/PNG/baseline-JPEG decodable without codec "
        "libraries in this environment (got magic %r)" % payload[:4]
    )


def fake_features(payload: bytes, n: int = 8) -> np.ndarray:
    """Deterministic stand-in feature extractor: byte-histogram moments.
    Same contract (binary → float vector) as a real embedding model."""
    if not payload:
        return np.zeros(n, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % n, minlength=n).astype(np.float32)
    return hist / hist.sum()


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id", n: int = 8
) -> DataFrame:
    """binary → array<float> features via Arrow-batched mapInPandas (the
    real-model call site; batch shape = one media blob per row). Decodable
    payloads (BMP) get real pixel features — per-channel means/stds plus
    normalized dims; everything else falls back to the deterministic
    byte-histogram stand-in."""

    def one(p: bytes) -> list:
        try:
            img = decode_image(p).astype(np.float32)
            h, w, _ = img.shape
            feats = np.concatenate(
                [
                    img.mean(axis=(0, 1)) / 255.0,
                    img.std(axis=(0, 1)) / 255.0,
                    [np.log1p(h) / 10.0, np.log1p(w) / 10.0],
                ]
            ).astype(np.float32)
            return np.resize(feats, n).tolist()
        except (NotImplementedError, ValueError):
            return fake_features(p, n).tolist()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, payload_col).mapInPandas(
        gen, schema=f"{id_col} long, features array<float>"
    )


def image_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = True,
) -> DataFrame:
    """Real-decode stats stage: (id, width, height, mean_all, mean_b) per
    BMP payload — the post-prune step after ``byte_stats`` filtering. Means
    are rounded to 6 dp for cross-engine comparability; mean_b is the blue
    channel specifically, so a BGR/RGB channel-order bug cannot pass.

    ``strict=False`` is the 100 TB posture: an undecodable payload yields a
    row of NULL stats instead of failing the whole task — one poisoned blob
    in a billion must not kill the job; count the NULL rows as decode
    failures downstream."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {id_col: [], "width": [], "height": [], "mean_all": [], "mean_b": []}
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    img = decode_image(p)
                except (NotImplementedError, ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    img = None
                out[id_col].append(mid)
                if img is None:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["mean_all"].append(None)
                    out["mean_b"].append(None)
                else:
                    out["width"].append(img.shape[1])
                    out["height"].append(img.shape[0])
                    out["mean_all"].append(round(float(img.mean()), 6))
                    out["mean_b"].append(round(float(img[:, :, 2].mean()), 6))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        gen,
        schema=f"{id_col} long, width int, height int, mean_all double, mean_b double",
    )


def byte_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata pass that never leaves the JVM: payload length and a
    stable content hash — the pruning/pre-filter stage before any decode."""
    return df.select(
        "*",
        F.length(F.col(payload_col)).alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("payload_md5"),
    )


def audio_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Real-decode audio stats: (id, sample_rate, n_frames, n_channels,
    duration_ms, rms) per 16-bit PCM WAV payload — the audio twin of
    ``image_stats``, same Arrow-batched shape."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: [], "sample_rate": [], "n_frames": [],
                "n_channels": [], "duration_ms": [], "rms": [],
            }
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                rate, samples = decode_wav(p)
                out[id_col].append(mid)
                out["sample_rate"].append(rate)
                out["n_frames"].append(samples.shape[0])
                out["n_channels"].append(samples.shape[1])
                out["duration_ms"].append(int(samples.shape[0] * 1000 / rate))
                # float64 accumulation: the float32 samples are exact
                # (int16/2^15 dyadic rationals), so the double mean/sqrt
                # is bit-reproducible by any IEEE engine — SQL-oracle-able
                out["rms"].append(
                    round(float(np.sqrt(np.mean(np.square(samples.astype(np.float64))))), 6)
                    if samples.size
                    else 0.0
                )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        gen,
        schema=(
            f"{id_col} long, sample_rate int, n_frames int, "
            "n_channels int, duration_ms int, rms double"
        ),
    )


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    silence_abs: int = 512,
) -> DataFrame:
    """Audio feature pass over REAL WAV decode — the speech-data curation
    primitives next to ``audio_stats``: (id, n_samples, zcr, peak,
    n_silent) where zcr counts strict sign changes between adjacent
    channel-0 samples (the classic voiced/unvoiced heuristic), peak is
    the max absolute int16 amplitude across all channels, and n_silent
    counts samples under ``silence_abs`` (clip-level silence trimming).
    All-integer state on the exact int16 grid (the float32 samples are
    dyadic rationals, reconstructed losslessly), so the oracle replays
    every value exactly. Same Arrow-batched shape as the other decode
    stages; JVM prunes columns before decode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: [], "n_samples": [], "zcr": [], "peak": [],
                "n_silent": [],
            }
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                _rate, samples = decode_wav(p)
                ints = np.round(samples.astype(np.float64) * 32768.0).astype(
                    np.int64
                )
                ch0 = ints[:, 0] if ints.size else np.zeros(0, np.int64)
                out[id_col].append(mid)
                out["n_samples"].append(int(ints.size))
                out["zcr"].append(int(((ch0[:-1] * ch0[1:]) < 0).sum()))
                out["peak"].append(int(np.abs(ints).max()) if ints.size else 0)
                out["n_silent"].append(
                    int((np.abs(ints) < silence_abs).sum())
                )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        gen,
        schema=(
            f"{id_col} long, n_samples int, zcr int, peak int, n_silent int"
        ),
    )


def video_frame_sample(
    df: DataFrame,
    every_k: int = 2,
    bpp: int = 3,
    payload_col: str = "payload",
    id_col: str = "media_id",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """REAL frame sampling over raw video payloads: the payload is a
    concatenated sequence of fixed-size uncompressed frames
    (``width × height × bpp`` bytes — the raw twin of the H.264 stream
    whose codec decode is the declared ``NotImplementedError`` boundary in
    ``decode_image``); every ``every_k``-th frame is sliced out of the
    binary JVM-side (``substr`` on binary, column-valued offsets) and
    fingerprinted. Output: one row per sampled frame
    (id, frame_idx, n_frames, frame_md5). A trailing partial frame is
    dropped; an empty/short payload yields no rows.

    The whole plan is JVM column exprs — frame selection, slicing, and
    hashing never touch Python, so at 100 TB the decode-free sampling
    pass prunes to the frames worth shipping to a (Pandas-UDF) decoder.

    Offsets: a Spark binary cell is structurally capped at 2 GiB (JVM
    byte[] — a larger video must be stored as per-chunk rows upstream),
    but ``substr`` takes INT positions, so a corrupt ``width × height``
    could still silently wrap the computed offset in non-ANSI mode and
    hash the wrong bytes. The explicit end-offset guard below drops any
    frame whose slice would exceed INT_MAX instead of wrapping."""
    frame_size = (
        F.col(width_col) * F.col(height_col) * F.lit(bpp)
    ).cast("long")
    n_frames = (F.length(payload_col) / frame_size).cast("long")
    sampled_idx = F.when(
        n_frames > 0,
        F.filter(
            F.sequence(F.lit(0).cast("long"), n_frames - 1),
            lambda i: i % every_k == 0,
        ),
    ).otherwise(F.array().cast("array<long>"))
    return (
        df.withColumn("_fs", frame_size)
        .withColumn("n_frames", n_frames)
        .withColumn("frame_idx", F.explode(sampled_idx))
        # all arithmetic stays LONG until the guard passes; only then is
        # the offset narrowed to the INT substr expects
        .filter(
            F.col("frame_idx") * F.col("_fs") + F.col("_fs")
            <= F.lit(2147483647).cast("long")
        )
        .select(
            id_col,
            "frame_idx",
            "n_frames",
            F.md5(
                F.col(payload_col).substr(
                    (F.col("frame_idx") * F.col("_fs") + 1).cast("int"),
                    F.col("_fs").cast("int"),
                )
            ).alias("frame_md5"),
        )
    )


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, duration_col: str = "duration_ms"
) -> DataFrame:
    """Video frame-sampling *plan*: one row per planned frame timestamp
    (explode of a sequence — pure JVM). The decode of each frame is the
    stubbed call above; the plan is what partitions/distributes."""
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )


def image_ahash(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = True,
) -> DataFrame:
    """Perceptual average-hash (aHash) over REAL image decode — the
    visual near-dup primitive: block-mean the image onto an 8×8 luma
    grid, threshold every cell against the grid total, pack the 64 bits
    into a signed two's-complement BIGINT. Downstream, Hamming distance
    is pure JVM (``bit_count(a ^ b)``) and the simhash chunk-banding
    machinery (dedup.simhash_near_dups) applies to the hash column
    unchanged for candidate generation at corpus scale.

    All-integer state, like the simhash/pagerank family: per-pixel luma
    is the channel SUM r+g+b (monotone-equivalent to the mean for
    thresholding — and channel-order invariant, so a BGR/RGB decoder
    bug cannot change the hash), cell values are exact integer block
    sums, and the threshold is cross-multiplied (``cell*64 >= total``).
    Exact on every engine — the driver key's oracle recomputes the hash
    from the pre-encode pixel definition in SQL.

    Dimensions not divisible by 8 yield NULL (strict=False) or raise
    (strict=True): averaging fractional blocks needs an interpolation
    choice that breaks exactness; a real cluster swaps in a PIL resize
    ahead of this operator and keeps the same contract.
    """

    def one(p: bytes):
        img = decode_image(p).astype(np.int64)
        h, w, _ = img.shape
        if h % 8 or w % 8:
            raise ValueError(f"ahash needs 8-divisible dims, got {h}x{w}")
        luma = img.sum(axis=2)
        bh, bw = h // 8, w // 8
        cells = luma.reshape(8, bh, 8, bw).sum(axis=(1, 3)).flatten()
        total = int(cells.sum())
        val = np.uint64(0)
        for i in range(64):
            if int(cells[i]) * 64 >= total:
                val |= np.uint64(1) << np.uint64(i)
        return int(val.astype(np.int64))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    hv = one(p)
                except (NotImplementedError, ValueError, IndexError, struct.error):
                    if strict:
                        raise
                    hv = None
                ids.append(mid)
                hashes.append(hv)
            yield pd.DataFrame({id_col: ids, "ahash": hashes})

    return df.select(id_col, payload_col).mapInPandas(
        gen, schema=f"{id_col} long, ahash long"
    )


# ------------------------------------------------- MJPEG video (RIFF/AVI)


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: "list[bytes]", width: int, height: int, fps: int = 10
) -> bytes:
    """Minimal spec-shaped AVI container around MJPEG frames: RIFF('AVI '
    LIST(hdrl avih LIST(strl strh strf)) LIST(movi 00dc…) idx1), with the
    idx1 index chunk backing the AVIF_HASINDEX flag. Motion JPEG
    is the web's lowest-common-denominator video codec (every frame is a
    standalone JFIF image — operators/jpeg.py decodes them for real),
    which makes it the one video format this environment can encode AND
    decode end-to-end without codec libraries; H.264 remains the
    declared stub. Header sizes follow the AVIMAINHEADER /
    AVISTREAMHEADER / BITMAPINFOHEADER layouts (56/56/40 bytes)."""
    n = len(frames)
    avih = (
        struct.pack(
            "<10I",
            1_000_000 // fps, 0, 0, 0x10, n, 0, 1, 0, width, height,
        )
        + b"\x00" * 16
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack("<III", 0, 0, 0)     # flags, prio+lang, initial
        + struct.pack("<II", 1, fps)       # scale, rate
        + struct.pack("<IIIiI", 0, n, 0, -1, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(
            b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)
        ),
    )
    chunks, offsets, off = [], [], 4  # offsets relative to 'movi' fourcc
    for f in frames:
        chunks.append(_riff_chunk(b"00dc", f))
        offsets.append(off)
        off += len(chunks[-1])
    movi = _riff_list(b"movi", b"".join(chunks))
    # idx1 backs the AVIF_HASINDEX flag set in avih: one 16-byte
    # AVIINDEXENTRY per frame (every MJPEG frame is a keyframe, 0x10).
    idx1 = _riff_chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, o, len(f))
            for o, f in zip(offsets, frames)
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _riff_walk(payload: bytes, pos: int, end: int):
    """Yield (fourcc, list_type, body_start, body_len) for each chunk in
    [pos, end); list_type is None for plain chunks. Malformed layouts
    raise ValueError (fail-loud: a truncated chunk must not silently
    drop trailing frames)."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("AVI: truncated chunk header")
        fourcc = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError("AVI: chunk overruns container")
        if fourcc == b"LIST":
            if size < 4:
                raise ValueError("AVI: LIST without a type")
            yield fourcc, payload[body_start : body_start + 4], body_start + 4, size - 4
        else:
            yield fourcc, None, body_start, size
        pos = body_start + size + (size % 2)  # chunks are word-aligned


def parse_avi_mjpeg(payload: bytes) -> "list[bytes]":
    """RIFF/AVI walk → the list of MJPEG frame payloads (each a complete
    JFIF stream for ``jpeg.decode_jpeg``). Streams are numbered by their
    ``strl`` position in ``hdrl``; the FIRST ``vids`` stream whose
    fccHandler is MJPG is decoded (so audio-first files — video chunks
    ``01dc`` — and files with a second non-MJPG video track both work),
    and its ``{nn}dc``/``{nn}db`` chunks are collected from ``movi``
    including inside classic ``rec `` interleave LISTs. If video streams
    exist but none is MJPG, the module's declared ``NotImplementedError``
    codec boundary is raised (typed error — never silently-wrong
    frames). Structural damage raises ValueError."""
    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    end = min(8 + struct.unpack("<I", payload[4:8])[0], len(payload))
    vids: "list[tuple[int, bytes]]" = []  # (stream index, fccHandler)
    movi_spans: "list[tuple[int, int]]" = []
    stream_idx = 0
    for fourcc, ltype, start, size in _riff_walk(payload, 12, end):
        if fourcc == b"LIST" and ltype == b"hdrl":
            for f2, l2, s2, z2 in _riff_walk(payload, start, start + size):
                if f2 == b"LIST" and l2 == b"strl":
                    for f3, _l3, s3, z3 in _riff_walk(payload, s2, s2 + z2):
                        if f3 == b"strh" and z3 >= 8:
                            if payload[s3 : s3 + 4] == b"vids":
                                vids.append(
                                    (stream_idx, payload[s3 + 4 : s3 + 8])
                                )
                    stream_idx += 1
        elif fourcc == b"LIST" and ltype == b"movi":
            movi_spans.append((start, size))
    if not vids:
        raise ValueError("AVI: no video stream header")
    mjpg = [(i, h) for i, h in vids if h.upper() == b"MJPG"]
    if not mjpg:
        raise NotImplementedError(
            "AVI video codec %r: only MJPG decodable without codec "
            "libraries in this environment (H.264 is the declared stub)"
            % vids[0][1]
        )
    want = {b"%02ddc" % mjpg[0][0], b"%02ddb" % mjpg[0][0]}
    frames: "list[bytes]" = []

    def collect(pos: int, limit: int) -> None:
        for f2, l2, s2, z2 in _riff_walk(payload, pos, limit):
            if f2 == b"LIST" and l2 == b"rec ":
                collect(s2, s2 + z2)
            elif f2 in want:
                frames.append(payload[s2 : s2 + z2])

    for start, size in movi_spans:
        collect(start, start + size)
    return frames


def mjpeg_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = True,
) -> DataFrame:
    """Real MJPEG video decode stats: container walk + per-frame JPEG
    decode → (id, n_frames, width, height, mean_all) with the mean over
    EVERY decoded frame's pixels (round 6 for cross-engine compare);
    width/height from the first frame. Same Arrow batch shape and
    ``strict=False`` poisoned-blob posture as ``image_stats``."""
    from edgar_spark.operators.jpeg import decode_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                id_col: [], "n_frames": [], "width": [], "height": [],
                "mean_all": [],
            }
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    frames = [decode_jpeg(f) for f in parse_avi_mjpeg(p)]
                    if not frames:
                        raise ValueError("AVI: zero frames")
                except (NotImplementedError, ValueError, IndexError,
                        struct.error):
                    if strict:
                        raise
                    frames = None
                out[id_col].append(mid)
                if frames is None:
                    for k in ("n_frames", "width", "height", "mean_all"):
                        out[k].append(None)
                else:
                    tot = sum(float(f.sum()) for f in frames)
                    cnt = sum(f.size for f in frames)
                    out["n_frames"].append(len(frames))
                    out["width"].append(frames[0].shape[1])
                    out["height"].append(frames[0].shape[0])
                    out["mean_all"].append(round(tot / cnt, 6))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        gen,
        schema=f"{id_col} long, n_frames int, width int, height int, "
        "mean_all double",
    )
