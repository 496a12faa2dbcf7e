"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with a typed metadata struct.
Decode kernels are REAL pure-numpy/stdlib implementations for the open
formats feasible without PIL/ffmpeg (absent in this container):

- **BMP**  — uncompressed 24-bit (BITMAPINFOHEADER, bottom-up rows,
  4-byte stride padding, BGR->RGB)
- **PNG**  — 8-bit gray/RGB/RGBA, non-interlaced: IDAT zlib inflate +
  all five scanline filters (None/Sub/Up/Average/Paeth) per the PNG spec
- **WAV**  — RIFF/WAVE PCM16: fmt/data chunk walk -> int16 sample matrix

Anything else (JPEG, video codecs) deliberately falls back to a
clearly-labeled deterministic RAW RASTER interpretation of the bytes —
a decode failure or unknown format must never fail the Spark task
(one-bad-row robustness rule); rows keep flowing with fallback features.

Scale notes: payload bytes travel executor->Python once per stage via
Arrow; keep all multimodal transforms in ONE ``mapInPandas`` stage
(compose kernels inside the iterator) to avoid repeated binary shuttling.
Batches are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
for multi-MB payloads set it low (e.g. 64) to cap executor memory.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),        # image|audio|video|unknown
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("magic_hex", T.StringType(), True),   # first-4-bytes sniff
        T.StructField("content_md5", T.StringType(), True),
    ]
)

# magic-byte prefixes -> kind (public file-format signatures)
_MAGIC = {
    "89504e47": "image",  # PNG
    "ffd8ffe0": "image",  # JPEG
    "52494646": "audio",  # RIFF/WAV (also AVI)
    "1a45dfa3": "video",  # Matroska/WebM
}


def sniff_media_meta(payload: Column) -> Column:
    """Typed metadata struct from an opaque binary column — fully native
    (octet length, hex prefix, md5), no Python, runs at scan speed."""
    magic = F.lower(F.hex(F.substring(payload, 1, 4)))
    kind = F.lit("unknown")
    for sig, k in _MAGIC.items():
        kind = F.when(magic == sig, F.lit(k)).otherwise(kind)
    return F.struct(
        kind.alias("kind"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        magic.alias("magic_hex"),
        F.md5(payload).alias("content_md5"),
    )


DECODED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def _decode_bmp(buf: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (h, w, 3) uint8 RGB (spec: BITMAPFILEHEADER
    + BITMAPINFOHEADER, rows bottom-up unless height<0, stride padded to 4)."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", buf, 10)
    w, h = struct.unpack_from("<ii", buf, 18)
    (_planes, bpp) = struct.unpack_from("<HH", buf, 26)
    (comp,) = struct.unpack_from("<I", buf, 30)
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    bottom_up, hh = h > 0, abs(h)
    stride = (w * 3 + 3) & ~3
    if data_off + stride * hh > len(buf):
        raise ValueError("truncated BMP")
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * hh, offset=data_off)
    img = rows.reshape(hh, stride)[:, : w * 3].reshape(hh, w, 3)[:, :, ::-1]  # BGR->RGB
    return img[::-1] if bottom_up else img


def _png_unfilter(raw: bytes, w: int, h: int, nch: int) -> np.ndarray:
    """Undo PNG scanline filters (spec 9. Filtering): 0 None, 1 Sub, 2 Up,
    3 Average, 4 Paeth. uint8 arithmetic wraps mod 256 by construction.

    None/Up are whole-row numpy ops; Sub is a per-channel mod-256
    cumulative sum (uint8 cumsum wraps by construction), so it is fully
    vectorized too. Average and Paeth are inherently sequential in x (the
    predictor reads the just-reconstructed left pixel), so they run as
    plain-int loops over Python lists — list indexing + int arithmetic is
    ~5x faster per element than numpy scalar extraction, which keeps
    MB-scale images tractable without a native codec dependency.

    Measured (32-core host, single core): None/Up/Sub rows ~90 Mpix/s;
    Average/Paeth rows ~1.7 Mpix/s (the CPython floor — the predictor
    reads the just-written left pixel, so no batch kernel applies). Budget
    accordingly for Paeth-heavy MB-scale images (~0.6 s per Mpix per
    core); the decode_images mapInPandas stage parallelizes across
    images, so BATCH throughput scales with executor cores either way.
    bench.py emits the measured per-image rate as ``png_decode``."""
    stride = w * nch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        cur = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ft == 1:  # Sub: recon[x] = mod-256 prefix sum of deltas per channel
            cur = np.cumsum(cur.reshape(w, nch), axis=0, dtype=np.uint8).reshape(stride)
        elif ft == 2:  # Up
            cur += prev
        elif ft == 3:  # Average (left-pixel recurrence -> sequential in x)
            cl, pl = cur.tolist(), prev.tolist()
            for x in range(nch):
                cl[x] = (cl[x] + (pl[x] >> 1)) & 0xFF
            # zip streams (up, raw) pairs — cl[nch:] copies the raw values
            # up front, so mutating cl[x] never feeds back into the stream
            for x, (b, v) in enumerate(zip(pl[nch:], cl[nch:]), nch):
                cl[x] = (v + ((cl[x - nch] + b) >> 1)) & 0xFF
            cur = np.frombuffer(bytes(cl), dtype=np.uint8).copy()
        elif ft == 4:  # Paeth (same left-pixel recurrence)
            cl, pl = cur.tolist(), prev.tolist()
            for x in range(nch):
                # a = c = 0 -> the Paeth predictor reduces to b (= up)
                cl[x] = (cl[x] + pl[x]) & 0xFF
            # with p = a+b-c: p-a = b-c, p-b = a-c, p-c = (b-c)+(a-c) —
            # the distances need no recomputed p and no abs() calls
            for x, (b, c, v) in enumerate(zip(pl[nch:], pl, cl[nch:]), nch):
                a = cl[x - nch]
                bc = b - c
                pa = bc if bc >= 0 else -bc
                ac = a - c
                pb = ac if ac >= 0 else -ac
                s = bc + ac
                pc = s if s >= 0 else -s
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cl[x] = (v + pred) & 0xFF
            cur = np.frombuffer(bytes(cl), dtype=np.uint8).copy()
        elif ft != 0:
            raise ValueError(f"bad PNG filter {ft}")
        out[y] = cur
        prev = out[y]
    return out


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _decode_png(buf: bytes) -> np.ndarray:
    """Minimal PNG: 8-bit gray (color 0) / RGB (2) / RGBA (6),
    non-interlaced. IDAT chunks concatenated -> zlib inflate -> unfilter."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, b""
    w = h = nch = None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or interlace != 0 or color not in (0, 2, 6):
                raise ValueError(f"unsupported PNG (depth={depth}, color={color})")
            nch = {0: 1, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    out = _png_unfilter(zlib.decompress(idat), w, h, nch)
    return out.reshape(h, w, nch) if nch > 1 else out.reshape(h, w)


def _decode_wav(buf: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM16 -> (sample_rate, n_channels, samples[n, nch] int16)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, nch, rate = struct.unpack_from("<HHI", fmt, 0)
    (bits,) = struct.unpack_from("<H", fmt, 14)
    if audio_fmt != 1 or bits != 16 or nch < 1:
        raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
    frame = 2 * nch
    samples = np.frombuffer(data[: (len(data) // frame) * frame], dtype="<i2")
    return rate, nch, samples.reshape(-1, nch)


def _raw_raster(buf: bytes) -> np.ndarray:
    """DETERMINISTIC FALLBACK for undecodable/unknown payloads: the byte
    stream as an 8-bit single-channel raster of width 64, zero-padded to a
    full last row (empty payload -> one zero row — never raises, so one bad
    payload can't fail the task)."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    w = 64
    if arr.size == 0:
        return np.zeros((1, w), dtype=np.uint8)
    h = (arr.size + w - 1) // w
    padded = np.zeros(h * w, dtype=np.uint8)
    padded[: arr.size] = arr
    return padded.reshape(h, w)


def decode_raster(buf: bytes) -> np.ndarray:
    """Magic-dispatched image decode: real BMP/PNG kernels, raw-raster
    fallback for everything else (including corrupt files)."""
    try:
        if buf[:8] == _PNG_SIG:
            return _decode_png(buf)
        if buf[:2] == b"BM":
            return _decode_bmp(buf)
    except Exception:  # noqa: BLE001 - corrupt payload -> fallback, not task death
        pass
    return _raw_raster(buf)


def decode_images(df: DataFrame, url_col: str = "url", payload_col: str = "html") -> DataFrame:
    """binary payload -> decoded image features via one mapInPandas stage.

    Real kernels (BMP/PNG) with raw-raster fallback; Arrow batches in,
    typed rows out, column pruning to just (url, payload).
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rasters = [decode_raster(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].to_numpy(),
                    "width": [r.shape[1] for r in rasters],
                    "height": [r.shape[0] for r in rasters],
                    "n_channels": [r.shape[2] if r.ndim == 3 else 1 for r in rasters],
                    "mean_luma": [float(r.mean()) for r in rasters],
                }
            )

    return df.select(url_col, payload_col).mapInPandas(_decode, schema=DECODED_IMAGE_SCHEMA)


DECODED_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def decode_audio(df: DataFrame, url_col: str = "url", payload_col: str = "html") -> DataFrame:
    """binary payload -> PCM16 WAV features (rate, channels, frames, RMS)
    in one mapInPandas stage; undecodable payloads yield NULL features
    (row preserved, task never fails)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, chans, counts, rmss = [], [], [], []
            for b in pdf[payload_col]:
                try:
                    rate, nch, samples = _decode_wav(bytes(b))
                    rates.append(rate)
                    chans.append(nch)
                    counts.append(samples.shape[0])
                    rmss.append(
                        float(np.sqrt(np.mean(samples.astype(np.float64) ** 2)))
                        if samples.size
                        else 0.0
                    )
                except Exception:  # noqa: BLE001
                    rates.append(None)
                    chans.append(None)
                    counts.append(None)
                    rmss.append(None)
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].to_numpy(),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_channels": pd.array(chans, dtype="Int32"),
                    "n_samples": pd.array(counts, dtype="Int64"),
                    "rms": pd.array(rmss, dtype="Float64"),
                }
            )

    return df.select(url_col, payload_col).mapInPandas(_decode, schema=DECODED_AUDIO_SCHEMA)


def resize_images(
    df: DataFrame, out_w: int = 8, out_h: int = 8, url_col: str = "url", payload_col: str = "html"
) -> DataFrame:
    """Decode + grayscale + nearest-neighbor resize to (out_h, out_w),
    emitting the resized raster as array<int>. One fused mapInPandas stage
    (decode and resize share the batch; bytes cross the Arrow boundary
    once)."""
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), True),
            T.StructField("thumb", T.ArrayType(T.IntegerType()), True),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for b in pdf[payload_col]:
                r = decode_raster(bytes(b))
                if r.ndim == 3:  # multi-channel -> integer mean luma
                    r = (r.astype(np.uint32).sum(axis=2) // r.shape[2]).astype(np.uint8)
                yi = (np.arange(out_h) * r.shape[0] // out_h).astype(int)
                xi = (np.arange(out_w) * r.shape[1] // out_w).astype(int)
                out.append(r[np.ix_(yi, xi)].ravel().astype(np.int32).tolist())
            yield pd.DataFrame({"url": pdf[url_col].to_numpy(), "thumb": out})

    return df.select(url_col, payload_col).mapInPandas(_resize, schema=schema)


def sample_frames(
    df: DataFrame, every_n_bytes: int = 1024, url_col: str = "url", payload_col: str = "html"
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emits one row per
    sampled 'frame' offset (explode on the Python side keeps the payload
    from being duplicated across rows in the JVM)."""
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), True),
            T.StructField("frame_idx", T.IntegerType(), True),
            T.StructField("offset", T.LongType(), True),
            T.StructField("frame_md5", T.StringType(), True),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            urls, idxs, offs, digs = [], [], [], []
            for u, b in zip(pdf[url_col], pdf[payload_col]):
                buf = bytes(b)
                for i, off in enumerate(range(0, len(buf), every_n_bytes)):
                    urls.append(u)
                    idxs.append(i)
                    offs.append(off)
                    digs.append(hashlib.md5(buf[off : off + every_n_bytes]).hexdigest())
            yield pd.DataFrame(
                {"url": urls, "frame_idx": idxs, "offset": offs, "frame_md5": digs}
            )

    return df.select(url_col, payload_col).mapInPandas(_sample, schema=schema)


# --- perceptual image hashing ------------------------------------------------
def _gray(raster: np.ndarray) -> np.ndarray:
    """Multi-channel -> integer mean luma (same arithmetic as
    resize_images: uint32 sum // n_channels, exact, no float)."""
    if raster.ndim == 3:
        return (raster.astype(np.uint32).sum(axis=2) // raster.shape[2]).astype(
            np.uint8
        )
    return raster


def _resample(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample by pure index arithmetic
    (``arange(out) * in // out`` — identical to resize_images, so every
    sampled pixel is an EXACT source pixel an oracle can name)."""
    yi = (np.arange(out_h) * gray.shape[0] // out_h).astype(int)
    xi = (np.arange(out_w) * gray.shape[1] // out_w).astype(int)
    return gray[np.ix_(yi, xi)]


def _pack_bits64(bits: np.ndarray) -> int:
    """64 bools -> signed int64 (bit 63 wraps negative, same convention
    as dedup.simhash fingerprints, so the hamming/pigeonhole machinery
    applies unchanged)."""
    v = 0
    for k in range(64):
        if bits[k]:
            v += (1 << k) if k < 63 else -(1 << 63)
    return v


def dhash64(raster: np.ndarray) -> int:
    """64-bit difference hash (dHash, Krawetz 2013-style): gray ->
    nearest-resample to 8x9 -> bit (r*8+c) = 1 iff p[r,c] < p[r,c+1].
    Gradient signs survive brightness/contrast shifts and recompression;
    bit-exact integer arithmetic end to end."""
    g = _resample(_gray(raster), 8, 9).astype(np.int32)
    bits = (g[:, :-1] < g[:, 1:]).ravel()  # row-major: bit k = r*8+c
    return _pack_bits64(bits)


def ahash64(raster: np.ndarray) -> int:
    """64-bit average hash (aHash): gray -> 8x8 -> bit = pixel > mean,
    with mean as INTEGER floor(sum/64) so both engines replay it exactly
    (ties -> 0)."""
    g = _resample(_gray(raster), 8, 8).astype(np.int64)
    mean = int(g.sum()) // 64
    bits = (g > mean).ravel()
    return _pack_bits64(bits)


# --- audio fingerprinting ----------------------------------------------------
def audio_fp64(samples: np.ndarray) -> int | None:
    """64-bit energy-contour audio fingerprint over PCM16 samples[n, nch]:
    integer-mean mono mix (int64 sum // nch, exact), split into 65 equal
    windows (floor width, trailing remainder dropped), window energy
    E[i] = sum of squared samples (int64), bit i = E[i+1] > E[i] (signed
    int64 packing, bit 63 wraps negative — same convention as simhash /
    dhash64, so ``dedup.hamming_pairs`` applies unchanged).

    This is the time-domain analogue of Haitsma-Kalker (2002) band-energy
    fingerprints: a uniform gain change scales every window energy by the
    same factor, so every adjacent-energy comparison — hence the whole
    fingerprint — is EXACTLY invariant; a local edit (dropout, click,
    splice) disturbs only the bits whose windows it touches, so
    near-identical clips land within a few hamming bits while unrelated
    audio sits near 32. Integer arithmetic end to end: an oracle that
    knows the sample construction can replay every bit.

    Returns None for clips shorter than 65 samples (no contour exists)."""
    if samples.ndim == 2:
        mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
    else:
        mono = samples.astype(np.int64)
    win = mono.shape[0] // 65
    if win == 0:
        return None
    e = (mono[: win * 65] ** 2).reshape(65, win).sum(axis=1)
    return _pack_bits64(e[1:] > e[:-1])


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("fingerprint", T.LongType(), True),
    ]
)


def fingerprint_audio(
    df: DataFrame, url_col: str = "url", payload_col: str = "html"
) -> DataFrame:
    """binary WAV payload -> (url, rate, n_samples, 64-bit energy-contour
    fingerprint) in ONE mapInPandas stage (decode + mono mix + windowed
    energies + hash share the batch; bytes cross the Arrow boundary once;
    column-pruned input). Undecodable/too-short payloads yield NULL
    fingerprints (row preserved, task never fails). Output feeds
    ``dedup.hamming_pairs`` for audio near-dup at corpus scale — the same
    pigeonhole candidate join the text-simhash and image-phash paths use."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, counts, fps = [], [], []
            for b in pdf[payload_col]:
                try:
                    rate, _nch, samples = _decode_wav(bytes(b))
                    rates.append(rate)
                    counts.append(samples.shape[0])
                    fps.append(audio_fp64(samples))
                except Exception:  # noqa: BLE001 - one bad payload, not task death
                    rates.append(None)
                    counts.append(None)
                    fps.append(None)
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].to_numpy(),
                    "sample_rate": pd.array(rates, dtype="Int32"),
                    "n_samples": pd.array(counts, dtype="Int64"),
                    "fingerprint": pd.array(fps, dtype="Int64"),
                }
            )

    return df.select(url_col, payload_col).mapInPandas(_fp, schema=AUDIO_FP_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("fingerprint", T.LongType(), True),
    ]
)


def phash_images(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "html",
    algo: str = "dhash",
) -> DataFrame:
    """binary image payload -> (url, 64-bit perceptual fingerprint) in ONE
    mapInPandas stage (decode + gray + resample + hash share the batch;
    bytes cross the Arrow boundary once; column-pruned input). The
    fingerprints feed ``dedup.hamming_pairs`` (the simhash pigeonhole
    candidate join) for image near-dup at corpus scale — no embedding
    model needed; near-identical images (bit flips, brightness shifts,
    re-encodes) land within a few hamming bits, unrelated images at ~32.
    """
    hash_fn = {"dhash": dhash64, "ahash": ahash64}[algo]

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].to_numpy(),
                    "fingerprint": [
                        hash_fn(decode_raster(bytes(b))) for b in pdf[payload_col]
                    ],
                }
            )

    return df.select(url_col, payload_col).mapInPandas(_hash, schema=PHASH_SCHEMA)


# --- video: frame-container walk + per-frame perceptual hash -----------------
def _walk_bmp_frames(buf: bytes) -> list[bytes]:
    """Split a concatenated-BMP video container into per-frame buffers
    using the format's OWN delimiters: every BMP carries its total file
    size at BITMAPFILEHEADER offset 2 (``<I``, public BMP spec), so the
    walker jumps frame to frame from the bytes alone — no out-of-band
    index. Stops at the first malformed header (bad magic, size running
    past the buffer), so a truncated tail or trailing garbage yields the
    decodable prefix instead of failing the task (one-bad-row rule)."""
    frames: list[bytes] = []
    off = 0
    n = len(buf)
    while off + 14 <= n and buf[off : off + 2] == b"BM":
        size = struct.unpack_from("<I", buf, off + 2)[0]
        if size < 14 + 40 or off + size > n:
            break
        frames.append(buf[off : off + size])
        off += size
    return frames


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("frame_idx", T.LongType(), True),
        T.StructField("fingerprint", T.LongType(), True),
    ]
)


def hash_video_frames(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "html",
    algo: str = "dhash",
) -> DataFrame:
    """binary video container -> (url, frame_idx, 64-bit perceptual hash)
    — one row per decodable frame, in ONE mapInPandas stage (container
    walk + frame decode + gray + resample + hash share the batch; the
    multi-MB payload crosses the Arrow boundary once and the explode to
    frame rows happens Python-side, so the container bytes are never
    duplicated across JVM rows). Undecodable frames are skipped, an
    undecodable container yields zero rows; the task never fails.

    Per-frame fingerprints feed the same downstream machinery as images
    and audio: ``dedup.hamming_pairs`` for single-frame near-dup, or —
    treating the per-video hash sequence as a token stream — shingle
    containment for clip detection (see ``clip_containment_pairs``)."""
    hash_fn = {"dhash": dhash64, "ahash": ahash64}[algo]

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, fps = [], [], []
            for u, b in zip(pdf[url_col], pdf[payload_col]):
                for i, frame in enumerate(_walk_bmp_frames(bytes(b))):
                    try:
                        fp = hash_fn(decode_raster(frame))
                    except Exception:  # noqa: BLE001 - one bad frame only
                        continue
                    urls.append(u)
                    idxs.append(i)
                    fps.append(fp)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "frame_idx": pd.array(idxs, dtype="Int64"),
                    "fingerprint": pd.array(fps, dtype="Int64"),
                }
            )

    return df.select(url_col, payload_col).mapInPandas(_hash, schema=VIDEO_FRAME_SCHEMA)


VIDEO_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("hash_stream", T.StringType(), True),
    ]
)


def video_hash_streams(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "html",
    algo: str = "dhash",
) -> DataFrame:
    """binary video container -> (url, n_frames, hash_stream) where
    ``hash_stream`` is the space-joined signed-decimal per-frame
    fingerprint sequence, assembled Python-side in the SAME mapInPandas
    batch as the decode (no per-frame explode, no groupBy shuffle to
    re-assemble order — frame order is the walk order by construction).

    The stream is a plain whitespace token sequence, so the entire text
    dedup toolchain applies verbatim: n-gram shingles over it are windows
    of n CONSECUTIVE frames, which makes ``dedup.containment_pairs`` a
    clip detector (a clip shares every frame-window shingle with its
    source video -> containment 1.0)."""
    hash_fn = {"dhash": dhash64, "ahash": ahash64}[algo]

    def _stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts, streams = [], []
            for b in pdf[payload_col]:
                fps = []
                for frame in _walk_bmp_frames(bytes(b)):
                    try:
                        fps.append(hash_fn(decode_raster(frame)))
                    except Exception:  # noqa: BLE001 - one bad frame only
                        continue
                counts.append(len(fps))
                streams.append(" ".join(str(v) for v in fps))
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].to_numpy(),
                    "n_frames": pd.array(counts, dtype="Int64"),
                    "hash_stream": streams,
                }
            )

    return df.select(url_col, payload_col).mapInPandas(_stream, schema=VIDEO_STREAM_SCHEMA)


def clip_containment_pairs(
    df: DataFrame,
    url_col: str = "url",
    payload_col: str = "html",
    clip_frames: int = 3,
    threshold: float = 0.9,
    algo: str = "dhash",
    max_posting: int | None = None,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """Video clip detection: (id_a, id_b, containment) with id_a's frame
    sequence contained in id_b's at >= threshold.

    Composition, not new machinery: per-frame perceptual hashes become a
    whitespace token stream (``video_hash_streams``), and
    ``dedup.containment_pairs`` in banded block-key-free mode does the
    rest — n-gram shingles over the stream are ``clip_frames``-frame
    windows, candidates come from the shingle-posting self-join (FULL
    recall: a contained clip shares every frame-window with its source),
    exact containment is computed on candidates only. Near-identical
    frames (brightness shift, re-encode) map to equal dHash tokens, so
    detection survives mild per-frame distortion; at 10^12 scale the cost
    profile is the text-containment one — bounded by posting-list sizes,
    never all-pairs (``max_posting`` caps pathological still-frame hashes
    shared by everything, e.g. black frames)."""
    from ..operators.dedup import containment_pairs

    streams = video_hash_streams(df, url_col=url_col, payload_col=payload_col, algo=algo)
    return containment_pairs(
        streams,
        id_col="url",
        text_col="hash_stream",
        block_col=None,
        n=clip_frames,
        threshold=threshold,
        max_posting=max_posting,
        unpersist_handles=unpersist_handles,
    )


def scene_cuts(
    frames: DataFrame,
    id_col: str = "url",
    idx_col: str = "frame_idx",
    fp_col: str = "fingerprint",
    max_hamming: int = 0,
) -> DataFrame:
    """Scene segmentation over per-frame perceptual hashes: a CUT is a
    frame whose fingerprint sits more than ``max_hamming`` bits from its
    predecessor's; ``scene_id`` is the running cut count (first frame =
    scene 0). Pure relational — one window keyed by video id (a video's
    frames land on one reducer; videos are bounded, so no skew cliff),
    ``bit_count(xor)`` verify, running-sum scene numbering; no Python.
    dHash tokens absorb brightness/re-encode wobble, so ``max_hamming``
    a few bits above 0 segments on CONTENT changes, not codec noise.
    Output: (id, frame_idx, fingerprint, is_cut, scene_id)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(idx_col)
    prev = F.lag(fp_col).over(w)
    dist = F.bit_count(F.col(fp_col).bitwiseXOR(prev)).cast("long")
    is_cut = F.when(prev.isNull(), F.lit(False)).otherwise(dist > max_hamming)
    out = frames.select(
        F.col(id_col),
        F.col(idx_col),
        F.col(fp_col),
        is_cut.alias("is_cut"),
    )
    w2 = Window.partitionBy(id_col).orderBy(idx_col)
    return out.withColumn(
        "scene_id",
        F.sum(F.col("is_cut").cast("long")).over(w2).cast("long"),
    )


def scene_keyframes(scenes: DataFrame, id_col: str = "url") -> DataFrame:
    """One representative frame per scene: the scene's FIRST frame
    (deterministic, no decode rework — the fingerprint rides along for
    downstream near-dup). Map-side-combinable min aggregate over the
    ``scene_cuts`` output. Output: (id, scene_id, frame_idx, fingerprint)."""
    first = F.min(F.struct("frame_idx", "fingerprint")).alias("_f")
    return (
        scenes.groupBy(id_col, "scene_id")
        .agg(first)
        .select(
            id_col,
            "scene_id",
            F.col("_f.frame_idx").alias("frame_idx"),
            F.col("_f.fingerprint").alias("fingerprint"),
        )
    )


AUDIO_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("n_segments", T.LongType(), True),
        T.StructField("hash_stream", T.StringType(), True),
    ]
)


def audio_hash_streams(
    df: DataFrame,
    seg_samples: int,
    url_col: str = "url",
    payload_col: str = "html",
) -> DataFrame:
    """binary WAV payload -> (url, n_segments, hash_stream): the PCM
    sample stream split into consecutive ``seg_samples``-sample segments
    (trailing remainder dropped), each segment fingerprinted with
    ``audio_fp64`` (gain-invariant energy contour), the per-segment
    hashes emitted as a space-joined signed-decimal token stream — the
    audio analogue of ``video_hash_streams``, assembled in the SAME
    mapInPandas batch as the decode (one Arrow crossing, no re-assembly
    shuffle). ``seg_samples`` must be >= 65 (the contour window count).

    n-gram shingles over the stream are windows of n CONSECUTIVE audio
    segments, so ``dedup.containment_pairs`` detects an audio clip
    embedded in a longer recording (segment-aligned; gain changes on the
    clip do NOT break the match — the per-segment fingerprint is exactly
    gain-invariant). Undecodable payloads yield n_segments=0 and an
    empty stream (row preserved)."""
    if seg_samples < 65:
        raise ValueError("seg_samples must be >= 65 (energy-contour windows)")

    def _stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts, streams = [], []
            for b in pdf[payload_col]:
                fps: list[int] = []
                try:
                    _rate, _nch, samples = _decode_wav(bytes(b))
                    if samples.ndim == 2:
                        mono = samples.astype(np.int64).sum(axis=1) // samples.shape[1]
                    else:
                        mono = samples.astype(np.int64)
                    for k in range(mono.shape[0] // seg_samples):
                        fp = audio_fp64(mono[k * seg_samples : (k + 1) * seg_samples])
                        if fp is not None:
                            fps.append(fp)
                except Exception:  # noqa: BLE001 - one bad payload only
                    fps = []
                counts.append(len(fps))
                streams.append(" ".join(str(v) for v in fps))
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].to_numpy(),
                    "n_segments": pd.array(counts, dtype="Int64"),
                    "hash_stream": streams,
                }
            )

    return df.select(url_col, payload_col).mapInPandas(_stream, schema=AUDIO_STREAM_SCHEMA)


def audio_clip_pairs(
    df: DataFrame,
    seg_samples: int,
    url_col: str = "url",
    payload_col: str = "html",
    clip_segments: int = 3,
    threshold: float = 0.9,
    max_posting: int | None = None,
    unpersist_handles: list | None = None,
) -> DataFrame:
    """Audio clip detection: (id_a, id_b, containment) with id_a's
    segment-fingerprint sequence contained in id_b's at >= threshold —
    the audio twin of ``clip_containment_pairs`` (same banded
    ``dedup.containment_pairs`` machinery: posting-join candidates with
    FULL recall, exact verify on candidates only; ``max_posting`` caps
    silence-segment hot tokens)."""
    from ..operators.dedup import containment_pairs

    streams = audio_hash_streams(
        df, seg_samples, url_col=url_col, payload_col=payload_col
    )
    return containment_pairs(
        streams,
        id_col="url",
        text_col="hash_stream",
        block_col=None,
        n=clip_segments,
        threshold=threshold,
        max_posting=max_posting,
        unpersist_handles=unpersist_handles,
    )


def keyframe_hash_streams(
    frames: DataFrame,
    id_col: str = "url",
    max_hamming: int = 0,
) -> DataFrame:
    """Per-video SCENE-level hash token stream: frames -> scene cuts ->
    one keyframe fingerprint per scene, space-joined in scene order.
    Fully relational (window + min-struct + ordered collect_list — one
    keyed shuffle, videos bounded).

    The collapse of consecutive same-content frames makes the stream
    invariant to FRAME RATE: a clip re-encoded with every frame
    duplicated (or its rate halved) yields the SAME scene sequence, so
    ``dedup.containment_pairs`` over these streams detects clips across
    rate changes where the raw frame-level stream cannot (pinned in the
    gate fixture: the planted clip runs at a different duplication
    factor than its source and still matches at containment 1.0).
    Output: (id, n_scenes, hash_stream)."""
    kf = scene_keyframes(
        scene_cuts(frames, id_col=id_col, max_hamming=max_hamming), id_col=id_col
    )
    ordered = F.array_sort(F.collect_list(F.struct("scene_id", "fingerprint")))
    return kf.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_scenes"),
        F.concat_ws(
            " ", F.transform(ordered, lambda s: s["fingerprint"].cast("string"))
        ).alias("hash_stream"),
    )
