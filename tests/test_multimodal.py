"""Multimodal tests: metadata sniff (native), REAL pure-numpy decode
kernels (BMP / PNG / WAV) verified byte-exactly against hand-built
payloads, raw-raster fallback robustness, resize / frame-sample stages."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from log_analysis_spark.functions import multimodal as MM


# --- tiny reference encoders (independent of the decoders under test) ------
def make_bmp(rgb: np.ndarray) -> bytes:
    """Minimal 24-bit uncompressed BMP from an (h, w, 3) uint8 RGB array."""
    h, w, _ = rgb.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in rgb[::-1]:  # bottom-up
        line = bytearray()
        for px in row:
            line += bytes([px[2], px[1], px[0]])  # RGB -> BGR
        line += b"\x00" * (stride - len(line))
        body += line
    data_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", data_off + len(body), 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def make_png(arr: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal PNG (8-bit gray or RGB) with chosen per-row filter types."""
    if arr.ndim == 2:
        h, w, nch, color = arr.shape[0], arr.shape[1], 1, 0
        flat = arr.reshape(h, w)
    else:
        h, w, nch = arr.shape
        color = {3: 2, 4: 6}[nch]
        flat = arr.reshape(h, w * nch)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.uint8)
    for y in range(h):
        line = flat[y].astype(np.uint8)
        ft = filters[y]
        if ft == 0:
            enc = line.copy()
        elif ft == 2:  # Up
            enc = (line - prev) % 256
        elif ft == 1:  # Sub
            enc = line.copy()
            enc[nch:] = (line[nch:] - line[:-nch]) % 256
        else:
            raise ValueError("test encoder supports filters 0/1/2")
        raw += bytes([ft]) + enc.astype(np.uint8).tobytes()
        prev = line
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal PCM16 WAV from an (n, nch) int16 array."""
    n, nch = samples.shape
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * 2 * nch, 2 * nch, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


@pytest.fixture(scope="module")
def media(spark):
    rows = pd.DataFrame(
        {
            "url": ["u://png", "u://jpg", "u://wav", "u://raw"],
            "html": [
                b"\x89PNG\r\n\x1a\n" + bytes(range(256)) * 8,
                b"\xff\xd8\xff\xe0JFIF" + bytes(range(256)) * 4,
                b"RIFF$\x00\x00\x00WAVE" + bytes(64),
                bytes(range(200)),
            ],
        }
    )
    return spark.createDataFrame(rows)


def test_sniff_media_meta(media):
    got = {
        r["url"]: r["m"].asDict()
        for r in media.select("url", MM.sniff_media_meta(F.col("html")).alias("m")).collect()
    }
    assert got["u://png"]["kind"] == "image"
    assert got["u://jpg"]["kind"] == "image"
    assert got["u://wav"]["kind"] == "audio"
    assert got["u://raw"]["kind"] == "unknown"
    assert got["u://raw"]["n_bytes"] == 200
    assert got["u://raw"]["content_md5"] == hashlib.md5(bytes(range(200))).hexdigest()


def test_decode_images_plumbing(media):
    out = {r["url"]: r for r in MM.decode_images(media).collect()}
    assert set(out) == {"u://png", "u://jpg", "u://wav", "u://raw"}
    # u://png has the PNG magic but no valid chunks -> raw-raster fallback
    # (zero-padded last row, so height is the byte-count CEILING / 64)
    r = out["u://png"]
    assert r["width"] == 64 and r["height"] == -(-(8 + 256 * 8) // 64)
    assert r["n_channels"] == 1
    assert 0.0 <= r["mean_luma"] <= 255.0


def test_decode_real_png_byte_exact():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    for filters in ([0] * 5, [1] * 5, [2] * 5, [0, 1, 2, 1, 0]):
        buf = make_png(img, filters=list(filters))
        got = MM.decode_raster(buf)
        assert got.shape == (5, 4, 3)
        assert np.array_equal(got, img), f"filters {filters}"
    gray = rng.integers(0, 256, size=(3, 7), dtype=np.uint8)
    assert np.array_equal(MM.decode_raster(make_png(gray)), gray)


def test_decode_png_paeth_average_roundtrip():
    """Filters 3/4 aren't in the test encoder; verify the decoder against
    hand-filtered scanlines built straight from the spec formulas."""
    img = np.array([[10, 20, 30, 40], [15, 25, 35, 45]], dtype=np.uint8)
    w, h, nch = 4, 2, 1
    raw = bytearray()
    # row 0: Average filter (prev = 0): enc[x] = cur[x] - (left // 2)
    row0 = img[0]
    enc0 = [int(row0[0])]
    for x in range(1, w):
        enc0.append((int(row0[x]) - (int(row0[x - 1]) >> 1)) % 256)
    raw += bytes([3]) + bytes(enc0)
    # row 1: Paeth (a=left in row1, b=up, c=up-left)
    row1 = img[1]
    enc1 = []
    for x in range(w):
        a = int(row1[x - 1]) if x >= 1 else 0
        b = int(img[0][x])
        c = int(img[0][x - 1]) if x >= 1 else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        enc1.append((int(row1[x]) - pred) % 256)
    raw += bytes([4]) + bytes(enc1)
    got = MM._png_unfilter(bytes(raw), w, h, nch)
    assert np.array_equal(got, img)


def test_decode_real_bmp_byte_exact():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)  # stride pad hits
    got = MM.decode_raster(make_bmp(img))
    assert got.shape == (3, 5, 3)
    assert np.array_equal(got, img)


def test_decode_wav_features(spark):
    t = np.arange(800)
    mono = (np.sin(t / 10.0) * 1000).astype(np.int16).reshape(-1, 1)
    stereo = np.stack([t % 100, (t * 3) % 100], axis=1).astype(np.int16)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u://mono", "u://stereo", "u://bad"],
                "html": [make_wav(mono, 8000), make_wav(stereo, 44100), b"notawav"],
            }
        )
    )
    out = {r["url"]: r for r in MM.decode_audio(df).collect()}
    assert out["u://mono"]["sample_rate"] == 8000
    assert out["u://mono"]["n_channels"] == 1
    assert out["u://mono"]["n_samples"] == 800
    expect_rms = float(np.sqrt(np.mean(mono.astype(np.float64) ** 2)))
    assert out["u://mono"]["rms"] == pytest.approx(expect_rms)
    assert out["u://stereo"]["n_channels"] == 2
    assert out["u://stereo"]["sample_rate"] == 44100
    # undecodable payload -> NULL features, row preserved
    assert out["u://bad"]["sample_rate"] is None
    assert out["u://bad"]["rms"] is None


def test_decode_images_short_and_empty_payloads(spark):
    """One bad row must never fail the task: empty and sub-64-byte payloads
    decode via the padded fallback raster."""
    df = spark.createDataFrame(
        pd.DataFrame({"url": ["u://empty", "u://tiny"], "html": [b"", b"abc"]})
    )
    out = {r["url"]: r for r in MM.decode_images(df).collect()}
    assert out["u://empty"]["height"] == 1 and out["u://empty"]["mean_luma"] == 0.0
    assert out["u://tiny"]["height"] == 1 and out["u://tiny"]["width"] == 64


def test_decode_images_deterministic(media):
    a = sorted(r["mean_luma"] for r in MM.decode_images(media).collect())
    b = sorted(r["mean_luma"] for r in MM.decode_images(media).collect())
    assert a == b


def test_resize_images_shape(media):
    out = MM.resize_images(media, out_w=8, out_h=8).collect()
    assert len(out) == 4
    for r in out:
        assert len(r["thumb"]) == 64
        assert all(0 <= v <= 255 for v in r["thumb"])


def test_sample_frames_offsets(media):
    rows = [r for r in MM.sample_frames(media, every_n_bytes=256).collect() if r["url"] == "u://raw"]
    assert len(rows) == 1  # 200 bytes -> single frame at offset 0
    assert rows[0]["offset"] == 0
    assert rows[0]["frame_md5"] == hashlib.md5(bytes(range(200))).hexdigest()
    png_rows = [
        r for r in MM.sample_frames(media, every_n_bytes=256).collect() if r["url"] == "u://png"
    ]
    assert [r["offset"] for r in sorted(png_rows, key=lambda r: r["frame_idx"])] == list(
        range(0, 8 + 256 * 8, 256)
    )


# --- perceptual image hashing (dHash / aHash + near-dup) --------------------
def test_dhash_deterministic_and_brightness_tolerant():
    """dHash is a pure function of the raster; a small uniform brightness
    shift (order-preserving where unclipped) moves it only a few bits,
    while an unrelated image sits near the 32-bit random distance."""
    rng = np.random.default_rng(42)
    base = rng.integers(10, 240, size=(32, 48, 3), dtype=np.uint8)
    assert MM.dhash64(base) == MM.dhash64(base.copy())
    bright = np.clip(base.astype(np.int32) + 3, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(MM.dhash64(base), MM.dhash64(bright)) <= 7
    assert ham(MM.dhash64(base), MM.dhash64(other)) > 7


def test_ahash_known_raster():
    """aHash on a hand-computable raster: left half 0, right half 255 at
    8x8 -> bits set exactly on the brighter half (mean = 127, 255 > 127,
    0 is not)."""
    r = np.zeros((8, 8), dtype=np.uint8)
    r[:, 4:] = 255
    fp = MM.ahash64(r) & ((1 << 64) - 1)
    want = 0
    for k in range(64):
        if (k % 8) >= 4:
            want |= 1 << k
    assert fp == want


def test_image_neardup_planted_pairs_found(spark):
    """End-to-end image near-dup: REAL BMP bytes through phash_images ->
    dedup.hamming_pairs (8x8-bit pigeonhole chunks). Planted: a base image,
    a single-pixel edit, a +3 brightness shift — all mutually within
    hamming 7; two unrelated images — found in NO pair."""
    from log_analysis_spark.operators.dedup import hamming_pairs

    rng = np.random.default_rng(7)
    base = rng.integers(10, 240, size=(24, 36, 3), dtype=np.uint8)
    onepx = base.copy()
    onepx[0, 0] = [255, 255, 255]  # bit-flip-ish: one sampled pixel blown out
    bright = np.clip(base.astype(np.int32) + 3, 0, 255).astype(np.uint8)
    other1 = rng.integers(0, 256, size=(24, 36, 3), dtype=np.uint8)
    other2 = rng.integers(0, 256, size=(40, 20, 3), dtype=np.uint8)
    rows = [
        ("u0", make_bmp(base)),
        ("u1", make_bmp(onepx)),
        ("u2", make_bmp(bright)),
        ("u3", make_bmp(other1)),
        ("u4", make_bmp(other2)),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    fp = MM.phash_images(df, payload_col="payload", algo="dhash")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_pairs(
            fp, "url", "fingerprint", max_hamming=7, n_chunks=8
        ).collect()
    }
    assert ("u0", "u1") in pairs and ("u0", "u2") in pairs
    assert not any("u3" in p or "u4" in p for p in pairs)


def test_phash_ahash_mode_and_fallback(spark):
    """algo='ahash' works through the same stage, and a non-image payload
    takes the raw-raster fallback (never raises)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [("img", make_bmp(img)), ("junk", b"not an image at all")],
        "url string, payload binary",
    )
    out = {r["url"]: r["fingerprint"] for r in MM.phash_images(df, payload_col="payload", algo="ahash").collect()}
    assert out["img"] == MM.ahash64(img)
    assert isinstance(out["junk"], int)  # fallback raster hashed, no error


# --- audio fingerprinting -----------------------------------------------------
def test_audio_fp64_known_bits_and_gain_invariance():
    """Designed window energies: 65 windows of 4 samples with amplitude
    i+1 -> strictly increasing energies -> all 64 bits set (== -1 in the
    signed packing); reversed -> 0. A uniform gain scales every window
    energy by the same factor, so the fingerprint is EXACTLY invariant."""
    amps = np.repeat(np.arange(1, 66, dtype=np.int64), 4)
    up = amps.reshape(-1, 1).astype(np.int16)
    assert MM.audio_fp64(up) == -1
    assert MM.audio_fp64(up[::-1].copy()) == 0
    rng = np.random.default_rng(11)
    base = rng.integers(-3000, 3000, size=(65 * 7, 1)).astype(np.int16)
    assert MM.audio_fp64(base * 5) == MM.audio_fp64(base)


def test_audio_fp64_local_edit_and_stereo_mix():
    """A click confined to one window flips at most the two bits whose
    comparisons involve that window; identical L/R stereo mixes to the
    mono fingerprint (integer-mean channel mix)."""
    rng = np.random.default_rng(23)
    base = rng.integers(-8000, 8000, size=(65 * 10, 1)).astype(np.int16)
    clicked = base.copy()
    clicked[30 * 10 + 3, 0] = 32000
    fp_a, fp_b = MM.audio_fp64(base), MM.audio_fp64(clicked)
    assert bin((fp_a ^ fp_b) & 0xFFFFFFFFFFFFFFFF).count("1") <= 2
    stereo = np.concatenate([base, base], axis=1)
    assert MM.audio_fp64(stereo) == fp_a


def test_fingerprint_audio_planted_neardups(spark):
    """End-to-end audio near-dup: REAL WAV bytes through fingerprint_audio
    -> dedup.hamming_pairs. Planted: a base clip, a 2x gain copy, a
    one-click copy — mutually within hamming 7; two unrelated clips in NO
    pair; undecodable and too-short payloads carry NULL fingerprints."""
    from log_analysis_spark.operators.dedup import hamming_pairs

    rng = np.random.default_rng(42)
    base = rng.integers(-6000, 6000, size=(65 * 12, 1)).astype(np.int16)
    click = base.copy()
    click[7 * 12 + 1, 0] = 32000
    rows = [
        ("a0", make_wav(base)),
        ("a1", make_wav((base * 2).astype(np.int16))),
        ("a2", make_wav(click)),
        ("x0", make_wav(rng.integers(-6000, 6000, size=(65 * 9, 1)).astype(np.int16))),
        ("x1", make_wav(rng.integers(-6000, 6000, size=(65 * 4, 1)).astype(np.int16))),
        ("bad", b"notawav"),
        ("short", make_wav(np.zeros((10, 1), dtype=np.int16))),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    fp = MM.fingerprint_audio(df, payload_col="payload")
    got = {r["url"]: r for r in fp.collect()}
    assert got["a0"]["fingerprint"] == got["a1"]["fingerprint"]  # gain-exact
    assert got["bad"]["fingerprint"] is None
    assert got["short"]["fingerprint"] is None  # < 65 samples: no contour
    assert got["a0"]["sample_rate"] == 8000 and got["a0"]["n_samples"] == 65 * 12
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_pairs(
            fp.filter(F.col("fingerprint").isNotNull()),
            "url",
            "fingerprint",
            max_hamming=7,
            n_chunks=8,
        ).collect()
    }
    assert ("a0", "a1") in pairs and ("a0", "a2") in pairs and ("a1", "a2") in pairs
    assert not any("x0" in p or "x1" in p for p in pairs)


# --- video: frame-container walk + clip detection ---------------------------
def test_walk_bmp_frames_self_delimiting_and_truncation():
    """The walker splits frames purely from the BMP header size field;
    trailing garbage and a truncated final frame yield the decodable
    prefix (never raise)."""
    rng = np.random.default_rng(11)
    frames = [
        make_bmp(rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    buf = b"".join(frames)
    got = MM._walk_bmp_frames(buf)
    assert got == frames
    # truncated last frame -> first 3 recovered
    assert MM._walk_bmp_frames(buf[: len(buf) - 10]) == frames[:3]
    # trailing garbage after valid frames -> frames recovered, garbage dropped
    assert MM._walk_bmp_frames(buf + b"\x00garbage") == frames
    assert MM._walk_bmp_frames(b"not a container") == []


def test_hash_video_frames_matches_image_hash(spark):
    """A container's per-frame hashes equal phash of each frame image —
    same decode+hash path, walk adds only the delimiting; frame order is
    the byte order."""
    rng = np.random.default_rng(23)
    imgs = [rng.integers(0, 256, size=(16, 18, 3), dtype=np.uint8) for _ in range(3)]
    df = spark.createDataFrame(
        [("v0", b"".join(make_bmp(i) for i in imgs))], "url string, payload binary"
    )
    rows = (
        MM.hash_video_frames(df, payload_col="payload", algo="dhash")
        .orderBy("frame_idx")
        .collect()
    )
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert [r["fingerprint"] for r in rows] == [MM.dhash64(i) for i in imgs]


def test_video_hash_streams_and_empty_container(spark):
    """hash_stream is the space-joined signed-decimal hash sequence in
    frame order; an undecodable payload yields n_frames=0 and an empty
    stream (row preserved, no task death)."""
    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, size=(10, 12, 3), dtype=np.uint8) for _ in range(2)]
    df = spark.createDataFrame(
        [("v0", b"".join(make_bmp(i) for i in imgs)), ("bad", b"\x01\x02\x03")],
        "url string, payload binary",
    )
    out = {
        r["url"]: r
        for r in MM.video_hash_streams(df, payload_col="payload").collect()
    }
    assert out["v0"]["n_frames"] == 2
    assert out["v0"]["hash_stream"] == " ".join(str(MM.dhash64(i)) for i in imgs)
    assert out["bad"]["n_frames"] == 0 and out["bad"]["hash_stream"] == ""


def test_clip_containment_planted(spark):
    """End-to-end clip detection: video B = a consecutive sub-segment of
    A's frames -> containment 1.0 (B in A); C shares only a 2-frame
    overlap with A (below the 3-frame shingle) -> no pair; D is unrelated
    -> no pair. Brightness-shifted clip frames (+2) still match (dHash
    tokens are gradient-sign invariant away from mod-256 wraps, and these
    rasters stay in [10, 240))."""
    rng = np.random.default_rng(41)
    seq = [rng.integers(10, 238, size=(16, 18, 3), dtype=np.uint8) for _ in range(8)]
    shifted = [np.clip(f.astype(np.int32) + 2, 0, 255).astype(np.uint8) for f in seq[2:6]]
    other = [rng.integers(0, 256, size=(16, 18, 3), dtype=np.uint8) for _ in range(5)]
    rows = [
        ("A", b"".join(make_bmp(f) for f in seq)),          # frames 0..7
        ("B", b"".join(make_bmp(f) for f in shifted)),      # frames 2..5, +2 bright
        ("C", b"".join(make_bmp(f) for f in (seq[6:8] + other[:3]))),  # 2-frame overlap
        ("D", b"".join(make_bmp(f) for f in other)),        # unrelated
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in MM.clip_containment_pairs(
            df, payload_col="payload", clip_frames=3, threshold=0.9
        ).collect()
    }
    assert pairs.get(("B", "A")) == 1.0
    assert ("A", "B") not in pairs  # containment is DIRECTED
    assert not any("C" in p or "D" in p for p in pairs)


def test_scene_cuts_and_keyframes(spark):
    """Relational scene segmentation over per-frame hashes: frames
    AABBBCC -> cuts at the A->B and B->C transitions, scene ids 0/0/1/1/
    1/2/2; keyframes = first frame of each scene with its fingerprint."""
    rng = np.random.default_rng(17)
    A, B, C = (rng.integers(0, 256, size=(16, 18, 3), dtype=np.uint8) for _ in range(3))
    container = b"".join(make_bmp(f) for f in [A, A, B, B, B, C, C])
    df = spark.createDataFrame([("v", container)], "url string, payload binary")
    fh = MM.hash_video_frames(df, payload_col="payload")
    sc = MM.scene_cuts(fh, max_hamming=0).orderBy("frame_idx").collect()
    assert [r["scene_id"] for r in sc] == [0, 0, 1, 1, 1, 2, 2]
    assert [r["is_cut"] for r in sc] == [False, False, True, False, False, True, False]
    kf = MM.scene_keyframes(MM.scene_cuts(fh, max_hamming=0)).orderBy("scene_id").collect()
    assert [(r["scene_id"], r["frame_idx"]) for r in kf] == [(0, 0), (1, 2), (2, 5)]
    assert [r["fingerprint"] for r in kf] == [MM.dhash64(f) for f in (A, B, C)]


def test_scene_cuts_hamming_tolerance(spark):
    """max_hamming absorbs codec wobble: a one-pixel-edited repeat of a
    frame (exactly one gradient bit flips — pixel (0,0) is sampled and
    participates in only the (r=0, c=0) comparison) is NOT a cut at
    max_hamming=6 but IS at max_hamming=0."""
    rng = np.random.default_rng(29)
    A = rng.integers(0, 250, size=(16, 18, 3), dtype=np.uint8)
    A[0, 0], A[0, 2] = 10, 100  # bit (0,0): 10 < 100 -> 1
    A2 = A.copy()
    A2[0, 0] = 255  # -> 255 < 100 is false -> bit flips to 0
    d = MM.dhash64(A) ^ MM.dhash64(A2)
    assert 0 < bin(d & 0xFFFFFFFFFFFFFFFF).count("1") <= 6  # fixture sanity
    df = spark.createDataFrame(
        [("v", make_bmp(A) + make_bmp(A2))], "url string, payload binary"
    )
    fh = MM.hash_video_frames(df, payload_col="payload")
    strict = MM.scene_cuts(fh, max_hamming=0).orderBy("frame_idx").collect()
    loose = MM.scene_cuts(fh, max_hamming=6).orderBy("frame_idx").collect()
    assert [r["scene_id"] for r in strict] == [0, 1]
    assert [r["scene_id"] for r in loose] == [0, 0]


def test_audio_clip_pairs_planted_gain_invariant(spark):
    """End-to-end audio clip detection: B = segments 2..5 of A's sample
    stream at 2x gain -> containment 1.0 (the per-segment energy-contour
    fingerprint is exactly gain-invariant); C overlaps A by only 2
    segments -> no pair; D unrelated -> no pair."""
    rng = np.random.default_rng(37)
    master = rng.integers(-2048, 2048, size=8 * 520, dtype=np.int64)
    extra = rng.integers(-2048, 2048, size=2 * 520, dtype=np.int64)
    other = rng.integers(-2048, 2048, size=5 * 520, dtype=np.int64)
    rows = [
        ("A", make_wav(master.reshape(-1, 1))),
        ("B", make_wav((2 * master[2 * 520 : 6 * 520]).reshape(-1, 1))),
        ("C", make_wav(np.concatenate([master[6 * 520 :], extra, extra]).reshape(-1, 1))),
        ("D", make_wav(other.reshape(-1, 1))),
    ]
    df = spark.createDataFrame(rows, "url string, payload binary")
    pairs = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in MM.audio_clip_pairs(
            df, seg_samples=520, payload_col="payload", clip_segments=3, threshold=0.9
        ).collect()
    }
    assert pairs.get(("B", "A")) == 1.0
    assert ("A", "B") not in pairs
    assert not any("D" in p for p in pairs)


def test_audio_hash_streams_segmentation(spark):
    """Stream = per-520-sample-segment fingerprints in order; trailing
    remainder dropped; too-short and undecodable payloads -> 0 segments."""
    rng = np.random.default_rng(43)
    s = rng.integers(-2048, 2048, size=2 * 520 + 100, dtype=np.int64)
    df = spark.createDataFrame(
        [("a", make_wav(s.reshape(-1, 1))), ("short", make_wav(s[:64].reshape(-1, 1))), ("bad", b"\x00\x01")],
        "url string, payload binary",
    )
    out = {
        r["url"]: r
        for r in MM.audio_hash_streams(df, 520, payload_col="payload").collect()
    }
    exp = [MM.audio_fp64(s[k * 520 : (k + 1) * 520]) for k in range(2)]
    assert out["a"]["n_segments"] == 2
    assert out["a"]["hash_stream"] == " ".join(str(v) for v in exp)
    assert out["short"]["n_segments"] == 0
    assert out["bad"]["n_segments"] == 0


def test_keyframe_streams_frame_rate_robust(spark):
    """Scene-level streams detect a clip across a FRAME-RATE change
    where raw frame-level streams cannot: A plays scenes 0..3 at 2
    frames/scene, B plays scenes 1..2 at 3 frames/scene. Frame-level
    3-gram containment misses (no 3-frame window of B's AAA BBB pattern
    appears in A's AA BB); keyframe streams collapse both to the scene
    sequence and 2-scene containment finds B in A at 1.0."""
    from log_analysis_spark.operators.dedup import containment_pairs

    rng = np.random.default_rng(53)
    scenes = [rng.integers(0, 256, size=(16, 18, 3), dtype=np.uint8) for _ in range(4)]
    a = b"".join(make_bmp(s) for s in scenes for _ in range(2))
    b = b"".join(make_bmp(s) for s in scenes[1:3] for _ in range(3))
    df = spark.createDataFrame([("A", a), ("B", b)], "url string, payload binary")
    fh = MM.hash_video_frames(df, payload_col="payload")

    frame_streams = MM.video_hash_streams(df, payload_col="payload")
    frame_pairs = containment_pairs(
        frame_streams, "url", "hash_stream", block_col=None, n=3, threshold=0.9
    ).collect()
    assert frame_pairs == []  # rate change defeats frame-level matching

    scene_streams = MM.keyframe_hash_streams(fh)
    got = {
        r["url"]: (r["n_scenes"], r["hash_stream"])
        for r in scene_streams.collect()
    }
    exp = [str(MM.dhash64(s)) for s in scenes]
    assert got["A"] == (4, " ".join(exp))
    assert got["B"] == (2, " ".join(exp[1:3]))
    scene_pairs = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            scene_streams, "url", "hash_stream", block_col=None, n=2, threshold=0.9
        ).collect()
    }
    assert scene_pairs == {("B", "A"): 1.0}
