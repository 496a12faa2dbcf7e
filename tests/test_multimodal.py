"""Multimodal plumbing tests: metadata sniff (native), stubbed decode /
resize / frame-sample kernels behind real mapInPandas stages."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from pyspark.sql import functions as F

from log_analysis_spark.functions import multimodal as MM


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
    r = out["u://png"]
    assert r["width"] == 64 and r["height"] == (8 + 256 * 8) // 64
    assert r["n_channels"] == 1
    assert 0.0 <= r["mean_luma"] <= 255.0


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
