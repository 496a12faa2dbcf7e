"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with a typed metadata struct.
The decode kernels themselves are STUBBED (this container has no
PIL/ffmpeg/librosa — see ``_HAVE_PIL`` gates): when the real library is
absent, decode uses a clearly-marked deterministic fake so the Spark-side
plumbing — schema, Arrow batch shape, ``mapInPandas`` signature,
partitioning — is real and fully tested. Swapping in the real kernel is a
one-function change.

Scale notes: payload bytes travel executor->Python once per stage via
Arrow; keep all multimodal transforms in ONE ``mapInPandas`` stage
(compose kernels inside the iterator) to avoid repeated binary shuttling.
Batches are bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
for multi-MB payloads set it low (e.g. 64) to cap executor memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

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


def _fake_decode(buf: bytes) -> np.ndarray:
    """DETERMINISTIC FAKE decode (no image libs in container): interprets
    the byte stream itself as an 8-bit single-channel raster of width 64.
    Replace with ``PIL.Image.open`` when available."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    w = 64
    h = max(len(arr) // w, 1)
    return arr[: h * w].reshape(h, w)


def decode_images(df: DataFrame, url_col: str = "url", payload_col: str = "html") -> DataFrame:
    """binary payload -> decoded image features via one mapInPandas stage.

    Real plumbing (Arrow batches in, typed rows out, column pruning to just
    (url, payload)); stubbed kernel when PIL is absent.
    """
    if _HAVE_PIL:  # pragma: no cover
        raise NotImplementedError("real PIL decode kernel: wire Image.open here")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rasters = [_fake_decode(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].to_numpy(),
                    "width": [r.shape[1] for r in rasters],
                    "height": [r.shape[0] for r in rasters],
                    "n_channels": [1] * len(rasters),
                    "mean_luma": [float(r.mean()) for r in rasters],
                }
            )

    return df.select(url_col, payload_col).mapInPandas(_decode, schema=DECODED_IMAGE_SCHEMA)


def resize_images(
    df: DataFrame, out_w: int = 8, out_h: int = 8, url_col: str = "url", payload_col: str = "html"
) -> DataFrame:
    """Decode + nearest-neighbor resize to (out_h, out_w), emitting the
    resized raster as array<int>. One fused mapInPandas stage (decode and
    resize share the batch; bytes cross the Arrow boundary once)."""
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
                r = _fake_decode(bytes(b))
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
