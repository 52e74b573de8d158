"""Multimodal (image/audio/video) columns: opaque binary + typed
metadata, with Arrow-batched decode / resize / frame-sample kernels.

The reference decodes rasters via format drivers (frmts/, 117 raster
drivers); in this engine media travel as ``binary`` columns with a
metadata struct, and the decode step is a pandas-UDF kernel over
mapInPandas.  The image/audio codec libraries are NOT available in
this container, so the codec boundary is explicit:

* ``decode_image`` first tries Pillow (import-gated), else falls back
  to the deterministic FAKEIMG container below, else raises
  NotImplementedError per row group — the Spark-side plumbing
  (schema, batching, partitioning, kernel signatures) is real and
  tested either way.
* FAKEIMG container: b"FAKEIMG" + uint16 w, h, c + raw uint8 pixels,
  C order — a stand-in codec so resize / frame-sample kernels have
  real arrays to chew on.

All kernels keep the (rows x decoded-arrays) work inside numpy on the
Arrow batch; no per-row Python in the hot path beyond the unavoidable
per-image codec call.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_frames", IntegerType()),
])

_MAGIC = b"FAKEIMG"


def encode_fakeimg(arr: np.ndarray) -> bytes:
    """Encode an (h, w, c) uint8 array into the FAKEIMG container."""
    h, w, c = arr.shape
    return _MAGIC + struct.pack("<HHH", w, h, c) + \
        np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_any(payload: bytes) -> np.ndarray:
    """Decode one image payload -> (h, w, c) uint8 array.

    Magic-byte dispatch to the IN-REPO spec codecs first — PNG
    (operators/png.py), baseline JPEG (operators/jpeg.py), GeoTIFF
    (operators/gtiff.py) — the same way the reference decodes its
    rasters with its own in-tree drivers (frmts/).  Pillow is only
    an import-gated fallback for formats the repo doesn't implement
    (webp, gif, ...); FAKEIMG remains the deterministic stand-in."""
    if payload[:7] == _MAGIC:
        w, h, c = struct.unpack("<HHH", payload[7:13])
        return np.frombuffer(payload[13:13 + w * h * c],
                             dtype=np.uint8).reshape(h, w, c)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from gdal_spark.operators.png import decode_png

        a = decode_png(bytes(payload))
        return a[:, :, None] if a.ndim == 2 else a
    if payload[:3] == b"\xff\xd8\xff":
        from gdal_spark.operators.jpeg import decode_jpeg

        a = decode_jpeg(bytes(payload))
        return a[:, :, None] if a.ndim == 2 else a
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from gdal_spark.operators.gtiff import decode_gtiff

        a, _meta = decode_gtiff(bytes(payload))
        if a.ndim == 2:
            a = a[:, :, None]
        # features/resize operate on uint8 display values (the
        # translate -ot Byte convention used by the tile sinks)
        if a.dtype != np.uint8:
            a = np.clip(np.round(a.astype(np.float64)), 0,
                        255).astype(np.uint8)
        return a
    try:
        import io

        from PIL import Image  # noqa: F401

        img = Image.open(io.BytesIO(payload))
        a = np.asarray(img)
        if a.ndim == 2:
            a = a[:, :, None]
        return a
    except ImportError as exc:
        raise NotImplementedError(
            "no in-repo codec for this payload (png/jpeg/tiff are "
            "in-repo; others need Pillow) and Pillow is unavailable; "
            "use the FAKEIMG stand-in or install Pillow"
        ) from exc


def fakeimg_for_id(mid: int) -> np.ndarray:
    """The deterministic FAKEIMG pixel law: a pure function of
    media_id (size AND pixels), so feature extraction has an exact
    closed-form/SQL oracle."""
    w = 16 + (mid % 4) * 8
    h = 16 + (mid % 3) * 8
    yy, xx = np.mgrid[0:h, 0:w]
    base_ch = (xx * 7 + yy * 13 + mid) % 256
    return np.stack([base_ch, (base_ch * 2) % 256,
                     (base_ch + mid) % 256], axis=2).astype(np.uint8)


def media_from_ids(ids_df: DataFrame, id_col: str = "media_id"
                   ) -> DataFrame:
    """Deterministic media frame from ANY id column (the pixel law
    above); one FAKEIMG image row per id."""

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k.name: [] for k in MEDIA_SCHEMA.fields}
            for mid in b[id_col]:
                mid = int(mid)
                arr = fakeimg_for_id(mid)
                h, w, c = arr.shape
                rows["media_id"].append(mid)
                rows["kind"].append("image")
                rows["payload"].append(encode_fakeimg(arr))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                rows["n_frames"].append(1)
            yield pd.DataFrame(rows)

    return ids_df.select(F.col(id_col).cast("long").alias(id_col)) \
        .mapInPandas(render, MEDIA_SCHEMA)


def synth_media_df(spark: SparkSession, n: int,
                   partitions: int | None = None) -> DataFrame:
    """Deterministic media table: FAKEIMG payloads whose pixel values
    are a pure function of media_id (seeded, reproducible)."""
    partitions = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n, 1, partitions).withColumnRenamed("id", "media_id")
    return media_from_ids(base)


FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mean_r", IntegerType()),
    StructField("mean_g", IntegerType()),
    StructField("mean_b", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + per-channel mean features (Arrow-batched)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {k.name: [] for k in FEATURE_SCHEMA.fields}
            for mid, payload in zip(b["media_id"], b["payload"]):
                arr = decode_any(bytes(payload))
                m = arr.reshape(-1, arr.shape[2]).mean(axis=0)
                rows["media_id"].append(int(mid))
                rows["mean_r"].append(int(m[0]))
                rows["mean_g"].append(int(m[1] if len(m) > 1 else m[0]))
                rows["mean_b"].append(int(m[2] if len(m) > 2 else m[0]))
                rows["width"].append(arr.shape[1])
                rows["height"].append(arr.shape[0])
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        kernel, FEATURE_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize kernel -> new FAKEIMG payloads (the
    same pixel-center sampling as the raster near kernel)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b.copy()
            payloads = []
            for payload in b["payload"]:
                arr = decode_any(bytes(payload))
                h, w, _ = arr.shape
                sx = (np.floor((np.arange(out_w) + 0.5) * w / out_w)
                      .astype(int).clip(0, w - 1))
                sy = (np.floor((np.arange(out_h) + 0.5) * h / out_h)
                      .astype(int).clip(0, h - 1))
                payloads.append(encode_fakeimg(arr[sy][:, sx]))
            out["payload"] = payloads
            out["width"] = out_w
            out["height"] = out_h
            yield out

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video kinds: explode n_frames into
    (media_id, frame_idx) rows keeping every ``every_n``-th frame —
    JVM-side sequence/explode, no Python."""
    return (
        media.withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)),
        )
        .filter(F.col("frame_idx") % every_n == 0)
        .select("media_id", "kind", "frame_idx")
    )
