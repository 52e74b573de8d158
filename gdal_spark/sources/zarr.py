"""Zarr v2 driver: distributed chunked-array read + write.

Reference: frmts/zarr (the reference's Zarr driver; SURVEY §2.1 lists
Zarr among the raster drivers).  Re-derived from the PUBLIC Zarr v2
spec (zarr-specs v2: .zarray JSON metadata — shape/chunks/dtype/
compressor/order/fill_value, chunk files named "i.j" with "." or the
declared dimension_separator, C or F order, missing chunk files read
as fill_value).  The reference reads chunks through its block cache;
the Spark-native shape is better: a Zarr store IS a pre-partitioned
dataset, so the chunk grid becomes the task list — ONE task per
chunk, no driver pixel I/O, bbox/window pruning selects chunk keys
before any file opens.

Scope (declared, COVERAGE.md): 1-D and 2-D arrays (the raster
surface), dtype codes [<>|][uif][1248] + bool, compressor null /
zlib / gzip, order C and F, groups (.zgroup with member arrays),
both dimension separators.  Out: blosc/lz4/zstd/lzma compressors
(codec libs absent in this environment — the error names the codec),
filters (delta/fixedscaleoffset), >2-D arrays, v3 stores.

Cross-checked against the reference's own autotest fixtures
(autotest/gdrivers/data/zarr: zlib.zarr, gzip.zarr, order_f_u1.zarr,
f2_le/f2_be endianness pair, byte_cf1.zarr — whose Band1 equals
byte.tif's pixels, the repo's 4672-checksum golden).
"""

from __future__ import annotations

import gzip as _gzip
import json
import os
import zlib as _zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField,
    StructType,
)

BLOCK_SCHEMA = StructType([
    StructField("chunk_y", LongType()),
    StructField("chunk_x", LongType()),
    StructField("y0", LongType()),       # array-space origin of block
    StructField("x0", LongType()),
    StructField("height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("data", BinaryType()),   # raw C-order bytes (trimmed)
    StructField("dtype", StringType()),  # numpy dtype string
])

_SUPPORTED_CODECS = {None: "raw", "zlib": "zlib", "gzip": "gzip"}


def _parse_zarray(path: str) -> dict:
    with open(os.path.join(path, ".zarray")) as fh:
        meta = json.load(fh)
    if meta.get("zarr_format") != 2:
        raise ValueError(f"{path}: only Zarr v2 stores are supported "
                         f"(got zarr_format={meta.get('zarr_format')})")
    if meta.get("filters"):
        raise ValueError(f"{path}: Zarr filters are out of scope "
                         "(COVERAGE.md)")
    comp = meta.get("compressor")
    cid = comp.get("id") if isinstance(comp, dict) else None
    if comp is not None and cid not in _SUPPORTED_CODECS:
        raise ValueError(
            f"{path}: compressor {cid!r} needs a codec library this "
            "environment does not ship (supported: null/zlib/gzip)")
    if len(meta["shape"]) not in (1, 2):
        raise ValueError(f"{path}: only 1-D/2-D arrays are in scope "
                         f"(shape {meta['shape']})")
    return meta


def zarr_info(path: str) -> dict:
    """Store metadata: an array store returns its .zarray dict; a
    group store lists member arrays (the reference's multi-band
    group layout, e.g. byte_cf1.zarr/Band1)."""
    if os.path.exists(os.path.join(path, ".zarray")):
        return {"kind": "array", "arrays": {"": _parse_zarray(path)}}
    if os.path.exists(os.path.join(path, ".zgroup")):
        arrays, skipped = {}, {}
        for name in sorted(os.listdir(path)):
            sub = os.path.join(path, name)
            if os.path.isdir(sub) and \
                    os.path.exists(os.path.join(sub, ".zarray")):
                try:
                    arrays[name] = _parse_zarray(sub)
                except ValueError as exc:
                    # out-of-scope member (0-D grid-mapping scalar,
                    # exotic codec): the rest of the group stays
                    # readable — reading THAT member re-raises
                    skipped[name] = str(exc)
        return {"kind": "group", "arrays": arrays,
                "skipped": skipped}
    raise ValueError(f"{path}: no .zarray or .zgroup — not a Zarr "
                     "v2 store")


def _decode_chunk(buf: bytes, meta: dict) -> np.ndarray:
    comp = meta.get("compressor")
    cid = comp.get("id") if isinstance(comp, dict) else None
    if cid == "zlib":
        buf = _zlib.decompress(buf)
    elif cid == "gzip":
        buf = _gzip.decompress(buf)
    dt = np.dtype(meta["dtype"])
    chunks = meta["chunks"]
    arr = np.frombuffer(buf, dtype=dt)
    order = meta.get("order", "C")
    if len(chunks) == 1:
        return arr[:chunks[0]]
    if order == "F":
        return arr.reshape((chunks[1], chunks[0])).T
    return arr.reshape((chunks[0], chunks[1]))


def read_zarr(spark: SparkSession, path: str,
              array: str | None = None) -> DataFrame:
    """Distributed chunk read -> BLOCK_SCHEMA frame.

    The chunk-key grid derives from shape/chunks ALONE (driver opens
    only the small .zarray), so the plan is a local key list — one
    task per chunk, each decoding its own file; a missing chunk file
    materializes fill_value, per spec.  Edge chunks are trimmed to
    the array bounds (Zarr stores them padded).  1-D arrays read as
    one row high."""
    info = zarr_info(path)
    if info["kind"] == "group":
        if array is None:
            if len(info["arrays"]) != 1:
                raise ValueError(
                    f"{path}: group has arrays "
                    f"{sorted(info['arrays'])}; pass array=")
            array = next(iter(info["arrays"]))
        apath = os.path.join(path, array)
        meta = info["arrays"][array]
    else:
        apath = path
        meta = info["arrays"][""]

    shape = list(meta["shape"])
    chunks = list(meta["chunks"])
    if len(shape) == 1:
        shape = [1, shape[0]]
        chunks = [1, chunks[0]]
        one_d = True
    else:
        one_d = False
    sep = meta.get("dimension_separator", ".")
    ny = -(-shape[0] // chunks[0])
    nx = -(-shape[1] // chunks[1])
    keys = [(cy, cx) for cy in range(ny) for cx in range(nx)]
    fill = meta.get("fill_value")
    dt = np.dtype(meta["dtype"])
    dt_name = dt.str

    kdf = spark.createDataFrame(
        pd.DataFrame(keys, columns=["chunk_y", "chunk_x"]))

    def kernel(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {f.name: [] for f in BLOCK_SCHEMA.fields}
            for cy, cx in zip(b["chunk_y"], b["chunk_x"]):
                cy, cx = int(cy), int(cx)
                key = (str(cx) if one_d
                       else f"{cy}{sep}{cx}")
                f = os.path.join(apath, key)
                if os.path.exists(f):
                    with open(f, "rb") as fh:
                        arr = _decode_chunk(fh.read(), meta)
                    if one_d:
                        arr = arr.reshape(1, -1)
                else:
                    arr = np.full((chunks[0], chunks[1]),
                                  0 if fill is None else fill,
                                  dtype=dt)
                y0, x0 = cy * chunks[0], cx * chunks[1]
                h = min(chunks[0], shape[0] - y0)
                w = min(chunks[1], shape[1] - x0)
                arr = np.ascontiguousarray(arr[:h, :w])
                rows["chunk_y"].append(cy)
                rows["chunk_x"].append(cx)
                rows["y0"].append(y0)
                rows["x0"].append(x0)
                rows["height"].append(h)
                rows["width"].append(w)
                rows["data"].append(arr.tobytes())
                rows["dtype"].append(dt_name)
            yield pd.DataFrame(rows)

    par = spark.sparkContext.defaultParallelism
    return kdf.repartition(min(len(keys), par)) \
        .mapInPandas(kernel, BLOCK_SCHEMA)


def blocks_to_array(pdf: pd.DataFrame, shape: tuple[int, int]
                    ) -> np.ndarray:
    """Assemble a (small) collected block frame into one array —
    test/driver-side helper, not a distributed path."""
    first = np.dtype(pdf.iloc[0]["dtype"])
    out = np.zeros(shape, dtype=first)
    for _, r in pdf.iterrows():
        a = np.frombuffer(bytes(r["data"]), dtype=np.dtype(
            r["dtype"])).reshape(int(r["height"]), int(r["width"]))
        out[int(r["y0"]):int(r["y0"]) + int(r["height"]),
            int(r["x0"]):int(r["x0"]) + int(r["width"])] = a
    return out


def write_zarr(blocks: DataFrame, path: str, *,
               shape: tuple[int, int],
               chunks: tuple[int, int],
               dtype: str,
               compressor: str | None = "zlib",
               fill_value=0) -> None:
    """BLOCK_SCHEMA frame -> a Zarr v2 array store.

    Executors write their own chunk files (one per block row — the
    store layout IS file-per-chunk, so the write is embarrassingly
    parallel, same contract as the z/x/y tile sink); the driver only
    writes the .zarray JSON.  Blocks must cover whole chunks on the
    chunk grid (edge blocks may be trimmed; they are padded back to
    the chunk size with fill_value, per spec)."""
    if "://" in str(path):
        raise ValueError("write_zarr needs a shared-filesystem path")
    if compressor not in (None, "zlib", "gzip"):
        raise ValueError(f"unsupported compressor {compressor!r}")
    os.makedirs(path, exist_ok=True)
    dt = np.dtype(dtype)
    meta = {
        "zarr_format": 2,
        "shape": list(shape),
        "chunks": list(chunks),
        "dtype": dt.str,
        "compressor": ({"id": "zlib", "level": 1}
                       if compressor == "zlib" else
                       {"id": "gzip", "level": 1}
                       if compressor == "gzip" else None),
        "fill_value": fill_value,
        "filters": None,
        "order": "C",
    }
    ch, cw = chunks

    def kernel(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        n = 0
        for b in batches:
            for _, r in b.iterrows():
                a = np.frombuffer(bytes(r["data"]),
                                  dtype=np.dtype(r["dtype"])) \
                    .reshape(int(r["height"]), int(r["width"]))
                if a.shape != (ch, cw):
                    full = np.full((ch, cw), fill_value,
                                   dtype=a.dtype)
                    full[:a.shape[0], :a.shape[1]] = a
                    a = full
                buf = np.ascontiguousarray(a.astype(dt)).tobytes()
                if compressor == "zlib":
                    buf = _zlib.compress(buf, 1)
                elif compressor == "gzip":
                    buf = _gzip.compress(buf, 1)
                key = f"{int(r['chunk_y'])}.{int(r['chunk_x'])}"
                with open(os.path.join(path, key), "wb") as fh:
                    fh.write(buf)
                n += 1
        yield pd.DataFrame({"n": [n]})

    blocks.mapInPandas(
        kernel, StructType([StructField("n", LongType())])
    ).agg({"n": "sum"}).collect()
    with open(os.path.join(path, ".zarray"), "w") as fh:
        json.dump(meta, fh)


def zarr_to_tiles(blocks: DataFrame, *, zoom: int = 0,
                  band: int = 1) -> DataFrame:
    """BLOCK_SCHEMA -> TILE_SCHEMA for SQUARE full-size chunks, so a
    Zarr array feeds the raster operator family directly (hillshade,
    neighbors, contour, zonal, the tile sinks).  Map-only projection
    + per-row re-encode; edge blocks pad back to the chunk square
    with zeros (the tile lattice is square by contract)."""
    from gdal_spark.operators.tiling import TILE_SCHEMA

    def kernel(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {f.name: [] for f in TILE_SCHEMA.fields}
            for _, r in b.iterrows():
                h, w = int(r["height"]), int(r["width"])
                ts = max(h, w)
                a = np.frombuffer(bytes(r["data"]),
                                  dtype=np.dtype(r["dtype"])) \
                    .reshape(h, w)
                if (h, w) != (ts, ts):
                    full = np.zeros((ts, ts), dtype=a.dtype)
                    full[:h, :w] = a
                    a = full
                rows["zoom"].append(zoom)
                rows["tile_x"].append(int(r["chunk_x"]))
                rows["tile_y"].append(int(r["chunk_y"]))
                rows["band"].append(band)
                rows["data"].append(
                    np.ascontiguousarray(a).tobytes())
                rows["dtype"].append(str(a.dtype))
                rows["tile_size"].append(ts)
            yield pd.DataFrame(rows)

    return blocks.mapInPandas(kernel, TILE_SCHEMA)
