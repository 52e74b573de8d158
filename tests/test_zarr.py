"""Zarr v2 driver: reference-fixture decode matrix + round-trip.

Fixtures are the reference's own (autotest/gdrivers/data/zarr),
giving byte-level anchors for codecs, memory order and endianness.
"""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.sources.zarr import (
    BLOCK_SCHEMA, blocks_to_array, read_zarr, write_zarr, zarr_info,
)

ZD = "/root/reference/autotest/gdrivers/data/zarr"


def _arr(spark, path, **kw):
    pdf = read_zarr(spark, path, **kw).toPandas()
    info = zarr_info(path)
    meta = (next(iter(info["arrays"].values()))
            if info["kind"] == "array"
            else info["arrays"][kw.get("array")
                                or next(iter(info["arrays"]))])
    shape = meta["shape"]
    if len(shape) == 1:
        shape = [1, shape[0]]
    return blocks_to_array(pdf, tuple(shape))


def test_zlib_and_gzip_chunks(spark):
    a = _arr(spark, f"{ZD}/zlib.zarr")
    g = _arr(spark, f"{ZD}/gzip.zarr")
    # the reference's autotest expects [1, 2] for both
    assert a.tolist() == [[1, 2]]
    assert g.tolist() == [[1, 2]]


def test_fortran_order_chunks(spark):
    """order=F fixtures must transpose per chunk (the reference's
    autotest test_zarr_read_F_order)."""
    a = _arr(spark, f"{ZD}/order_f_u1.zarr")
    # 4x4 array, 2x3... chunks: row-major values 0..15 per fixture
    # generator (generate_test_files.py writes arange)
    assert a.shape == (4, 4)
    assert a.tolist() == np.arange(16).reshape(4, 4).tolist()


def test_endianness_pair(spark):
    le = _arr(spark, f"{ZD}/f2_le.zarr")
    be = _arr(spark, f"{ZD}/f2_be.zarr")
    # fixture stores [1.5, NaN] (0x3e00, 0x7e00) in both byte orders
    assert float(le[0, 0]) == 1.5 and np.isnan(float(le[0, 1]))
    assert float(be[0, 0]) == 1.5 and np.isnan(float(be[0, 1]))


def test_group_store_matches_gtiff_golden(spark):
    """byte_cf1.zarr's Band1 is byte.tif re-encoded — the driver's
    output must equal the in-repo GTiff decoder's pixels (the
    4672-checksum golden)."""
    from gdal_spark.operators.gtiff import decode_gtiff

    info = zarr_info(f"{ZD}/byte_cf1.zarr")
    assert info["kind"] == "group" and "Band1" in info["arrays"]
    z = _arr(spark, f"{ZD}/byte_cf1.zarr", array="Band1")
    with open("/root/reference/autotest/gcore/data/byte.tif",
              "rb") as fh:
        t, _ = decode_gtiff(fh.read())
    # CF-1 stores north-up data bottom-to-top (y ascending): the
    # raster rows are flipped relative to the GeoTIFF
    assert (np.array_equal(z, t) or np.array_equal(z[::-1], t))


def test_unsupported_codec_raises(spark):
    with pytest.raises(ValueError, match="codec library"):
        zarr_info(f"{ZD}/blosc.zarr")


def test_missing_chunks_fill(spark, tmp_path):
    import json
    import os

    p = tmp_path / "holes.zarr"
    p.mkdir()
    (p / ".zarray").write_text(json.dumps({
        "zarr_format": 2, "shape": [4, 4], "chunks": [2, 2],
        "dtype": "<i4", "compressor": None, "filters": None,
        "order": "C", "fill_value": 7}))
    a = np.array([[1, 2], [3, 4]], dtype="<i4")
    (p / "0.0").write_bytes(a.tobytes())   # only one of 4 chunks
    got = _arr(spark, str(p))
    assert got[:2, :2].tolist() == a.tolist()
    assert (got[2:, :] == 7).all() and (got[:2, 2:] == 7).all()


def test_roundtrip_distributed(spark, tmp_path):
    rng = np.random.default_rng(3)
    full = rng.integers(0, 1000, (50, 70)).astype("<i4")
    rows = []
    for cy in range(0, 50, 16):
        for cx in range(0, 70, 32):
            blk = full[cy:cy + 16, cx:cx + 32]
            rows.append({
                "chunk_y": cy // 16, "chunk_x": cx // 32,
                "y0": cy, "x0": cx,
                "height": blk.shape[0], "width": blk.shape[1],
                "data": np.ascontiguousarray(blk).tobytes(),
                "dtype": "<i4"})
    blocks = spark.createDataFrame(pd.DataFrame(rows), BLOCK_SCHEMA)
    out = str(tmp_path / "rt.zarr")
    write_zarr(blocks, out, shape=(50, 70), chunks=(16, 32),
               dtype="<i4", compressor="zlib")
    back = _arr(spark, out)
    assert np.array_equal(back, full)
    # gzip + uncompressed variants round-trip too
    for comp in (None, "gzip"):
        out2 = str(tmp_path / f"rt_{comp}.zarr")
        write_zarr(blocks, out2, shape=(50, 70), chunks=(16, 32),
                   dtype="<i4", compressor=comp)
        assert np.array_equal(_arr(spark, out2), full)


def test_raster_info_zarr():
    from gdal_spark.sources.registry import raster_info

    info = raster_info(f"{ZD}/byte_cf1.zarr")
    assert info["driver"] == "Zarr" and info["kind"] == "group"
    assert info["arrays"]["Band1"]["shape"] == [20, 20]
    assert info["arrays"]["Band1"]["dtype"] == "|u1"


def test_zarr_feeds_raster_ops(spark, tmp_path):
    """A Zarr DEM runs the raster operator family via zarr_to_tiles
    (the reference opens Zarr through the same GDALDataset surface
    its DEM tools consume)."""
    from gdal_spark.operators.dem import focal_tiles
    from gdal_spark.sources.zarr import read_zarr, write_zarr, zarr_to_tiles

    yy, xx = np.mgrid[0:64, 0:64]
    dem = (xx * 2.0 + yy * 3.0).astype("<f8")   # exact plane
    rows = []
    for cy in range(2):
        for cx in range(2):
            blk = dem[cy*32:(cy+1)*32, cx*32:(cx+1)*32]
            rows.append({"chunk_y": cy, "chunk_x": cx,
                         "y0": cy*32, "x0": cx*32,
                         "height": 32, "width": 32,
                         "data": np.ascontiguousarray(blk).tobytes(),
                         "dtype": "<f8"})
    p = str(tmp_path / "dem.zarr")
    write_zarr(spark.createDataFrame(pd.DataFrame(rows), BLOCK_SCHEMA),
               p, shape=(64, 64), chunks=(32, 32), dtype="<f8")
    tiles = zarr_to_tiles(read_zarr(spark, p))
    slope = focal_tiles(tiles, "slope", xres=1.0, yres=1.0)
    from gdal_spark.operators.tiling import decode_tile
    r = slope.toPandas().iloc[0]
    a = decode_tile(r["data"], r["dtype"], int(r["tile_size"]))
    # exact plane: slope everywhere = atan(|grad|) in degrees
    want = np.degrees(np.arctan(np.hypot(2.0, 3.0)))
    inner = a[1:-1, 1:-1]
    assert np.allclose(inner, want, atol=1e-6)
