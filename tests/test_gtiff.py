"""GeoTIFF codec + gtiff tile sink + pyramid read-back.

Golden strategy: the canonical byte.tif fixture (the image GDAL's
own test suite anchors on, autotest/gcore/tiff_read.py:45) must
decode to checksum 4672 with its known UTM georeferencing, every
gcore dtype fixture must decode to the SAME image, and GDAL-written
LZW/predictor/tiled/big-endian variants are ground truth for the
entropy decoders.  Our encoder is then checked as
decode(encode(x)) == x across the dtype x compression x layout
matrix (TIFF is lossless everywhere, so identity is exact).
"""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.checksum import checksum_array
from gdal_spark.operators.gtiff import decode_gtiff, encode_gtiff

DATA = "/root/reference/autotest/gcore/data"
BYTE_GT = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)


def _fixture(name: str) -> bytes:
    with open(f"{DATA}/{name}", "rb") as fh:
        return fh.read()


def test_byte_tif_golden():
    """Checksum(byte.tif) == 4672 through the product decoder, with
    the fixture's documented georeferencing (EPSG:26711 UTM 11N)."""
    arr, meta = decode_gtiff(_fixture("byte.tif"))
    assert arr.shape == (20, 20) and arr.dtype == np.uint8
    assert checksum_array(arr) == 4672
    assert meta["geotransform"] == BYTE_GT
    assert meta["epsg"] == 26711


@pytest.mark.parametrize("name,dtype", [
    ("uint16.tif", np.uint16), ("int16.tif", np.int16),
    ("uint32.tif", np.uint32), ("float32.tif", np.float32),
    ("float64.tif", np.float64),
])
def test_dtype_fixtures_hold_the_byte_image(name, dtype):
    ref, _ = decode_gtiff(_fixture("byte.tif"))
    arr, meta = decode_gtiff(_fixture(name))
    assert arr.dtype == dtype
    np.testing.assert_array_equal(arr.astype(np.float64),
                                  ref.astype(np.float64))
    assert meta["geotransform"] == BYTE_GT


@pytest.mark.parametrize("name", [
    "gtiff/byte_LZW.tif",
    "gtiff/byte_LZW_predictor_2.tif",
    "gtiff/byte_LZW_tiled.tif",
    "gtiff/byte_little_endian_tiled_lzw_golden.tif",
    "gtiff/uint16_LZW_predictor_2.tif",
    "gtiff/uint32_LZW_predictor_2.tif",
])
def test_lzw_fixtures_ground_truth(name):
    """GDAL-written LZW streams (plain / predictor-2 at 8/16/32 bit
    / tiled) are ground truth for the early-change LZW decoder."""
    ref, _ = decode_gtiff(_fixture("byte.tif"))
    arr, _ = decode_gtiff(_fixture(name))
    np.testing.assert_array_equal(arr.astype(np.int64),
                                  ref.astype(np.int64))


def test_planar_rgb_fixture_and_reencode():
    """rgbsmall.tif is PlanarConfig=2 (separate planes): decode,
    then round-trip through our chunky encoder."""
    arr, meta = decode_gtiff(_fixture("rgbsmall.tif"))
    assert arr.shape == (50, 50, 3) and arr.dtype == np.uint8
    assert meta["epsg"] == 4326
    again, meta2 = decode_gtiff(encode_gtiff(
        arr, geotransform=meta["geotransform"], epsg=4326))
    np.testing.assert_array_equal(again, arr)
    assert meta2["geotransform"] == meta["geotransform"]
    assert meta2["epsg"] == 4326


@pytest.mark.parametrize("dtype", [
    np.uint8, np.uint16, np.int16, np.int32, np.float32, np.float64])
@pytest.mark.parametrize("comp", ["none", "deflate", "lzw"])
@pytest.mark.parametrize("tiled", [False, True])
def test_roundtrip_matrix(dtype, comp, tiled):
    rng = np.random.RandomState(7)
    for shape in ((23, 31), (40, 33, 3)):
        if np.issubdtype(dtype, np.floating):
            img = rng.randn(*shape).astype(dtype)
        else:
            info = np.iinfo(dtype)
            img = rng.randint(info.min, min(info.max, 2 ** 31 - 1),
                              shape).astype(dtype)
        buf = encode_gtiff(img, geotransform=BYTE_GT, epsg=26711,
                           compression=comp, tiled=tiled,
                           tile_size=32)
        got, meta = decode_gtiff(buf)
        np.testing.assert_array_equal(got, img)
        assert got.dtype == img.dtype
        assert meta["geotransform"] == BYTE_GT
        assert meta["epsg"] == 26711


def test_lzw_table_reset_long_input():
    """>4094 phrases forces the encoder's Clear-code table reset."""
    big = np.tile(np.arange(256, dtype=np.uint8), (512, 40))
    buf = encode_gtiff(big, compression="lzw")
    got, _ = decode_gtiff(buf)
    np.testing.assert_array_equal(got, big)
    assert len(buf) < big.nbytes // 50   # and it actually compresses


def test_deflate_predictor_compresses_smooth_data():
    smooth = np.add.outer(np.arange(500), np.arange(500)) \
        .astype(np.uint16)
    buf = encode_gtiff(smooth, compression="deflate")
    got, _ = decode_gtiff(buf)
    np.testing.assert_array_equal(got, smooth)
    assert len(buf) < smooth.nbytes // 20


def test_geographic_vs_projected_geokeys():
    a = np.zeros((4, 4), np.uint8)
    geo = decode_gtiff(encode_gtiff(
        a, geotransform=(0, 0.1, 0, 10, 0, -0.1), epsg=4326))[1]
    assert geo["epsg"] == 4326
    prj = decode_gtiff(encode_gtiff(
        a, geotransform=(0, 10, 0, 0, 0, -10), epsg=3857))[1]
    assert prj["epsg"] == 3857


def test_encode_rejects_out_of_scope():
    a = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="rotated"):
        encode_gtiff(a, geotransform=(0, 1, 0.5, 0, 0, -1))
    with pytest.raises(ValueError, match="compression"):
        encode_gtiff(a, compression="jpeg")
    with pytest.raises(ValueError, match="multiple of 16"):
        encode_gtiff(a, tiled=True, tile_size=20)
    with pytest.raises(ValueError, match="dtype"):
        encode_gtiff(np.zeros((4, 4), np.complex64))
    with pytest.raises(ValueError, match="BigTIFF"):
        decode_gtiff(b"II\x2b\x00" + b"\0" * 12)


def test_write_tiles_gtiff_native_dtype_and_georef(spark, tmp_path):
    """write_tiles(format='gtiff') keeps float values EXACTLY (no
    Byte clipping), stamps EPSG:3857 per-tile georeferencing, and
    the pyramid reads back losslessly through the tile data source."""
    from gdal_spark.functions.geo import ORIGIN
    from gdal_spark.operators.tiling import encode_tile, write_tiles
    from gdal_spark.sources.tile_datasource import register_tile_source

    rng = np.random.RandomState(11)
    arrays = {}
    rows = []
    for tx, ty in [(0, 0), (2, 1), (3, 3)]:
        arr = (rng.randn(16, 16) * 1000.0).astype(np.float64)
        payload, dts = encode_tile(arr, None)
        arrays[(tx, ty)] = arr
        rows.append({"zoom": 2, "tile_x": tx, "tile_y": ty,
                     "band": 1, "data": payload, "dtype": dts,
                     "tile_size": 16})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    out = tmp_path / "pyr"
    write_tiles(tiles, str(out), convention="xyz", format="gtiff")

    # files decode to the exact float arrays with tile georef
    size = 2.0 * ORIGIN / 4          # zoom 2
    for (tx, ty), arr in arrays.items():
        p = out / "2" / str(tx) / f"{ty}.tif"
        got, meta = decode_gtiff(p.read_bytes())
        np.testing.assert_array_equal(got, arr)
        gt = meta["geotransform"]
        assert meta["epsg"] == 3857
        assert gt[0] == pytest.approx(-ORIGIN + tx * size)
        assert gt[3] == pytest.approx(ORIGIN - ty * size)
        assert gt[1] == pytest.approx(size / 16)

    # ...and round-trip through the pyramid data source
    register_tile_source(spark)
    back = (spark.read.format("tile_pyramid")
            .option("path", str(out)).load()
            .filter("zoom = 2").toPandas())
    assert len(back) == 3
    from gdal_spark.operators.tiling import decode_tile
    for _, r in back.iterrows():
        got = decode_tile(r["data"], r["dtype"], r["tile_size"])
        np.testing.assert_array_equal(
            got, arrays[(r["tile_x"], r["tile_y"])])
        assert got.dtype == np.float64


def test_multi_ifd_reads_first_ifd_only():
    """Contract (COVERAGE.md): a multi-IFD TIFF — a COG or any file
    with overviews — decodes its FIRST IFD (the full-resolution
    image); later IFDs (overview levels) are ignored, never merged.
    Fixture: the reference's byte.tif with two overview IFDs
    (autotest/gcore/data/byte_with_ovr.tif) must decode to the exact
    same full-res pixels as plain byte.tif."""
    import numpy as np

    from gdal_spark.operators.gtiff import decode_gtiff

    with open("/root/reference/autotest/gcore/data/byte_with_ovr.tif",
              "rb") as fh:
        ovr, meta = decode_gtiff(fh.read())
    with open("/root/reference/autotest/gcore/data/byte.tif",
              "rb") as fh:
        base, _ = decode_gtiff(fh.read())
    assert ovr.shape == (20, 20)          # full-res, NOT the 10x10
    assert np.array_equal(ovr, base)      # or 5x5 overview IFDs
    assert meta["epsg"] == 26711
