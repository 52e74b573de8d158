"""Baseline JPEG codec (operators/jpeg.py) + JPEG tile sink.

Golden strategy: the codec is lossy, so the anchors are (a) marker
structure well-formed, (b) DC-exact reconstruction of flat blocks,
(c) PSNR floors on smooth gradients per quality, (d) an INDEPENDENT
decode by javax.imageio through the Spark JVM gateway (raster
samples, not getRGB — that path applies a gray->sRGB color
transform), and (e) the z/x/y.jpg sink round-trips through the
tile_pyramid data source within a quality-75 error bound.
"""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def test_jpeg_markers_and_flat_exact():
    flat = np.full((24, 40), 77, dtype=np.uint8)
    buf = encode_jpeg(flat, quality=50)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in buf[:32]
    # flat block at mid quality: within DC quantization of the value
    assert np.abs(decode_jpeg(buf).astype(int) - 77).max() <= 1
    # quality=100 -> all-ones quant tables -> flat block DC-exact
    got100 = decode_jpeg(encode_jpeg(flat, quality=100))
    np.testing.assert_array_equal(got100, flat)


def test_jpeg_quality_psnr_floors():
    grad = (np.add.outer(np.arange(64), np.arange(48)) * 2
            % 256).astype(np.uint8)
    sizes = []
    for q, floor in ((50, 40.0), (75, 45.0), (95, 55.0)):
        buf = encode_jpeg(grad, quality=q)
        sizes.append(len(buf))
        assert _psnr(decode_jpeg(buf), grad) >= floor, q
    assert sizes == sorted(sizes)  # higher quality -> bigger stream


def test_jpeg_rgb_roundtrip():
    rgb = np.stack([
        np.tile(np.linspace(0, 255, 64), (48, 1)),
        np.tile(np.linspace(255, 0, 64), (48, 1)),
        np.full((48, 64), 100.0)], axis=-1).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert got.shape == rgb.shape
    assert _psnr(got, rgb) >= 45.0


def test_jpeg_nonmultiple_of_8_shapes():
    rng = np.random.RandomState(11)
    for shape in ((13, 21), (9, 8), (17, 31, 3)):
        img = rng.randint(0, 256, shape).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(img, quality=95))
        assert got.shape == img.shape


def test_jpeg_rejects_bad_input():
    with pytest.raises(ValueError, match="uint8"):
        encode_jpeg(np.zeros((8, 8), dtype=np.float64))
    with pytest.raises(ValueError, match="RGB"):
        encode_jpeg(np.zeros((8, 8, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_jpeg_cross_decoder_javax_imageio(spark):
    """Independent decoder: javax.imageio (JDK) must parse our
    stream and agree on the raster samples."""
    jvm = spark.sparkContext._jvm

    def imageio_raster(buf, bands):
        bais = jvm.java.io.ByteArrayInputStream(bytearray(buf))
        img = jvm.javax.imageio.ImageIO.read(bais)
        assert img is not None, "javax.imageio failed to parse"
        h, w = img.getHeight(), img.getWidth()
        raster = img.getRaster()
        out = np.zeros((h, w, bands), dtype=np.int32)
        for y in range(h):
            for x in range(w):
                for c in range(bands):
                    out[y, x, c] = raster.getSample(x, y, c)
        return out

    gray = (np.add.outer(np.arange(16), np.arange(16)) * 4
            % 256).astype(np.uint8)
    ext = imageio_raster(encode_jpeg(gray, quality=95), 1)[:, :, 0]
    ours = decode_jpeg(encode_jpeg(gray, quality=95))
    np.testing.assert_array_equal(ext, ours)

    rng = np.random.RandomState(2)
    rgb = rng.randint(60, 196, (16, 16, 3)).astype(np.uint8)
    ext3 = imageio_raster(encode_jpeg(rgb, quality=95), 3)
    ours3 = decode_jpeg(encode_jpeg(rgb, quality=95))
    # IDCT + YCbCr float rounding chains: <= 2 code values per sample
    assert np.abs(ext3 - ours3.astype(np.int32)).max() <= 2


def test_jpeg_tile_sink_roundtrip(spark, tmp_path):
    from gdal_spark.operators.tiling import (
        decode_tile, encode_tile, write_tiles,
    )
    from gdal_spark.sources.tile_datasource import register_tile_source

    rng = np.random.RandomState(21)
    rows = []
    arrays = {}
    for zoom, tx, ty in [(1, 0, 0), (2, 3, 2), (3, 5, 1)]:
        # smooth content so the quality-75 bound is tight
        arr = ((np.add.outer(np.arange(8), np.arange(8)) * 7
                + zoom * 11) % 256).astype(np.uint8)
        payload, dts = encode_tile(arr, None)
        arrays[(zoom, tx, ty)] = arr
        rows.append({"zoom": zoom, "tile_x": tx, "tile_y": ty,
                     "band": 1, "data": payload, "dtype": dts,
                     "tile_size": 8})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    out = tmp_path / "jpyr"
    write_tiles(tiles, str(out), convention="xyz", format="jpeg",
                quality=95)
    assert (out / "2" / "3" / "2.jpg").exists()

    register_tile_source(spark)
    got = (spark.read.format("tile_pyramid")
           .option("path", str(out)).load().toPandas())
    assert len(got) == len(arrays)
    for _, r in got.iterrows():
        key = (int(r["zoom"]), int(r["tile_x"]), int(r["tile_y"]))
        arr = decode_tile(r["data"], r["dtype"], int(r["tile_size"]))
        assert _psnr(arr, arrays[key]) >= 40.0, key


def test_jpeg_sink_rejects_rgba(spark, tmp_path):
    from gdal_spark.operators.tiling import encode_tile, write_tiles

    rows = []
    for band in (1, 2, 3, 4):
        payload, dts = encode_tile(
            np.zeros((8, 8), dtype=np.uint8), None)
        rows.append({"zoom": 1, "tile_x": 0, "tile_y": 0,
                     "band": band, "data": payload, "dtype": dts,
                     "tile_size": 8})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    with pytest.raises(Exception, match="bands"):
        write_tiles(tiles, str(tmp_path / "bad"), format="jpeg")
