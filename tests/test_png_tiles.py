"""PNG codec + PNG tile sink.

Golden strategy: encode -> decode round-trip must be the identity on
the raw arrays (the decoder implements the full five-filter spec, so
a filter bug on either side breaks the identity), chunk CRCs must
verify, and the z/x/y file layout must match the XYZ/TMS conventions
(gdalalg_raster_tile.cpp:509-514 GetFileY).  If Pillow happens to be
installed the decode is cross-checked against it (import-gated).
"""

import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.png import decode_png, encode_png


def _check_chunks(data: bytes):
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    off = 8
    tags = []
    while off < len(data):
        (ln,) = struct.unpack_from(">I", data, off)
        tag = data[off + 4:off + 8]
        payload = data[off + 8:off + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, off + 8 + ln)
        assert crc == (zlib.crc32(tag + payload) & 0xFFFFFFFF), tag
        tags.append(tag)
        off += 12 + ln
    assert tags[0] == b"IHDR" and tags[-1] == b"IEND"


def test_png_roundtrip_and_chunks():
    rng = np.random.RandomState(3)
    cases = [
        rng.randint(0, 256, (64, 64)).astype(np.uint8),       # noise
        np.add.outer(np.arange(64), np.arange(64)).astype(np.uint8),
        rng.randint(0, 256, (33, 17, 3)).astype(np.uint8),    # rgb
        rng.randint(0, 256, (16, 16, 4)).astype(np.uint8),    # rgba
        np.zeros((8, 8), dtype=np.uint8),
    ]
    for a in cases:
        data = encode_png(a)
        _check_chunks(data)
        got = decode_png(data)
        np.testing.assert_array_equal(got, a)
        try:  # cross-decoder check when an image lib exists
            import io

            from PIL import Image
            ext = np.asarray(Image.open(io.BytesIO(data)))
            np.testing.assert_array_equal(ext, a)
        except ImportError:
            pass

    # smooth data must actually engage the predictive filters
    grad = np.add.outer(np.arange(256), np.arange(256)).astype(np.uint8)
    assert len(encode_png(grad)) < 2000  # vs 64 KiB raw

    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4), dtype=np.float64))


def test_write_tiles_png_files(spark, tmp_path):
    """write_tiles(format='png') emits decodable z/x/y.png files
    whose pixels equal the tile arrays, under both conventions."""
    from gdal_spark.operators.tiling import encode_tile, write_tiles

    rng = np.random.RandomState(9)
    rows = []
    arrays = {}
    for tx, ty in [(0, 0), (1, 0), (3, 2)]:
        arr = rng.randint(0, 256, (16, 16)).astype(np.uint8)
        payload, dts = encode_tile(arr, None)
        arrays[(tx, ty)] = arr
        rows.append({"zoom": 2, "tile_x": tx, "tile_y": ty, "band": 1,
                     "data": payload, "dtype": dts, "tile_size": 16})
    tiles = spark.createDataFrame(pd.DataFrame(rows))

    out = tmp_path / "xyz"
    write_tiles(tiles, str(out), convention="xyz", format="png")
    for (tx, ty), arr in arrays.items():
        p = out / "2" / str(tx) / f"{ty}.png"
        assert p.exists(), p
        np.testing.assert_array_equal(decode_png(p.read_bytes()), arr)

    # TMS flips y: file_y = 2^z - 1 - tile_y
    out2 = tmp_path / "tms"
    write_tiles(tiles, str(out2), convention="tms", format="png")
    for (tx, ty), arr in arrays.items():
        p = out2 / "2" / str(tx) / f"{(1 << 2) - 1 - ty}.png"
        assert p.exists(), p
        np.testing.assert_array_equal(decode_png(p.read_bytes()), arr)


def test_write_tiles_png_multiband_and_float(spark, tmp_path):
    """Bands stack into RGB channels; float tiles clip+cast to Byte
    (the translate -ot Byte convention)."""
    from gdal_spark.operators.tiling import encode_tile, write_tiles

    rng = np.random.RandomState(4)
    chans = [rng.randint(0, 256, (8, 8)).astype(np.uint8)
             for _ in range(3)]
    rows = []
    for b, arr in enumerate(chans, start=1):
        payload, dts = encode_tile(arr, None)
        rows.append({"zoom": 1, "tile_x": 0, "tile_y": 1, "band": b,
                     "data": payload, "dtype": dts, "tile_size": 8})
    # float tile: values beyond [0,255] clip
    farr = np.linspace(-50.0, 300.0, 64).reshape(8, 8)
    payload, dts = encode_tile(farr, None)
    rows.append({"zoom": 1, "tile_x": 1, "tile_y": 0, "band": 1,
                 "data": payload, "dtype": dts, "tile_size": 8})
    tiles = spark.createDataFrame(pd.DataFrame(rows))

    out = tmp_path / "t"
    write_tiles(tiles, str(out), convention="xyz", format="png")
    rgb = decode_png((out / "1" / "0" / "1.png").read_bytes())
    assert rgb.shape == (8, 8, 3)
    for c in range(3):
        np.testing.assert_array_equal(rgb[:, :, c], chans[c])
    grey = decode_png((out / "1" / "1" / "0.png").read_bytes())
    np.testing.assert_array_equal(
        grey, np.clip(np.round(farr), 0, 255).astype(np.uint8))


def test_write_tiles_png_overwrite_mode(spark, tmp_path):
    """mode='overwrite' (default) clean-replaces the pyramid — stale
    z/x/y.png files from a previous larger write must not survive;
    mode='append' keeps them."""
    from gdal_spark.operators.tiling import encode_tile, write_tiles

    def tile_df(coords, val):
        rows = []
        for tx, ty in coords:
            arr = np.full((8, 8), val, dtype=np.uint8)
            payload, dts = encode_tile(arr, None)
            rows.append({"zoom": 1, "tile_x": tx, "tile_y": ty,
                         "band": 1, "data": payload, "dtype": dts,
                         "tile_size": 8})
        return spark.createDataFrame(pd.DataFrame(rows))

    out = tmp_path / "pyr"
    write_tiles(tile_df([(0, 0), (1, 0), (1, 1)], 5), str(out),
                format="png")
    assert len(list(out.rglob("*.png"))) == 3
    # smaller overwrite: the two stale tiles disappear
    write_tiles(tile_df([(0, 0)], 9), str(out), format="png")
    pngs = list(out.rglob("*.png"))
    assert len(pngs) == 1 and pngs[0].parts[-3:] == ("1", "0", "0.png")
    np.testing.assert_array_equal(
        decode_png(pngs[0].read_bytes()),
        np.full((8, 8), 9, dtype=np.uint8))
    # append keeps existing files
    write_tiles(tile_df([(1, 1)], 3), str(out), format="png",
                mode="append")
    assert len(list(out.rglob("*.png"))) == 2
    import pytest
    with pytest.raises(ValueError, match="mode"):
        write_tiles(tile_df([(0, 0)], 1), str(out), format="png",
                    mode="bogus")
