"""tile_pyramid Python data source: round-trip with the PNG sink,
zoom/x directory pruning via pushed filters, multi-band explode."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql.datasource import (
    EqualTo, GreaterThanOrEqual, LessThan,
)

from gdal_spark.sources.tile_datasource import (
    TilePyramidReader, register_tile_source,
)


def _pyramid(spark, tmp_path):
    from gdal_spark.operators.tiling import encode_tile, write_tiles

    rng = np.random.RandomState(21)
    rows = []
    arrays = {}
    for zoom, tx, ty in [(1, 0, 0), (1, 1, 1), (2, 0, 0), (2, 3, 2),
                         (3, 5, 1)]:
        arr = rng.randint(0, 256, (8, 8)).astype(np.uint8)
        payload, dts = encode_tile(arr, None)
        arrays[(zoom, tx, ty)] = arr
        rows.append({"zoom": zoom, "tile_x": tx, "tile_y": ty,
                     "band": 1, "data": payload, "dtype": dts,
                     "tile_size": 8})
    tiles = spark.createDataFrame(pd.DataFrame(rows))
    out = tmp_path / "pyr"
    write_tiles(tiles, str(out), convention="xyz", format="png")
    return out, arrays


def test_roundtrip_and_filter(spark, tmp_path):
    from gdal_spark.operators.tiling import decode_tile

    out, arrays = _pyramid(spark, tmp_path)
    register_tile_source(spark)
    df = (spark.read.format("tile_pyramid")
          .option("path", str(out)).load())
    got = df.toPandas()
    assert len(got) == len(arrays)
    for _, r in got.iterrows():
        key = (int(r["zoom"]), int(r["tile_x"]), int(r["tile_y"]))
        arr = decode_tile(r["data"], r["dtype"], int(r["tile_size"]))
        np.testing.assert_array_equal(arr, arrays[key])

    # filtered read returns exactly the matching tiles
    sub = df.filter("zoom = 2 AND tile_x >= 1").toPandas()
    assert sorted((int(r["zoom"]), int(r["tile_x"]))
                  for _, r in sub.iterrows()) == [(2, 3)]
    # empty result after pruning still works
    assert df.filter("zoom = 9").count() == 0


def test_pushdown_prunes_directories(tmp_path):
    """pushFilters consumes zoom/tile_x/tile_y bounds (partitions()
    lists only matching dirs) and returns unsupported filters."""
    import os

    base = tmp_path / "p"
    for z in (1, 2, 3):
        for x in range(4):
            d = base / str(z) / str(x)
            d.mkdir(parents=True)
            (d / "0.png").write_bytes(b"")

    r = TilePyramidReader({"path": str(base)})
    left = list(r.pushFilters([
        EqualTo(("zoom",), 2),
        GreaterThanOrEqual(("tile_x",), 1),
        LessThan(("tile_x",), 3),
        EqualTo(("band",), 1),          # not prunable -> comes back
    ]))
    assert len(left) == 1 and isinstance(left[0], EqualTo)
    parts = r.partitions()
    assert sorted((p.zoom, p.tile_x) for p in parts) \
        == [(2, 1), (2, 2)]
    # nothing matches -> single no-op partition, read yields nothing
    r2 = TilePyramidReader({"path": str(base)})
    list(r2.pushFilters([EqualTo(("zoom",), 7)]))
    parts2 = r2.partitions()
    assert len(parts2) == 1 and parts2[0].zoom == -1
    assert list(r2.read(parts2[0])) == []


def test_missing_root_raises(spark, tmp_path):
    register_tile_source(spark)
    df = (spark.read.format("tile_pyramid")
          .option("path", str(tmp_path / "nope")).load())
    with pytest.raises(Exception, match="nope"):
        df.count()


def test_multiband_explode(spark, tmp_path):
    from gdal_spark.operators.png import encode_png
    from gdal_spark.operators.tiling import decode_tile

    rng = np.random.RandomState(5)
    rgb = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    d = tmp_path / "p" / "2" / "1"
    d.mkdir(parents=True)
    (d / "3.png").write_bytes(encode_png(rgb))

    register_tile_source(spark)
    got = (spark.read.format("tile_pyramid")
           .option("path", str(tmp_path / "p")).load()
           .toPandas().sort_values("band").reset_index(drop=True))
    assert got["band"].tolist() == [1, 2, 3]
    assert got["zoom"].tolist() == [2, 2, 2]
    assert got["tile_x"].tolist() == [1, 1, 1]
    assert got["tile_y"].tolist() == [3, 3, 3]
    for c in range(3):
        arr = decode_tile(got["data"][c], got["dtype"][c], 8)
        np.testing.assert_array_equal(arr, rgb[:, :, c])


def test_tms_convention_read(spark, tmp_path):
    """TMS file names flip y: reading with convention=tms recovers
    the original tile_y."""
    from gdal_spark.operators.png import encode_png

    arr = np.full((8, 8), 4, dtype=np.uint8)
    # tile (zoom=2, tile_y=1) lives in file 2^2-1-1 = 2.png
    d = tmp_path / "p" / "2" / "0"
    d.mkdir(parents=True)
    (d / "2.png").write_bytes(encode_png(arr))
    register_tile_source(spark)
    got = (spark.read.format("tile_pyramid")
           .option("path", str(tmp_path / "p"))
           .option("convention", "tms").load().toPandas())
    assert got["tile_y"].tolist() == [1]


def test_tms_y_pruning_skips_file_opens(tmp_path, monkeypatch):
    """TMS prunes tile_y by filename exactly like xyz: the per-zoom
    flip is monotonic, so pushed bounds test the flipped value before
    any file opens.  Counted via a decode_png hook."""
    from gdal_spark.operators import png as pngmod
    from gdal_spark.operators.png import encode_png

    arr = np.full((8, 8), 9, dtype=np.uint8)
    d = tmp_path / "p" / "2" / "0"
    d.mkdir(parents=True)
    # zoom 2: file_y f holds tile_y 3-f
    for f in range(4):
        (d / f"{f}.png").write_bytes(encode_png(arr))

    opened = []
    real = pngmod.decode_png

    def counting(buf):
        opened.append(1)
        return real(buf)

    monkeypatch.setattr(pngmod, "decode_png", counting)

    r = TilePyramidReader({"path": str(tmp_path / "p"),
                           "convention": "tms"})
    # tile_y == 1 -> file_y 2 only
    leftover = list(r.pushFilters([EqualTo(("tile_y",), 1)]))
    assert leftover == []          # consumed: the reader prunes it
    parts = r.partitions()
    rows = [row for p in parts for row in r.read(p)]
    assert [row[2] for row in rows] == [1]   # tile_y recovered
    assert len(opened) == 1                  # 3 of 4 files never read


def test_mixed_format_tile_dir_raises(tmp_path):
    """A directory holding BOTH y.png and y.jpg for the same tile is
    a stale mixed pyramid: the reader refuses instead of emitting
    duplicate rows."""
    from gdal_spark.operators.jpeg import encode_jpeg
    from gdal_spark.operators.png import encode_png

    arr = np.full((8, 8), 3, dtype=np.uint8)
    d = tmp_path / "p" / "1" / "0"
    d.mkdir(parents=True)
    (d / "0.png").write_bytes(encode_png(arr))
    (d / "0.jpg").write_bytes(encode_jpeg(arr))
    r = TilePyramidReader({"path": str(tmp_path / "p")})
    parts = r.partitions()
    with pytest.raises(ValueError, match="mixed tile formats"):
        list(r.read(parts[0]))
