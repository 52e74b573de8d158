"""gdal raster pipeline surface: chains == direct operator calls."""

import numpy as np
import pytest

from gdal_spark.operators.rasterize import GridSpec, assemble_raster
from gdal_spark.operators.warp import tiles_from_array
from gdal_spark.plans.raster_pipeline import run_raster_pipeline

RNG = np.random.RandomState(9)


def _tiles(spark, arr, ts=32):
    t, _, _ = tiles_from_array(spark, arr, tile_size=ts)
    return t


def test_calc_scale_chain(spark):
    arr = RNG.uniform(1, 9, (64, 64))
    tiles = _tiles(spark, arr)
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    out = run_raster_pipeline(
        spark, 'read t ! calc "np.sqrt(A) + 1" ! scale 2 1',
        layers={"t": tiles})
    got = assemble_raster(out.toPandas(), grid)
    np.testing.assert_allclose(got, (np.sqrt(arr) + 1) * 2 + 1,
                               rtol=1e-12)


def test_focal_and_overview(spark):
    arr = RNG.uniform(0, 100, (64, 64))
    tiles = _tiles(spark, arr)
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    from gdal_spark.operators.dem import focal_tiles

    direct = assemble_raster(
        focal_tiles(tiles, "hillshade").toPandas(), grid)
    piped = assemble_raster(
        run_raster_pipeline(spark, "read t ! hillshade",
                            layers={"t": tiles}).toPandas(), grid)
    np.testing.assert_allclose(piped, direct)

    # one 2x overview level conserves summed mass
    ov = run_raster_pipeline(spark, "read t ! overview sum",
                             layers={"t": tiles})
    pdf = ov.toPandas()
    tot = sum(np.frombuffer(r["data"], np.dtype(r["dtype"])).sum()
              for _, r in pdf.iterrows())
    assert tot == pytest.approx(arr.sum(), rel=1e-12)


def test_reclassify_polygonize_chain(spark):
    arr = np.zeros((64, 64))
    arr[8:24, 8:24] = 7.0
    arr[40:56, 40:48] = 42.0
    tiles = _tiles(spark, arr)
    gt = [0.0, 1.0, 0.0, 64.0, 0.0, -1.0]
    polys = run_raster_pipeline(
        spark, "read t ! reclassify 1:10:1,10:100:2 0 ! polygonize 0",
        layers={"t": tiles}, gt=gt)
    pdf = polys.toPandas()
    got = pdf.groupby("value")["n_pixels"].sum().to_dict()
    assert got == {1.0: 16 * 16, 2.0: 16 * 8}


def test_fill_nodata_step(spark):
    arr = RNG.uniform(1, 9, (64, 64))
    holes = RNG.rand(64, 64) < 0.2
    arr[holes] = -5.0
    tiles = _tiles(spark, arr)
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    out = run_raster_pipeline(
        spark, "read t ! fill-nodata -5 8 1", layers={"t": tiles})
    got = assemble_raster(out.toPandas(), grid)
    assert (got == -5.0).sum() < holes.sum() * 0.1
    np.testing.assert_array_equal(got[~holes], arr[~holes])


def test_pipeline_validation(spark):
    tiles = _tiles(spark, np.ones((32, 32)))
    with pytest.raises(ValueError):
        run_raster_pipeline(spark, "hillshade ! write /tmp/x",
                            layers={"t": tiles})
    with pytest.raises(ValueError):
        run_raster_pipeline(spark, "read t ! bogus",
                            layers={"t": tiles})
    with pytest.raises(ValueError):
        run_raster_pipeline(spark, "read t ! polygonize",
                            layers={"t": tiles})


def test_tile_sink_verb(spark, tmp_path):
    """`... ! tile <path> png xyz` writes a decodable z/x/y PNG
    pyramid through the pipeline surface."""
    from gdal_spark.operators.png import decode_png

    arr = RNG.randint(0, 255, (64, 64)).astype(np.float64)
    tiles = _tiles(spark, arr)
    out = tmp_path / "pyr"
    got = run_raster_pipeline(
        spark, f'read t ! scale 1 0 ! tile {out} png xyz',
        layers={"t": tiles})
    assert got is None  # terminal step
    # 2x2 tiles at the source zoom
    pngs = sorted(out.rglob("*.png"))
    assert len(pngs) == 4
    ts = 32
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    for p in pngs:
        tx, fy = int(p.parent.name), int(p.stem)
        img = decode_png(p.read_bytes())
        want = arr[fy * ts:(fy + 1) * ts, tx * ts:(tx + 1) * ts]
        np.testing.assert_array_equal(
            img, np.clip(np.round(want), 0, 255).astype(np.uint8))


def test_read_pyramid_roundtrip_verb(spark, tmp_path):
    """`read <path> tile_pyramid` round-trips what `tile <path> png`
    wrote — the pipeline surface covers both directions."""
    arr = RNG.randint(0, 255, (64, 64)).astype(np.float64)
    tiles = _tiles(spark, arr)
    out = tmp_path / "pyr"
    run_raster_pipeline(spark, f"read t ! tile {out} png",
                        layers={"t": tiles})
    back = run_raster_pipeline(
        spark, f"read {out} tile_pyramid ! scale 1 0")
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    got = assemble_raster(back.toPandas(), grid)
    np.testing.assert_array_equal(got, np.round(arr))


def test_tile_verb_jpeg_roundtrip(spark, tmp_path):
    """`tile <path> jpeg` writes z/x/y.jpg via the in-repo baseline
    codec; `read <path> tile_pyramid` decodes them back within the
    default-quality error bound."""
    # smooth content so the lossy bound stays tight
    arr = (np.add.outer(np.arange(64), np.arange(64)) * 2
           % 256).astype(np.float64)
    tiles = _tiles(spark, arr)
    out = tmp_path / "jpyr"
    run_raster_pipeline(spark, f"read t ! tile {out} jpeg",
                        layers={"t": tiles})
    assert list(out.rglob("*.jpg"))
    back = run_raster_pipeline(spark, f"read {out} tile_pyramid")
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    got = assemble_raster(back.toPandas(), grid)
    mse = float(np.mean((got - arr) ** 2))
    assert 10 * np.log10(255.0 ** 2 / max(mse, 1e-12)) >= 35.0
