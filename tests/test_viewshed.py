"""Viewshed: exact-LOS properties + distributed == single-array."""

import numpy as np

from gdal_spark.operators.rasterize import GridSpec, assemble_raster
from gdal_spark.operators.viewshed import viewshed_array, viewshed_tiles
from gdal_spark.operators.warp import tiles_from_array


def test_flat_terrain_all_visible():
    dem = np.zeros((32, 32))
    vs = viewshed_array(dem, 16.5, 16.5, observer_height=2.0)
    assert (vs == 255.0).all()


def test_wall_casts_shadow():
    dem = np.zeros((33, 33))
    dem[:, 20] = 50.0  # north-south wall east of the observer
    vs = viewshed_array(dem, 16.5, 16.5, observer_height=2.0)
    # pixels behind the wall along the +x axis are hidden
    assert vs[16, 25] == 0.0
    assert vs[16, 30] == 0.0
    # wall itself visible; pixels before the wall visible
    assert vs[16, 20] == 255.0
    assert vs[16, 18] == 255.0
    # other directions unaffected
    assert vs[16, 5] == 255.0 and vs[5, 16] == 255.0


def test_observer_height_reveals():
    dem = np.zeros((33, 33))
    dem[:, 20] = 10.0
    low = viewshed_array(dem, 16.5, 16.5, observer_height=1.0)
    high = viewshed_array(dem, 16.5, 16.5, observer_height=100.0)
    assert low[16, 30] == 0.0
    assert high[16, 30] == 255.0  # tall observer sees over the wall
    assert (high >= low).all()


def test_radius_masks():
    dem = np.zeros((33, 33))
    vs = viewshed_array(dem, 16.5, 16.5, radius=5.0,
                        out_of_range_val=7.0)
    assert vs[16, 16] == 255.0
    assert vs[16, 30] == 7.0
    assert vs[0, 0] == 7.0


def test_downhill_all_visible():
    # monotone downhill from the observer: nothing can occlude
    jj, ii = np.mgrid[0:33, 0:33]
    dem = -np.hypot(ii - 16, jj - 16)
    vs = viewshed_array(dem, 16.5, 16.5, observer_height=2.0)
    assert (vs == 255.0).all()


def test_distributed_matches_single(spark):
    rng = np.random.RandomState(12)
    dem = rng.uniform(0, 5, (64, 64))
    dem[30:34, 40:44] = 60.0
    tiles, w, h = tiles_from_array(spark, dem, tile_size=32)
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    # observer at world (20, 40) -> pixel (20, 24)
    out = viewshed_tiles(tiles, grid, 20.0, 40.0, observer_height=2.0,
                         radius=30.0, tile_size=32)
    got = assemble_raster(out.toPandas(), grid)
    want = viewshed_array(dem, 20.0, 24.0, observer_height=2.0,
                          radius=30.0)
    np.testing.assert_array_equal(got, want)
    assert (got == 255.0).sum() > 100
    assert (got == 0.0).sum() > 10
