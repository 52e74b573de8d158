"""Proximity / fillnodata / sieve vs single-array oracles."""

import numpy as np

from gdal_spark.operators.proximity import (
    edt_squared, fillnodata_tiles, proximity_tiles, sieve_tiles,
)
from gdal_spark.operators.rasterize import GridSpec, assemble_raster
from gdal_spark.operators.warp import tiles_from_array

RNG = np.random.RandomState(31)


def test_proximity_matches_global_edt(spark):
    arr = np.zeros((64, 64), dtype=np.float64)
    targets = RNG.rand(64, 64) < 0.01
    arr[targets] = 7.0
    tiles, w, h = tiles_from_array(spark, arr, tile_size=32)
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    out = proximity_tiles(tiles, [7.0], max_dist=12.0, nodata=-1.0)
    got = assemble_raster(out.toPandas(), grid)
    d2, _, _ = edt_squared(arr == 7.0)
    dist = np.sqrt(d2)
    want = np.where(dist <= 12.0, dist, -1.0)
    np.testing.assert_allclose(got, want)


def test_fillnodata_edt_nearest(spark):
    arr = RNG.uniform(1, 9, (64, 64))
    holes = RNG.rand(64, 64) < 0.3
    arr[holes] = -999.0
    tiles, w, h = tiles_from_array(spark, arr, tile_size=32)
    grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
    out = fillnodata_tiles(tiles, nodata=-999.0, max_dist=16.0,
                           method="edt_nearest")
    got = assemble_raster(out.toPandas(), grid)
    d2, sy, sx = edt_squared(arr != -999.0)
    want = arr.copy()
    take = holes & (np.sqrt(d2) <= 16.0)
    want[take] = arr[sy[take], sx[take]]
    np.testing.assert_allclose(got, want)
    assert (got != -999.0).sum() > (arr != -999.0).sum()


def _quad_fill_oracle(arr, nodata, max_dist, nearest=False):
    """Per-pixel brute-force rasterfill.cpp oracle: per column within
    +-maxdist, nearest ORIGINAL valid above (incl.) / below (excl.),
    reduced to 4 quadrant minima, 1/dist IDW or nearest."""
    h, w = arr.shape
    k = int(np.ceil(max_dist))
    out = arr.copy()
    for y in range(h):
        for x in range(w):
            if arr[y, x] != nodata:
                continue
            qd = [max_dist + 1.0] * 4
            qv = [0.0] * 4
            for dx in range(0, k + 1):
                for side, qt, qb in ((-1, 0, 1), (1, 2, 3)):
                    if side > 0 and dx == 0:
                        continue
                    cx = x + side * dx
                    if cx < 0 or cx >= w:
                        continue
                    col = arr[:, cx] != nodata
                    above = np.flatnonzero(col[:y + 1])
                    if len(above) and y - above[-1] <= max_dist:
                        d = np.hypot(dx, y - above[-1])
                        if d < qd[qt]:
                            qd[qt] = d
                            qv[qt] = arr[above[-1], cx]
                    below = np.flatnonzero(col[y + 1:])
                    if len(below) and below[0] + 1 <= max_dist:
                        d = np.hypot(dx, below[0] + 1)
                        if d < qd[qb]:
                            qd[qb] = d
                            qv[qb] = arr[y + 1 + below[0], cx]
            if nearest:
                i = int(np.argmin(qd))
                if qd[i] <= max_dist:
                    out[y, x] = qv[i]
            else:
                ws = sum(1.0 / d for d in qd if d <= max_dist)
                vs = sum(v / d for d, v in zip(qd, qv) if d <= max_dist)
                if ws > 0:
                    out[y, x] = vs / ws
    return out


def test_fillnodata_inv_dist_matches_rasterfill_oracle(spark):
    arr = RNG.uniform(1, 9, (48, 48))
    holes = RNG.rand(48, 48) < 0.35
    arr[holes] = -999.0
    tiles, w, h = tiles_from_array(spark, arr, tile_size=16)
    grid = GridSpec(0.0, 48.0, 1.0, 1.0, 48, 48)
    for method, nearest in (("inv_dist", False), ("nearest", True)):
        out = fillnodata_tiles(tiles, nodata=-999.0, max_dist=6.0,
                               method=method)
        got = assemble_raster(out.toPandas(), grid)
        want = _quad_fill_oracle(arr, -999.0, 6.0, nearest=nearest)
        np.testing.assert_allclose(got, want, rtol=1e-12)


def test_sieve_removes_small_polygons(spark):
    arr = np.zeros((32, 32), dtype=np.float64)
    arr[4:20, 4:20] = 5.0        # big polygon (256 px)
    arr[25:27, 25:27] = 9.0      # small polygon (4 px) inside zeros
    arr[0, 31] = 3.0             # single pixel, corner
    tiles, w, h = tiles_from_array(spark, arr, tile_size=16)
    grid = GridSpec(0.0, 32.0, 1.0, 1.0, 32, 32)
    out = sieve_tiles(tiles, threshold=10, gt=grid.gt)
    got = assemble_raster(out.toPandas(), grid)
    # small polygons absorbed into the background (their largest
    # neighbor, value 0)
    assert (got[25:27, 25:27] == 0.0).all()
    assert got[0, 31] == 0.0
    # big one survives
    assert (got[4:20, 4:20] == 5.0).all()
    # background unchanged
    assert got[0, 0] == 0.0


def test_sieve_spanning_component_not_removed(spark):
    """A polygon split across 4 tiles whose TOTAL size exceeds the
    threshold must survive (global labeling, not per-tile)."""
    arr = np.zeros((32, 32), dtype=np.float64)
    arr[14:18, 14:18] = 5.0      # 16 px crossing all 4 tile corners
    tiles, w, h = tiles_from_array(spark, arr, tile_size=16)
    grid = GridSpec(0.0, 32.0, 1.0, 1.0, 32, 32)
    out = sieve_tiles(tiles, threshold=10, gt=grid.gt)
    got = assemble_raster(out.toPandas(), grid)
    assert (got[14:18, 14:18] == 5.0).all()
    out2 = sieve_tiles(tiles, threshold=20, gt=grid.gt)
    got2 = assemble_raster(out2.toPandas(), grid)
    assert (got2[14:18, 14:18] == 0.0).all()


def test_fillnodata_smoothing_iterations(spark):
    """GDALFillNodata's smoothing post-pass (nSmoothingIterations):
    distributed (halo widened by one pixel per iteration) == the
    single-array fill + smooth kernels; original pixels untouched."""
    from gdal_spark.operators.proximity import (
        fill_quad_idw, smooth_filled,
    )

    arr = RNG.uniform(1, 9, (96, 96))
    holes = RNG.rand(96, 96) < 0.35
    arr[holes] = -999.0
    tiles, w, h = tiles_from_array(spark, arr, tile_size=32)
    grid = GridSpec(0.0, 96.0, 1.0, 1.0, 96, 96)

    for iters in (1, 3):
        out = fillnodata_tiles(tiles, nodata=-999.0, max_dist=6.0,
                               method="inv_dist",
                               smoothing_iterations=iters)
        got = assemble_raster(out.toPandas(), grid)
        valid = arr != -999.0
        filled = fill_quad_idw(arr, valid, 6.0)
        want = smooth_filled(filled, valid, -999.0, iters)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)
        # original data never modified
        np.testing.assert_array_equal(got[valid], arr[valid])
        # smoothing actually changed some filled pixels
        unsmoothed = fill_quad_idw(arr, valid, 6.0)
        changed = (got != assemble_raster(
            fillnodata_tiles(tiles, nodata=-999.0, max_dist=6.0,
                             method="inv_dist").toPandas(), grid))
        assert changed.sum() > 50


def test_sieve_driver_gate_matches_distributed(spark):
    """The bounded-collect driver replica of the pointer-merge must
    be byte-identical to the distributed join loop (collect_cap=0
    forces the loop) — random rasters with many small components,
    cascades and mutual-small pairs."""
    for seed in range(6):
        rng = np.random.RandomState(100 + seed)
        # coarse blobs so components span tiles; quantized values so
        # distinct components share values too
        arr = np.floor(rng.rand(8, 8) * 4).astype(np.float64)
        arr = np.kron(arr, np.ones((8, 8)))          # 64x64 blocks
        speck = rng.rand(64, 64) < 0.08              # speckle islands
        arr[speck] = np.floor(rng.rand(speck.sum()) * 4) + 10
        tiles, w, h = tiles_from_array(spark, arr, tile_size=32)
        grid = GridSpec(0.0, 64.0, 1.0, 1.0, 64, 64)
        a = assemble_raster(
            sieve_tiles(tiles, threshold=30, gt=grid.gt).toPandas(),
            grid)
        b = assemble_raster(
            sieve_tiles(tiles, threshold=30, gt=grid.gt,
                        collect_cap=0).toPandas(), grid)
        np.testing.assert_array_equal(a, b)


def test_sieve_driver_gate_mutual_small_pair(spark):
    """Two adjacent undersized components that point at each other:
    the tie rule (larger size, then smaller id) must break the cycle
    identically in both paths."""
    arr = np.zeros((32, 32), dtype=np.float64)
    arr[4:6, 4:8] = 5.0         # 8 px
    arr[6:8, 4:8] = 7.0         # 8 px, adjacent below
    tiles, w, h = tiles_from_array(spark, arr, tile_size=16)
    grid = GridSpec(0.0, 32.0, 1.0, 1.0, 32, 32)
    a = assemble_raster(
        sieve_tiles(tiles, threshold=20, gt=grid.gt).toPandas(), grid)
    b = assemble_raster(
        sieve_tiles(tiles, threshold=20, gt=grid.gt,
                    collect_cap=0).toPandas(), grid)
    np.testing.assert_array_equal(a, b)
