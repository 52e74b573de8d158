"""GCP polynomial + TPS transformers and their warp integration."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.functions.gcp import (
    fit_gcp_poly, fit_tps, gcp_inverse_transformer,
)


def test_poly_order1_recovers_affine():
    rng = np.random.default_rng(5)
    src = rng.uniform(-100, 100, (20, 2))
    A = np.array([[1.5, -0.25], [0.4, 2.0]])
    b = np.array([10.0, -7.0])
    dst = src @ A.T + b
    f = fit_gcp_poly(src, dst, order=1)
    probe = rng.uniform(-200, 200, (50, 2))
    X, Y = f(probe[:, 0], probe[:, 1])
    want = probe @ A.T + b
    assert np.allclose(X, want[:, 0], atol=1e-9)
    assert np.allclose(Y, want[:, 1], atol=1e-9)


def test_poly_order2_recovers_quadratic():
    rng = np.random.default_rng(6)
    src = rng.uniform(-10, 10, (30, 2))
    x, y = src[:, 0], src[:, 1]
    dst = np.stack([1 + 2*x - y + 0.1*x*y + 0.05*x*x,
                    -3 + x + 0.5*y - 0.02*y*y], axis=1)
    f = fit_gcp_poly(src, dst, order=2)
    X, Y = f(x, y)
    assert np.allclose(X, dst[:, 0], atol=1e-9)
    assert np.allclose(Y, dst[:, 1], atol=1e-9)
    with pytest.raises(ValueError, match=">= 6"):
        fit_gcp_poly(src[:4], dst[:4], order=2)


def test_tps_interpolates_gcps_exactly():
    rng = np.random.default_rng(7)
    src = rng.uniform(0, 100, (15, 2))
    dst = src + rng.normal(0, 3, (15, 2))    # irregular warp
    f = fit_tps(src, dst)
    X, Y = f(src[:, 0], src[:, 1])
    assert np.allclose(X, dst[:, 0], atol=1e-8)
    assert np.allclose(Y, dst[:, 1], atol=1e-8)
    # affine data -> TPS reduces to the affine (zero bending)
    A = np.array([[2.0, 0.0], [0.0, 3.0]])
    g = fit_tps(src, src @ A.T)
    p = rng.uniform(10, 90, (20, 2))
    X2, Y2 = g(p[:, 0], p[:, 1])
    assert np.allclose(X2, 2 * p[:, 0], atol=1e-6)
    assert np.allclose(Y2, 3 * p[:, 1], atol=1e-6)


def test_gcp_warp_matches_shift(spark):
    """A pure-shift GCP set warped through warp_tiles(inv_fn=...)
    must equal the direct shifted render (the reference's
    -gcp ... -tps gdalwarp path)."""
    from gdal_spark.operators.rasterize import GridSpec
    from gdal_spark.operators.tiling import (
        TILE_SCHEMA, decode_tile,
    )
    from gdal_spark.operators.warp import warp_tiles

    ts = 32
    yy, xx = np.mgrid[0:ts, 0:ts]
    v = ((xx * 13 + yy * 29) % 97).astype(np.float64)
    tiles = spark.createDataFrame(pd.DataFrame([{
        "zoom": 0, "tile_x": 0, "tile_y": 0, "band": 1,
        "data": np.ascontiguousarray(v).tobytes(),
        "dtype": "float64", "tile_size": ts}]), TILE_SCHEMA)
    # world == pixel coords; dst shifted by (+8, -4) world units
    sg = GridSpec(0.0, float(ts), 1.0, 1.0, ts, ts)
    dg = GridSpec(8.0, float(ts) - 4.0, 1.0, 1.0, ts, ts)
    # GCPs describe the identity world mapping (dst world == src
    # world), as 4 corners + center — TPS and poly must both resolve
    # to the identity and the warp reduces to the grid shift
    gcps = [(x, y, x, y) for x, y in
            [(0, 0), (ts, 0), (0, ts), (ts, ts), (ts/2, ts/3)]]
    for method, kw in (("tps", {}), ("poly", {"order": 1})):
        inv = gcp_inverse_transformer(gcps, method=method, **kw)
        out = warp_tiles(tiles, sg, dg, "EPSG:3857", "EPSG:3857",
                         resample="near", tile_size=ts,
                         inv_fn=inv).toPandas()
        assert len(out) == 1
        got = decode_tile(bytes(out.iloc[0]["data"]),
                          out.iloc[0]["dtype"], ts)
        # dst pixel (i,j) samples src at (i+8, j+4)
        want = np.zeros((ts, ts))
        want[:ts - 4, :ts - 8] = v[4:, 8:]
        assert np.array_equal(got[:ts - 4, :ts - 8],
                              want[:ts - 4, :ts - 8]), method
