"""gdal raster neighbors (focal statistics / convolution).

Brute-force NumPy oracle re-implements the reference loop
(frmts/vrt/vrtfilters.cpp:480-700) directly: per-pixel window scan
with nodata skip, zero-coef skip, weighted values, edge replication.
Distributed tiles must match it bit-for-bit (modulo the declared
mode tie rule).
"""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.neighbors import (
    METHODS, neighbors_tiles, resolve_kernel,
)
from gdal_spark.operators.tiling import TILE_SCHEMA, decode_tile


def _brute(arr, coefs, method, nodata=None):
    """Reference loop, literal translation (edge replication)."""
    h, w = arr.shape
    k = coefs.shape[0]
    r = k // 2
    pad = np.pad(arr.astype(np.float64), r, mode="edge")
    out = np.empty((h, w))
    for y in range(h):
        for x in range(w):
            cv = arr[y, x]
            if nodata is not None and cv == nodata:
                out[y, x] = nodata
                continue
            vals = []
            ksum = 0.0
            for dy in range(k):
                for dx in range(k):
                    c = coefs[dy, dx]
                    if c == 0.0:
                        continue
                    v = pad[y + dy, x + dx]
                    if nodata is not None and v == nodata:
                        continue
                    if np.isnan(v):
                        continue
                    vals.append(v * c)
                    ksum += c
            fill = nodata if nodata is not None else 0.0
            if method == "sum":
                out[y, x] = sum(vals)
            elif not vals:
                out[y, x] = fill
            elif method == "mean":
                out[y, x] = sum(vals) / ksum if ksum else fill
            elif method == "min":
                out[y, x] = min(vals)
            elif method == "max":
                out[y, x] = max(vals)
            elif method == "stddev":
                a = np.array(vals)
                out[y, x] = float(np.sqrt(((a - a.mean()) ** 2).mean()))
            elif method == "median":
                out[y, x] = float(np.median(vals))
            elif method == "mode":
                a = np.sort(np.array(vals))
                best, bl = a[0], 0
                i = 0
                while i < len(a):
                    j = i
                    while j < len(a) and a[j] == a[i]:
                        j += 1
                    if j - i > bl:
                        bl, best = j - i, a[i]
                    i = j
                out[y, x] = best
            else:
                raise AssertionError(method)
    return out


def _tiles_df(spark, arr, ts, nodata_holes=()):
    n = arr.shape[0] // ts
    rows = []
    for ty in range(n):
        for tx in range(n):
            block = arr[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
            rows.append({
                "zoom": 3, "tile_x": tx, "tile_y": ty, "band": 1,
                "data": np.ascontiguousarray(block).tobytes(),
                "dtype": str(block.dtype), "tile_size": ts,
            })
    rows = [r for r in rows
            if (r["tile_x"], r["tile_y"]) not in nodata_holes]
    return spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)


def _assemble(pdf):
    ts = int(pdf["tile_size"].iloc[0])
    n = int(max(pdf["tile_x"].max(), pdf["tile_y"].max())) + 1
    out = np.full((n * ts, n * ts), np.nan)
    for _, r in pdf.iterrows():
        a = decode_tile(r["data"], r["dtype"], int(r["tile_size"]))
        out[int(r["tile_y"]) * ts:(int(r["tile_y"]) + 1) * ts,
            int(r["tile_x"]) * ts:(int(r["tile_x"]) + 1) * ts] = a
    return out


@pytest.fixture(scope="module")
def rng_arr():
    rng = np.random.default_rng(42)
    return np.round(rng.uniform(0, 50, (48, 48)), 1)


@pytest.mark.parametrize("method", METHODS)
def test_methods_match_reference_loop(spark, rng_arr, method):
    df = _tiles_df(spark, rng_arr, ts=16)
    out = neighbors_tiles(df, kernel="equal", method=method,
                          size=3).toPandas()
    got = _assemble(out)
    k, coefs, _ = resolve_kernel("equal", method, 3)
    want = _brute(rng_arr, coefs, method)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_size5_weighted_gaussian_mean(spark, rng_arr):
    df = _tiles_df(spark, rng_arr, ts=16)
    out = neighbors_tiles(df, kernel="gaussian", size=5).toPandas()
    got = _assemble(out)
    k, coefs, m = resolve_kernel("gaussian", None, 5)
    assert (k, m) == (5, "mean")
    want = _brute(rng_arr, coefs, "mean")
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_nodata_skip_and_center_passthrough(spark, rng_arr):
    arr = rng_arr.copy()
    arr[5:9, 5:9] = -1.0
    df = _tiles_df(spark, arr, ts=16)
    out = neighbors_tiles(df, kernel="equal", method="mean",
                          size=5, nodata=-1.0).toPandas()
    got = _assemble(out)
    k, coefs, _ = resolve_kernel("equal", "mean", 5)
    want = _brute(arr, coefs, "mean", nodata=-1.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert (got[5:9, 5:9] == -1.0).all()


def test_zero_sum_kernel_defaults_to_sum(spark, rng_arr):
    for name in ("u", "v", "edge1", "edge2"):
        k, coefs, m = resolve_kernel(name, None, 0)
        assert m == "sum"
        assert abs(coefs.sum()) < 1e-12
    k, coefs, m = resolve_kernel("sharpen", None, 0)
    assert m == "mean" and coefs.sum() == 1.0
    # u/v carry the reference's 0.5 gradient weight
    _, cu, _ = resolve_kernel("u", None, 0)
    assert cu[1, 2] == 0.5 and cu[1, 0] == -0.5
    df = _tiles_df(spark, rng_arr, ts=16)
    out = neighbors_tiles(df, kernel="edge1").toPandas()
    got = _assemble(out)
    _, ce, _ = resolve_kernel("edge1", None, 0)
    want = _brute(rng_arr, ce, "sum")
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_custom_matrix_string_and_missing_tile_hole(spark, rng_arr):
    # custom zero-coef ring: corners excluded from the window
    kern = "[0,1,0, 1,1,1, 0,1,0]"
    df = _tiles_df(spark, rng_arr, ts=16, nodata_holes={(1, 1)})
    out = neighbors_tiles(df, kernel=kern, method="mean").toPandas()
    assert len(out) == 8            # the hole stays a hole
    got = _assemble(out)
    _, coefs, _ = resolve_kernel(kern, "mean", 0)
    ref_in = rng_arr.copy()
    ref_in[16:32, 16:32] = np.nan   # hole pixels skip like nodata
    want = _brute(ref_in, coefs, "mean")
    hole = np.zeros_like(got, dtype=bool)
    hole[16:32, 16:32] = True
    np.testing.assert_allclose(got[~hole], want[~hole], rtol=1e-12)


def test_unsharp_masking_normalization():
    k, coefs, m = resolve_kernel("unsharp-masking", None, 0)
    assert k == 5 and m == "mean"
    # nSum = 256-36-476 = -256 -> coefs = val / -256
    assert coefs[0, 0] == pytest.approx(1.0 / -256.0)
    assert coefs[2, 2] == pytest.approx(-476.0 / -256.0)


def test_validation_errors(spark):
    with pytest.raises(ValueError, match="odd"):
        resolve_kernel("equal", None, 4)
    with pytest.raises(ValueError, match="zero-sum"):
        resolve_kernel("[1,-1,0, 0,0,0, 0,0,0]", "mean", 0)
    with pytest.raises(ValueError, match="unknown kernel"):
        resolve_kernel("nope", None, 0)
    with pytest.raises(ValueError, match="unknown method"):
        df = _tiles_df(spark, np.zeros((16, 16)), ts=16)
        neighbors_tiles(df, kernel="equal", method="nope")


# ----------------------------------------------- reference anchors

def _three_by_three(spark, vals, ts=None):
    arr = np.array(vals, dtype=np.float64).reshape(3, 3)
    rows = [{"zoom": 0, "tile_x": 0, "tile_y": 0, "band": 1,
             "data": arr.tobytes(), "dtype": "float64",
             "tile_size": 3}]
    return spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)


def _center(spark, df, **kw):
    out = neighbors_tiles(df, **kw).toPandas()
    a = decode_tile(out.iloc[0]["data"], out.iloc[0]["dtype"], 3)
    return a[1, 1]


def test_reference_autotest_center_expectations(spark):
    """The reference's own single-pixel expectations
    (autotest/utilities/test_gdalalg_raster_neighbors.py:88-258):
    every method on the canonical 1..9 grid."""
    base = _three_by_three(spark, [1, 2, 3, 4, 5, 6, 7, 8, 9])
    assert _center(spark, base, kernel="equal",
                   method="mean") == 5.0
    assert _center(spark, base, kernel="equal",
                   method="sum") == 45.0
    assert _center(spark, base, kernel="equal", method="min") == 1
    assert _center(spark, base, kernel="equal", method="max") == 9
    assert _center(spark, base, kernel="equal",
                   method="stddev") == pytest.approx(
        2.58198881149292)
    assert _center(spark, base, kernel="u") == 1.0
    assert _center(spark, base, kernel="v") == 3.0
    med = _three_by_three(spark, [1, 2, 3, 4, 5, 60, 70, 80, 90])
    assert _center(spark, med, kernel="equal", method="median") == 5
    # nodata=90 leaves 8 values -> (4+5)/2
    assert _center(spark, med, kernel="equal", method="median",
                   nodata=90.0) == 4.5
    mode = _three_by_three(spark, [1, 2, 3, 4, 5, 6, 3, 8, 9])
    assert _center(spark, mode, kernel="equal", method="mode") == 3
    nd = _three_by_three(spark, [1, 2, 3, 4, 5, 6, 7, 8, 9])
    assert _center(spark, nd, kernel="equal", method="max",
                   nodata=9.0) == 8.0


def test_reference_autotest_byte_tif_gaussian(spark):
    """gaussian 3x3/5x5 + unsharp-masking pixel (10,10) of the
    canonical byte.tif — the reference's own expectations
    (test_gdalalg_raster_neighbors.py:260-298: 114.0625,
    119.00390625, 110.99609375)."""
    from gdal_spark.operators.gtiff import decode_gtiff

    with open("/root/reference/autotest/gcore/data/byte.tif",
              "rb") as fh:
        arr, _meta = decode_gtiff(fh.read())
    arr = arr.astype(np.float64)        # 20x20
    rows = [{"zoom": 0, "tile_x": tx, "tile_y": ty, "band": 1,
             "data": np.ascontiguousarray(
                 arr[ty * 10:(ty + 1) * 10,
                     tx * 10:(tx + 1) * 10]).tobytes(),
             "dtype": "float64", "tile_size": 10}
            for tx in range(2) for ty in range(2)]
    tiles = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)

    def px(df):
        out = df.toPandas().set_index(["tile_x", "tile_y"])
        a = decode_tile(out.loc[(1, 1), "data"],
                        out.loc[(1, 1), "dtype"], 10)
        return a[0, 0]                  # global (10, 10)

    assert px(neighbors_tiles(tiles, kernel="gaussian")) \
        == 114.0625
    assert px(neighbors_tiles(tiles, kernel="gaussian", size=5)) \
        == pytest.approx(119.00390625)
    assert px(neighbors_tiles(tiles, kernel="unsharp-masking")) \
        == pytest.approx(110.99609375)
