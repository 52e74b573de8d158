"""r7: _footprint_stat's per-dst-pixel python loop (65k iterations
per 256px tile — the q52 52-second hotspot) gained a vectorized
separable path.  These tests pin BIT-equality against the verbatim
loop across stats, scale factors (aligned/unaligned down- and
upscale), offsets, window sizes beyond numpy's pairwise-summation
blocksize, and nodata."""

import numpy as np
import pytest

from gdal_spark.operators.warp import (
    _footprint_stat, _footprint_stat_loop, _footprint_stat_rows,
)

STATS = ["average", "min", "max", "sum", "med", "q1", "q3", "rms"]


def _sep_coords(h_out, w_out, sx, sy, ox=0.0, oy=0.0):
    """Separable dst->src pixel coords: lx depends on the column
    only, ly on the row only (every CRS pair the engine warps)."""
    ii = np.arange(w_out) + 0.5
    jj = np.arange(h_out) + 0.5
    lx = np.broadcast_to(ii * sx + ox, (h_out, w_out)).copy()
    ly = np.broadcast_to((jj * sy + oy)[:, None], (h_out, w_out)).copy()
    return lx, ly


@pytest.mark.parametrize("stat", STATS)
@pytest.mark.parametrize("sx,sy,ox", [
    (2.0, 2.0, 0.0),          # aligned 2x downscale (the q52 shape)
    (3.7, 2.3, 0.4),          # unaligned downscale
    (0.5, 0.25, 0.0),         # upscale (narrow-footprint fallback)
    (1.0, 1.0, 0.3),          # identity-ish with offset
    (17.0, 13.0, 1.7),        # windows > 128 elements (pairwise regime)
])
def test_bit_equal_to_loop(stat, sx, sy, ox):
    rng = np.random.RandomState(7)
    patch = rng.uniform(-50, 50, size=(96, 96)).astype(np.float64)
    h_out = max(2, int(96 / sy) - 1)
    w_out = max(2, int(96 / sx) - 1)
    lx, ly = _sep_coords(h_out, w_out, sx, sy, ox, ox / 2)
    got = _footprint_stat(patch, lx, ly, stat, None, 0.0)
    want = _footprint_stat_loop(patch, lx, ly, stat, None, 0.0)
    assert np.array_equal(got.view(np.int64), want.view(np.int64)), \
        (stat, sx, sy)


@pytest.mark.parametrize("stat", ["min", "max"])
def test_bit_equal_nodata_minmax(stat):
    rng = np.random.RandomState(9)
    patch = rng.randint(0, 5, size=(64, 64)).astype(np.float64)
    lx, ly = _sep_coords(31, 31, 2.0, 2.0)
    got = _footprint_stat(patch, lx, ly, stat, 3.0, -1.0)
    want = _footprint_stat_loop(patch, lx, ly, stat, 3.0, -1.0)
    assert np.array_equal(got, want)


def test_masked_sum_and_mode_route_to_loop():
    """nodata + sum (pairwise-tree hazard) and mode must take the
    reference loop; the vectorized kernel is never asked for them."""
    patch = np.ones((8, 8))
    lx, ly = _sep_coords(4, 4, 2.0, 2.0)
    got = _footprint_stat(patch, lx, ly, "sum", 1.0, -1.0)
    want = _footprint_stat_loop(patch, lx, ly, "sum", 1.0, -1.0)
    assert np.array_equal(got, want)
    got = _footprint_stat(patch, lx, ly, "mode", None, -1.0)
    want = _footprint_stat_loop(patch, lx, ly, "mode", None, -1.0)
    assert np.array_equal(got, want)


def test_non_separable_falls_back():
    """A rotated mapping (lx varies with the row) must produce the
    loop's answer (dispatcher detects non-separability)."""
    jj, ii = np.mgrid[0:16, 0:16].astype(np.float64)
    lx = 2.0 * ii + 0.01 * jj
    ly = 2.0 * jj
    patch = np.arange(48 * 48, dtype=np.float64).reshape(48, 48)
    got = _footprint_stat(patch, lx, ly, "sum", None, 0.0)
    want = _footprint_stat_loop(patch, lx, ly, "sum", None, 0.0)
    assert np.array_equal(got, want)


def test_out_of_patch_windows_keep_fill():
    """Columns/rows clamped to empty windows stay at fill in both
    paths."""
    patch = np.ones((16, 16))
    lx, ly = _sep_coords(8, 8, 4.0, 4.0, ox=-8.0, oy=-8.0)
    for stat in ("sum", "min"):
        got = _footprint_stat(patch, lx, ly, stat, None, -7.0)
        want = _footprint_stat_loop(patch, lx, ly, stat, None, -7.0)
        assert np.array_equal(got, want)


def test_rows_path_is_actually_vectorized():
    """Sanity: the separable inputs really take the fast path (guard
    against a silent always-fallback)."""
    patch = np.arange(64 * 64, dtype=np.float64).reshape(64, 64)
    lx, ly = _sep_coords(32, 32, 2.0, 2.0)
    fast = _footprint_stat_rows(patch, lx, ly, "sum", None, 0.0)
    assert np.array_equal(fast,
                          _footprint_stat(patch, lx, ly, "sum",
                                          None, 0.0))
