"""r7: the k-halo exchange gained (a) a constant-block encoding
(all-equal blocks ship as one value, h = -1) and (b) center
pass-through of the tile's original, possibly deflate-coded payload.
The assembled canvas must be identical to what full raw blocks
produce, for raw and coded inputs alike."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.proximity import (
    assemble_halo_canvas, emit_halos_k,
)
from gdal_spark.operators.tiling import encode_tile


def _tiles_df(spark, arrays, codec):
    rows = []
    for (tx, ty), arr in arrays.items():
        payload, dts = encode_tile(arr, codec)
        rows.append({"zoom": 3, "tile_x": tx, "tile_y": ty,
                     "band": 1, "data": payload, "dtype": dts,
                     "tile_size": arr.shape[0]})
    return spark.createDataFrame(pd.DataFrame(rows))


@pytest.mark.parametrize("codec", [None, "deflate"])
@pytest.mark.parametrize("k", [1, 3])
def test_halo_canvas_matches_raw_reference(spark, codec, k):
    ts = 32
    rng = np.random.RandomState(4)
    arrays = {
        (1, 1): rng.randint(0, 9, (ts, ts)).astype(np.float64),
        (2, 1): np.zeros((ts, ts)),               # constant tile
        (1, 2): np.full((ts, ts), 7.0),           # constant nonzero
        (2, 2): rng.randint(0, 3, (ts, ts)).astype(np.float64),
    }
    halos = emit_halos_k(_tiles_df(spark, arrays, codec), k)
    pdfs = {k2: g for k2, g in halos.toPandas().groupby(
        ["tile_x", "tile_y"])}
    # reference canvas straight from the arrays
    for (tx, ty), arr in arrays.items():
        want = np.full((ts + 2 * k, ts + 2 * k), np.nan)
        want[k:-k, k:-k] = arr
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == dy == 0:
                    continue
                nb = arrays.get((tx + dx, ty + dy))
                if nb is None:
                    continue
                # neighbor's facing strip
                ys = slice(0, k) if dy == 1 else \
                    (slice(ts - k, ts) if dy == -1 else slice(0, ts))
                xs = slice(0, k) if dx == 1 else \
                    (slice(ts - k, ts) if dx == -1 else slice(0, ts))
                blk = nb[ys, xs]
                cy = slice(0, k) if dy == -1 else \
                    (slice(ts + k, ts + 2 * k) if dy == 1
                     else slice(k, ts + k))
                cx = slice(0, k) if dx == -1 else \
                    (slice(ts + k, ts + 2 * k) if dx == 1
                     else slice(k, ts + k))
                want[cy, cx] = blk
        got, meta = assemble_halo_canvas(pdfs[(tx, ty)], ts, k,
                                         fill=np.nan)
        assert np.array_equal(np.nan_to_num(got, nan=-777.0),
                              np.nan_to_num(want, nan=-777.0)), (tx, ty)
        assert meta == {"zoom": 3, "band": 1}
    # the constant tiles really took the compact form
    h_col = pdfs[(2, 1)]
    center = h_col[h_col["rel"] == 0].iloc[0]
    assert int(center["h"]) == -1 and len(center["data"]) == 8
