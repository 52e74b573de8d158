"""Footprint + pansharpen — compositions over existing kernels.

* footprint — raster mask -> footprint (multi)polygon with optional
  convex hull / simplification (apps/gdal_footprint_lib.cpp:98-184:
  polygonize the mask, dissolve, densify/hull/simplify options).
  Composed from polygonize_tiles + the geometry kernels.
* pansharpen — weighted Brovey: out_band = band * pan / pseudo_pan,
  pseudo_pan = sum(w_i * band_i) (alg/gdalpansharpen.cpp weighted
  Brovey default).  Composed from raster_calc over aligned tiles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from gdal_spark.geometry.ops import convex_hull, douglas_peucker
from gdal_spark.geometry.packed import geom_area
from gdal_spark.geometry.wkb import parse_wkb, polygon_wkb
from gdal_spark.operators.dem import raster_calc
from gdal_spark.operators.polygonize import polygonize_tiles


def footprint_tiles(
    tiles: DataFrame, gt: list[float], nodata: float = 0.0,
    connectedness: int = 4,
    hull: bool = False,
    simplify_tol: float | None = None,
    min_ring_area: float | None = None,
) -> DataFrame:
    """Footprint of the valid-data mask -> polygons
    (value column dropped: every valid pixel contributes).

    Options mirror gdal_footprint: convex-hull output, simplification
    tolerance, minimum ring area filter."""
    # mask raster: valid=1 via calc, then polygonize value==1; the
    # mask is mostly zeros on sparse rasters, so it ships deflate-
    # coded into the polygonize CCL kernel (raw was 512 KB/tile)
    mask = raster_calc(
        {"x": tiles},
        lambda x: (x != nodata).astype(np.float64),
        dtype="float64",
        codec="deflate",
    )
    polys = polygonize_tiles(mask, gt, nodata=0.0,
                             connectedness=connectedness)

    from typing import Iterator

    from pyspark.sql.types import (
        BinaryType, DoubleType, StructField, StructType
    )

    out_schema = StructType([
        StructField("geometry", BinaryType()),
        StructField("area", DoubleType()),
    ])

    def post(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"geometry": [], "area": []}
            for wkb in b["geometry"]:
                g = parse_wkb(bytes(wkb))
                rings = g.rings()
                if min_ring_area is not None:
                    rings = [r for i, r in enumerate(rings)
                             if i == 0 or abs(_ring_area(r))
                             >= min_ring_area]
                if simplify_tol is not None:
                    rings = [douglas_peucker(r, simplify_tol)
                             for r in rings]
                    rings = [r for r in rings if len(r) >= 4]
                if hull:
                    rings = [convex_hull(np.vstack(rings))]
                if not rings:
                    continue
                out_wkb = polygon_wkb(rings)
                rows["geometry"].append(out_wkb)
                rows["area"].append(geom_area(parse_wkb(out_wkb)))
            if rows["geometry"]:
                yield pd.DataFrame(rows)

    return polys.filter(F.col("value") == 1.0) \
        .select("geometry").mapInPandas(post, out_schema)


def _ring_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def pansharpen(pan_tiles: DataFrame, band_tiles: dict[str, DataFrame],
               weights: dict[str, float] | None = None,
               dtype: str = "float64") -> dict[str, DataFrame]:
    """Weighted-Brovey pansharpen: each band scaled by
    pan / sum(w_i * band_i).  Bands must be pre-resampled onto the
    pan grid (translate_tiles upscale)."""
    names = list(band_tiles)
    w = weights or {n: 1.0 / len(names) for n in names}

    out = {}
    inputs = {"pan": pan_tiles, **band_tiles}
    for name in names:
        out[name] = raster_calc(inputs, _make_fn(name, w), dtype)
    return out


def _make_fn(name: str, w: dict[str, float]):
    def fn(pan, **bands):
        pseudo = sum(w[k] * bands[k] for k in bands)
        pseudo = np.where(pseudo == 0, 1.0, pseudo)
        return bands[name] * pan / pseudo

    return fn
