"""Viewshed: single-observer visibility raster.

The reference implements Wang et al.'s plane-propagation
approximation (alg/viewshed/viewshed_executor.cpp:61-115
CalcHeightLine/Diagonal/Edge — heights required for visibility are
propagated ring-to-ring).  This engine computes EXACT line-of-sight
instead: for every target pixel, the terrain is sampled along the
observer ray with bilinear interpolation and the pixel is visible iff
no sample blocks the sight line — a strictly more accurate variant
(Wang is the reference's speed optimization for its scanline
executor; a vectorized (pixels x samples) numpy broadcast doesn't
need it).  Earth-curvature adjustment follows the reference's
curveCoeff semantics (drop = curve_coeff * d^2 / (2 * R),
viewshed_executor.cpp:214).

Distribution: a single observer's viewshed only touches tiles within
``radius``; those are gathered to one kernel (groupBy a literal key)
— the reference's own executor is equally single-node per observer.
For many observers, call per observer or union the outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from gdal_spark.operators.rasterize import GridSpec
from gdal_spark.operators.tiling import (
    TILE_SCHEMA, decode_tile, encode_tile,
)

R_EARTH = 6378137.0


def viewshed_array(
    dem: np.ndarray, ox: float, oy: float,
    observer_height: float = 2.0,
    target_height: float = 0.0,
    radius: float | None = None,
    visible_val: float = 255.0,
    invisible_val: float = 0.0,
    out_of_range_val: float = 0.0,
    curve_coeff: float = 0.0,
    px_size: float = 1.0,
) -> np.ndarray:
    """Exact-LOS viewshed over a DEM array; (ox, oy) in pixel coords."""
    h, w = dem.shape
    jj, ii = np.mgrid[0:h, 0:w]
    cx = ii + 0.5
    cy = jj + 0.5
    dx = cx - ox
    dy = cy - oy
    # sqrt(dx^2+dy^2), NOT np.hypot: hypot's extra-precision path
    # differs from the correctly-rounded sqrt by 1 ulp on ~0.4% of
    # integer offsets, and the q99 SQL oracle replays this law
    # bit-exactly (pixel offsets are small — no overflow to guard)
    dist = np.sqrt(dx * dx + dy * dy)
    out = np.full((h, w), invisible_val, dtype=np.float64)
    in_range = np.ones((h, w), dtype=bool)
    if radius is not None:
        in_range = dist <= radius
        out[~in_range] = out_of_range_val

    oi = int(np.clip(np.floor(ox), 0, w - 1))
    oj = int(np.clip(np.floor(oy), 0, h - 1))
    z_obs = dem[oj, oi] + observer_height

    def curve_drop(d_px):
        if curve_coeff == 0.0:
            return 0.0
        d_m = d_px * px_size
        return curve_coeff * d_m * d_m / (2.0 * R_EARTH)

    # visibility: for each pixel, max over samples along the ray of
    # (z_sample - z_obs) / d_sample must not exceed
    # (z_target + target_height - z_obs) / d_target
    n_steps = int(np.ceil(dist.max())) + 1
    tgt = dem + target_height - curve_drop(dist)
    with np.errstate(divide="ignore", invalid="ignore"):
        tgt_slope = (tgt - z_obs) / np.where(dist == 0, 1.0, dist)
    max_slope = np.full((h, w), -np.inf)
    flat = in_range.ravel()
    idx = np.flatnonzero(flat)
    fdx = dx.ravel()[idx]
    fdy = dy.ravel()[idx]
    fdist = dist.ravel()[idx]
    fmax = np.full(len(idx), -np.inf)
    # sample at unit spacing along each ray (excluding the endpoint)
    for s in range(1, n_steps):
        active = fdist > s
        if not active.any():
            break
        t = s / fdist[active]
        sx = ox + fdx[active] * t - 0.5
        sy = oy + fdy[active] * t - 0.5
        x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 2)
        y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 2)
        fx = np.clip(sx - x0, 0.0, 1.0)
        fy = np.clip(sy - y0, 0.0, 1.0)
        z = (dem[y0, x0] * (1 - fx) * (1 - fy)
             + dem[y0, x0 + 1] * fx * (1 - fy)
             + dem[y0 + 1, x0] * (1 - fx) * fy
             + dem[y0 + 1, x0 + 1] * fx * fy)
        z = z - curve_drop(np.float64(s))
        slope = (z - z_obs) / s
        upd = np.full(len(idx), -np.inf)
        upd[active] = slope
        fmax = np.maximum(fmax, upd)
    max_slope.ravel()[idx] = fmax
    visible = in_range & (tgt_slope >= max_slope)
    out[visible] = visible_val
    out[oj, oi] = visible_val if in_range[oj, oi] else out_of_range_val
    return out


def viewshed_tiles(
    tiles: DataFrame, grid: GridSpec,
    observer_x: float, observer_y: float,
    observer_height: float = 2.0,
    radius: float = 1000.0,
    tile_size: int = 256,
    **kw,
) -> DataFrame:
    """Distributed plumbing: gather the tiles within ``radius`` of the
    observer (world coords) and run the exact-LOS kernel; returns
    viewshed tiles on the same lattice."""
    opx = (observer_x - grid.x0) / grid.px_w
    opy = (grid.y1 - observer_y) / grid.px_h
    rpx = radius / grid.px_w
    tx0 = int(max((opx - rpx) // tile_size, 0))
    tx1 = int((opx + rpx) // tile_size)
    ty0 = int(max((opy - rpx) // tile_size, 0))
    ty1 = int((opy + rpx) // tile_size)
    sel = tiles.filter(
        (F.col("tile_x").between(tx0, tx1))
        & (F.col("tile_y").between(ty0, ty1))
    )

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({f.name: [] for f in TILE_SCHEMA.fields})
        ts = int(pdf["tile_size"].iloc[0])
        txs = pdf["tile_x"].astype(int)
        tys = pdf["tile_y"].astype(int)
        bx0, by0 = txs.min(), tys.min()
        wloc = (txs.max() - bx0 + 1) * ts
        hloc = (tys.max() - by0 + 1) * ts
        dem = np.zeros((hloc, wloc))
        for _, r in pdf.iterrows():
            arr = decode_tile(r["data"], r["dtype"], ts)
            oxp = (int(r["tile_x"]) - bx0) * ts
            oyp = (int(r["tile_y"]) - by0) * ts
            dem[oyp:oyp + ts, oxp:oxp + ts] = arr
        vs = viewshed_array(
            dem, opx - bx0 * ts, opy - by0 * ts,
            observer_height=observer_height,
            radius=rpx, px_size=grid.px_w, **kw,
        )
        rows = {f.name: [] for f in TILE_SCHEMA.fields}
        for _, r in pdf.iterrows():
            oxp = (int(r["tile_x"]) - bx0) * ts
            oyp = (int(r["tile_y"]) - by0) * ts
            payload, dts = encode_tile(
                vs[oyp:oyp + ts, oxp:oxp + ts].astype(np.float64), None)
            rows["zoom"].append(int(r["zoom"]))
            rows["tile_x"].append(int(r["tile_x"]))
            rows["tile_y"].append(int(r["tile_y"]))
            rows["band"].append(int(r["band"]))
            rows["data"].append(payload)
            rows["dtype"].append(dts)
            rows["tile_size"].append(ts)
        return pd.DataFrame(rows)

    return (
        sel.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(kernel, TILE_SCHEMA)
    )
