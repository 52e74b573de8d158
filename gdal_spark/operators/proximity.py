"""Proximity, fillnodata, sieve — the remaining raster cleanup ops.

* proximity — distance-to-nearest-target raster
  (alg/gdalproximity.cpp: GDAL runs a two-pass scan; here each tile
  computes an EXACT Euclidean distance transform over a halo of
  ``max_dist`` pixels using the separable lower-envelope EDT
  [Felzenszwalb & Huttenlocher 2004, public algorithm], which equals
  GDAL's result wherever distance <= max_dist — GDAL's own MAXDIST
  option has the same truncation semantics)
* fillnodata — fill nodata pixels from surrounding valid pixels
  (alg/rasterfill.cpp); variant: value of the *nearest* valid pixel
  (exact via the same EDT with site tracking) where GDAL uses a
  4-ray IDW — both converge for smooth fields; documented difference
* sieve — remove raster polygons smaller than a threshold by merging
  them into their largest neighbor (alg/gdalsievefilter.cpp),
  implemented on the distributed-CCL machinery of polygonize:
  global labels -> sizes -> neighbor graph -> driver-side merge loop
  -> broadcast remap -> rewrite tiles.

The k-pixel halo exchange generalizes the DEM 1-px strips: every
tile ships its k-wide border blocks to the 8 neighbors.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType
)

from gdal_spark.operators.tiling import TILE_SCHEMA, decode_tile, encode_tile

_HALO_SCHEMA = StructType([
    StructField("tile_x", LongType()),
    StructField("tile_y", LongType()),
    StructField("rel", IntegerType()),
    StructField("data", BinaryType()),
    StructField("dtype", StringType()),
    StructField("tile_size", IntegerType()),
    StructField("zoom", IntegerType()),
    StructField("band", IntegerType()),
    StructField("h", IntegerType()),
    StructField("w", IntegerType()),
])

_REL = {1: (-1, -1), 2: (0, -1), 3: (1, -1), 4: (-1, 0),
        5: (1, 0), 6: (-1, 1), 7: (0, 1), 8: (1, 1)}


def emit_halos_k(tiles: DataFrame, k: int) -> DataFrame:
    """Center rows + 8 k-wide border blocks addressed to neighbors."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {f.name: [] for f in _HALO_SCHEMA.fields}

            def add(tx, ty, rel, arr, ts, zoom, band):
                rows["tile_x"].append(tx)
                rows["tile_y"].append(ty)
                rows["rel"].append(rel)
                rows["data"].append(
                    np.ascontiguousarray(arr).tobytes())
                rows["dtype"].append(str(arr.dtype))
                rows["tile_size"].append(ts)
                rows["zoom"].append(zoom)
                rows["band"].append(band)
                rows["h"].append(arr.shape[0])
                rows["w"].append(arr.shape[1])

            for _, r in b.iterrows():
                ts = int(r["tile_size"])
                tx, ty = int(r["tile_x"]), int(r["tile_y"])
                arr = decode_tile(r["data"], r["dtype"], ts)
                add(tx, ty, 0, arr, ts, int(r["zoom"]), int(r["band"]))
                blocks = {
                    1: arr[:k, :k], 2: arr[:k, :], 3: arr[:k, -k:],
                    4: arr[:, :k], 5: arr[:, -k:],
                    6: arr[-k:, :k], 7: arr[-k:, :], 8: arr[-k:, -k:],
                }
                for rel, (dx, dy) in _REL.items():
                    ntx, nty = tx + dx, ty + dy
                    if ntx < 0 or nty < 0:
                        continue
                    add(ntx, nty, rel, blocks[rel], ts,
                        int(r["zoom"]), int(r["band"]))
            yield pd.DataFrame(rows)

    return tiles.mapInPandas(kernel, _HALO_SCHEMA)


def assemble_halo_canvas(pdf: pd.DataFrame, ts: int, k: int,
                         fill: float) -> tuple[np.ndarray, dict] | None:
    """Place center + k-halo blocks into a (ts+2k, ts+2k) canvas."""
    center = pdf[pdf["rel"] == 0]
    if len(center) == 0:
        return None
    canvas = np.full((ts + 2 * k, ts + 2 * k), fill, dtype=np.float64)
    c0 = center.iloc[0]
    arr = np.frombuffer(c0["data"], dtype=np.dtype(c0["dtype"])) \
        .reshape(ts, ts)
    canvas[k:-k, k:-k] = arr
    # placement: block from a source at offset -(dx,dy) of this tile
    for _, r in pdf[pdf["rel"] != 0].iterrows():
        rel = int(r["rel"])
        h, w = int(r["h"]), int(r["w"])
        blk = np.frombuffer(r["data"], dtype=np.dtype(r["dtype"])) \
            .reshape(h, w)
        if rel == 2:            # dst above src -> src top block at bottom
            canvas[-k:, k:-k] = blk
        elif rel == 7:
            canvas[:k, k:-k] = blk
        elif rel == 4:
            canvas[k:-k, -k:] = blk
        elif rel == 5:
            canvas[k:-k, :k] = blk
        elif rel == 1:
            canvas[-k:, -k:] = blk
        elif rel == 3:
            canvas[-k:, :k] = blk
        elif rel == 6:
            canvas[:k, -k:] = blk
        elif rel == 8:
            canvas[:k, :k] = blk
    meta = {"zoom": int(c0["zoom"]), "band": int(c0["band"])}
    return canvas, meta


# --- exact Euclidean distance transform (separable lower envelope) ---

def _edt_1d(f: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """1-D squared EDT of sampled function f; returns (d, argmin)."""
    n = len(f)
    d = np.zeros(n)
    arg = np.zeros(n, dtype=np.int64)
    v = np.zeros(n, dtype=np.int64)
    z = np.zeros(n + 1)
    kk = 0
    v[0] = 0
    z[0] = -np.inf
    z[1] = np.inf
    for q in range(1, n):
        s = ((f[q] + q * q) - (f[v[kk]] + v[kk] * v[kk])) \
            / (2 * q - 2 * v[kk])
        while s <= z[kk]:
            kk -= 1
            s = ((f[q] + q * q) - (f[v[kk]] + v[kk] * v[kk])) \
                / (2 * q - 2 * v[kk])
        kk += 1
        v[kk] = q
        z[kk] = s
        z[kk + 1] = np.inf
    kk = 0
    for q in range(n):
        while z[kk + 1] < q:
            kk += 1
        d[q] = (q - v[kk]) ** 2 + f[v[kk]]
        arg[q] = v[kk]
    return d, arg


def edt_squared(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray,
                                           np.ndarray]:
    """Exact squared EDT to the nearest True pixel; returns
    (dist2, src_y, src_x) with nearest-site coordinates."""
    h, w = mask.shape
    INF = 1e18
    f = np.where(mask, 0.0, INF)
    dcol = np.empty((h, w))
    argy = np.empty((h, w), dtype=np.int64)
    for x in range(w):
        dcol[:, x], argy[:, x] = _edt_1d(f[:, x])
    d = np.empty((h, w))
    argx = np.empty((h, w), dtype=np.int64)
    for y in range(h):
        d[y], argx[y] = _edt_1d(dcol[y])
    src_x = argx
    src_y = argy[np.arange(h)[:, None], argx]
    return d, src_y, src_x


def proximity_tiles(tiles: DataFrame, target_values: list[float],
                    max_dist: float, nodata: float = -1.0) -> DataFrame:
    """Distance (pixels) to the nearest target-valued pixel, exact up
    to ``max_dist``; beyond it, ``nodata``
    (alg/gdalproximity.cpp MAXDIST semantics)."""
    k = int(np.ceil(max_dist))
    halos = emit_halos_k(tiles, k)
    targets = set(float(v) for v in target_values)

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ts = int(pdf["tile_size"].iloc[0])
        got = assemble_halo_canvas(pdf, ts, k, fill=np.nan)
        if got is None:
            return pd.DataFrame({f.name: [] for f in TILE_SCHEMA.fields})
        canvas, meta = got
        mask = np.isin(canvas, list(targets))
        d2, _, _ = edt_squared(mask)
        dist = np.sqrt(d2)[k:-k, k:-k]
        out = np.where(dist <= max_dist, dist, nodata)
        payload, dts = encode_tile(out.astype(np.float64), None)
        return pd.DataFrame({
            "zoom": [meta["zoom"]], "tile_x": [int(key[0])],
            "tile_y": [int(key[1])], "band": [meta["band"]],
            "data": [payload], "dtype": [dts], "tile_size": [ts],
        })

    return (
        halos.repartition("tile_x", "tile_y")
        .groupBy("tile_x", "tile_y")
        .applyInPandas(render, TILE_SCHEMA)
    )


def fillnodata_tiles(tiles: DataFrame, nodata: float,
                     max_dist: float = 16.0) -> DataFrame:
    """Fill nodata pixels with the nearest valid pixel's value (exact
    nearest within max_dist via EDT site tracking; rasterfill.cpp
    uses 4-ray IDW — nearest-value is this engine's documented
    variant)."""
    k = int(np.ceil(max_dist))
    halos = emit_halos_k(tiles, k)

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ts = int(pdf["tile_size"].iloc[0])
        got = assemble_halo_canvas(pdf, ts, k, fill=nodata)
        if got is None:
            return pd.DataFrame({f.name: [] for f in TILE_SCHEMA.fields})
        canvas, meta = got
        valid = canvas != nodata
        d2, sy, sx = edt_squared(valid)
        filled = canvas.copy()
        take = (~valid) & (np.sqrt(d2) <= max_dist)
        filled[take] = canvas[sy[take], sx[take]]
        out = filled[k:-k, k:-k]
        payload, dts = encode_tile(out.astype(np.float64), None)
        return pd.DataFrame({
            "zoom": [meta["zoom"]], "tile_x": [int(key[0])],
            "tile_y": [int(key[1])], "band": [meta["band"]],
            "data": [payload], "dtype": [dts], "tile_size": [ts],
        })

    return (
        halos.repartition("tile_x", "tile_y")
        .groupBy("tile_x", "tile_y")
        .applyInPandas(render, TILE_SCHEMA)
    )


def sieve_tiles(tiles: DataFrame, threshold: int,
                gt: list[float] | None = None,
                nodata: float | None = None,
                connectedness: int = 4) -> DataFrame:
    """Sieve filter: polygons smaller than ``threshold`` pixels merge
    into their largest neighbor (alg/gdalsievefilter.cpp), on the
    polygonize run/label machinery.

    Returns new tiles with small-polygon values rewritten."""
    spark = tiles.sparkSession

    # stage 1+2 of polygonize: global labels on runs
    # (reuse by calling the internal pieces)
    runs, _bc, tile_size = _global_runs(tiles, nodata, connectedness)

    # sizes per label + adjacency with overlap lengths
    sizes = runs.groupBy("label").agg(
        F.sum(F.col("x1") - F.col("x0")).alias("n_pix"),
        F.first("value").alias("value"),
    )
    top = runs.alias("t")
    bot = runs.alias("b")
    adj = (
        top.join(
            bot,
            (F.col("t.y") + 1 == F.col("b.y"))
            & (F.col("t.x0") < F.col("b.x1"))
            & (F.col("b.x0") < F.col("t.x1"))
            & (F.col("t.label") != F.col("b.label")),
        )
        .select(
            F.col("t.label").alias("a"), F.col("b.label").alias("b"),
            (F.least("t.x1", "b.x1")
             - F.greatest("t.x0", "b.x0")).alias("olap"),
        )
    )
    # horizontal adjacency within a row
    hadj = (
        top.join(
            bot,
            (F.col("t.y") == F.col("b.y"))
            & (F.col("t.x1") == F.col("b.x0"))
            & (F.col("t.label") != F.col("b.label")),
        )
        .select(F.col("t.label").alias("a"),
                F.col("b.label").alias("b"), F.lit(1).alias("olap"))
    )
    edges = adj.unionByName(hadj).groupBy("a", "b") \
        .agg(F.sum("olap").alias("olap")).collect()
    size_rows = sizes.collect()
    size_map = {int(r.label): int(r.n_pix) for r in size_rows}
    value_map = {int(r.label): float(r.value) for r in size_rows}
    neigh: dict[int, dict[int, int]] = {}
    for r in edges:
        a, b = int(r.a), int(r.b)
        neigh.setdefault(a, {})[b] = neigh.get(a, {}).get(b, 0) + int(r.olap)
        neigh.setdefault(b, {})[a] = neigh.get(b, {}).get(a, 0) + int(r.olap)

    # iterative small-into-largest-neighbor merge (driver side; the
    # label graph is orders of magnitude smaller than the raster)
    final = {lab: lab for lab in size_map}

    def root(x):
        while final[x] != x:
            final[x] = final[final[x]]
            x = final[x]
        return x

    changed = True
    while changed:
        changed = False
        # recompute effective sizes
        eff_size: dict[int, int] = {}
        for lab, sz in size_map.items():
            eff_size[root(lab)] = eff_size.get(root(lab), 0) + sz
        for lab in sorted(size_map):
            rl = root(lab)
            if eff_size.get(rl, 0) >= threshold:
                continue
            # largest neighboring component
            best, best_sz = None, -1
            for nb in neigh.get(lab, {}):
                rn = root(nb)
                if rn == rl:
                    continue
                if eff_size.get(rn, 0) > best_sz:
                    best, best_sz = rn, eff_size.get(rn, 0)
            if best is not None:
                final[rl] = best
                changed = True
    label_value = {lab: value_map[root(lab)] for lab in size_map
                   if root(lab) != lab}
    bc = spark.sparkContext.broadcast(label_value)

    # rewrite tiles: runs with remapped labels get the new value
    def rewrite(key, pdf: pd.DataFrame) -> pd.DataFrame:
        m = bc.value
        ts = tile_size
        tx, ty = int(key[0]), int(key[1])
        grid_arr = np.full((ts, ts), np.nan if nodata is None else nodata,
                           dtype=np.float64)
        for _, r in pdf.iterrows():
            y = int(r["y"]) - ty * ts
            x0 = int(r["x0"]) - tx * ts
            x1 = int(r["x1"]) - tx * ts
            val = m.get(int(r["label"]), float(r["value"]))
            grid_arr[y, x0:x1] = val
        payload, dts = encode_tile(grid_arr, None)
        return pd.DataFrame({
            "zoom": [-1], "tile_x": [tx], "tile_y": [ty], "band": [1],
            "data": [payload], "dtype": [dts], "tile_size": [ts],
        })

    ts = tile_size
    keyed = runs.withColumn("tile_x", (F.col("x0") / ts).cast("long")) \
        .withColumn("tile_y", (F.col("y") / ts).cast("long"))
    return (
        keyed.repartition("tile_x", "tile_y")
        .groupBy("tile_x", "tile_y")
        .applyInPandas(rewrite, TILE_SCHEMA)
    )


def _global_runs(tiles: DataFrame, nodata, connectedness):
    """Labeled runs with globally-merged labels (polygonize stages
    1+2, shared)."""
    from gdal_spark.operators import polygonize as pz

    spark = tiles.sparkSession
    ts_row = tiles.select("tile_size").first()
    tile_size = int(ts_row[0]) if ts_row else 256

    def tile_runs(batches):
        for b in batches:
            rows = {"label": [], "value": [], "y": [], "x0": [], "x1": []}
            for i in range(len(b)):
                ts = int(b["tile_size"].iloc[i])
                tx = int(b["tile_x"].iloc[i])
                ty = int(b["tile_y"].iloc[i])
                arr = decode_tile(b["data"].iloc[i], b["dtype"].iloc[i],
                                  ts)
                labels, _ = pz.label_tile(arr, nodata, connectedness)
                ls, ys, x0s, x1s = pz.runs_of_labels(labels)
                if len(ls) == 0:
                    continue
                tile_key = (tx * (1 << 20) + ty) << 24
                rows["label"].append(tile_key + ls)
                rows["value"].append(arr[ys, x0s].astype(np.float64))
                rows["y"].append(ys + ty * ts)
                rows["x0"].append(x0s + tx * ts)
                rows["x1"].append(x1s + tx * ts)
            if rows["label"]:
                yield pd.DataFrame({k: np.concatenate(v)
                                    for k, v in rows.items()})

    runs = tiles.mapInPandas(tile_runs, pz.RUNS_SCHEMA).cache()
    # border merge identical to polygonize
    top = runs.filter(F.col("y") % tile_size == 0).alias("t")
    bot = runs.filter((F.col("y") + 1) % tile_size == 0).alias("b")
    pairs = top.join(
        bot,
        (F.col("t.y") == F.col("b.y") + 1)
        & (F.col("t.value") == F.col("b.value"))
        & (F.col("t.x0") < F.col("b.x1"))
        & (F.col("b.x0") < F.col("t.x1")),
    ).select(F.col("t.label").alias("a"), F.col("b.label").alias("b"))
    left = runs.filter(F.col("x0") % tile_size == 0).alias("l")
    right = runs.filter(F.col("x1") % tile_size == 0).alias("r")
    vpairs = right.join(
        left,
        (F.col("l.x0") == F.col("r.x1"))
        & (F.col("l.value") == F.col("r.value"))
        & (F.col("l.y") == F.col("r.y")),
    ).select(F.col("l.label").alias("a"), F.col("r.label").alias("b"))
    all_pairs = pairs.unionByName(vpairs).distinct().collect()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in all_pairs:
        ra, rb = find(int(r.a)), find(int(r.b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    remap = {k: find(k) for k in list(parent)}
    spark_bc = spark.sparkContext.broadcast(remap)

    def apply_remap(batches):
        m = spark_bc.value
        for b in batches:
            if m:
                b = b.copy()
                b["label"] = b["label"].map(
                    lambda v: m.get(int(v), int(v)))
            yield b

    return (runs.mapInPandas(apply_remap, pz.RUNS_SCHEMA), spark_bc,
            tile_size)
