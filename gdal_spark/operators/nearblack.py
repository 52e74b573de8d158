"""``gdal raster clean-collar`` — the nearblack utility's flood-fill
algorithm.

Reference: apps/gdalalg_raster_clean_collar.cpp driving
apps/nearblack_lib.cpp.  The reference offers two algorithms; this
engine implements the FLOOD-FILL one (``algorithm=floodfill``):
starting from the raster border, every 4-connected pixel whose value
sits within ``threshold`` of a transparent color joins the collar
and is set to the exact color (or ``set_value``).  Interior
near-color lakes that do not touch the border survive — that is the
whole point of the flood variant over the line-scan one (the
``twopasses`` line heuristic is declared out: its result depends on
scanline order, which has no distributed analog).

Distributed shape: a label-propagation loop over tiles —

  round 0   per tile: near-mask; tiles on the DECLARED raster
            boundary seed from their outer edge pixels; a
            directional-sweep local fill closes each tile;
  round k   every tile ships its 1-px filled border to its 4
            neighbors (a narrow shuffle); tiles whose incoming
            seeds add pixels re-fill locally and flag ``changed``;
  stop      when no tile changed (one small agg per round).

Rounds are bounded by the collar's tile-diameter, not the raster
size (a collar that snakes through T tiles converges in ≤T rounds;
real collars converge in 2–3).  The state frame localCheckpoints
each round per the engine's iterative-loop rule (CLAUDE.md): the
mask feeds the next round's join, so carrying lineage would grow
the plan tree exponentially.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from gdal_spark.operators.tiling import TILE_SCHEMA, decode_tile

_STATE_SCHEMA = StructType([
    StructField("zoom", IntegerType()),
    StructField("tile_x", LongType()),
    StructField("tile_y", LongType()),
    StructField("band", IntegerType()),
    StructField("data", BinaryType()),
    StructField("dtype", StringType()),
    StructField("tile_size", IntegerType()),
    StructField("near", BinaryType()),     # uint8 ts*ts
    StructField("mask", BinaryType()),     # uint8 ts*ts (filled)
    StructField("changed", IntegerType()),
])

_STRIP_SCHEMA = StructType([
    StructField("tile_x", LongType()),
    StructField("tile_y", LongType()),
    StructField("side", IntegerType()),    # side of the DEST tile
    StructField("strip", BinaryType()),    # uint8 ts
])

# side codes on the destination canvas: 0=top 1=bottom 2=left 3=right
_SIDES = ((0, 0, -1), (1, 0, 1), (2, -1, 0), (3, 1, 0))


def _local_fill(near: np.ndarray, seed: np.ndarray) -> np.ndarray:
    """4-connected flood fill of ``seed & near`` inside ``near`` via
    alternating directional scans (each scan closes straight runs in
    one pass; loops until stable)."""
    filled = seed & near
    ts = near.shape[0]
    while True:
        before = int(filled.sum())
        for i in range(1, ts):                       # down
            filled[i] |= filled[i - 1] & near[i]
        for i in range(ts - 2, -1, -1):              # up
            filled[i] |= filled[i + 1] & near[i]
        for j in range(1, ts):                       # right
            filled[:, j] |= filled[:, j - 1] & near[:, j]
        for j in range(ts - 2, -1, -1):              # left
            filled[:, j] |= filled[:, j + 1] & near[:, j]
        if int(filled.sum()) == before:
            return filled


def clean_collar_tiles(tiles: DataFrame, *,
                       color=0.0, threshold: float = 15.0,
                       set_value: float | None = None,
                       extent_tiles: tuple[int, int, int, int] | None
                       = None,
                       max_rounds: int = 64) -> DataFrame:
    """nearblack flood fill over a single-band tile frame.

    color: one transparent value or a list (the reference's
    black+white combination); threshold: max |v - color| to join the
    collar; set_value: output value for collar pixels (default: the
    first color, the reference's exact-color rule)."""
    colors = [float(c) for c in
              (color if isinstance(color, (list, tuple)) else
               [color])]
    out_val = float(colors[0] if set_value is None else set_value)
    thr = float(threshold)

    # the precondition guard runs UNCONDITIONALLY: with an explicit
    # extent_tiles a multi-band/multi-zoom frame would reach expand()
    # (grouped by tile_x/tile_y only) and silently merge bands
    row = tiles.agg(F.min("tile_x"), F.min("tile_y"),
                    F.max("tile_x"), F.max("tile_y"),
                    F.countDistinct("zoom", "band")
                    .alias("nzb")).collect()[0]
    if row[0] is None:
        return tiles.limit(0)
    if int(row["nzb"]) > 1:
        raise ValueError(
            "clean_collar_tiles takes a single-zoom single-band "
            "frame (the fill groups by tile key); filter or "
            "select bands first")
    if extent_tiles is None:
        extent_tiles = tuple(int(v) for v in row[:4])
    x0, y0, x1, y1 = extent_tiles

    def init(batches: Iterator[pd.DataFrame]
             ) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {f.name: [] for f in _STATE_SCHEMA.fields}
            for _, r in b.iterrows():
                ts = int(r["tile_size"])
                arr = decode_tile(r["data"], str(r["dtype"]), ts) \
                    .astype(np.float64)
                near = np.zeros((ts, ts), dtype=bool)
                for c in colors:
                    near |= np.abs(arr - c) <= thr
                tx, ty = int(r["tile_x"]), int(r["tile_y"])
                seed = np.zeros((ts, ts), dtype=bool)
                if ty == y0:
                    seed[0, :] = True
                if ty == y1:
                    seed[-1, :] = True
                if tx == x0:
                    seed[:, 0] = True
                if tx == x1:
                    seed[:, -1] = True
                mask = _local_fill(near, seed)
                rows["zoom"].append(int(r["zoom"]))
                rows["tile_x"].append(tx)
                rows["tile_y"].append(ty)
                rows["band"].append(int(r["band"]))
                rows["data"].append(r["data"])
                rows["dtype"].append(str(r["dtype"]))
                rows["tile_size"].append(ts)
                rows["near"].append(
                    near.astype(np.uint8).tobytes())
                rows["mask"].append(
                    mask.astype(np.uint8).tobytes())
                rows["changed"].append(int(mask.any()))
            yield pd.DataFrame(rows)

    st = tiles.mapInPandas(init, _STATE_SCHEMA).localCheckpoint()

    def emit_strips(batches: Iterator[pd.DataFrame]
                    ) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {f.name: [] for f in _STRIP_SCHEMA.fields}
            for _, r in b.iterrows():
                ts = int(r["tile_size"])
                m = np.frombuffer(r["mask"], dtype=np.uint8) \
                    .reshape(ts, ts)
                tx, ty = int(r["tile_x"]), int(r["tile_y"])
                # my bottom edge seeds the TOP of the tile below...
                edges = ((0, 0, 1, m[-1, :]), (1, 0, -1, m[0, :]),
                         (2, 1, 0, m[:, -1]), (3, -1, 0, m[:, 0]))
                for side, dx, dy, strip in edges:
                    if not strip.any():
                        continue
                    ntx, nty = tx + dx, ty + dy
                    if not (x0 <= ntx <= x1 and y0 <= nty <= y1):
                        continue
                    rows["tile_x"].append(ntx)
                    rows["tile_y"].append(nty)
                    rows["side"].append(side)
                    rows["strip"].append(
                        np.ascontiguousarray(strip).tobytes())
            yield pd.DataFrame(rows)

    def expand(key, pdf: pd.DataFrame) -> pd.DataFrame:
        center = pdf[pdf["side"] < 0]
        if len(center) == 0:
            return pd.DataFrame(
                {f.name: [] for f in _STATE_SCHEMA.fields})
        c = center.iloc[0]
        ts = int(c["tile_size"])
        near = np.frombuffer(c["near"], dtype=np.uint8) \
            .reshape(ts, ts).astype(bool)
        mask = np.frombuffer(c["mask"], dtype=np.uint8) \
            .reshape(ts, ts).astype(bool)
        seed = np.zeros((ts, ts), dtype=bool)
        for _, r in pdf[pdf["side"] >= 0].iterrows():
            strip = np.frombuffer(r["strip"], dtype=np.uint8) \
                .astype(bool)
            side = int(r["side"])
            if side == 0:
                seed[0, :] |= strip
            elif side == 1:
                seed[-1, :] |= strip
            elif side == 2:
                seed[:, 0] |= strip
            else:
                seed[:, -1] |= strip
        fresh = seed & near & ~mask
        changed = 0
        if fresh.any():
            mask = _local_fill(near, mask | fresh)
            changed = 1
        return pd.DataFrame({
            "zoom": [int(c["zoom"])], "tile_x": [int(key[0])],
            "tile_y": [int(key[1])], "band": [int(c["band"])],
            "data": [c["data"]], "dtype": [str(c["dtype"])],
            "tile_size": [ts],
            "near": [near.astype(np.uint8).tobytes()],
            "mask": [mask.astype(np.uint8).tobytes()],
            "changed": [changed],
        })

    for _ in range(max_rounds):
        # only the FRONTIER (tiles that changed last round) can seed
        # anything new — unchanged tiles' strips were already seen
        strips = st.filter(F.col("changed") == 1) \
            .mapInPandas(emit_strips, _STRIP_SCHEMA)
        # center rows ride along with side = -1
        center = st.select(
            "tile_x", "tile_y", F.lit(-1).alias("side"),
            F.lit(None).cast("binary").alias("strip"),
            "zoom", "band", "data", "dtype", "tile_size",
            "near", "mask")
        strips_full = strips.select(
            "tile_x", "tile_y", "side", "strip",
            F.lit(0).alias("zoom"), F.lit(0).alias("band"),
            F.lit(None).cast("binary").alias("data"),
            F.lit("").alias("dtype"),
            F.lit(0).alias("tile_size"),
            F.lit(None).cast("binary").alias("near"),
            F.lit(None).cast("binary").alias("mask"))
        nxt = (center.unionByName(strips_full)
               .groupBy("tile_x", "tile_y")
               .applyInPandas(expand, _STATE_SCHEMA)
               .localCheckpoint())
        n_changed = nxt.agg(
            F.sum("changed").alias("c")).collect()[0]["c"]
        st = nxt
        if not n_changed:
            break

    def finish(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {f.name: [] for f in TILE_SCHEMA.fields}
            for _, r in b.iterrows():
                ts = int(r["tile_size"])
                dt = str(r["dtype"])
                arr = decode_tile(r["data"], dt, ts)
                mask = np.frombuffer(r["mask"], dtype=np.uint8) \
                    .reshape(ts, ts).astype(bool)
                out = np.where(mask,
                               np.asarray(out_val, arr.dtype), arr)
                rows["zoom"].append(int(r["zoom"]))
                rows["tile_x"].append(int(r["tile_x"]))
                rows["tile_y"].append(int(r["tile_y"]))
                rows["band"].append(int(r["band"]))
                rows["data"].append(
                    np.ascontiguousarray(out).tobytes())
                rows["dtype"].append(str(out.dtype))
                rows["tile_size"].append(ts)
            yield pd.DataFrame(rows)

    return st.mapInPandas(finish, TILE_SCHEMA)
