"""Two-stage spatial join: broadcast cell prefilter + exact PIP.

Re-creates the reference's spatial filter/join semantics
(OGRLayer::FilterGeometry, ogr/ogrsf_frmts/generic/ogrlayer.cpp:4004-4076):

  stage 1 — envelope/bbox reject: here a *broadcast equi-join* of the
            point's quadtree cell against a precomputed cell->polygon
            cover of each polygon's bbox (the distributed rendering
            of the bbox pretest; cells play the role GDAL gives its
            Hilbert/R-tree indexes, packedrtree.cpp:73-132)
  stage 2 — rectangle fast-accept when the polygon IS a rectangle
            (ogrlayer.cpp:3922 rectangle detection) — pure JVM-side
            range predicates, no Python at all
  stage 3 — exact vectorized ray-cast PIP over packed coordinate
            arrays (ogrlinearring.cpp:452-521 semantics) inside an
            Arrow-batched mapInPandas kernel.

Scale notes (100 TB design point):
* the polygon layer (admin boundaries etc.) is broadcast — the big
  pages table is never shuffled for the join itself;
* stage-1 join fan-out is bounded by cells-per-polygon; resolution
  trades candidate selectivity vs index size;
* hot cells (Zipf page skew) do not skew this join because the
  build side is the small one; downstream groupBys use salted
  two-phase aggregation (gdal_spark.operators.tiling.salted_agg).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from gdal_spark.functions import geo
from gdal_spark.geometry.pip import points_in_rings
from gdal_spark.geometry.wkb import parse_wkb


def _is_axis_rect(g) -> bool:
    """Rectangle detection (the fast-accept path of
    ogrlayer.cpp:3922): single 5-point ring, axis-aligned edges."""
    rings = g.rings()
    if len(rings) != 1 or len(rings[0]) != 5:
        return False
    r = rings[0]
    for i in range(4):
        dx = r[i + 1, 0] - r[i, 0]
        dy = r[i + 1, 1] - r[i, 1]
        if dx != 0.0 and dy != 0.0:
            return False
    return True


def _inv_merc_lon(mx: np.ndarray) -> np.ndarray:
    return mx / geo.ORIGIN * 180.0


def _inv_merc_lat(my: np.ndarray) -> np.ndarray:
    return np.degrees(2.0 * np.arctan(np.exp(my / geo.ORIGIN * np.pi))
                      - np.pi / 2.0)


def _cells_full_in(g, txs: np.ndarray, tys: np.ndarray, res: int
                   ) -> np.ndarray:
    """Which cover cells are FULLY INSIDE the polygon: the cell's
    lon/lat rect (expanded by the 2e-3-span assignment epsilon) meets
    no ring-edge bbox AND its center is inside.  Conservative (a near
    miss just stays on the exact-kernel path), never wrong."""
    span = geo.tile_span(res)
    eps = 2e-3 * span
    mx0 = (txs - 0.0) * span - geo.ORIGIN - eps
    mx1 = (txs + 1.0) * span - geo.ORIGIN + eps
    my1 = geo.ORIGIN - tys * span + eps
    my0 = geo.ORIGIN - (tys + 1.0) * span - eps
    lon0, lon1 = _inv_merc_lon(mx0), _inv_merc_lon(mx1)
    lat0, lat1 = _inv_merc_lat(my0), _inv_merc_lat(my1)
    rings = g.rings()
    # ring-edge bboxes, all rings concatenated
    ex0 = np.concatenate([np.minimum(r[:-1, 0], r[1:, 0]) for r in rings])
    ex1 = np.concatenate([np.maximum(r[:-1, 0], r[1:, 0]) for r in rings])
    ey0 = np.concatenate([np.minimum(r[:-1, 1], r[1:, 1]) for r in rings])
    ey1 = np.concatenate([np.maximum(r[:-1, 1], r[1:, 1]) for r in rings])
    touches = (
        (lon0[:, None] <= ex1[None, :]) & (ex0[None, :] <= lon1[:, None])
        & (lat0[:, None] <= ey1[None, :]) & (ey0[None, :] <= lat1[:, None])
    ).any(axis=1)
    cx = (lon0 + lon1) / 2.0
    cy = (lat0 + lat1) / 2.0
    inside = points_in_rings(cx, cy, list(rings))
    return (~touches) & inside


def polygon_cell_cover_pdf(polys_pdf: pd.DataFrame, res: int,
                           fid_col: str = "fid",
                           geom_col: str = "geometry") -> pd.DataFrame:
    """(cell, fid, bbox..., is_rect, full_in) cover of each polygon's
    bbox at resolution *res*.

    Uses the same GetTileIndices math as point->cell assignment
    (apps/gdalalg_raster_tile.cpp:457-480), so floor monotonicity
    guarantees the cover is a superset of matching cells.  The bbox
    columns enable the JVM-side envelope reject; ``is_rect`` marks
    polygons whose bbox IS the geometry (fast accept,
    ogrlayer.cpp:3922); ``full_in`` marks INTERIOR cells — every point
    assigned there is inside regardless of ray-cast edge rules, so
    those rows accept JVM-side and only boundary cells pay the exact
    Python kernel (the interior/boundary split of a prepared-geometry
    containment index).
    """
    n = 1 << res
    span = geo.tile_span(res)
    rows = {"cell": [], "fid": [], "minx": [], "miny": [],
            "maxx": [], "maxy": [], "is_rect": [], "full_in": []}
    for fid, wkb in zip(polys_pdf[fid_col], polys_pdf[geom_col]):
        g = parse_wkb(bytes(wkb))
        minx, miny, maxx, maxy = g.bbox()
        rect = _is_axis_rect(g)
        mx0, mx1 = _merc_x(minx), _merc_x(maxx)
        my0, my1 = _merc_y(miny), _merc_y(maxy)
        tx0 = int(np.clip(np.floor((mx0 + geo.ORIGIN) / span + 1e-3), 0, n - 1))
        tx1 = int(np.clip(np.floor((mx1 + geo.ORIGIN) / span + 1e-3), 0, n - 1))
        ty0 = int(np.clip(np.floor((geo.ORIGIN - my1) / span + 1e-3), 0, n - 1))
        ty1 = int(np.clip(np.floor((geo.ORIGIN - my0) / span + 1e-3), 0, n - 1))
        txs, tys = np.meshgrid(np.arange(tx0, tx1 + 1),
                               np.arange(ty0, ty1 + 1))
        txs = txs.ravel()
        tys = tys.ravel()
        full = (np.zeros(len(txs), dtype=bool) if rect
                else _cells_full_in(g, txs.astype(np.float64),
                                    tys.astype(np.float64), res))
        rows["cell"].extend((txs * n + tys).tolist())
        rows["fid"].extend([int(fid)] * len(txs))
        rows["minx"].extend([minx] * len(txs))
        rows["miny"].extend([miny] * len(txs))
        rows["maxx"].extend([maxx] * len(txs))
        rows["maxy"].extend([maxy] * len(txs))
        rows["is_rect"].extend([rect] * len(txs))
        rows["full_in"].extend(full.tolist())
    return pd.DataFrame({
        "cell": np.array(rows["cell"], dtype=np.int64),
        "fid": np.array(rows["fid"], dtype=np.int64),
        "minx": rows["minx"], "miny": rows["miny"],
        "maxx": rows["maxx"], "maxy": rows["maxy"],
        "is_rect": rows["is_rect"],
        "full_in": np.array(rows["full_in"], dtype=bool),
    })


def bounded_layer_pdf(df: DataFrame, row_bound: int,
                      byte_bound: int, geom_col: str = "geometry"):
    """Collect a method layer only when it is provably small in ROWS
    AND BYTES; returns None when the caller must stay distributed.

    The size probe runs JVM-side on limit(row_bound+1) — count plus
    sum(length(geom)) — so neither an unbounded row count NOR
    few-but-huge geometries (50k multipolygons at 1 MB WKB = 50 GB)
    ever reach the driver.  The geometry column dominates layer size,
    so its byte sum is the estimate — the analog of
    autoBroadcastJoinThreshold's byte gate (a row gate alone has no
    such analog)."""
    row = (df.limit(row_bound + 1)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.length(F.col(geom_col).cast("binary")))
                .alias("nbytes"))
           .collect()[0])
    if row["n"] > row_bound or (row["nbytes"] or 0) > byte_bound:
        return None
    return df.toPandas()


def _merc_x(lon: float) -> float:
    return lon * geo.ORIGIN / 180.0


def _merc_y(lat: float) -> float:
    lat = min(max(lat, -geo.MERC_LAT_MAX), geo.MERC_LAT_MAX)
    return float(np.log(np.tan((90.0 + lat) * np.pi / 360.0)) / np.pi
                 * geo.ORIGIN)


def spatial_join_points_in_polygons(
    spark: SparkSession,
    points: DataFrame,
    polys_pdf: pd.DataFrame,
    res: int = 7,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """points ⋈ polygons on containment -> points columns + ``fid``.

    ``polys_pdf`` is the (small, broadcastable) polygon layer with
    fid + geometry(WKB) columns.
    """
    cover = spark.createDataFrame(polygon_cell_cover_pdf(polys_pdf, res))
    pts = points.withColumn("cell", geo.cell_id(lon, lat, res))
    # stage 1 (bbox reject) entirely JVM-side: cell equi-join + the
    # envelope predicate (ogrlayer.cpp:4004 envelope pretest)
    # envelope pretest must be a SUPERSET of ray-cast-inside: a point
    # exactly on the leftmost/bottom edge IS strictly-inside by the
    # crossing rule (the 0-distance crossing is not counted, the far
    # one is), so the reject uses inclusive bounds
    in_bbox = (
        (F.col(lon) >= F.col("minx")) & (F.col(lon) <= F.col("maxx"))
        & (F.col(lat) >= F.col("miny")) & (F.col(lat) <= F.col("maxy"))
    )
    cand = pts.join(F.broadcast(cover), "cell", "inner").filter(in_bbox)
    out_cols = [c for c in points.columns if c != "cell"] + ["fid"]
    # stage 2 (rectangle fast accept, ogrlayer.cpp:3922): bbox IS the
    # geometry -> accepted without touching Python.  Ray casting a
    # rectangle admits exactly [x0, x1) x [y0, y1) (left/bottom edges
    # in, right/top out) — the JVM predicate replicates that
    rect_in = (
        (F.col(lon) >= F.col("minx")) & (F.col(lon) < F.col("maxx"))
        & (F.col(lat) >= F.col("miny")) & (F.col(lat) < F.col("maxy"))
    )
    # stage 2b: interior-cell fast accept — the candidate's cell is
    # wholly inside the polygon, no exact test needed (JVM-only).
    # Rect accepts and interior-cell accepts are DISJOINT conditions
    # on the same candidate frame, so one filter covers both: a
    # branch per condition would re-evaluate the whole scan+join
    # subtree per branch (no exchange below the broadcast join means
    # nothing is reused across union arms)
    jvm_hits = cand.filter(
        (F.col("is_rect") & rect_in)
        | (~F.col("is_rect") & F.col("full_in"))
    ).select(*out_cols)
    # stage 3: exact ray-cast kernel for boundary cells only
    nonrect = cand.filter(~F.col("is_rect") & ~F.col("full_in")) \
        .select(*out_cols)

    rings_by_fid = {
        int(fid): [np.ascontiguousarray(r) for r in
                   parse_wkb(bytes(wkb)).rings()]
        for fid, wkb in zip(polys_pdf["fid"], polys_pdf["geometry"])
        if not _is_axis_rect(parse_wkb(bytes(wkb)))
    }
    if not rings_by_fid:
        return jvm_hits
    bc = spark.sparkContext.broadcast(rings_by_fid)
    schema = nonrect.schema

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        polys = bc.value
        for b in batches:
            if len(b) == 0:
                continue
            keep = np.zeros(len(b), dtype=bool)
            px = b[lon].to_numpy(dtype=np.float64)
            py = b[lat].to_numpy(dtype=np.float64)
            for fid, idx in b.groupby("fid").indices.items():
                rings = polys.get(int(fid))
                if rings:
                    keep[idx] = points_in_rings(px[idx], py[idx], rings)
            out = b[keep]
            if len(out):
                yield out

    return jvm_hits.unionByName(nonrect.mapInPandas(exact, schema))


def spatial_join_big_polygons(
    spark: SparkSession,
    points: DataFrame,
    polys: DataFrame,
    res: int = 7,
    lon: str = "lon",
    lat: str = "lat",
    fid_col: str = "fid",
    geom_col: str = "geometry",
) -> DataFrame:
    """Two-stage spatial join for polygon layers TOO BIG to broadcast.

    The distributed rendering of the same FilterGeometry plan:

      stage 1 — the polygon layer is exploded into its cell cover
        (an Arrow kernel computing the same bbox/tile math as
        polygon_cell_cover_pdf, distributed), carrying bbox columns
        and the WKB; the candidate join is a plain shuffle equi-join
        on cell — Catalyst/AQE pick the strategy and split skewed
        cells;
      stage 2 — JVM envelope reject + rectangle fast accept;
      stage 3 — exact PIP per (cell) cogroup: each task sees its
        cell's points and its cell's polygons, so no polygon index
        needs to fit in memory anywhere.

    Output: points columns + fid (same rows as the broadcast path).
    """
    n = 1 << res
    span = geo.tile_span(res)

    from pyspark.sql.types import (
        BinaryType, BooleanType, DoubleType, LongType, StructField,
        StructType,
    )

    cover_schema = StructType([
        StructField("cell", LongType()), StructField(fid_col, LongType()),
        StructField("minx", DoubleType()), StructField("miny", DoubleType()),
        StructField("maxx", DoubleType()), StructField("maxy", DoubleType()),
        StructField("is_rect", BooleanType()),
        StructField("full_in", BooleanType()),
        StructField(geom_col, BinaryType()),
    ])

    def cover_kernel(batches: Iterator[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {f.name: [] for f in cover_schema.fields}
            for fid, wkb in zip(b[fid_col], b[geom_col]):
                g = parse_wkb(bytes(wkb))
                minx, miny, maxx, maxy = g.bbox()
                rect = _is_axis_rect(g)
                mx0, mx1 = _merc_x(minx), _merc_x(maxx)
                my0, my1 = _merc_y(miny), _merc_y(maxy)
                tx0 = int(np.clip(np.floor((mx0 + geo.ORIGIN) / span
                                           + 1e-3), 0, n - 1))
                tx1 = int(np.clip(np.floor((mx1 + geo.ORIGIN) / span
                                           + 1e-3), 0, n - 1))
                ty0 = int(np.clip(np.floor((geo.ORIGIN - my1) / span
                                           + 1e-3), 0, n - 1))
                ty1 = int(np.clip(np.floor((geo.ORIGIN - my0) / span
                                           + 1e-3), 0, n - 1))
                txs, tys = np.meshgrid(np.arange(tx0, tx1 + 1),
                                       np.arange(ty0, ty1 + 1))
                txs = txs.ravel()
                tys = tys.ravel()
                full = (np.zeros(len(txs), dtype=bool) if rect
                        else _cells_full_in(g, txs.astype(np.float64),
                                            tys.astype(np.float64),
                                            res))
                rows["cell"].extend((txs * n + tys).tolist())
                rows[fid_col].extend([int(fid)] * len(txs))
                rows["minx"].extend([minx] * len(txs))
                rows["miny"].extend([miny] * len(txs))
                rows["maxx"].extend([maxx] * len(txs))
                rows["maxy"].extend([maxy] * len(txs))
                rows["is_rect"].extend([rect] * len(txs))
                rows["full_in"].extend(full.tolist())
                rows[geom_col].extend([bytes(wkb)] * len(txs))
            if rows["cell"]:
                yield pd.DataFrame(rows)

    cover = polys.select(fid_col, geom_col).mapInPandas(
        cover_kernel, cover_schema)

    pts = points.withColumn("cell", geo.cell_id(lon, lat, res))
    # envelope pretest must be a SUPERSET of ray-cast-inside: a point
    # exactly on the leftmost/bottom edge IS strictly-inside by the
    # crossing rule (the 0-distance crossing is not counted, the far
    # one is), so the reject uses inclusive bounds
    in_bbox = (
        (F.col(lon) >= F.col("minx")) & (F.col(lon) <= F.col("maxx"))
        & (F.col(lat) >= F.col("miny")) & (F.col(lat) <= F.col("maxy"))
    )
    cand = (
        pts.join(cover, "cell", "inner")
        .filter(in_bbox)
    )
    out_cols = [c for c in points.columns] + [fid_col]
    rect_in = (
        (F.col(lon) >= F.col("minx")) & (F.col(lon) < F.col("maxx"))
        & (F.col(lat) >= F.col("miny")) & (F.col(lat) < F.col("maxy"))
    )
    # disjoint JVM accepts merged into ONE filter (see the broadcast
    # path: a branch per condition re-evaluates the candidate join)
    jvm_hits = cand.filter(
        (F.col("is_rect") & rect_in)
        | (~F.col("is_rect") & F.col("full_in"))
    ).select(*out_cols)
    nonrect = cand.filter(~F.col("is_rect") & ~F.col("full_in")) \
        .select(*(out_cols + [geom_col]))
    schema = nonrect.drop(geom_col).schema

    def exact(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ring_cache: dict[int, list[np.ndarray]] = {}
        for b in batches:
            if len(b) == 0:
                continue
            keep = np.zeros(len(b), dtype=bool)
            px = b[lon].to_numpy(dtype=np.float64)
            py = b[lat].to_numpy(dtype=np.float64)
            for fid, idx in b.groupby(fid_col).indices.items():
                rings = ring_cache.get(int(fid))
                if rings is None:
                    rings = parse_wkb(
                        bytes(b[geom_col].iloc[idx[0]])).rings()
                    if len(ring_cache) < 4096:
                        ring_cache[int(fid)] = rings
                keep[idx] = points_in_rings(px[idx], py[idx], rings)
            out = b[keep].drop(columns=[geom_col])
            if len(out):
                yield out

    return jvm_hits.unionByName(nonrect.mapInPandas(exact, schema))


def brute_force_join_pdf(points_pdf: pd.DataFrame, polys_pdf: pd.DataFrame,
                         lon: str = "lon", lat: str = "lat") -> pd.DataFrame:
    """Driver-side oracle: every point x every polygon, exact PIP."""
    px = points_pdf[lon].to_numpy(dtype=np.float64)
    py = points_pdf[lat].to_numpy(dtype=np.float64)
    out = []
    for fid, wkb in zip(polys_pdf["fid"], polys_pdf["geometry"]):
        inside = points_in_rings(px, py, parse_wkb(bytes(wkb)).rings())
        sub = points_pdf[inside].copy()
        sub["fid"] = int(fid)
        out.append(sub)
    return (pd.concat(out, ignore_index=True) if out
            else points_pdf.iloc[:0].assign(fid=np.int64(0)))


def _geom_cell_cover(df: DataFrame, res: int, fid_col: str,
                     geom_col: str, out_fid: str) -> DataFrame:
    """Distributed bbox cell cover of a geometry layer: one row per
    (cell of the feature's bbox) carrying bbox columns + the WKB —
    the exploded build input of the polygon x polygon join (the
    distributed rendering of the ogrlayer.cpp:4004 envelope pretest,
    same GetTileIndices math as polygon_cell_cover_pdf)."""
    from pyspark.sql.types import (
        BinaryType, DoubleType, LongType, StructField, StructType,
    )

    n = 1 << res
    span = geo.tile_span(res)
    sfx = out_fid
    schema = StructType([
        StructField("cell", LongType()), StructField(sfx, LongType()),
        StructField(f"minx_{sfx}", DoubleType()),
        StructField(f"miny_{sfx}", DoubleType()),
        StructField(f"maxx_{sfx}", DoubleType()),
        StructField(f"maxy_{sfx}", DoubleType()),
        StructField(f"geom_{sfx}", BinaryType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {f.name: [] for f in schema.fields}
            for fid, wkb in zip(b[fid_col], b[geom_col]):
                g = parse_wkb(bytes(wkb))
                minx, miny, maxx, maxy = g.bbox()
                mx0, mx1 = _merc_x(minx), _merc_x(maxx)
                my0, my1 = _merc_y(miny), _merc_y(maxy)
                tx0 = int(np.clip(np.floor((mx0 + geo.ORIGIN) / span
                                           + 1e-3), 0, n - 1))
                tx1 = int(np.clip(np.floor((mx1 + geo.ORIGIN) / span
                                           + 1e-3), 0, n - 1))
                ty0 = int(np.clip(np.floor((geo.ORIGIN - my1) / span
                                           + 1e-3), 0, n - 1))
                ty1 = int(np.clip(np.floor((geo.ORIGIN - my0) / span
                                           + 1e-3), 0, n - 1))
                txs, tys = np.meshgrid(np.arange(tx0, tx1 + 1),
                                       np.arange(ty0, ty1 + 1))
                txs = txs.ravel()
                tys = tys.ravel()
                k = len(txs)
                rows["cell"].extend((txs * n + tys).tolist())
                rows[sfx].extend([int(fid)] * k)
                rows[f"minx_{sfx}"].extend([minx] * k)
                rows[f"miny_{sfx}"].extend([miny] * k)
                rows[f"maxx_{sfx}"].extend([maxx] * k)
                rows[f"maxy_{sfx}"].extend([maxy] * k)
                rows[f"geom_{sfx}"].extend([bytes(wkb)] * k)
            if rows["cell"]:
                yield pd.DataFrame(rows)

    return df.select(fid_col, geom_col).mapInPandas(kernel, schema)


def spatial_join_polygons_intersect_big(
    spark: SparkSession,
    input_df: DataFrame,
    method_df: DataFrame,
    geom_col: str = "geometry",
    method_geom_col: str | None = None,
    fid_col: str = "fid",
    res: int = 6,
) -> DataFrame:
    """polygon layer ⋈ polygon layer on ST_Intersects, NEITHER side
    collected to the driver (the fallback when the method layer
    exceeds the broadcast bound — ogrlayer.cpp:4004 works for any
    pair of layers).

      stage 1 — each layer's features explode into the cell cover of
        their bbox (a distributed mapInPandas, then a plain shuffle
        equi-join on cell — Catalyst/AQE pick the strategy, split
        skewed cells);
      stage 2 — JVM bbox-overlap reject + CORNER-CELL dedup: a
        candidate pair survives only in the cell containing the
        top-left corner of the bbox intersection.  Both covers
        enumerate complete cell rectangles of their bboxes and the
        corner lies inside both, so by floor monotonicity exactly one
        copy of each pair survives — no distinct() shuffle;
      stage 3 — exact boundary-cross/containment kernel per pair,
        then a join back to the input layer's columns.

    Output: input columns + ``method_fid`` (same rows as the
    broadcast path ``spatial_join_polygons_intersect``).
    """
    from gdal_spark.geometry.overlay import geoms_intersect
    from pyspark.sql.types import LongType, StructField, StructType

    a = _geom_cell_cover(input_df, res, fid_col, geom_col, "fid_a")
    b = _geom_cell_cover(method_df, res, fid_col,
                         method_geom_col or geom_col, "fid_b")
    cand = (
        a.join(b, "cell")
        .filter(
            (F.col("minx_fid_a") <= F.col("maxx_fid_b"))
            & (F.col("minx_fid_b") <= F.col("maxx_fid_a"))
            & (F.col("miny_fid_a") <= F.col("maxy_fid_b"))
            & (F.col("miny_fid_b") <= F.col("maxy_fid_a"))
        )
        .withColumn("_cx", F.greatest("minx_fid_a", "minx_fid_b"))
        .withColumn("_cy", F.least("maxy_fid_a", "maxy_fid_b"))
        .filter(F.col("cell") == geo.cell_id("_cx", "_cy", res))
        .select("fid_a", "fid_b", "geom_fid_a", "geom_fid_b")
    )
    pair_schema = StructType([StructField(fid_col, LongType()),
                              StructField("method_fid", LongType())])

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for bt in batches:
            if len(bt) == 0:
                continue
            fids, mfids = [], []
            for fa, fb, ga, gb in zip(bt["fid_a"], bt["fid_b"],
                                      bt["geom_fid_a"], bt["geom_fid_b"]):
                if geoms_intersect(parse_wkb(bytes(ga)),
                                   parse_wkb(bytes(gb))):
                    fids.append(int(fa))
                    mfids.append(int(fb))
            if fids:
                yield pd.DataFrame({
                    fid_col: np.array(fids, dtype=np.int64),
                    "method_fid": np.array(mfids, dtype=np.int64),
                })

    pairs = cand.mapInPandas(verify, pair_schema)
    return input_df.join(pairs, fid_col)


def spatial_join_polygons_intersect(
    spark: SparkSession,
    input_df: DataFrame,
    polys_pdf: pd.DataFrame,
    geom_col: str = "geometry",
    fid_col: str = "fid",
) -> DataFrame:
    """polygon layer ⋈ polygon layer on ST_Intersects.

    The general FilterGeometry pair the point-in-polygon join cannot
    express (ogrlayer.cpp:4004-4076 handles any geometry pair): the
    small method layer is broadcast with bboxes; the kernel runs the
    JVM-free but Arrow-batched exact test — boundary cross (vectorized
    segment orientation) or containment either way.

    Output: input columns + ``method_fid`` (one row per intersecting
    pair, like SetSpatialFilter + a join on the method fid).

    Accepts ANY geometry kinds on either side (point/line/polygon and
    their multis) — the exact predicate dispatches per dimension pair
    (geoms_intersect), matching FilterGeometry's generality.
    """
    from gdal_spark.geometry.overlay import geoms_intersect

    idx = []
    for _, r in polys_pdf.iterrows():
        g = parse_wkb(bytes(r[geom_col]))
        idx.append((int(r[fid_col]), g, g.bbox()))
    bc = spark.sparkContext.broadcast(idx)
    out_schema = input_df.withColumn(
        "method_fid", F.lit(0).cast("long")).schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        meth = bc.value
        for b in batches:
            if len(b) == 0:
                continue
            out_rows = []
            mfids = []
            for i, wkb in enumerate(b[geom_col]):
                g = parse_wkb(bytes(wkb))
                gx0, gy0, gx1, gy1 = g.bbox()
                for mfid, mg, (mx0, my0, mx1, my1) in meth:
                    if not (gx0 <= mx1 and mx0 <= gx1
                            and gy0 <= my1 and my0 <= gy1):
                        continue
                    if geoms_intersect(g, mg):
                        out_rows.append(i)
                        mfids.append(mfid)
            if out_rows:
                out = b.iloc[out_rows].copy()
                out["method_fid"] = np.array(mfids, dtype=np.int64)
                yield out

    return input_df.mapInPandas(kernel, out_schema)
