"""``gdal vector check-coverage`` — polygonal-coverage validity.

Reference: apps/gdalalg_vector_check_coverage.cpp, which calls
GEOS ``GEOSCoverageIsValid`` and emits one feature per input with
the invalid portion of its boundary.  A valid coverage requires
that every shared boundary is IDENTICAL in both polygons — same
vertices, opposite orientation; T-vertices, slivers, gaps and
overlaps all surface as boundary segments that fail to pair up.

Spark-first shape: the pairing rule is a pure groupBy —

  1. every polygon explodes into directed boundary edges (one
     Arrow kernel, no shuffle);
  2. edges key on their canonical endpoint pair (optionally snapped
     to a tolerance grid) and ONE hash shuffle counts, per key, how
     many times each direction appears;
  3. an edge is MATCHED when its key carries exactly one edge in
     each direction (the interior case).  Unmatched edges lying on
     the declared coverage extent frame are the legitimate outer
     boundary and are excluded when ``extent`` is given.

The result is a per-feature defect report: edge counts, unmatched
counts and unmatched length — nonzero means the feature
participates in a gap, overlap or vertex-mismatch.  maximum-gap-width
classification of the GEOS checker is declared out (it requires the
gap polygons themselves; the edge report localizes the same
defects).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StructField,
    StructType,
)

_EDGE_SCHEMA = StructType([
    StructField("fid", LongType()),
    StructField("ax", DoubleType()),
    StructField("ay", DoubleType()),
    StructField("bx", DoubleType()),
    StructField("by", DoubleType()),
    StructField("fwd", IntegerType()),     # 1 canonical, 0 reversed
    StructField("length", DoubleType()),
])

REPORT_SCHEMA = ["fid", "n_edges", "n_unmatched", "unmatched_len"]


def _edges_frame(df: DataFrame, geometry_col: str, fid_col: str,
                 snap: float) -> DataFrame:
    def kernel(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        from gdal_spark.geometry.wkb import parse_wkb

        for b in batches:
            rows = {f.name: [] for f in _EDGE_SCHEMA.fields}
            for fid, wkb in zip(b[fid_col], b[geometry_col]):
                if wkb is None:
                    continue
                g = parse_wkb(bytes(wkb))
                for ring in g.parts:
                    r = np.asarray(ring, dtype=np.float64)
                    if len(r) < 2:
                        continue
                    if not np.array_equal(r[0], r[-1]):
                        r = np.vstack([r, r[:1]])
                    a, bpt = r[:-1], r[1:]
                    ln = np.hypot(bpt[:, 0] - a[:, 0],
                                  bpt[:, 1] - a[:, 1])
                    if snap > 0.0:
                        qa = np.round(a / snap) * snap
                        qb = np.round(bpt / snap) * snap
                    else:
                        qa, qb = a, bpt
                    # canonical key: lexicographically smaller
                    # endpoint first; fwd records the original
                    # direction relative to the key
                    swapmask = (qa[:, 0] > qb[:, 0]) | (
                        (qa[:, 0] == qb[:, 0])
                        & (qa[:, 1] > qb[:, 1]))
                    lo = np.where(swapmask[:, None], qb, qa)
                    hi = np.where(swapmask[:, None], qa, qb)
                    n = len(a)
                    rows["fid"].extend([int(fid)] * n)
                    rows["ax"].extend(lo[:, 0].tolist())
                    rows["ay"].extend(lo[:, 1].tolist())
                    rows["bx"].extend(hi[:, 0].tolist())
                    rows["by"].extend(hi[:, 1].tolist())
                    rows["fwd"].extend(
                        (~swapmask).astype(np.int32).tolist())
                    rows["length"].extend(ln.tolist())
            yield pd.DataFrame(rows)

    return df.mapInPandas(kernel, _EDGE_SCHEMA)


def check_coverage(df: DataFrame, *, geometry_col: str = "geometry",
                   fid_col: str = "fid", snap: float = 0.0,
                   extent: tuple[float, float, float, float] | None
                   = None) -> DataFrame:
    """Per-feature coverage-defect report: (fid, n_edges,
    n_unmatched, unmatched_len).  Zero unmatched everywhere ==
    valid coverage (given ``extent``, the declared outer frame)."""
    edges = _edges_frame(df, geometry_col, fid_col, snap)

    key = ["ax", "ay", "bx", "by"]
    # per canonical segment: how many edges in each direction
    counts = (edges.groupBy(*key)
              .agg(F.sum("fwd").alias("n_fwd"),
                   F.count("*").alias("n_all")))
    # matched interior edge: exactly one forward + one reverse
    matched = (F.col("n_all") == 2) & (F.col("n_fwd") == 1)
    bad = counts.filter(~matched).select(*key,
                                         F.lit(1).alias("bad"))
    # The defect set is only small for near-valid coverages; for the
    # inputs this operator exists to DIAGNOSE (overlapping layers, or
    # any call without extent= where the whole outer perimeter is
    # unmatched) it is O(total boundary edges).  Bounded probe
    # (limit(n+1).count(), the spatial_join.bounded_layer_pdf
    # pattern): broadcast only when provably small (~250k rows of 4
    # doubles ≈ 10 MB, the autoBroadcastJoinThreshold analog), else
    # a plain shuffled join — never an unbounded driver collect.
    _BCAST_ROWS = 250_000
    n_bad = bad.limit(_BCAST_ROWS + 1).count()
    join_side = F.broadcast(bad) if n_bad <= _BCAST_ROWS else bad
    joined = edges.join(join_side, on=key, how="left")

    unmatched = F.coalesce(F.col("bad"), F.lit(0))
    if extent is not None:
        x0, y0, x1, y1 = (float(v) for v in extent)
        on_frame = (
            ((F.col("ax") == x0) & (F.col("bx") == x0))
            | ((F.col("ax") == x1) & (F.col("bx") == x1))
            | ((F.col("ay") == y0) & (F.col("by") == y0))
            | ((F.col("ay") == y1) & (F.col("by") == y1)))
        unmatched = F.when(on_frame, F.lit(0)).otherwise(unmatched)

    return (joined
            .withColumn("u", unmatched)
            .groupBy("fid")
            .agg(F.count("*").cast("long").alias("n_edges"),
                 F.sum("u").cast("long").alias("n_unmatched"),
                 F.sum(F.col("u") * F.col("length"))
                 .alias("unmatched_len")))


# ------------------------------------------------ simplify-coverage

_VERT_SCHEMA = StructType([
    StructField("fid", LongType()),
    StructField("ring", IntegerType()),
    StructField("pos", IntegerType()),
    StructField("x", DoubleType()),
    StructField("y", DoubleType()),
])

_ARC_SCHEMA = StructType([
    StructField("fid", LongType()),
    StructField("ring", IntegerType()),
    StructField("seq", IntegerType()),      # arc order within ring
    StructField("arc_key", LongType()),     # canonical content hash
    StructField("fwd", IntegerType()),      # 1: stored orientation
])

_ARCDEF_SCHEMA = StructType([
    StructField("arc_key", LongType()),
    StructField("n_refs", LongType()),
    StructField("verts", BinaryType()),
])


def _arc_hash(kb: bytes) -> int:
    """Deterministic 63-bit content hash — python's hash() is
    process-salted and would break arc pairing across executors."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(kb, digest_size=8).digest(), "big") >> 1


def _vw_simplify(pts: np.ndarray, tol: float, closed: bool
                 ) -> np.ndarray:
    """Visvalingam–Whyatt: drop interior vertices while the smallest
    effective triangle area < tol^2 / 2 (a base-tol height-tol
    triangle).  Endpoints always survive; closed rings keep >= 4
    points (3 distinct).  O(n^2) worst case on tiny arcs — arcs are
    short by construction."""
    thresh = 0.5 * tol * tol
    pts = pts.copy()
    keep = np.ones(len(pts), dtype=bool)

    def area(i, j, k):
        return 0.5 * abs(
            (pts[j, 0] - pts[i, 0]) * (pts[k, 1] - pts[i, 1])
            - (pts[k, 0] - pts[i, 0]) * (pts[j, 1] - pts[i, 1]))

    # interior vertices only: endpoints survive; for closed rings
    # the canonical start vertex is pinned too (deterministic on
    # both sides of a shared arc — the lexmin roll fixed the start)
    min_pts = 4 if closed else 2
    while keep.sum() > min_pts:
        idx = np.flatnonzero(keep)
        best_a, best_i = None, None
        for p in range(1, len(idx) - 1):
            i = idx[p]
            a = area(idx[p - 1], i, idx[p + 1])
            if best_a is None or a < best_a:
                best_a, best_i = a, i
        if best_a is None or best_a >= thresh:
            break
        keep[best_i] = False
    return pts[keep]


def simplify_coverage(df: DataFrame, tolerance: float, *,
                      geometry_col: str = "geometry",
                      fid_col: str = "fid",
                      preserve_boundary: bool = False,
                      snap: float = 0.0) -> DataFrame:
    """``gdal vector simplify-coverage``
    (apps/gdalalg_vector_simplify_coverage.cpp calling
    GEOSCoverageSimplifyVW): Visvalingam–Whyatt simplification that
    PRESERVES the coverage — every shared boundary arc is simplified
    exactly once, in canonical orientation, and both neighbors
    reassemble from the same simplified vertices, so no gap or
    overlap can open.  preserve_boundary keeps unshared (outer)
    arcs untouched, like the reference flag.

    Distributed shape: (1) vertex-degree pass finds NODES (junction
    points whose incident distinct-segment count != 2 or with >2
    touching features) — one groupBy over segment endpoints; (2)
    each ring walks its vertices, splitting at nodes, into ARCS
    keyed by a canonical content hash; (3) ONE groupBy per distinct
    arc simplifies it once; (4) rings reassemble by joining their
    arc sequence to the simplified arcs.  Every stage is a keyed
    shuffle over arcs/vertices — nothing driver-side, no broadcast
    of unbounded node sets.

    A valid coverage has BIT-IDENTICAL shared vertices (what
    check_coverage validates); inputs with float noise need
    ``snap`` — ulp-mismatched twins otherwise read as junction
    nodes and pin their vertices."""
    from gdal_spark.geometry.wkb import parse_wkb

    edges = _edges_frame(df, geometry_col, fid_col, snap)
    # node = endpoint whose incident distinct segments != 2 or
    # touching >2 features
    seg_id = F.hash("ax", "ay", "bx", "by")
    ends = (edges.select(seg_id.alias("seg"), "fid",
                         F.col("ax").alias("x"),
                         F.col("ay").alias("y"))
            .unionByName(
                edges.select(seg_id.alias("seg"), "fid",
                             F.col("bx").alias("x"),
                             F.col("by").alias("y"))))
    nodes = (ends.groupBy("x", "y")
             .agg(F.countDistinct("seg").alias("ns"),
                  F.countDistinct("fid").alias("nf"))
             .filter((F.col("ns") != 2) | (F.col("nf") > 2))
             .select("x", "y", F.lit(1).alias("is_node")))

    def verts(batches: Iterator[pd.DataFrame]
              ) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {f.name: [] for f in _VERT_SCHEMA.fields}
            for fid, wkb in zip(b[fid_col], b[geometry_col]):
                g = parse_wkb(bytes(wkb))
                if g.kind == 6:      # MULTIPOLYGON
                    raise ValueError(
                        "simplify_coverage takes single POLYGON "
                        "features (explode collections first)")
                for ri, ring in enumerate(g.parts):
                    r = np.asarray(ring, dtype=np.float64)
                    if snap > 0.0:
                        r = np.round(r / snap) * snap
                    n = len(r)
                    rows["fid"].extend([int(fid)] * n)
                    rows["ring"].extend([ri] * n)
                    rows["pos"].extend(range(n))
                    rows["x"].extend(r[:, 0].tolist())
                    rows["y"].extend(r[:, 1].tolist())
            yield pd.DataFrame(rows)

    vframe = (df.mapInPandas(verts, _VERT_SCHEMA)
              .join(nodes, ["x", "y"], "left"))

    def split_arcs(key, pdf: pd.DataFrame):
        pdf = pdf.sort_values("pos")
        xs = pdf["x"].to_numpy()
        ys = pdf["y"].to_numpy()
        isn = pdf["is_node"].fillna(0).to_numpy().astype(bool)
        n = len(pdf)                      # ring closed: last==first
        arc_rows = {f.name: [] for f in _ARC_SCHEMA.fields}
        def_rows = {"arc_key": [], "verts": []}

        node_idx = np.flatnonzero(isn[:-1])
        if len(node_idx) == 0:
            # island ring: one closed arc, canonical start = lexmin
            pts = np.column_stack([xs[:-1], ys[:-1]])
            start = int(np.lexsort((pts[:, 1], pts[:, 0]))[0])
            rolled = np.roll(pts, -start, axis=0)
            rolled = np.vstack([rolled, rolled[:1]])
            kb = rolled.tobytes()
            akey = _arc_hash(kb)
            arc_rows["fid"].append(int(key[0]))
            arc_rows["ring"].append(int(key[1]))
            arc_rows["seq"].append(0)
            arc_rows["arc_key"].append(int(akey))
            arc_rows["fwd"].append(1)
            def_rows["arc_key"].append(int(akey))
            def_rows["verts"].append(kb)
        else:
            # rotate so the ring starts at a node
            order = np.concatenate([
                np.arange(node_idx[0], n - 1),
                np.arange(0, node_idx[0])])
            rx, ry, rn = xs[order], ys[order], isn[order]
            # close the walk back to the first node
            rx = np.append(rx, rx[0])
            ry = np.append(ry, ry[0])
            rn = np.append(rn, True)
            starts = np.flatnonzero(rn[:-1])
            seq = 0
            for si in range(len(starts)):
                a0 = int(starts[si])
                a1 = int(starts[si + 1]) if si + 1 < len(starts) \
                    else len(rx) - 1
                pts = np.column_stack([rx[a0:a1 + 1],
                                       ry[a0:a1 + 1]])
                if len(pts) < 2:
                    continue
                # canonical orientation: smaller endpoint first
                e0, e1 = (pts[0, 0], pts[0, 1]), \
                    (pts[-1, 0], pts[-1, 1])
                fwd = 1
                cpts = pts
                if (e1, tuple(pts[-2])) < (e0, tuple(pts[1])):
                    cpts = pts[::-1]
                    fwd = 0
                kb = np.ascontiguousarray(cpts).tobytes()
                akey = _arc_hash(kb)
                arc_rows["fid"].append(int(key[0]))
                arc_rows["ring"].append(int(key[1]))
                arc_rows["seq"].append(seq)
                arc_rows["arc_key"].append(int(akey))
                arc_rows["fwd"].append(fwd)
                def_rows["arc_key"].append(int(akey))
                def_rows["verts"].append(kb)
                seq += 1
        return (pd.DataFrame(arc_rows),
                pd.DataFrame({"arc_key": def_rows["arc_key"],
                              "n_refs": [1] * len(def_rows["arc_key"]),
                              "verts": def_rows["verts"]}))

    # one pass emits both the per-ring arc sequence and the arc
    # definitions; applyInPandas can't return two frames, so run the
    # walk twice over the (small) vertex frame — columns prune each
    def arcs_only(key, pdf):
        return split_arcs(key, pdf)[0]

    def defs_only(key, pdf):
        return split_arcs(key, pdf)[1]

    ring_groups = vframe.groupBy("fid", "ring")
    arc_seq = ring_groups.applyInPandas(arcs_only, _ARC_SCHEMA)
    arc_defs = (ring_groups.applyInPandas(defs_only, _ARCDEF_SCHEMA)
                .groupBy("arc_key")
                .agg(F.sum("n_refs").alias("n_refs"),
                     F.first("verts").alias("verts")))

    tol = float(tolerance)
    pb = bool(preserve_boundary)

    simp_schema = StructType([
        StructField("arc_key", LongType()),
        _ARCDEF_SCHEMA["verts"],
    ])

    def simplify(batches: Iterator[pd.DataFrame]
                 ) -> Iterator[pd.DataFrame]:
        for b in batches:
            keys, outs = [], []
            for _, r in b.iterrows():
                pts = np.frombuffer(r["verts"], dtype=np.float64) \
                    .reshape(-1, 2)
                closed = bool(np.array_equal(pts[0], pts[-1]))
                if pb and int(r["n_refs"]) < 2:
                    out = pts          # outer boundary preserved
                else:
                    out = _vw_simplify(pts, tol, closed)
                keys.append(int(r["arc_key"]))
                outs.append(np.ascontiguousarray(out).tobytes())
            yield pd.DataFrame({"arc_key": keys, "verts": outs})

    simplified = arc_defs.mapInPandas(simplify, simp_schema)

    out_schema = StructType([
        df.schema[fid_col],
        StructField("geometry",
                    df.schema[geometry_col].dataType),
    ])

    def rebuild(key, pdf: pd.DataFrame) -> pd.DataFrame:
        from gdal_spark.geometry.wkb import (
            multipolygon_wkb, polygon_wkb,
        )

        rings = {}
        for ring_id, grp in pdf.groupby("ring"):
            grp = grp.sort_values("seq")
            coords = []
            for _, r in grp.iterrows():
                pts = np.frombuffer(r["verts"], dtype=np.float64) \
                    .reshape(-1, 2)
                if not int(r["fwd"]):
                    pts = pts[::-1]
                if coords:
                    pts = pts[1:]      # arcs share endpoints
                coords.append(pts)
            ring = np.vstack(coords)
            if not np.array_equal(ring[0], ring[-1]):
                ring = np.vstack([ring, ring[:1]])
            rings[int(ring_id)] = ring
        ordered = [rings[k] for k in sorted(rings)]
        wkb = polygon_wkb(ordered) if len(ordered) else None
        return pd.DataFrame({fid_col: [int(key[0])],
                             "geometry": [wkb]})

    return (arc_seq.join(simplified, "arc_key")
            .groupBy("fid")
            .applyInPandas(rebuild, out_schema))
