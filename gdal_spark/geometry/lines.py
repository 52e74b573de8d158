"""Line x polygon geometry kernels — pure numpy, no GEOS.

Re-creates the reference's line-geometry handling in spatial filters
and layer algebra: FilterGeometry accepts any geometry pair
(ogr/ogrsf_frmts/generic/ogrlayer.cpp:4004-4076), and the layer ops
keep lower-dimension results behind KEEP_LOWER_DIMENSION_GEOMETRIES
(:5385 option block).  GDAL delegates the actual predicates/overlays
to GEOS; here:

* ``clip_line_to_rings``  — Intersection/Clip of a polyline with a
  polygon (with holes): every segment is split at its crossings with
  all ring edges and the sub-segments whose midpoint is inside (ray
  cast, even-odd across rings) are kept.  Length-preserving: kept +
  erased partition the line exactly.
* ``erase_line_from_rings`` — the complement selection.
* ``line_intersects_rings`` / ``lines_cross`` — ST_Intersects for
  line x polygon and line x line.

Boundary semantics: a sub-segment collinear WITH a polygon edge is
classified by the ray-cast parity of its midpoint (the strictly-
inside rule of ogrlinearring.cpp:452) — on-boundary runs land on one
deterministic side rather than raising, mirroring GEOS's dimension-
collapse handling.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geometry.pip import points_in_rings

__all__ = [
    "clip_line_to_rings", "erase_line_from_rings",
    "line_intersects_rings", "lines_cross", "polyline_length",
]


def _close(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, dtype=np.float64)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def _ring_edges(rings: list[np.ndarray]) -> np.ndarray:
    segs = []
    for r in rings:
        c = _close(r)
        segs.append(np.stack([c[:-1], c[1:]], axis=1))
    return np.concatenate(segs) if segs else np.zeros((0, 2, 2))


def _split_params(p: np.ndarray, q: np.ndarray, edges: np.ndarray
                  ) -> np.ndarray:
    """Parametric positions t in (0,1) where segment p->q crosses any
    polygon edge (touching counts; collinear overlaps contribute the
    projected endpoints, so the midpoint rule classifies each run)."""
    if len(edges) == 0:
        return np.zeros(0)
    r = q - p                       # (2,)
    a = edges[:, 0]                 # (m,2)
    s = edges[:, 1] - a             # (m,2)
    denom = r[0] * s[:, 1] - r[1] * s[:, 0]
    ap = a - p
    t_num = ap[:, 0] * s[:, 1] - ap[:, 1] * s[:, 0]
    u_num = ap[:, 0] * r[1] - ap[:, 1] * r[0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = t_num / denom
        u = u_num / denom
    ok = (denom != 0) & (t > 0.0) & (t < 1.0) & (u >= 0.0) & (u <= 1.0)
    ts = [t[ok]]
    # collinear overlap: project the edge endpoints onto the segment
    rr = float(r @ r)
    if rr > 0:
        coll = (denom == 0) & (np.abs(u_num) <= 1e-12 * (1 + rr))
        if bool(coll.any()):
            t0 = (ap[coll] @ r) / rr
            t1 = t0 + (s[coll] @ r) / rr
            cand = np.concatenate([t0, t1])
            ts.append(cand[(cand > 0.0) & (cand < 1.0)])
    return np.concatenate(ts) if len(ts) > 1 else ts[0]


def clip_line_to_rings(line: np.ndarray, rings: list[np.ndarray],
                       inside: bool = True) -> list[np.ndarray]:
    """Portions of polyline ``line`` inside (or outside) the polygon
    given by ``rings`` (outer first, holes follow; even-odd parity).

    Returns a list of (n,2) polylines; consecutive kept sub-segments
    are stitched.  Exact partition: clip + erase lengths sum to the
    input length.
    """
    pts = np.asarray(line, dtype=np.float64)
    edges = _ring_edges(rings)
    closed = [_close(r) for r in rings]
    out: list[np.ndarray] = []
    run: list[np.ndarray] = []

    def flush():
        nonlocal run
        if len(run) >= 2:
            out.append(np.array(run))
        run = []

    for i in range(len(pts) - 1):
        p, q = pts[i], pts[i + 1]
        if np.array_equal(p, q):
            continue
        ts = np.unique(np.concatenate([[0.0, 1.0],
                                       _split_params(p, q, edges)]))
        # merge split points closer than 1e-12 (the same crossing
        # found via two formulas differs by ulps and would emit a
        # zero-length sub-segment)
        ts = ts[np.concatenate([[True], np.diff(ts) > 1e-12])]
        if ts[-1] != 1.0:
            ts = np.concatenate([ts[:-1], [1.0]])
        mids = p[None, :] + (ts[:-1] + ts[1:])[:, None] / 2.0 \
            * (q - p)[None, :]
        keep = points_in_rings(mids[:, 0], mids[:, 1], closed)
        if not inside:
            keep = ~keep
        for k in range(len(ts) - 1):
            if not keep[k]:
                flush()
                continue
            a = p + ts[k] * (q - p)
            b = p + ts[k + 1] * (q - p)
            if not run:
                run = [a, b]
            elif np.allclose(run[-1], a, rtol=0, atol=1e-12):
                run.append(b)
            else:
                flush()
                run = [a, b]
    flush()
    return out


def erase_line_from_rings(line: np.ndarray, rings: list[np.ndarray]
                          ) -> list[np.ndarray]:
    """Portions of the polyline OUTSIDE the polygon (layer Erase for
    line inputs, ogrlayer.cpp:7846)."""
    return clip_line_to_rings(line, rings, inside=False)


def polyline_length(parts: list[np.ndarray]) -> float:
    tot = 0.0
    for p in parts:
        d = np.diff(np.asarray(p, dtype=np.float64), axis=0)
        tot += float(np.sqrt((d * d).sum(axis=1)).sum())
    return tot


def lines_cross(a: np.ndarray, b: np.ndarray) -> bool:
    """ST_Intersects for two polylines (proper or touching)."""
    from gdal_spark.geometry.overlay import _seg_cross_any

    aa = np.asarray(a, dtype=np.float64)
    bb = np.asarray(b, dtype=np.float64)
    sa = np.stack([aa[:-1], aa[1:]], axis=1)
    sb = np.stack([bb[:-1], bb[1:]], axis=1)
    return _seg_cross_any(sa, sb)


def line_intersects_rings(line: np.ndarray, rings: list[np.ndarray]
                          ) -> bool:
    """ST_Intersects for polyline x polygon: a boundary crossing or a
    vertex in the interior."""
    from gdal_spark.geometry.overlay import _seg_cross_any

    pts = np.asarray(line, dtype=np.float64)
    segs = np.stack([pts[:-1], pts[1:]], axis=1)
    if _seg_cross_any(segs, _ring_edges(rings)):
        return True
    closed = [_close(r) for r in rings]
    return bool(points_in_rings(pts[:1, 0], pts[:1, 1], closed)[0])
