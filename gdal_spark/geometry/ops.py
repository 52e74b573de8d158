"""Geometry construction / editing kernels (numpy, no GEOS).

Engine equivalents of the reference's GEOS-backed scalar ops where
the semantics are classical algorithms:

* convex_hull — Andrew monotone chain (OGRGeometry::ConvexHull,
  ogr/ogrgeometry.cpp:4449)
* simplify — Douglas-Peucker (OGRGeometry::Simplify,
  ogrgeometry.cpp:6778)
* clip_ring_rect — Sutherland-Hodgman rectangle clip: the rectangle
  fast path the reference takes in Clip/warp cutline
  (apps/ogr2ogr_lib.cpp:604-609 rectangle fast path;
  ogrlayer.cpp:3922 rectangle filter detection)
* segment/point distance — kNN refine metric (OGRGeometry::Distance,
  ogrgeometry.cpp:3818)
"""

from __future__ import annotations

import numpy as np


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Monotone-chain hull; returns closed CCW ring (n,2)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return np.vstack([pts, pts[:1]]) if len(pts) else pts
    # lexicographic sort (x, then y)
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = np.array(lower[:-1] + upper[:-1])
    return np.vstack([hull, hull[:1]])


def douglas_peucker(coords: np.ndarray, tol: float) -> np.ndarray:
    """Iterative DP simplification preserving endpoints."""
    c = np.asarray(coords, dtype=np.float64)
    n = len(c)
    if n < 3:
        return c
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        seg = c[i0 + 1:i1]
        a, b = c[i0], c[i1]
        ab = b - a
        L2 = ab @ ab
        if L2 == 0.0:
            d = np.sqrt(((seg - a) ** 2).sum(axis=1))
        else:
            # perpendicular distance to the infinite line (DP classic)
            d = np.abs(np.cross(ab, seg - a)) / np.sqrt(L2)
        k = int(np.argmax(d))
        if d[k] > tol:
            j = i0 + 1 + k
            keep[j] = True
            stack.append((i0, j))
            stack.append((j, i1))
    return c[keep]


def clip_ring_rect(ring: np.ndarray, minx: float, miny: float,
                   maxx: float, maxy: float) -> np.ndarray:
    """Sutherland-Hodgman polygon clip against an axis rectangle.

    Returns a closed ring (possibly empty (0,2))."""
    poly = np.asarray(ring, dtype=np.float64)
    if len(poly) and np.array_equal(poly[0], poly[-1]):
        poly = poly[:-1]

    def clip_edge(pts: np.ndarray, axis: int, bound: float, keep_ge: bool):
        if len(pts) == 0:
            return pts
        cur = pts
        prev = np.roll(pts, 1, axis=0)
        cur_in = (cur[:, axis] >= bound) if keep_ge else (cur[:, axis] <= bound)
        prev_in = (
            (prev[:, axis] >= bound) if keep_ge else (prev[:, axis] <= bound)
        )
        out = []
        for i in range(len(cur)):
            if cur_in[i]:
                if not prev_in[i]:
                    out.append(_isect(prev[i], cur[i], axis, bound))
                out.append(cur[i])
            elif prev_in[i]:
                out.append(_isect(prev[i], cur[i], axis, bound))
        return np.array(out) if out else np.zeros((0, 2))

    poly = clip_edge(poly, 0, minx, True)
    poly = clip_edge(poly, 0, maxx, False)
    poly = clip_edge(poly, 1, miny, True)
    poly = clip_edge(poly, 1, maxy, False)
    if len(poly) >= 3:
        return np.vstack([poly, poly[:1]])
    return np.zeros((0, 2))


def _isect(p: np.ndarray, q: np.ndarray, axis: int, bound: float) -> np.ndarray:
    t = (bound - p[axis]) / (q[axis] - p[axis])
    return p + t * (q - p)


def segmentize(coords: np.ndarray, max_len: float) -> np.ndarray:
    """Densify: insert vertices so no segment exceeds ``max_len``
    (OGRGeometry::segmentize semantics used by ogr2ogr -segmentize,
    apps/ogr2ogr_lib.cpp LayerTranslator)."""
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        return c
    out = [c[:1]]
    for i in range(1, len(c)):
        seg = c[i] - c[i - 1]
        length = float(np.hypot(*seg))
        n = int(np.ceil(length / max_len)) if length > max_len else 1
        if n > 1:
            t = np.arange(1, n)[:, None] / n
            out.append(c[i - 1] + t * seg)
        out.append(c[i:i + 1])
    return np.vstack(out)


def point_segment_dist(px: np.ndarray, py: np.ndarray,
                       seg: np.ndarray) -> np.ndarray:
    """Min distance from points to a polyline (vectorized over both)."""
    p = np.stack([px, py], axis=1)[:, None, :]   # (P,1,2)
    a = seg[:-1][None, :, :]                      # (1,S,2)
    b = seg[1:][None, :, :]
    ab = b - a
    L2 = (ab * ab).sum(axis=2)
    t = ((p - a) * ab).sum(axis=2) / np.where(L2 == 0.0, 1.0, L2)
    t = np.clip(t, 0.0, 1.0)
    proj = a + t[..., None] * ab
    d2 = ((p - proj) ** 2).sum(axis=2)
    return np.sqrt(d2.min(axis=1))


def _ring_self_intersects(ring: np.ndarray) -> bool:
    """Any two NON-ADJACENT segments of the closed ring cross."""
    r = np.asarray(ring, dtype=np.float64)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    n = len(r) - 1
    from gdal_spark.geometry.overlay import _seg_cross_any

    segs = np.stack([r[:-1], r[1:]], axis=1)
    for i in range(n):
        js = [j for j in range(i + 2, n)
              if not (i == 0 and j == n - 1)]
        if js and _seg_cross_any(segs[i:i + 1], segs[js]):
            return True
    return False


def simplify_preserve_topology(rings: list[np.ndarray], tol: float,
                               max_halvings: int = 6
                               ) -> list[np.ndarray]:
    """OGRGeometry::SimplifyPreserveTopology (ogrgeometry.cpp:6856,
    GEOS TopologyPreservingSimplifier semantics): Douglas-Peucker per
    ring, but a result that self-intersects, collapses (< 4 points),
    crosses another ring, or lets a hole escape its shell is retried
    at half the tolerance (down to the original ring) — geometry
    validity is never traded for vertex count."""
    from gdal_spark.geometry.overlay import (
        _seg_cross_any, ring_contains_ring,
    )

    def segs(r):
        rr = np.asarray(r, dtype=np.float64)
        if not np.array_equal(rr[0], rr[-1]):
            rr = np.vstack([rr, rr[:1]])
        return np.stack([rr[:-1], rr[1:]], axis=1)

    out: list[np.ndarray] = []
    for idx, ring in enumerate(rings):
        t = tol
        cand = None
        for _ in range(max_halvings):
            s = douglas_peucker(np.asarray(ring, dtype=np.float64), t)
            if len(s) >= 5 and not _ring_self_intersects(s):
                cand = s
                break
            t /= 2.0
        if cand is None:
            cand = np.asarray(ring, dtype=np.float64)
        # holes must stay inside the (simplified) shell and not
        # cross; retried candidates must also stay SIMPLE
        if idx > 0 and out:
            shell = out[0]
            t = tol
            while (_seg_cross_any(segs(cand), segs(shell))
                   or not ring_contains_ring(shell, cand)):
                t /= 2.0
                cand = douglas_peucker(
                    np.asarray(ring, dtype=np.float64), t)
                if len(cand) < 5 or _ring_self_intersects(cand):
                    # a finer tolerance reintroduced an invalid
                    # hole: skip straight to the original ring
                    t = 0.0
                if t < tol / (2 ** max_halvings):
                    cand = np.asarray(ring, dtype=np.float64)
                    break
            if (_seg_cross_any(segs(cand), segs(shell))
                    or not ring_contains_ring(shell, cand)):
                # even the ORIGINAL hole conflicts with the
                # simplified shell: validity wins over vertex
                # count — revert the shell (and every previously
                # accepted hole was valid against the original
                # shell by construction, so re-base them)
                out = [np.asarray(rings[0], dtype=np.float64)] + [
                    np.asarray(rings[j + 1], dtype=np.float64)
                    for j in range(len(out) - 1)
                ]
        out.append(cand)
    return out


def concave_hull(points: np.ndarray, ratio: float = 0.3,
                 max_iters: int = 100000) -> np.ndarray:
    """Concave hull of a point set (closed ring, CCW).

    OGRGeometry::ConcaveHull(ratio, allowHoles=False)
    (ogr/ogrgeometry.cpp:4569) delegates to GEOS's Delaunay-erosion
    hull; without a triangulator this uses the public edge-digging
    formulation (Park & Oh 2012 / mapbox concaveman): start from the
    convex hull and repeatedly replace the longest edge above the
    length threshold with two edges through the interior point
    nearest to it, provided both new edges are strictly shorter and
    cross nothing.  ``ratio`` follows the GEOS maximum-edge-length
    convention: threshold = min_edge + ratio * (max_edge - min_edge)
    of the initial convex hull (ratio 1 -> convex hull, smaller ->
    tighter).  Invariants shared with the reference: a simple
    polygon, every input point inside or on it, area <= convex hull.
    """
    from gdal_spark.geometry.overlay import _seg_cross_any

    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) < 3:
        raise ValueError("concave hull needs >= 3 distinct points")
    ch = convex_hull(pts)[:-1]                       # open, CCW
    # hull as an index list into pts
    def find_idx(v):
        return int(np.where((np.abs(pts - v[None, :]) < 1e-12)
                            .all(axis=1))[0][0])

    hull = [find_idx(v) for v in ch]
    on_hull = np.zeros(len(pts), dtype=bool)
    on_hull[hull] = True
    elens = np.sqrt(((ch - np.roll(ch, -1, axis=0)) ** 2).sum(axis=1))
    thresh = float(elens.min()
                   + np.clip(ratio, 0.0, 1.0)
                   * (elens.max() - elens.min()))
    undiggable: set = set()

    for _ in range(max_iters):
        n = len(hull)
        hv = pts[np.array(hull)]
        nxt = np.roll(hv, -1, axis=0)
        lens = np.sqrt(((hv - nxt) ** 2).sum(axis=1))
        order = np.argsort(-lens)
        dug = False
        for ei in order:
            a_i, b_i = hull[ei], hull[(ei + 1) % n]
            if lens[ei] <= thresh or (a_i, b_i) in undiggable:
                continue
            interior = np.flatnonzero(~on_hull)
            if len(interior) == 0:
                break
            a, b = pts[a_i], pts[b_i]
            d = point_segment_dist(pts[interior, 0], pts[interior, 1],
                                   np.array([a, b]))
            p_i = int(interior[np.argmin(d)])
            p = pts[p_i]
            la = float(np.hypot(*(p - a)))
            lb = float(np.hypot(*(p - b)))
            # strictly shorter edges guarantee termination
            if max(la, lb) >= lens[ei]:
                undiggable.add((a_i, b_i))
                continue
            new = np.array([[a, p], [p, b]])
            others = np.stack(
                [hv, nxt], axis=1)[np.arange(n) != ei]
            # exclude edges incident to a or b (shared endpoints
            # always "touch"); full-ring check against the rest
            keep = []
            for j in range(len(others)):
                if (np.abs(others[j] - a[None, :]) < 1e-12)                         .all(axis=1).any() or                    (np.abs(others[j] - b[None, :]) < 1e-12)                         .all(axis=1).any():
                    keep.append(False)
                else:
                    keep.append(True)
            prior = others[np.array(keep, dtype=bool)]                 if any(keep) else np.zeros((0, 2, 2))
            if len(prior) and _seg_cross_any(new, prior):
                undiggable.add((a_i, b_i))
                continue
            hull.insert(ei + 1, p_i)
            on_hull[p_i] = True
            dug = True
            break
        if not dug:
            break
    ring = pts[np.array(hull)]
    return np.vstack([ring, ring[:1]])


def normalize_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    """OGRGeometry::Normalize (ogr/ogrgeometry.cpp:4369 -> GEOS
    Geometry::normalize): canonical vertex order so that equal
    geometries compare equal —

    * every ring is rotated to start at its lexicographically
      smallest (x, y) vertex and closed;
    * the exterior ring winds CW and holes CCW (the GEOS normal
      form);
    * holes are sorted by their start vertex.
    """
    from gdal_spark.geometry.packed import ring_signed_area

    def norm_one(r: np.ndarray, ccw: bool) -> np.ndarray:
        rr = np.asarray(r, dtype=np.float64)
        if len(rr) and np.array_equal(rr[0], rr[-1]):
            rr = rr[:-1]
        if (ring_signed_area(np.vstack([rr, rr[:1]])) > 0) != ccw:
            rr = rr[::-1]
        i = int(np.lexsort((rr[:, 1], rr[:, 0]))[0])
        rr = np.roll(rr, -i, axis=0)
        return np.vstack([rr, rr[:1]])

    if not rings:
        return []
    shell = norm_one(rings[0], ccw=False)         # exterior CW
    holes = [norm_one(h, ccw=True) for h in rings[1:]]
    holes.sort(key=lambda h: (h[0, 0], h[0, 1]))
    return [shell] + holes
