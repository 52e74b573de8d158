"""OGRGeometry::Buffer (ogr/ogrgeometry.cpp:4949) without GEOS.

Construction (the standard offset-curve method, as in Clipper and
GEOS's OffsetCurveBuilder):

  1. orient shells CCW and holes CW, so the polygon interior is on
     the LEFT of every directed edge;
  2. offset every edge by ``dist`` along its RIGHT normal (positive
     dist grows the shell and shrinks holes — both move right of
     travel);
  3. at corners where the offset edges separate (turn direction times
     sign(dist) > 0) insert a ROUND join: an arc of radius |dist|
     sampled at quad_segs segments per quarter circle (GEOS
     default 8); where they overlap, connect directly — the loop
     this creates is removed by winding resolution;
  4. resolve the (self-intersecting) offset curves with the POSITIVE
     winding rule via geometry/valid.py — reversed loops from
     collapsed holes or over-eroded shells get winding <= 0 and drop
     out, which is exactly the collapse semantics of the reference.

Points buffer to a 4*quad_segs-gon; negative distances erode.
"""

from __future__ import annotations

import numpy as np

from gdal_spark.geometry.packed import ring_signed_area
from gdal_spark.geometry.valid import resolve_rings


def _closed(r: np.ndarray) -> np.ndarray:
    r = np.asarray(r, dtype=np.float64)
    if not np.array_equal(r[0], r[-1]):
        r = np.vstack([r, r[:1]])
    return r


def _orient(r: np.ndarray, ccw: bool) -> np.ndarray:
    if (ring_signed_area(r) > 0) != ccw:
        return r[::-1].copy()
    return r


def _arc(center: np.ndarray, radius: float, a0: float, a1: float,
         ccw: bool, quad_segs: int) -> np.ndarray:
    """Arc points from angle a0 to a1 (radians), exclusive of the
    endpoints (the edge offsets supply those)."""
    if ccw:
        while a1 <= a0:
            a1 += 2 * np.pi
    else:
        while a1 >= a0:
            a1 -= 2 * np.pi
    sweep = a1 - a0
    n = max(int(np.ceil(abs(sweep) / (np.pi / 2 / quad_segs))), 1)
    ang = a0 + sweep * np.arange(1, n) / n
    return center[None, :] + radius * np.column_stack(
        [np.cos(ang), np.sin(ang)])


def offset_ring(ring: np.ndarray, dist: float, quad_segs: int = 8
                ) -> np.ndarray:
    """Closed offset curve of a ring at signed distance ``dist``
    along the right normal (round joins)."""
    r = _closed(ring)[:-1]
    n = len(r)
    d = np.abs(dist)
    pts: list[np.ndarray] = []
    for i in range(n):
        p0 = r[i]
        p1 = r[(i + 1) % n]
        u = p1 - p0
        ln = np.hypot(*u)
        if ln == 0:
            continue
        u = u / ln
        nrm = np.array([u[1], -u[0]])      # right of travel
        off = nrm * dist
        pts.append(p0 + off)
        pts.append(p1 + off)
        # corner join toward the next edge
        p2 = r[(i + 2) % n]
        u2 = p2 - p1
        ln2 = np.hypot(*u2)
        if ln2 == 0:
            continue
        u2 = u2 / ln2
        cross = u[0] * u2[1] - u[1] * u2[0]
        reversal = cross == 0 and (u * u2).sum() < 0  # 180-degree cap
        if cross * dist > 0 or reversal:
            # offsets separate: round join around the vertex
            n2 = np.array([u2[1], -u2[0]]) * np.sign(dist)
            n1 = nrm * np.sign(dist)
            a0 = float(np.arctan2(n1[1], n1[0]))
            a1 = float(np.arctan2(n2[1], n2[0]))
            arc = _arc(p1, d, a0, a1, ccw=dist > 0,
                       quad_segs=quad_segs)
            pts.extend(arc)
    if not pts:
        return np.zeros((0, 2))
    out = np.array(pts)
    return np.vstack([out, out[:1]])


def buffer_polygon(rings: list[np.ndarray], dist: float,
                   quad_segs: int = 8) -> list[list[np.ndarray]]:
    """Buffer a polygon (first ring shell, rest holes) by ``dist``.
    Returns valid polygons [outer CCW, holes CW...]."""
    if dist == 0:
        return [[_orient(_closed(rings[0]), True)]
                + [_orient(_closed(h), False) for h in rings[1:]]]
    curves = []
    shell = _orient(_closed(rings[0]), True)
    curves.append(offset_ring(shell, dist, quad_segs))
    for h in rings[1:]:
        hole = _orient(_closed(h), False)
        curves.append(offset_ring(hole, dist, quad_segs))
    curves = [c for c in curves if len(c) >= 4]
    if not curves:
        return []
    return resolve_rings(curves, rule="positive")


def buffer_point(x: float, y: float, dist: float, quad_segs: int = 8
                 ) -> list[list[np.ndarray]]:
    """Point buffer: a 4*quad_segs-gon (GEOS's circle approximation)."""
    if dist <= 0:
        return []
    ang = np.linspace(0, 2 * np.pi, 4 * quad_segs, endpoint=False)
    ring = np.column_stack([x + dist * np.cos(ang),
                            y + dist * np.sin(ang)])
    return [[np.vstack([ring, ring[:1]])]]


def buffer_line(coords: np.ndarray, dist: float, quad_segs: int = 8
                ) -> list[list[np.ndarray]]:
    """LineString buffer with round caps: offset both sides, close
    with half-circle caps, resolve with the positive rule."""
    if dist <= 0:
        return []
    c = np.asarray(coords, dtype=np.float64)
    if len(c) < 2:
        return []
    # traverse forward then backward (interior points only — the ring
    # closure supplies the return to the start) — right-offsetting the
    # closed walk yields both sides; caps emerge from the joins at the
    # two reversal vertices (180-degree turns -> half-circle arcs)
    walk = np.vstack([c, c[-2:0:-1]]) if len(c) > 2 else c
    curve = offset_ring(walk, dist, quad_segs)
    if len(curve) < 4:
        return []
    return resolve_rings([curve], rule="positive")
