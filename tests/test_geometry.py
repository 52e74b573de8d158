"""Geometry kernels: WKB codec, ray-cast PIP (ogrlinearring.cpp
semantics), measures, Hilbert parity."""

import numpy as np

from gdal_spark.functions.hilbert import hilbert_code_u16
from gdal_spark.geometry.ops import (
    clip_ring_rect, convex_hull, douglas_peucker,
)
from gdal_spark.geometry.packed import geom_area, geom_centroid
from gdal_spark.geometry.pip import points_in_rings
from gdal_spark.geometry.wkb import (
    multipolygon_wkb, parse_wkb, point_wkb, polygon_wkb, to_wkt,
)

SQUARE = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype=float)
HOLE = np.array([(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)], dtype=float)


def test_wkb_roundtrip_polygon():
    wkb = polygon_wkb([SQUARE, HOLE])
    g = parse_wkb(wkb)
    assert g.kind == 3
    assert len(g.parts) == 2
    np.testing.assert_allclose(g.parts[0], SQUARE)
    assert to_wkt(g).startswith("POLYGON ((0 0,4 0,4 4,0 4,0 0),(1 1,")


def test_wkb_point_and_multipolygon():
    g = parse_wkb(point_wkb(2.5, -3.5))
    np.testing.assert_allclose(g.parts[0], [[2.5, -3.5]])
    mp = parse_wkb(multipolygon_wkb([[SQUARE], [HOLE]]))
    assert mp.kind == 6
    assert mp.part_offsets == [0, 1, 2]


def test_wkb_big_endian():
    import struct

    # hand-build a big-endian point
    buf = struct.pack(">BIdd", 0, 1, 7.0, 8.0)
    g = parse_wkb(buf)
    np.testing.assert_allclose(g.parts[0], [[7.0, 8.0]])


def test_pip_square_interior_exterior():
    px = np.array([2.0, 5.0, -1.0, 2.0])
    py = np.array([2.0, 2.0, 2.0, 4.5])
    inside = points_in_rings(px, py, [SQUARE])
    assert inside.tolist() == [True, False, False, False]


def test_pip_hole_excluded():
    px = np.array([2.0, 0.5, 3.5])
    py = np.array([2.0, 0.5, 3.5])
    inside = points_in_rings(px, py, [SQUARE, HOLE])
    # center is in the hole -> excluded; corners region included
    assert inside.tolist() == [False, True, True]


def test_pip_concave():
    # arrow shape: notch at the left
    ring = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (0, 0)],
                    dtype=float)
    px = np.array([1.0, 3.0])
    py = np.array([2.0, 2.0])
    inside = points_in_rings(px, py, [ring])
    assert inside.tolist() == [False, True]


def test_pip_matches_matplotlib_free_reference():
    """Randomized cross-check against an independent even-odd
    implementation (different formulation of the same rule)."""
    rng = np.random.RandomState(42)
    ring = np.array([(0, 0), (10, 0), (10, 10), (5, 5), (0, 10), (0, 0)],
                    dtype=float)
    px = rng.uniform(-1, 11, 500)
    py = rng.uniform(-1, 11, 500)
    got = points_in_rings(px, py, [ring])

    def ref_pip(x, y):
        inside = False
        j = len(ring) - 2
        for i in range(len(ring) - 1):
            xi, yi = ring[i]
            xj, yj = ring[j]
            if ((yi > y) != (yj > y)) and (
                x < (xj - xi) * (y - yi) / (yj - yi) + xi
            ):
                inside = not inside
            j = i
        return inside

    want = np.array([ref_pip(x, y) for x, y in zip(px, py)])
    assert (got == want).all()


def test_area_centroid():
    g = parse_wkb(polygon_wkb([SQUARE, HOLE]))
    assert geom_area(g) == 16.0 - 4.0
    cx, cy = geom_centroid(g)
    assert abs(cx - 2.0) < 1e-12 and abs(cy - 2.0) < 1e-12


def test_convex_hull_and_dp():
    pts = np.array([(0, 0), (4, 0), (4, 4), (0, 4), (2, 2), (1, 1)],
                   dtype=float)
    hull = convex_hull(pts)
    assert len(hull) == 5  # 4 corners + closure
    line = np.array([(0, 0), (1, 0.01), (2, 0), (3, 1)], dtype=float)
    simp = douglas_peucker(line, 0.1)
    np.testing.assert_allclose(simp, [(0, 0), (2, 0), (3, 1)])


def test_clip_ring_rect():
    clipped = clip_ring_rect(SQUARE, 1, 1, 10, 10)
    assert geom_area(parse_wkb(polygon_wkb([clipped]))) == 9.0
    assert len(clip_ring_rect(SQUARE, 10, 10, 20, 20)) == 0


def test_hilbert_matches_classic_algorithm():
    """GDALHilbertCode (alg/hilbert.cpp) vs the textbook rotate-flip
    Hilbert d-index on the 2^16 lattice."""

    def xy2d(order, x, y):
        d = 0
        s = order // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            # rotate
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    rng = np.random.RandomState(7)
    xs = rng.randint(0, 1 << 16, 64).astype(np.uint32)
    ys = rng.randint(0, 1 << 16, 64).astype(np.uint32)
    got = hilbert_code_u16(xs, ys)
    want = np.array([xy2d(1 << 16, int(x), int(y)) for x, y in zip(xs, ys)],
                    dtype=np.uint32)
    assert (got == want).all()


def test_segmentize():
    from gdal_spark.geometry.ops import segmentize

    line = np.array([(0, 0), (10, 0), (10, 3)], dtype=float)
    out = segmentize(line, 2.5)
    d = np.hypot(*(np.diff(out, axis=0).T))
    assert (d <= 2.5 + 1e-12).all()
    # original vertices preserved in order
    for v in line:
        assert (np.abs(out - v).sum(axis=1) < 1e-12).any()
    # no-op below threshold
    np.testing.assert_array_equal(segmentize(line, 100.0), line)


def test_simplify_preserve_topology():
    """DP simplify that never invalidates: rings keep >= 4 points, no
    self-intersection, holes stay inside their shell
    (ogrgeometry.cpp:6856 semantics)."""
    import numpy as np

    from gdal_spark.geometry.ops import simplify_preserve_topology
    from gdal_spark.geometry.overlay import ring_contains_ring

    th = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    circle = np.column_stack([np.cos(th) * 10, np.sin(th) * 10])
    circle = np.vstack([circle, circle[:1]])
    out = simplify_preserve_topology([circle], 5.0)
    assert len(out[0]) >= 5

    shell = np.array([(0, 0), (5, 0.4), (10, 0), (10, 10), (5, 9.6),
                      (0, 10), (0, 0)], dtype=np.float64)
    hole = np.array([(1, 1), (9, 1), (9, 9), (1, 9), (1, 1)],
                    dtype=np.float64)[::-1]
    s, h = simplify_preserve_topology([shell, hole], 3.0)
    assert ring_contains_ring(s, h)
    assert len(s) >= 5 and len(h) >= 5


def test_poly_op_union_with_holes():
    """Holed union through the planar-arrangement resolver matches a
    dense grid oracle."""
    import numpy as np

    from gdal_spark.geometry.overlay import poly_op
    from gdal_spark.geometry.packed import ring_signed_area

    def sq(x0, y0, x1, y1):
        return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1),
                         (x0, y0)], dtype=np.float64)

    Ah = [sq(0, 0, 10, 10), sq(3, 3, 7, 7)[::-1]]
    Bh = [sq(5, 0, 15, 10), sq(8, 4, 12, 6)[::-1]]
    got = sum(ring_signed_area(r)
              for rings in poly_op(Ah, Bh, "union") for r in rings)
    xs = np.linspace(0.005, 15, 1500)
    ys = np.linspace(0.005, 10, 1000)
    X, Y = np.meshgrid(xs, ys)
    inA = ((X >= 0) & (X <= 10) & (Y >= 0) & (Y <= 10)
           & ~((X >= 3) & (X <= 7) & (Y >= 3) & (Y <= 7)))
    inB = ((X >= 5) & (X <= 15) & (Y >= 0) & (Y <= 10)
           & ~((X >= 8) & (X <= 12) & (Y >= 4) & (Y <= 6)))
    want = (inA | inB).mean() * 150
    assert abs(got - want) < 0.1


def test_simplify_topology_shell_fallback():
    """When even the ORIGINAL hole conflicts with the simplified
    shell, the shell reverts to the original ring: validity is never
    traded for vertex count (TopologyPreservingSimplifier contract)."""
    import numpy as np

    from gdal_spark.geometry.ops import simplify_preserve_topology
    from gdal_spark.geometry.overlay import (
        ring_contains_ring, _seg_cross_any,
    )

    # shell: square with a small outward BUMP on the top edge;
    # tolerance 2 straightens the bump away, which SHRINKS the
    # polygon across the hole placed inside the bump
    shell = np.array([
        (0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
        (6.0, 10.0), (5.0, 11.5), (4.0, 10.0),
        (0.0, 10.0), (0.0, 0.0),
    ])
    hole = np.array([(4.6, 10.2), (5.4, 10.2), (5.0, 11.0),
                     (4.6, 10.2)])
    out = simplify_preserve_topology([shell, hole], tol=2.0)
    def segs(r):
        rr = r if np.array_equal(r[0], r[-1]) else np.vstack([r, r[:1]])
        return np.stack([rr[:-1], rr[1:]], axis=1)
    # invariants: hole inside shell, no crossing — always
    assert ring_contains_ring(out[0], out[1])
    assert not _seg_cross_any(segs(out[0]), segs(out[1]))
    # the shell reverted (the simplified square would exclude the hole)
    assert len(out[0]) >= 8


def test_concave_hull_contract():
    """ConcaveHull contract (ogrgeometry.cpp:4569): simple ring,
    every point covered, area <= convex hull, ratio=1 == convex,
    smaller ratio digs (strictly less area on a concave cloud)."""
    import numpy as np

    from gdal_spark.geometry.ops import (
        _ring_self_intersects, concave_hull, convex_hull,
    )
    from gdal_spark.geometry.packed import ring_signed_area
    from gdal_spark.geometry.pip import points_in_rings

    rng = np.random.RandomState(0)
    th = rng.uniform(0.5, 2 * np.pi - 0.5, 400)
    r = rng.uniform(3.0, 5.0, 400)
    pts = np.column_stack([np.cos(th) * r, np.sin(th) * r])
    a_cv = abs(ring_signed_area(convex_hull(pts)))

    full = concave_hull(pts, ratio=1.0)
    assert abs(abs(ring_signed_area(full)) - a_cv) < 1e-9

    dug = concave_hull(pts, ratio=0.1)
    a_dug = abs(ring_signed_area(dug))
    assert a_dug < a_cv
    assert not _ring_self_intersects(dug)
    inside = points_in_rings(pts[:, 0], pts[:, 1], [dug])
    on_ring = np.zeros(len(pts), dtype=bool)
    for v in dug[:-1]:
        on_ring |= (np.abs(pts - v[None, :]) < 1e-12).all(axis=1)
    assert (inside | on_ring).all()
    assert ring_signed_area(dug) > 0  # CCW


def test_normalize_canonical():
    """Normalize (ogrgeometry.cpp:4369): rotated/reversed variants of
    the same polygon normalize to identical vertex arrays; shell CW,
    holes CCW, holes sorted by start vertex."""
    import numpy as np

    from gdal_spark.geometry.ops import normalize_rings
    from gdal_spark.geometry.packed import ring_signed_area

    sq = np.array([(0.0, 0), (0, 2), (2, 2), (2, 0), (0, 0)])
    h1 = np.array([(0.4, 0.4), (0.4, 0.8), (0.8, 0.8), (0.8, 0.4),
                   (0.4, 0.4)])
    h2 = np.array([(1.2, 1.2), (1.6, 1.2), (1.6, 1.6), (1.2, 1.6),
                   (1.2, 1.2)])
    n1 = normalize_rings([sq, h2, h1])

    def variant(r, k):
        rr = np.roll(r[:-1][::-1], k, axis=0)
        return np.vstack([rr, rr[:1]])

    n2 = normalize_rings([variant(sq, 2), variant(h1, 1),
                          variant(h2, 3)])
    assert len(n1) == len(n2) == 3
    for a, b in zip(n1, n2):
        np.testing.assert_array_equal(a, b)
    assert ring_signed_area(n1[0]) < 0          # shell CW
    assert all(ring_signed_area(h) > 0 for h in n1[1:])  # holes CCW
    # holes sorted by lexicographic start vertex
    assert n1[1][0, 0] <= n1[2][0, 0]
