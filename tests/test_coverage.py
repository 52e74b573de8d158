"""gdal vector check-coverage (shared-boundary edge pairing)."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry import wkb as W
from gdal_spark.operators.coverage import check_coverage


def _cell(i, j, split_right=False, dx1=0.0):
    x0, y0, x1, y1 = float(i), float(j), float(i + 1 + dx1), \
        float(j + 1)
    ring = [(x0, y0), (x1, y0)]
    if split_right:
        ring.append((x1, y0 + 0.5))
    ring += [(x1, y1), (x0, y1), (x0, y0)]
    return W.polygon_wkb([ring])


def _lattice(spark, n, split_cells=(), dx1_cells=()):
    rows = []
    for j in range(n):
        for i in range(n):
            c = i + j * n
            rows.append({
                "fid": c,
                "geometry": _cell(i, j, split_right=(c in
                                                     split_cells),
                                  dx1=(0.25 if c in dx1_cells
                                       else 0.0)),
            })
    return spark.createDataFrame(pd.DataFrame(rows))


def test_valid_lattice_has_no_defects(spark):
    df = _lattice(spark, 4)
    rep = check_coverage(df, extent=(0, 0, 4, 4)).toPandas()
    assert len(rep) == 16
    assert (rep["n_unmatched"] == 0).all()
    assert (rep["n_edges"] == 4).all()
    assert (rep["unmatched_len"] == 0.0).all()


def test_without_extent_outer_frame_reports_unmatched(spark):
    df = _lattice(spark, 2)
    rep = check_coverage(df).toPandas().set_index("fid")
    # every cell of a 2x2 lattice owns exactly 2 frame edges
    assert (rep["n_unmatched"] == 2).all()


def test_t_vertex_split_flags_both_sides(spark):
    # cell 5 (i=1, j=1 in a 4x4) splits its right edge: its two
    # halves AND neighbor 6's left edge all fail to pair
    df = _lattice(spark, 4, split_cells={5})
    rep = check_coverage(df, extent=(0, 0, 4, 4)).toPandas() \
        .set_index("fid")
    assert rep.loc[5, "n_edges"] == 5
    assert rep.loc[5, "n_unmatched"] == 2
    assert rep.loc[5, "unmatched_len"] == pytest.approx(1.0)
    assert rep.loc[6, "n_unmatched"] == 1
    assert rep.loc[6, "unmatched_len"] == pytest.approx(1.0)
    clean = rep.drop(index=[5, 6])
    assert (clean["n_unmatched"] == 0).all()


def test_overlap_shift_flags_all_moved_edges(spark):
    # cell 9 (i=1, j=2) extends right by 0.25: its right/top/bottom
    # edges move, so they and the three neighbor twins unmatch
    df = _lattice(spark, 4, dx1_cells={9})
    rep = check_coverage(df, extent=(0, 0, 4, 4)).toPandas() \
        .set_index("fid")
    assert rep.loc[9, "n_unmatched"] == 3
    assert rep.loc[10, "n_unmatched"] == 1   # right neighbor left
    assert rep.loc[5, "n_unmatched"] == 1    # below neighbor top
    assert rep.loc[13, "n_unmatched"] == 1   # above neighbor bottom


def test_snap_tolerates_float_noise(spark):
    rows = []
    eps = 1e-12
    rows.append({"fid": 0, "geometry": W.polygon_wkb(
        [[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]])})
    rows.append({"fid": 1, "geometry": W.polygon_wkb(
        [[(1 + eps, 0), (2, 0), (2, 1), (1 + eps, 1),
          (1 + eps, 0)]])})
    df = spark.createDataFrame(pd.DataFrame(rows))
    strict = check_coverage(df, extent=(0, 0, 2, 1)).toPandas()
    assert strict["n_unmatched"].sum() == 2   # eps breaks pairing
    snapped = check_coverage(df, snap=1e-9,
                             extent=(0, 0, 2, 1)).toPandas()
    assert snapped["n_unmatched"].sum() == 0


# ---------------------------------------------- simplify-coverage

def _densified_cell(i, j, k=4):
    """Unit cell with every edge densified into k collinear
    segments."""
    x0, y0, x1, y1 = float(i), float(j), float(i + 1), float(j + 1)

    def seg(a, b):
        return [(a[0] + (b[0] - a[0]) * t / k,
                 a[1] + (b[1] - a[1]) * t / k) for t in range(k)]

    ring = (seg((x0, y0), (x1, y0)) + seg((x1, y0), (x1, y1))
            + seg((x1, y1), (x0, y1)) + seg((x0, y1), (x0, y0))
            + [(x0, y0)])
    return W.polygon_wkb([ring])


def test_simplify_coverage_removes_collinear_keeps_valid(spark):
    from gdal_spark.operators.coverage import simplify_coverage

    n = 4
    rows = [{"fid": i + j * n, "geometry": _densified_cell(i, j)}
            for j in range(n) for i in range(n)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = simplify_coverage(df, tolerance=0.2)
    pdf = out.toPandas()
    assert len(pdf) == 16
    for _, r in pdf.iterrows():
        g = W.parse_wkb(bytes(r["geometry"]))
        ring = g.parts[0]
        assert len(ring) == 5            # clean unit square
        xs, ys = ring[:, 0], ring[:, 1]
        area = 0.5 * abs(np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1]))
        assert area == pytest.approx(1.0)
    # the simplified layer is STILL a valid coverage
    rep = check_coverage(out, extent=(0, 0, 4, 4)).toPandas()
    assert (rep["n_unmatched"] == 0).all()


def _sawtooth_pair(spark, amp):
    """Two rectangles sharing a sawtooth boundary at x=1."""
    teeth = []
    k = 8
    for t in range(1, k):
        x = 1.0 + (amp if t % 2 else -amp)
        teeth.append((x, t / k))
    left = [(0.0, 0.0), (1.0, 0.0)] + teeth + [(1.0, 1.0),
                                               (0.0, 1.0), (0.0, 0.0)]
    right = [(1.0, 0.0), (2.0, 0.0), (2.0, 1.0), (1.0, 1.0)] \
        + teeth[::-1] + [(1.0, 0.0)]
    rows = [{"fid": 0, "geometry": W.polygon_wkb([left])},
            {"fid": 1, "geometry": W.polygon_wkb([right])}]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_simplify_coverage_shared_arc_consistent(spark):
    """The sawtooth shared boundary simplifies IDENTICALLY on both
    sides — the coverage stays defect-free and total area is
    conserved (what independent per-polygon simplify cannot do)."""
    from gdal_spark.operators.coverage import simplify_coverage

    df = _sawtooth_pair(spark, amp=0.02)
    out = simplify_coverage(df, tolerance=0.2)
    pdf = out.toPandas().set_index("fid")
    areas = {}
    for fid, r in pdf.iterrows():
        ring = W.parse_wkb(bytes(r["geometry"])).parts[0]
        xs, ys = ring[:, 0], ring[:, 1]
        areas[fid] = 0.5 * np.sum(xs[:-1] * ys[1:] - xs[1:] * ys[:-1])
        assert len(ring) < 10            # teeth collapsed
    assert abs(areas[0]) + abs(areas[1]) == pytest.approx(2.0)
    rep = check_coverage(out, extent=(0, 0, 2, 1)).toPandas()
    assert (rep["n_unmatched"] == 0).all()


def test_simplify_coverage_preserve_boundary(spark):
    from gdal_spark.operators.coverage import simplify_coverage

    rows = [{"fid": 0, "geometry": _densified_cell(0, 0)},
            {"fid": 1, "geometry": _densified_cell(1, 0)}]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = simplify_coverage(df, tolerance=0.2,
                            preserve_boundary=True).toPandas() \
        .set_index("fid")
    g0 = W.parse_wkb(bytes(out.loc[0, "geometry"])).parts[0]
    # outer arcs keep their densified vertices; only the shared
    # edge (x=1) simplifies to its 2 endpoints
    on_shared = np.isclose(g0[:-1, 0], 1.0)   # drop closing dup
    assert on_shared.sum() == 2          # simplified shared arc
    assert len(g0) > 10                  # outer boundary untouched


def test_simplify_coverage_snap_heals_ulp_noise(spark):
    """k=6 densification makes the two sides synthesize shared
    vertices that differ in the last ulp (1/6 is not float-exact) —
    without snap those read as junction nodes and pin vertices;
    with snap the lattice simplifies clean."""
    from gdal_spark.operators.coverage import simplify_coverage

    rows = [{"fid": i + j * 2, "geometry": _densified_cell(i, j, k=6)}
            for j in range(2) for i in range(2)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = simplify_coverage(df, tolerance=0.2, snap=1e-9).toPandas()
    for _, r in out.iterrows():
        assert len(W.parse_wkb(bytes(r["geometry"])).parts[0]) == 5
    rep = check_coverage(simplify_coverage(df, 0.2, snap=1e-9),
                         snap=1e-9, extent=(0, 0, 2, 2)).toPandas()
    assert (rep["n_unmatched"] == 0).all()


def test_simplify_coverage_donut_with_filling_island(spark):
    """A donut polygon whose hole is exactly filled by an island
    feature: the hole ring and the island shell are the SAME arc
    set, so both must simplify identically and the pair stays a
    valid coverage with conserved areas."""
    from gdal_spark.operators.coverage import simplify_coverage

    k = 8  # densify each edge into 8 float-exact segments

    def seg(a, b):
        return [(a[0] + (b[0] - a[0]) * t / k,
                 a[1] + (b[1] - a[1]) * t / k) for t in range(k)]

    def rect_ring(x0, y0, x1, y1):
        return (seg((x0, y0), (x1, y0)) + seg((x1, y0), (x1, y1))
                + seg((x1, y1), (x0, y1)) + seg((x0, y1), (x0, y0))
                + [(x0, y0)])

    outer = rect_ring(0, 0, 8, 8)
    # the hole winds OPPOSITE to the island shell so the shared
    # boundary pairs (one forward + one reverse edge per segment)
    hole = rect_ring(2, 2, 6, 6)[::-1]
    rows = [
        {"fid": 0, "geometry": W.polygon_wkb([outer, hole])},
        {"fid": 1, "geometry": W.polygon_wkb(
            [rect_ring(2, 2, 6, 6)])},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = simplify_coverage(df, tolerance=0.3).toPandas() \
        .set_index("fid")

    def ring_areas(g):
        areas = []
        for r in g.parts:
            xs, ys = r[:, 0], r[:, 1]
            areas.append(0.5 * abs(np.sum(
                xs[:-1] * ys[1:] - xs[1:] * ys[:-1])))
        return sorted(areas)

    g0 = W.parse_wkb(bytes(out.loc[0, "geometry"]))
    g1 = W.parse_wkb(bytes(out.loc[1, "geometry"]))
    assert ring_areas(g0) == pytest.approx([16.0, 64.0])
    assert ring_areas(g1) == pytest.approx([16.0])
    assert all(len(r) == 5 for r in g0.parts)
    assert all(len(r) == 5 for r in g1.parts)
    rep = check_coverage(simplify_coverage(df, 0.3),
                         extent=(0, 0, 8, 8)).toPandas()
    assert (rep["n_unmatched"] == 0).all()
