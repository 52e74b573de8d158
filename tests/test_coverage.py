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
