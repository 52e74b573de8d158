"""General polygon overlay: Greiner-Hormann kernel + layer algebra
mirroring the reference's suite (autotest/ogr/ogr_layer_algebra.py:
A = 2 unit rects, B = 1 spanning rect; Intersection->2, Union->5,
SymDifference->3, Identity->4, Clip->2, Erase->2 features)."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.geometry.overlay import (
    poly_op, polygons_intersect, ring_op,
)
from gdal_spark.geometry.packed import ring_signed_area
from gdal_spark.geometry.wkb import polygon_wkb


def sq(x0, y0, x1, y1):
    return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)],
                    dtype=np.float64)


def area(polys):
    return sum(ring_signed_area(r) for rings in polys for r in rings)


# ---- ring_op kernel ------------------------------------------------


def test_ring_op_basic_rects():
    A, B = sq(0, 0, 10, 10), sq(5, 5, 15, 15)
    assert area(ring_op(A, B, "intersection")) == pytest.approx(25)
    assert area(ring_op(A, B, "union")) == pytest.approx(175)
    assert area(ring_op(A, B, "difference")) == pytest.approx(75)


def test_ring_op_disjoint_contained():
    A, C, D = sq(0, 0, 10, 10), sq(20, 20, 30, 30), sq(2, 2, 4, 4)
    assert ring_op(A, C, "intersection") == []
    assert area(ring_op(A, C, "union")) == pytest.approx(200)
    assert area(ring_op(A, D, "intersection")) == pytest.approx(4)
    # containment difference -> polygon with hole
    diff = ring_op(A, D, "difference")
    assert len(diff) == 1 and len(diff[0]) == 2
    assert area(diff) == pytest.approx(96)


def test_ring_op_concave_multipiece():
    U = np.array([(0, 0), (10, 0), (10, 10), (7, 10), (7, 3), (3, 3),
                  (3, 10), (0, 10), (0, 0)], dtype=np.float64)
    R = sq(-1, 4, 11, 6)
    got = ring_op(U, R, "intersection")
    assert len(got) == 2
    assert area(got) == pytest.approx(12)


def test_ring_op_degenerate_shared_edge():
    A, E = sq(0, 0, 10, 10), sq(10, 0, 20, 10)
    assert area(ring_op(A, E, "intersection")) == pytest.approx(0, abs=1e-6)
    assert area(ring_op(A, E, "union")) == pytest.approx(200, abs=1e-4)
    assert area(ring_op(A, E, "difference")) == pytest.approx(100, abs=1e-4)


def test_ring_op_identical():
    A = sq(0, 0, 10, 10)
    assert area(ring_op(A, A.copy(), "intersection")) == pytest.approx(
        100, abs=1e-4)
    assert area(ring_op(A, A.copy(), "difference")) == pytest.approx(
        0, abs=1e-4)


def test_ring_op_concave_concave_invariants():
    S1 = np.array([(0, 0), (10, 0), (5, 4), (10, 10), (0, 10), (5, 5),
                   (0, 0)], dtype=np.float64)
    S2 = sq(3, -2, 7, 12)
    i = area(ring_op(S1, S2, "intersection"))
    u = area(ring_op(S1, S2, "union"))
    d = area(ring_op(S1, S2, "difference"))
    a1, a2 = ring_signed_area(S1), ring_signed_area(S2)
    assert i + d == pytest.approx(a1, abs=1e-6)
    assert u == pytest.approx(a1 + a2 - i, abs=1e-6)


def test_poly_op_holes():
    Ah = [sq(0, 0, 10, 10), sq(3, 3, 7, 7)[::-1]]
    B = [sq(5, 0, 15, 10)]
    assert area(poly_op(Ah, B, "intersection")) == pytest.approx(42)
    assert area(poly_op(Ah, B, "difference")) == pytest.approx(42)
    # clip hole survives in the difference
    Bh = [sq(5, 0, 15, 10), sq(8, 4, 12, 6)[::-1]]
    assert area(poly_op([sq(0, 0, 10, 10)], Bh, "difference")) == \
        pytest.approx(54)


def test_polygons_intersect_predicate():
    A = [sq(0, 0, 10, 10)]
    assert polygons_intersect(A, [sq(5, 5, 15, 15)])
    assert not polygons_intersect(A, [sq(20, 20, 30, 30)])
    assert polygons_intersect(A, [sq(10, 0, 20, 10)])   # touch
    assert polygons_intersect(A, [sq(2, 2, 4, 4)])      # contained
    # hole makes the small square NOT intersect the interior ring
    holed = [sq(0, 0, 10, 10), sq(2, 2, 8, 8)[::-1]]
    inner = [sq(4, 4, 6, 6)]
    assert not polygons_intersect(holed, inner)


# ---- layer algebra (reference autotest counts) ---------------------


A_WKB = [polygon_wkb([sq(1, 2, 3, 3)]), polygon_wkb([sq(5, 2, 7, 3)])]
B_WKB = [polygon_wkb([sq(2, 1, 6, 4)])]


def _a_df(spark):
    return spark.createDataFrame(pd.DataFrame({
        "fid": np.array([1, 2], dtype=np.int64),
        "geometry": A_WKB,
    }))


def _b_pdf():
    return pd.DataFrame({"fid": np.array([1], dtype=np.int64),
                         "geometry": B_WKB})


def test_algebra_counts_and_areas(spark):
    from gdal_spark.operators.layer_algebra import overlay_general

    cases = {
        "intersection": (2, 2.0),
        # A remainders 1+1, intersections 1+1, B remainder 12-2=10
        "union": (5, 2.0 + 2.0 + 10.0),
        "symdifference": (3, 2.0 + 10.0),
        "identity": (4, 2.0 + 2.0),
        "clip": (2, 2.0),
        "erase": (2, 2.0),
    }
    a = _a_df(spark)
    for op, (n, total) in cases.items():
        got = overlay_general(a.sparkSession, a, _b_pdf(), op).toPandas()
        assert len(got) == n, f"{op}: {len(got)} rows"
        assert got["area"].sum() == pytest.approx(total, abs=1e-4), op


def test_algebra_intersection_geometries(spark):
    """The two intersection rectangles from the reference golden:
    (2 2, 3 3) and (5 2, 6 3)."""
    from gdal_spark.operators.layer_algebra import overlay_general

    a = _a_df(spark)
    got = overlay_general(a.sparkSession, a, _b_pdf(), "intersection") \
        .orderBy("fid").toPandas()
    assert got["fid"].tolist() == [1, 2]
    assert got["area"].tolist() == pytest.approx([1.0, 1.0])


def test_spatial_join_polygons_intersect(spark):
    from gdal_spark.operators.spatial_join import (
        spatial_join_polygons_intersect,
    )

    inp = spark.createDataFrame(pd.DataFrame({
        "fid": np.array([1, 2, 3], dtype=np.int64),
        "geometry": A_WKB + [polygon_wkb([sq(20, 20, 21, 21)])],
    }))
    got = spatial_join_polygons_intersect(spark, inp, _b_pdf()) \
        .toPandas().sort_values("fid")
    assert got["fid"].tolist() == [1, 2]
    assert got["method_fid"].tolist() == [1, 1]


def test_polygons_distance():
    from gdal_spark.geometry.overlay import polygons_distance

    assert polygons_distance([sq(0, 0, 1, 1)], [sq(3, 0, 4, 1)]) == \
        pytest.approx(2.0)
    assert polygons_distance([sq(0, 0, 1, 1)], [sq(2, 2, 3, 3)]) == \
        pytest.approx(np.sqrt(2))
    assert polygons_distance([sq(0, 0, 4, 4)], [sq(1, 1, 2, 2)]) == 0.0
    # brute-force parity on random convex pairs
    rng = np.random.RandomState(3)
    for _ in range(20):
        ax0, ay0 = rng.uniform(0, 10, 2)
        a = sq(ax0, ay0, ax0 + rng.uniform(0.5, 3), ay0 + rng.uniform(0.5, 3))
        bx0, by0 = rng.uniform(12, 20, 2)
        b = sq(bx0, by0, bx0 + rng.uniform(0.5, 3), by0 + rng.uniform(0.5, 3))
        got = polygons_distance([a], [b])
        # dense boundary sampling oracle
        ta = np.linspace(0, 1, 400)
        pa = np.vstack([a[i] + (a[i + 1] - a[i]) * ta[:, None]
                        for i in range(4)])
        pb = np.vstack([b[i] + (b[i + 1] - b[i]) * ta[:, None]
                        for i in range(4)])
        brute = np.sqrt(((pa[:, None, :] - pb[None, :, :]) ** 2)
                        .sum(-1)).min()
        assert got == pytest.approx(brute, abs=1e-2)


def test_union_remainder_salted_hot_method(spark):
    """One country-sized method polygon x hundreds of candidates: the
    salted remainder (S partial differences + an intersection merge)
    must equal the closed-form area and match the unsalted chain —
    the straggler decomposition is exact."""
    import numpy as np
    import pandas as pd

    from gdal_spark.geometry.wkb import polygon_wkb
    from gdal_spark.operators.layer_algebra import overlay_general

    def sq(x0, y0, x1, y1):
        return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1),
                         (x0, y0)], dtype=np.float64)

    method = pd.DataFrame({
        "fid": np.array([0], dtype=np.int64),
        "geometry": [polygon_wkb([sq(0.0, 0.0, 100.0, 100.0)])],
    })
    # 144 disjoint interior squares (area 0.25 each), well separated
    rows = []
    fid = 0
    for i in range(12):
        for j in range(12):
            x0, y0 = 3.25 + 8 * i % 96, 3.25 + 8 * j % 96
            x0, y0 = 2.25 + 8 * (i % 12), 2.25 + 8 * (j % 12)
            rows.append({"fid": fid,
                         "geometry": polygon_wkb(
                             [sq(x0, y0, x0 + 0.5, y0 + 0.5)])})
            fid += 1
    inputs = spark.createDataFrame(pd.DataFrame(rows))

    expected_rem = 100.0 * 100.0 - 144 * 0.25

    out8 = overlay_general(spark, inputs, method, "union",
                           remainder_salt=8).toPandas()
    rem8 = out8[(out8.fid == -1) & (out8.method_fid == 0)]
    assert len(rem8) == 1
    assert abs(rem8["area"].iloc[0] - expected_rem) < 1e-6

    out1 = overlay_general(spark, inputs, method, "union",
                           remainder_salt=1).toPandas()
    rem1 = out1[(out1.fid == -1) & (out1.method_fid == 0)]
    assert abs(rem1["area"].iloc[0] - rem8["area"].iloc[0]) < 1e-6
    # intersection pieces identical either way
    assert len(out8) == len(out1)
    assert abs(out8["area"].sum() - out1["area"].sum()) < 1e-6


def test_intersection_prefilter_bounded_expression(spark):
    """The bbox prefilter must stay O(1) in expression size: with 500
    method features the optimized plan may not contain a per-feature
    OR chain (it uses a broadcast LEFT SEMI join on the bbox table)."""
    import numpy as np
    import pandas as pd

    from gdal_spark.geometry.wkb import polygon_wkb
    from gdal_spark.operators.layer_algebra import overlay_general

    def sq(x0, y0, x1, y1):
        return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1),
                         (x0, y0)], dtype=np.float64)

    meth_rows = []
    for i in range(500):
        x0 = float(i % 50) * 2.0
        y0 = float(i // 50) * 2.0
        meth_rows.append({"fid": i,
                          "geometry": polygon_wkb(
                              [sq(x0, y0, x0 + 1.5, y0 + 1.5)])})
    method = pd.DataFrame(meth_rows)
    inputs = spark.createDataFrame(pd.DataFrame({
        "fid": np.arange(4, dtype=np.int64),
        "geometry": [polygon_wkb([sq(0.2, 0.2, 0.9, 0.9)]),
                     polygon_wkb([sq(10.2, 2.2, 11.4, 3.4)]),
                     polygon_wkb([sq(200.0, 200.0, 201.0, 201.0)]),
                     polygon_wkb([sq(4.2, 0.2, 4.8, 0.8)])],
        "x0": [0.2, 10.2, 200.0, 4.2], "y0": [0.2, 2.2, 200.0, 0.2],
        "x1": [0.9, 11.4, 201.0, 4.8], "y1": [0.9, 3.4, 201.0, 0.8],
    }))
    out = overlay_general(spark, inputs, method, "intersection",
                          bbox_cols=("x0", "y0", "x1", "y1"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("_mx0") < 20  # not expanded per method feature
    assert "LeftSemi" in plan
    got = out.toPandas().sort_values("fid")
    # fids 0 (in method 0), 1 (in method 5), 3 (in method 2) intersect
    assert got["fid"].tolist() == [0, 1, 3]


def test_dissolve_groups(spark):
    """Dissolve: shared-edge cells fuse per group with exact areas;
    a ring of cells produces the holed union; salting parity."""
    import numpy as np
    import pandas as pd
    import pytest

    from gdal_spark.geometry.wkb import parse_wkb, polygon_wkb
    from gdal_spark.operators.layer_algebra import dissolve

    def sq(x0, y0, x1, y1):
        return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1),
                         (x0, y0)])

    rows = []
    fid = 0
    # group 0: a 3x3 block of adjacent unit cells minus the center
    # (dissolves to an 8-cell donut with one hole)
    for i in range(3):
        for j in range(3):
            if i == 1 and j == 1:
                continue
            rows.append({"fid": fid, "grp": 0,
                         "geometry": polygon_wkb(
                             [sq(i, j, i + 1, j + 1)])})
            fid += 1
    # group 1: two overlapping rects + one disjoint
    for r in (sq(10, 0, 12, 2), sq(11, 1, 13, 3), sq(20, 0, 21, 1)):
        rows.append({"fid": fid, "grp": 1, "geometry": polygon_wkb([r])})
        fid += 1
    df = spark.createDataFrame(pd.DataFrame(rows))

    for salt in (1, 8):
        out = dissolve(spark, df, by="grp", n_salt=salt).toPandas() \
            .sort_values("key").reset_index(drop=True)
        assert out["key"].tolist() == [0, 1]
        assert out["area"][0] == pytest.approx(8.0)
        assert out["area"][1] == pytest.approx(4 + 4 - 1 + 1)
        g0 = parse_wkb(bytes(out["geometry"][0]))
        # donut: one part with outer + hole
        po = g0.part_offsets
        assert len(po) - 1 == 1 and po[1] - po[0] == 2
        g1 = parse_wkb(bytes(out["geometry"][1]))
        assert len(g1.part_offsets) - 1 == 2  # merged + disjoint

    # whole-layer dissolve through the pipeline verb
    from gdal_spark.plans.pipeline import run_vector_pipeline

    out = run_vector_pipeline(spark, "read d ! dissolve",
                              layers={"d": df}).toPandas()
    assert len(out) == 1
    assert out["area"][0] == pytest.approx(8.0 + 7.0 + 1.0)


def test_isect_pairs_chunked_equals_block(monkeypatch):
    """Subject-axis chunking of the vectorized pair search returns
    identical crossings (memory stays bounded for huge rings)."""
    import gdal_spark.geometry.overlay as ov

    def ring_edges(cx, n, r):
        a = np.linspace(0, 2 * np.pi, n, endpoint=False)
        pts = np.column_stack([cx + r * np.cos(a), r * np.sin(a)])
        closed = np.vstack([pts, pts[:1]])
        return np.stack([closed[:-1], closed[1:]], axis=1)

    sa = ring_edges(0.0, 157, 1.0)
    ca = ring_edges(1.0, 131, 1.0)
    want = ov._isect_pairs(sa, ca)
    monkeypatch.setattr(ov, "_PAIR_CHUNK_BUDGET", 512)
    got = ov._isect_pairs(sa, ca)
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w, g)


def test_dissolve_string_and_double_keys(spark):
    """A non-numeric `by` column must dissolve per group (carried in
    its own type), never NULL-collapse into one global union; an
    unsupported key type raises."""
    import numpy as np
    import pandas as pd
    import pytest

    from gdal_spark.geometry.wkb import polygon_wkb
    from gdal_spark.operators.layer_algebra import dissolve
    from gdal_spark.plans.pipeline import run_vector_pipeline

    def sq(x0, y0, x1, y1):
        return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1),
                         (x0, y0)])

    rows = []
    for fid, (cty, r) in enumerate([
            ("fr", sq(0, 0, 1, 1)), ("fr", sq(1, 0, 2, 1)),
            ("de", sq(10, 0, 11, 1)),
            ("de", sq(10.5, 0, 11.5, 1))]):
        rows.append({"fid": fid, "country": cty,
                     "w": float(fid % 2),
                     "geometry": polygon_wkb([r])})
    df = spark.createDataFrame(pd.DataFrame(rows))

    out = dissolve(spark, df, by="country").toPandas() \
        .sort_values("key").reset_index(drop=True)
    assert out["key"].tolist() == ["de", "fr"]
    assert out["area"][0] == pytest.approx(1.5)
    assert out["area"][1] == pytest.approx(2.0)

    # same layer through the pipeline verb with a string key
    pout = run_vector_pipeline(spark, "read d ! dissolve country",
                               layers={"d": df}).toPandas()
    assert sorted(pout["key"]) == ["de", "fr"]

    # double key passes through as double
    dout = dissolve(spark, df, by="w").toPandas()
    assert sorted(dout["key"].tolist()) == [0.0, 1.0]

    # scale-0 decimal (the parquet integer surrogate) casts to long
    from pyspark.sql import functions as F2
    ddf = df.withColumn("dk", F2.col("fid").cast("decimal(18,0)"))
    decout = dissolve(spark, ddf, by="dk").toPandas()
    assert sorted(decout["key"].tolist()) == [0, 1, 2, 3]

    # binary key -> fail fast, not NULL-collapse
    from pyspark.sql import functions as F
    with pytest.raises(TypeError, match="dissolve"):
        dissolve(spark, df.withColumnRenamed("geometry", "g")
                 .withColumn("geometry", F.col("g")), by="g")


def test_embedding_dedup_exact_key_dtype_guard(spark):
    """exact-mode block keying pmod's the key: a string key would
    NULL-block every row, so it must raise instead."""
    import pandas as pd
    import pytest

    from gdal_spark.operators.similarity import embedding_dedup

    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": ["a", "b"],
        "vec": [[1.0, 0.0], [0.0, 1.0]]}))
    with pytest.raises(TypeError, match="integral"):
        embedding_dedup(df, key_col="vec_id", vec_col="vec",
                        method="exact")


def test_dissolve_pins_reduce_width(spark):
    """Both dissolve union stages must repartition to an explicit
    width on the group keys (REPARTITION_BY_NUM) so AQE cannot
    coalesce the tiny-byte WKB shuffle to one task and serialize
    the CPU-bound resolver (the q47 single-task regression class)."""
    import numpy as np
    import pandas as pd

    from gdal_spark.geometry.wkb import polygon_wkb
    from gdal_spark.operators.layer_algebra import dissolve

    def sq(x, y):
        return polygon_wkb([np.array(
            [(x, y), (x + 1, y), (x + 1, y + 1), (x, y + 1), (x, y)],
            dtype=np.float64)])

    df = spark.createDataFrame(pd.DataFrame({
        "grp": [1, 1, 2], "geometry": [sq(0, 0), sq(1, 0), sq(5, 5)]}))
    out = dissolve(spark, df, by="grp")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("REPARTITION_BY_NUM") >= 2
    areas = {r.key: round(r.area, 9) for r in out.collect()}
    assert areas == {1: 2.0, 2: 1.0}
