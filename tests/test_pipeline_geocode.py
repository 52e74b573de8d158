"""gdal-style pipeline + geocode cache."""

import pytest

from gdal_spark.plans.pipeline import run_vector_pipeline
from gdal_spark.sources.geocode import geocode_with_cache
from gdal_spark.sources.pages import pages_df


def test_pipeline_end_to_end(spark, tmp_path, sf_dir):
    out = str(tmp_path / "out")
    run_vector_pipeline(
        spark,
        f"read {sf_dir}/orders.parquet"
        " ! filter \"o_totalprice > 1000 AND o_orderpriority = '1-URGENT'\""
        " ! select o_orderkey,o_totalprice"
        " ! sort o_totalprice desc ! limit 5"
        f" ! write {out}",
    )
    back = spark.read.parquet(out)
    assert back.count() == 5
    prices = [r.o_totalprice for r in back.orderBy("o_totalprice").collect()]
    assert prices == sorted(prices)


def test_pipeline_sql_and_reproject(spark):
    pts = pages_df(spark, 100, partitions=2).select("i", "lon", "lat")
    df = run_vector_pipeline(
        spark,
        "read pts ! reproject 4326->3857"
        " ! sql \"SELECT i, x, y FROM input WHERE i < 10\"",
        layers={"pts": pts},
    )
    rows = df.collect()
    assert len(rows) == 10
    assert all(abs(r.x) <= 20037508.35 for r in rows)


def test_pipeline_validation(spark):
    with pytest.raises(ValueError):
        run_vector_pipeline(spark, "filter \"a > 1\" ! write /tmp/x")
    with pytest.raises(ValueError):
        run_vector_pipeline(
            spark, "read a ! write /tmp/x ! filter \"a > 1\"")


def test_geocode_cache_roundtrip(spark, tmp_path):
    cache = str(tmp_path / "geocache")
    pages = pages_df(spark, 50, partitions=2).select("url", "html")
    first = geocode_with_cache(spark, pages, cache).toPandas()
    assert len(first) == 50
    assert not first["from_cache"].any()
    second = geocode_with_cache(spark, pages, cache).toPandas()
    assert len(second) == 50
    assert second["from_cache"].all()
    # cached coords identical to the first extraction
    a = first.set_index("url")[["lat", "lon"]].sort_index()
    b = second.set_index("url")[["lat", "lon"]].sort_index()
    assert ((a - b).abs().to_numpy() < 1e-12).all()


def test_pipeline_geometry_verbs(spark):
    """gdal vector <verb> family through the pipeline surface:
    make-point, buffer (closed-form area), clip-bbox, segmentize,
    convex-hull, swap-xy, explode, make-valid, simplify."""
    import numpy as np
    import pandas as pd
    import pytest

    from gdal_spark.geometry.packed import geom_area
    from gdal_spark.geometry.wkb import (
        linestring_wkb, multipolygon_wkb, parse_wkb, polygon_wkb,
    )
    from gdal_spark.plans.pipeline import run_vector_pipeline

    def sq(x0, y0, x1, y1):
        return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1),
                         (x0, y0)])

    polys = spark.createDataFrame(pd.DataFrame({
        "fid": np.arange(3, dtype=np.int64),
        "geometry": [polygon_wkb([sq(0, 0, 2, 1)]),
                     polygon_wkb([sq(5, 5, 8, 9)]),
                     polygon_wkb([sq(20, 20, 21, 21)])],
    }))

    # buffer: closed-form area w*h + 2d(w+h) + 16 sin(pi/16) d^2
    out = run_vector_pipeline(
        spark, "read polys ! buffer 0.5", layers={"polys": polys}
    ).toPandas().sort_values("fid")
    fan = 16 * np.sin(np.pi / 16) * 0.25
    for (w, h), wkb in zip([(2, 1), (3, 4), (1, 1)], out["geometry"]):
        assert geom_area(parse_wkb(bytes(wkb))) == pytest.approx(
            w * h + 2 * 0.5 * (w + h) + fan, rel=1e-9)

    # clip-bbox drops non-overlapping features, clips the rest
    out = run_vector_pipeline(
        spark, "read polys ! clip-bbox 1 0 6 6",
        layers={"polys": polys}).toPandas().sort_values("fid")
    assert out["fid"].tolist() == [0, 1]
    areas = [geom_area(parse_wkb(bytes(w))) for w in out["geometry"]]
    assert areas[0] == pytest.approx(1.0)   # [1,2]x[0,1]
    assert areas[1] == pytest.approx(1.0)   # [5,6]x[5,6]

    # segmentize + convex-hull + swap-xy round trip structure
    out = run_vector_pipeline(
        spark, "read polys ! segmentize 0.25 ! convex-hull ! swap-xy",
        layers={"polys": polys}).toPandas().sort_values("fid")
    g0 = parse_wkb(bytes(out.iloc[0]["geometry"]))
    assert g0.kind == 3
    assert geom_area(g0) == pytest.approx(2.0)  # swap keeps area
    xs = np.vstack(g0.rings())[:, 0]
    assert xs.min() == pytest.approx(0.0) and xs.max() == \
        pytest.approx(1.0)  # swapped: x now spans the old y range

    # explode: multipolygon -> rows per part
    multi = spark.createDataFrame(pd.DataFrame({
        "fid": np.array([7], dtype=np.int64),
        "geometry": [multipolygon_wkb(
            [[sq(0, 0, 1, 1)], [sq(3, 3, 4, 4)]])],
    }))
    out = run_vector_pipeline(spark, "read m ! explode",
                              layers={"m": multi}).toPandas()
    assert len(out) == 2
    assert all(parse_wkb(bytes(w)).kind == 3 for w in out["geometry"])

    # make-valid on a bowtie: area w*h/2 of the figure-eight square
    bow = spark.createDataFrame(pd.DataFrame({
        "fid": np.array([0], dtype=np.int64),
        "geometry": [polygon_wkb([np.array(
            [(0, 0), (2, 2), (0, 2), (2, 0), (0, 0)], float)])],
    }))
    out = run_vector_pipeline(spark, "read b ! make-valid",
                              layers={"b": bow}).toPandas()
    assert geom_area(parse_wkb(bytes(out.iloc[0]["geometry"]))) \
        == pytest.approx(2.0)

    # make-point from columns, then clip-bbox on lines via simplify
    pts = spark.createDataFrame(pd.DataFrame({
        "k": [1, 2], "x": [1.5, 9.0], "y": [2.5, 9.0]}))
    out = run_vector_pipeline(spark, "read p ! make-point x y",
                              layers={"p": pts}).toPandas()
    g = parse_wkb(bytes(out.iloc[0]["geometry"]))
    assert g.kind == 1 and g.parts[0][0, 0] == 1.5

    # simplify a densified line
    lines = spark.createDataFrame(pd.DataFrame({
        "fid": np.array([0], dtype=np.int64),
        "geometry": [linestring_wkb(
            np.column_stack([np.linspace(0, 10, 101),
                             np.zeros(101)]))],
    }))
    out = run_vector_pipeline(spark, "read l ! simplify 0.01",
                              layers={"l": lines}).toPandas()
    g = parse_wkb(bytes(out.iloc[0]["geometry"]))
    assert len(g.parts[0]) == 2  # collinear chain collapses


def test_pipeline_verbs_multipart_inputs(spark):
    """Multi-part inputs through the geometry verbs: a MULTIPOLYGON's
    later shells must stay shells (NOT demote to holes of the first),
    and MULTIPOINT dispatches as points."""
    import numpy as np
    import pandas as pd
    import pytest

    from gdal_spark.geometry import wkb as W
    from gdal_spark.geometry.packed import geom_area
    from gdal_spark.geometry.wkb import (
        multipoint_wkb, multipolygon_wkb, parse_wkb,
    )
    from gdal_spark.plans.pipeline import run_vector_pipeline

    def sq(x0, y0, x1, y1):
        return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1),
                         (x0, y0)])

    # unit square + disjoint 2x2 square: total area 5.0
    mp = multipolygon_wkb([[sq(0, 0, 1, 1)], [sq(10, 0, 12, 2)]])
    layer = spark.createDataFrame(pd.DataFrame({
        "fid": np.array([0], dtype=np.int64), "geometry": [mp]}))

    for verb, area in [("swap-xy", 5.0), ("segmentize 0.5", 5.0),
                       ("simplify 0.001", 5.0),
                       ("simplify-preserve-topology 0.001", 5.0),
                       ("clip-bbox -1 -1 50 50", 5.0)]:
        out = run_vector_pipeline(spark, f"read a ! {verb}",
                                  layers={"a": layer}).toPandas()
        g = parse_wkb(bytes(out["geometry"][0]))
        assert g.kind == W.MULTIPOLYGON, verb
        assert len(g.part_offsets) - 1 == 2, verb
        assert geom_area(g) == pytest.approx(area, rel=1e-9), verb

    # buffer: two disjoint rounded squares, area = sum of closed forms
    out = run_vector_pipeline(spark, "read a ! buffer 0.25",
                              layers={"a": layer}).toPandas()
    g = parse_wkb(bytes(out["geometry"][0]))
    fan = 16 * np.sin(np.pi / 16) * 0.0625
    want = sum(w * h + 2 * 0.25 * (w + h) + fan
               for (w, h) in [(1, 1), (2, 2)])
    assert geom_area(g) == pytest.approx(want, rel=1e-9)

    # MULTIPOINT: swap-xy stays a MULTIPOINT, buffer makes 2 discs
    mpt = multipoint_wkb([(1.0, 2.0), (3.0, 4.0)])
    ptl = spark.createDataFrame(pd.DataFrame({
        "fid": np.array([0], dtype=np.int64), "geometry": [mpt]}))
    out = run_vector_pipeline(spark, "read a ! swap-xy",
                              layers={"a": ptl}).toPandas()
    g = parse_wkb(bytes(out["geometry"][0]))
    assert g.kind == W.MULTIPOINT
    np.testing.assert_allclose(np.vstack(g.parts),
                               [(2.0, 1.0), (4.0, 3.0)])
    out = run_vector_pipeline(spark, "read a ! buffer 1",
                              layers={"a": ptl}).toPandas()
    g = parse_wkb(bytes(out["geometry"][0]))
    assert g.kind == W.MULTIPOLYGON
    assert geom_area(g) == pytest.approx(
        2 * 32 * np.sin(np.pi / 32) * np.cos(np.pi / 32), rel=1e-6)

    # LINESTRING buffer through the verb: rectangle + full cap circle
    from gdal_spark.geometry.wkb import linestring_wkb
    lin = spark.createDataFrame(pd.DataFrame({
        "fid": np.array([0], dtype=np.int64),
        "geometry": [linestring_wkb(
            np.array([(0.0, 0.0), (2.0, 0.0)]))]}))
    out = run_vector_pipeline(spark, "read a ! buffer 0.5",
                              layers={"a": lin}).toPandas()
    g = parse_wkb(bytes(out["geometry"][0]))
    assert geom_area(g) == pytest.approx(
        2 * 0.5 * 2 + 16 * np.sin(np.pi / 16) * 0.25, rel=1e-6)


def test_pipeline_check_geometry(spark):
    """check-geometry flags bowties and truncated WKB, passes valid
    rings (gdalalg_vector_check_geometry.cpp)."""
    import numpy as np
    import pandas as pd

    from gdal_spark.geometry.wkb import polygon_wkb
    from gdal_spark.plans.pipeline import run_vector_pipeline

    def sq(x0, y0, x1, y1):
        return np.array([(x0, y0), (x1, y0), (x1, y1), (x0, y1),
                         (x0, y0)])

    bow = np.array([(0, 0), (2, 2), (0, 2), (2, 0), (0, 0)], float)
    df = spark.createDataFrame(pd.DataFrame({
        "fid": np.arange(3, dtype=np.int64),
        "geometry": [polygon_wkb([sq(0, 0, 1, 1)]),
                     polygon_wkb([bow]),
                     b"\x01\x03\x00"],
    }))
    out = run_vector_pipeline(spark, "read g ! check-geometry",
                              layers={"g": df}).toPandas() \
        .sort_values("fid")
    assert out["geom_valid"].tolist() == [1, 0, 0]
