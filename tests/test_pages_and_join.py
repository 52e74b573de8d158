"""Pages synthesizer invariants + the two-stage spatial join vs the
brute-force PIP oracle (golden suite #1 in FIXTURES.md)."""

import numpy as np
import pandas as pd

from gdal_spark.operators.spatial_join import (
    brute_force_join_pdf, spatial_join_points_in_polygons,
)
from gdal_spark.sources import pages as pages_mod
from gdal_spark.sources.pages import (
    coords_for_index, expected_text, extract_text, pages_df,
    with_extracted_geo,
)
from gdal_spark.sources.polygons import poly_fixture_pdf

N = 3000


def test_pages_deterministic_and_text_invariant(spark):
    df = pages_df(spark, 200, partitions=4)
    pdf = df.toPandas().sort_values("i").reset_index(drop=True)
    assert len(pdf) == 200
    assert pdf["url"].is_unique
    # text byte-identical per url vs the oracle (input_hint invariant)
    lon, lat = coords_for_index(pdf["i"].to_numpy())
    np.testing.assert_allclose(pdf["lon"], lon)
    np.testing.assert_allclose(pdf["lat"], lat)
    want = expected_text(pdf["i"].to_numpy(), lon, lat, pdf["lang"])
    assert (pdf["text"].to_numpy() == want.to_numpy()).all()
    # determinism across a second materialization at different parallelism
    pdf2 = (
        pages_df(spark, 200, partitions=2).toPandas()
        .sort_values("i").reset_index(drop=True)
    )
    assert (pdf["html"].map(bytes) == pdf2["html"].map(bytes)).all()


def test_extracted_text_byte_identical(spark):
    df = extract_text(pages_df(spark, 300, partitions=2))
    bad = df.filter("extracted_text <> text").count()
    assert bad == 0


def test_geocode_extraction_close_to_truth(spark):
    df = with_extracted_geo(pages_df(spark, 300, partitions=2))
    pdf = df.select("lon", "lat", "geo_lon", "geo_lat").toPandas()
    # html embeds 6-decimal coords; extraction must match to 1e-6
    np.testing.assert_allclose(pdf["geo_lon"], pdf["lon"], atol=1e-6)
    np.testing.assert_allclose(pdf["geo_lat"], pdf["lat"], atol=1e-6)


def test_spatial_join_matches_brute_force(spark):
    polys = poly_fixture_pdf()
    pts = pages_df(spark, N, partitions=8).select("i", "lon", "lat")
    got = (
        spatial_join_points_in_polygons(spark, pts, polys, res=6)
        .select("i", "fid").toPandas()
        .sort_values(["i", "fid"]).reset_index(drop=True)
    )
    pts_pdf = pts.toPandas()
    want = (
        brute_force_join_pdf(pts_pdf, polys)[["i", "fid"]]
        .sort_values(["i", "fid"]).reset_index(drop=True)
        .astype({"fid": "int64"})
    )
    assert len(want) > 0, "fixture should match some pages"
    pd.testing.assert_frame_equal(got.astype({"fid": "int64"}), want)


def test_spatial_join_res_invariance(spark):
    """Join output must not depend on the prefilter resolution."""
    polys = poly_fixture_pdf()
    pts = pages_df(spark, 1000, partitions=4).select("i", "lon", "lat")
    a = (
        spatial_join_points_in_polygons(spark, pts, polys, res=4)
        .select("i", "fid").toPandas().sort_values(["i", "fid"])
        .reset_index(drop=True)
    )
    b = (
        spatial_join_points_in_polygons(spark, pts, polys, res=8)
        .select("i", "fid").toPandas().sort_values(["i", "fid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_hot_cells_exist():
    """The Zipf mixture creates hot cells (salting has work to do)."""
    i = np.arange(20000)
    lon, lat = coords_for_index(i)
    from gdal_spark.functions import geo

    n = 1 << 7
    span = geo.tile_span(7)
    mx = lon * geo.ORIGIN / 180.0
    my = np.log(np.tan((90 + lat) * np.pi / 360)) / np.pi * geo.ORIGIN
    tx = np.clip(np.floor((mx + geo.ORIGIN) / span + 1e-3), 0, n - 1)
    ty = np.clip(np.floor((geo.ORIGIN - my) / span + 1e-3), 0, n - 1)
    cells = (tx * n + ty).astype(np.int64)
    _, counts = np.unique(cells, return_counts=True)
    assert counts.max() > 50 * np.median(counts)
