"""Non-broadcast spatial join, footprint, pansharpen, IVF ANN."""

import numpy as np
import pandas as pd

from gdal_spark.operators.spatial_join import (
    spatial_join_big_polygons, spatial_join_points_in_polygons,
)
from gdal_spark.sources.pages import pages_df
from gdal_spark.sources.polygons import poly_fixture_pdf, random_polygons


def test_big_polygon_join_matches_broadcast(spark):
    pts = pages_df(spark, 2000, partitions=4).select("i", "lon", "lat")
    polys_pdf = poly_fixture_pdf()
    want = (
        spatial_join_points_in_polygons(spark, pts, polys_pdf, res=6)
        .select("i", "fid").toPandas()
        .sort_values(["i", "fid"]).reset_index(drop=True)
    )
    polys_df = spark.createDataFrame(polys_pdf[["fid", "geometry"]])
    got = (
        spatial_join_big_polygons(spark, pts, polys_df, res=6)
        .select("i", "fid").toPandas()
        .sort_values(["i", "fid"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_big_polygon_join_many_polys(spark):
    pts = pages_df(spark, 1000, partitions=4).select("i", "lon", "lat")
    polys_pdf = random_polygons(spark, 300).toPandas()
    polys_df = spark.createDataFrame(polys_pdf[["fid", "geometry"]])
    got = (
        spatial_join_big_polygons(spark, pts, polys_df, res=5)
        .select("i", "fid").toPandas()
        .sort_values(["i", "fid"]).reset_index(drop=True)
    )
    from gdal_spark.operators.spatial_join import brute_force_join_pdf

    want = (
        brute_force_join_pdf(pts.toPandas(), polys_pdf)[["i", "fid"]]
        .sort_values(["i", "fid"]).reset_index(drop=True)
        .astype({"fid": "int64"})
    )
    pd.testing.assert_frame_equal(got.astype({"fid": "int64"}), want)


def test_footprint(spark):
    from gdal_spark.operators.footprint import footprint_tiles
    from gdal_spark.operators.warp import tiles_from_array
    from gdal_spark.geometry.wkb import parse_wkb
    from gdal_spark.geometry.packed import geom_area

    arr = np.zeros((32, 32))
    arr[4:28, 6:26] = 7.0
    arr[10:14, 10:14] = 0.0  # interior hole
    tiles, w, h = tiles_from_array(spark, arr, tile_size=16)
    gt = [0.0, 1.0, 0.0, 32.0, 0.0, -1.0]
    out = footprint_tiles(tiles, gt).toPandas()
    assert len(out) == 1
    g = parse_wkb(bytes(out["geometry"].iloc[0]))
    assert len(g.rings()) == 2  # outer + hole
    assert geom_area(g) == 24 * 20 - 16
    hulled = footprint_tiles(tiles, gt, hull=True).toPandas()
    gh = parse_wkb(bytes(hulled["geometry"].iloc[0]))
    assert len(gh.rings()) == 1
    assert geom_area(gh) >= 24 * 20 - 16


def test_pansharpen(spark):
    from gdal_spark.operators.footprint import pansharpen
    from gdal_spark.operators.rasterize import GridSpec, assemble_raster
    from gdal_spark.operators.warp import tiles_from_array

    rng = np.random.RandomState(4)
    r = rng.uniform(10, 50, (32, 32))
    g = rng.uniform(10, 50, (32, 32))
    pan = (r + g) / 2 * 1.2
    tr, _, _ = tiles_from_array(spark, r, tile_size=32)
    tg, _, _ = tiles_from_array(spark, g, tile_size=32)
    tp, _, _ = tiles_from_array(spark, pan, tile_size=32)
    out = pansharpen(tp, {"r": tr, "g": tg}, {"r": 0.5, "g": 0.5})
    grid = GridSpec(0.0, 32.0, 1.0, 1.0, 32, 32)
    got_r = assemble_raster(out["r"].toPandas(), grid)
    want_r = r * pan / (0.5 * r + 0.5 * g)
    np.testing.assert_allclose(got_r, want_r)


def test_ivf_topk_recall(spark, sf_dir):
    from gdal_spark.operators.similarity import cosine_topk_numpy, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    qpdf = emb.limit(5).toPandas()
    queries = pd.DataFrame({
        "query_id": np.arange(5, dtype=np.int64),
        "query_vec": [list(map(float, v)) for v in qpdf["embedding"]],
    })
    exact = cosine_topk_numpy(emb, queries, k=5).toPandas()
    approx = ivf_topk(emb, queries, k=5, n_clusters=8, n_probe=4) \
        .toPandas()
    hits = 0
    for qid in range(5):
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        hits += len(e & a)
    assert hits / 25 >= 0.6
    # the query vector itself lives in a probed list -> top-1 self hit
    top1 = approx[approx["rank"] == 1].sort_values("query_id")
    assert top1["vec_id"].tolist() == qpdf["vec_id"].tolist()
