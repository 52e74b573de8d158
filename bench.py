"""gdal_spark benchmark — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "pages_per_sec": ..., "tiles_per_sec": ...}

The page counts scale with the relational sf so the bench measures
the same relative workload at every scale factor.

Run with BENCH_PARALLELISM=8/32 to override core count (used by
tools/bench_scaling.py for the N->4N scaling-efficiency evidence).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("BENCH_PARALLELISM",
                      os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    from gdal_spark.session import get_spark
    from gdal_spark.sources.pages import CITIES, pages_coords_df, pages_df
    from gdal_spark.sources.polygons import poly_fixture_pdf
    from gdal_spark.operators.spatial_join import (
        spatial_join_points_in_polygons,
    )
    from gdal_spark.operators.knn import knn_cells
    from gdal_spark.operators.tiling import build_pyramid
    from gdal_spark.operators.dedup import minhash_lsh_dedup
    from gdal_spark.operators.similarity import cosine_topk_numpy
    import __spark_entry__ as entrymod

    # scale page counts with sf (sf0.1 -> 2M join pages); BENCH_N_MULT
    # grows the workload for scaling runs so compute dominates the
    # fixed JVM/scheduling overheads
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    mult = float(os.environ.get("BENCH_N_MULT", "1"))
    n_join = int(20_000_000 * sf * mult)
    n_tile = int(10_000_000 * sf * mult)
    n_knn = int(5_000_000 * sf * mult)
    n_geo = int(2_000_000 * sf * mult)

    spark = get_spark("gdal_spark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS), 8))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        return out, dt

    # warmup (untimed): spin up python workers, JIT codegen, load the
    # shipped package on every executor — pytest-benchmark-style
    # calibration so the timed sections measure the operators
    warm_polys = poly_fixture_pdf()
    warm = pages_coords_df(spark, 50_000)
    spatial_join_points_in_polygons(spark, warm, warm_polys, res=6).count()
    build_pyramid(warm, base_zoom=5, min_zoom=4, codec="deflate").count()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    # 1. spatial join: pages x polygon fixture -> count matches
    polys = poly_fixture_pdf()
    pts = pages_coords_df(spark, n_join)
    (_n, dt) = timed(
        "spatial_join",
        lambda: spatial_join_points_in_polygons(
            spark, pts, polys, res=7).count(),
    )
    extras["pages_per_sec"] = round(n_join / dt, 1)

    # 2. tiling: density pyramid z8 -> z4
    pts_t = pages_coords_df(spark, n_tile)
    (n_tiles, dt) = timed(
        "tiling_pyramid",
        lambda: build_pyramid(pts_t, base_zoom=8, min_zoom=4,
                              codec="deflate").count(),
    )
    extras["tiles_per_sec"] = round(n_tiles / dt, 1)
    extras["tile_pages_per_sec"] = round(n_tile / dt, 1)

    # 3. kNN k=1 against the city set
    targets = pd.DataFrame({
        "target_id": np.arange(len(CITIES), dtype=np.int64),
        "t_lon": [c[0] for c in CITIES],
        "t_lat": [c[1] for c in CITIES],
    })
    pts_k = pages_coords_df(spark, n_knn)
    timed("knn_city",
          lambda: knn_cells(pts_k, targets, k=1, res=4).count())

    # 4. geocode extraction (html path, Arrow UDF)
    from gdal_spark.sources.pages import with_extracted_geo

    pg = pages_df(spark, n_geo)
    timed("geocode_extract",
          lambda: with_extracted_geo(pg).select("geo_lat").filter(
              "geo_lat IS NOT NULL").count())

    # 5-7. relational headline queries at SF_DIR
    qs = entrymod.queries()
    for name in ("q01_pricing_summary", "q09_theta_join",
                 "q11_tile_assign", "q15_knn_city"):
        timed(name, lambda n=name: qs[n](spark, SF_DIR).count())

    # 7b. raster ops: rasterize world polygons + zonal over density
    from gdal_spark.operators.rasterize import GridSpec, rasterize
    from gdal_spark.operators.zonal import zonal_stats
    from gdal_spark.operators.tiling import page_density_tiles
    from gdal_spark.sources.polygons import random_polygons_pdf

    rast_grid = GridSpec(-180.0, 85.0, 0.05, 0.05, 7200, 3400)
    polys_1k = random_polygons_pdf(1000)
    timed("rasterize_1k_polys",
          lambda: rasterize(spark, polys_1k, rast_grid, burn_col="fid",
                            dtype="int32").count())

    pts_z = pages_coords_df(spark, int(2_000_000 * sf * mult))
    density = page_density_tiles(pts_z, zoom=6, codec="deflate").cache()
    density.count()
    from gdal_spark.functions import geo as _geo

    zres = _geo.tile_span(6) / 256
    zgrid = GridSpec(-_geo.ORIGIN, _geo.ORIGIN, zres, zres,
                     64 * 256, 64 * 256)
    # mercator-space zone rectangles
    from gdal_spark.geometry.wkb import polygon_wkb

    rng = np.random.RandomState(7)
    zrows = []
    for fid in range(200):
        cx = rng.uniform(-0.9, 0.9) * _geo.ORIGIN
        cy = rng.uniform(-0.9, 0.9) * _geo.ORIGIN
        wdt = rng.uniform(0.01, 0.05) * _geo.ORIGIN
        ring = np.array([
            (cx - wdt, cy - wdt), (cx + wdt, cy - wdt),
            (cx + wdt, cy + wdt), (cx - wdt, cy + wdt),
            (cx - wdt, cy - wdt)])
        zrows.append({"fid": fid, "geometry": polygon_wkb([ring])})
    zones = pd.DataFrame(zrows)
    timed("zonal_stats_200_zones",
          lambda: zonal_stats(spark, density, zones, zgrid).count())
    density.unpersist()

    # 7c. general polygon overlay (Greiner-Hormann layer algebra)
    from gdal_spark.operators.layer_algebra import overlay_general

    rects = entrymod._overlay_rects_df(spark, SF_DIR)
    timed("overlay_general",
          lambda: overlay_general(spark, rects,
                                  entrymod._overlay_method_pdf(),
                                  "intersection",
                                  bbox_cols=("x0", "y0",
                                             "x1", "y1")).count())

    # 7d. buffer + makevalid over the random polygon layer (SQL UDFs)
    from gdal_spark.sql.ogrsql import _register_geom_udfs

    _register_geom_udfs(spark)
    polys_b = spark.createDataFrame(random_polygons_pdf(2000))
    polys_b.createOrReplaceTempView("bench_polys")
    timed("buffer_2k_polys",
          lambda: spark.sql(
              "SELECT COUNT(st_buffer(geometry, CAST(0.5 AS DOUBLE)))"
              " AS n FROM bench_polys").collect())

    # 7e. line-layer clip (round-3 lower-dimension layer algebra)
    from gdal_spark.operators.layer_algebra import overlay_lines

    lines_df = entrymod._overlay_lines_df(spark, SF_DIR)
    timed("line_clip",
          lambda: overlay_lines(spark, lines_df,
                                entrymod._overlay_method_pdf(),
                                "clip").count())

    # 7f. cutline clip with blend distance over the z=6 density
    from gdal_spark.geometry.wkb import polygon_wkb as _pw
    from gdal_spark.operators.cutline import cutline_clip
    from gdal_spark.operators.tiling import page_density_tiles

    cut_tiles = page_density_tiles(
        pages_coords_df(spark, int(1_000_000 * sf * mult)),
        zoom=4).cache()
    cut_tiles.count()
    # continental-scale cutline (~1/10 of the world)
    cring = np.array([(-6e6, -2e6), (2e6, -1.5e6), (1.5e6, 5e6),
                      (-5e6, 4.5e6), (-6e6, -2e6)])
    cut_pdf = pd.DataFrame({"fid": np.array([0], dtype=np.int64),
                            "geometry": [_pw([cring])]})
    from gdal_spark.operators.rasterize import GridSpec as _GS

    zres = _geo.tile_span(4) / 256
    cgrid = _GS(-_geo.ORIGIN, _geo.ORIGIN, zres, zres,
                16 * 256, 16 * 256)
    timed("cutline_blend",
          lambda: cutline_clip(spark, cut_tiles, cut_pdf, cgrid,
                               blend_px=3.0, nodata=0.0).count())

    # 7g. PNG tile encode throughput (z/x/y slippy-map sink)
    import shutil
    import tempfile

    from gdal_spark.operators.tiling import write_tiles

    png_dir = tempfile.mkdtemp(prefix="gdal_spark_png_")
    try:
        timed("png_tile_sink",
              lambda: write_tiles(cut_tiles, png_dir,
                                  convention="xyz", format="png"))
    finally:
        shutil.rmtree(png_dir, ignore_errors=True)
    jpg_dir = tempfile.mkdtemp(prefix="gdal_spark_jpg_")
    try:
        timed("jpeg_tile_sink",
              lambda: write_tiles(cut_tiles, jpg_dir,
                                  convention="xyz", format="jpeg"))
    finally:
        shutil.rmtree(jpg_dir, ignore_errors=True)
    from gdal_spark.sources.geopackage import write_gpkg_tiles

    gpkg_dir = tempfile.mkdtemp(prefix="gdal_spark_gpkg_")
    try:
        timed("gpkg_tile_sink",
              lambda: write_gpkg_tiles(
                  cut_tiles, os.path.join(gpkg_dir, "pyr.gpkg"),
                  format="png"))
    finally:
        shutil.rmtree(gpkg_dir, ignore_errors=True)
    cut_tiles.unpersist()

    # 7e. MVT vector-tile sink: n_geo points -> z6 .pbf pyramid
    # (sources/mvt.py; vectorized point cover + all-points flush)
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from gdal_spark.sources.mvt import write_mvt

    mvt_pts = pages_coords_df(spark, n_geo)
    pt_schema = StructType([StructField("fid", LongType()),
                            StructField("geometry", BinaryType())])

    def _to_wkb(batches):
        for b in batches:
            n = len(b)
            arr = np.empty(n, dtype=[("hdr", "S5"), ("x", "<f8"),
                                     ("y", "<f8")])
            arr["hdr"] = b"\x01\x01\x00\x00\x00"
            arr["x"] = b["lon"].to_numpy()
            arr["y"] = b["lat"].to_numpy()
            raw = arr.tobytes()
            yield pd.DataFrame({
                "fid": b["i"].to_numpy(),
                "geometry": [raw[i * 21:(i + 1) * 21]
                             for i in range(n)],
            })

    mvt_dir = tempfile.mkdtemp(prefix="gdal_spark_mvt_")
    try:
        timed("mvt_tile_sink",
              lambda: write_mvt(
                  mvt_pts.mapInPandas(_to_wkb, pt_schema),
                  os.path.join(mvt_dir, "tiles.mvt"),
                  minzoom=6, maxzoom=6, buffer=0))
    finally:
        shutil.rmtree(mvt_dir, ignore_errors=True)

    # 8. minhash dedup over documents
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("minhash_dedup", lambda: minhash_lsh_dedup(docs).count())

    # 8a2. exact duplicate-passage stats (pure-JVM windowed
    # substring dedup signal — zero Python in the plan)
    from gdal_spark.functions.text import duplicate_passage_stats

    timed("dup_passages",
          lambda: duplicate_passage_stats(docs, window=8)
          .agg(F.sum("n_dup_windows")).collect())

    # 8b. embedding-cosine dedup, banded-LSH 100-TB path
    emb_d = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from gdal_spark.operators.similarity import embedding_dedup

    timed("embedding_dedup_lsh",
          lambda: embedding_dedup(emb_d, 0.95, method="lsh").count())

    # 9. ANN cosine top-k
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qpdf = emb.filter(F.col("vec_id") < 8).toPandas()
    queries = pd.DataFrame({
        "query_id": qpdf["vec_id"].astype(np.int64),
        "query_vec": [list(map(float, v)) for v in qpdf["embedding"]],
    })
    timed("ann_cosine_topk",
          lambda: cosine_topk_numpy(emb, queries, k=10).count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "gdal_spark headline suite (spatial join + tiling + "
                  "kNN + geocode + relational + dedup + ANN)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "parallelism": int(CPUS),
        **extras,
    }))


if __name__ == "__main__":
    main()
