"""Per-operator isolation bench (guide §1.4): times ONE operator
with the noop sink, best-of-N in one session, so changes can be
attributed without the full-suite drift.  Not used by the driver —
bench.py stays the frozen measurement.

Usage:  python bench_extra.py <op>[,<op>...] [repeats]
Ops: dup_passages, minhash, mvt, pyramid, zonal, spatial_join,
     geocode, embedding, simhash, density
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
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from gdal_spark.session import get_spark

    ops = sys.argv[1].split(",") if len(sys.argv) > 1 else ["dup_passages"]
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("gdal_spark-bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS), 8))
    spark.sparkContext.setLogLevel("ERROR")
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()  # warm FS cache + executors
    # spin python workers + ship package, like bench.py's untimed
    # warmup section does before any timed query runs
    from gdal_spark.sources.pages import pages_coords_df
    from gdal_spark.sources.polygons import poly_fixture_pdf
    from gdal_spark.operators.spatial_join import (
        spatial_join_points_in_polygons)
    from gdal_spark.operators.tiling import build_pyramid
    warm = pages_coords_df(spark, 50_000)
    spatial_join_points_in_polygons(spark, warm, poly_fixture_pdf(),
                                    res=6).count()
    build_pyramid(warm, base_zoom=5, min_zoom=4,
                  codec="deflate").count()

    def run(name, thunk):
        times = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            thunk()
            times.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"op": name, "times": times,
                          "min": min(times)}), flush=True)

    for op in ops:
        if op == "dup_passages":
            from gdal_spark.functions.text import duplicate_passage_stats
            run("dup_passages", lambda: duplicate_passage_stats(
                docs, window=8).agg(F.sum("n_dup_windows")).collect())
        elif op == "passage_removal":
            from gdal_spark.functions.text import remove_duplicate_passages
            run("passage_removal", lambda: noop(
                remove_duplicate_passages(docs, window=8)))
        elif op == "minhash":
            from gdal_spark.operators.dedup import minhash_lsh_dedup
            run("minhash", lambda: minhash_lsh_dedup(docs).count())
        elif op == "simhash":
            from gdal_spark.operators.dedup import (
                simhash_candidates, simhash_signatures)
            run("simhash", lambda: simhash_candidates(
                simhash_signatures(docs)).count())
        elif op == "mvt":
            import shutil
            import tempfile
            from pyspark.sql.types import (
                BinaryType, LongType, StructField, StructType)
            from gdal_spark.sources.mvt import write_mvt
            from gdal_spark.sources.pages import pages_coords_df

            n_geo = int(2_000_000 * sf)
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

            def go():
                mvt_pts = pages_coords_df(spark, n_geo)
                mvt_dir = tempfile.mkdtemp(prefix="gs_bx_mvt_")
                try:
                    write_mvt(mvt_pts.mapInPandas(_to_wkb, pt_schema),
                              os.path.join(mvt_dir, "tiles.mvt"),
                              minzoom=6, maxzoom=6, buffer=0)
                finally:
                    shutil.rmtree(mvt_dir, ignore_errors=True)
            run("mvt", go)
        elif op == "pyramid":
            from gdal_spark.operators.tiling import build_pyramid
            from gdal_spark.sources.pages import pages_coords_df
            pts_t = pages_coords_df(spark, int(10_000_000 * sf))
            run("pyramid", lambda: build_pyramid(
                pts_t, base_zoom=8, min_zoom=4, codec="deflate").count())
        elif op == "density":
            from gdal_spark.operators.tiling import page_density_tiles
            from gdal_spark.sources.pages import pages_coords_df
            pts_z = pages_coords_df(spark, int(2_000_000 * sf))
            run("density", lambda: page_density_tiles(
                pts_z, zoom=6, codec="deflate").count())
        elif op == "zonal":
            from gdal_spark.functions import geo as _geo
            from gdal_spark.geometry.wkb import polygon_wkb
            from gdal_spark.operators.rasterize import GridSpec
            from gdal_spark.operators.tiling import page_density_tiles
            from gdal_spark.operators.zonal import zonal_stats
            from gdal_spark.sources.pages import pages_coords_df

            pts_z = pages_coords_df(spark, int(2_000_000 * sf))
            density = page_density_tiles(pts_z, zoom=6,
                                         codec="deflate").cache()
            density.count()
            zres = _geo.tile_span(6) / 256
            zgrid = GridSpec(-_geo.ORIGIN, _geo.ORIGIN, zres, zres,
                             64 * 256, 64 * 256)
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
            run("zonal", lambda: zonal_stats(
                spark, density, zones, zgrid).count())
            density.unpersist()
        elif op == "spatial_join":
            from gdal_spark.operators.spatial_join import (
                spatial_join_points_in_polygons)
            from gdal_spark.sources.pages import pages_coords_df
            from gdal_spark.sources.polygons import poly_fixture_pdf
            polys = poly_fixture_pdf()
            pts = pages_coords_df(spark, int(20_000_000 * sf))
            run("spatial_join", lambda: spatial_join_points_in_polygons(
                spark, pts, polys, res=7).count())
        elif op == "geocode":
            from gdal_spark.sources.pages import (
                pages_df, with_extracted_geo)
            pg = pages_df(spark, int(2_000_000 * sf))
            run("geocode", lambda: with_extracted_geo(pg)
                .select("geo_lat").filter("geo_lat IS NOT NULL").count())
        elif op == "embedding":
            from gdal_spark.operators.similarity import embedding_dedup
            emb_d = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            run("embedding", lambda: embedding_dedup(
                emb_d, 0.95, method="lsh").count())
        elif op == "rasterize":
            from gdal_spark.operators.rasterize import GridSpec, rasterize
            from gdal_spark.sources.polygons import random_polygons_pdf
            rast_grid = GridSpec(-180.0, 85.0, 0.05, 0.05, 7200, 3400)
            polys_1k = random_polygons_pdf(1000)
            run("rasterize", lambda: rasterize(
                spark, polys_1k, rast_grid, burn_col="fid",
                dtype="int32").count())
        else:
            print(f"unknown op {op}", file=sys.stderr)


if __name__ == "__main__":
    main()
