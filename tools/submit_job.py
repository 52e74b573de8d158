"""spark-submit entry point: the north rule's deployment mode.

Run (from ANY cwd — the engine must come from --py-files, not the
repo checkout):

    cd /tmp && spark-submit --master local[4] \
        --py-files /tmp/gdal_spark.zip \
        /root/repo/tools/submit_job.py

Builds nothing locally: imports gdal_spark from the shipped zip,
runs the flagship spatial join + a pyramid level, prints ONE JSON
line.  tools/make_pyfiles_zip.py builds the zip.
"""

from __future__ import annotations

import json
import time


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("gdal_spark-submit-smoke")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # imported from the --py-files zip on driver AND executors
    from gdal_spark.operators.spatial_join import (
        spatial_join_points_in_polygons,
    )
    from gdal_spark.operators.tiling import build_pyramid
    from gdal_spark.sources.pages import pages_coords_df, pages_df
    from gdal_spark.sources.polygons import poly_fixture_pdf

    t0 = time.time()
    pts = pages_df(spark, 200_000).select("i", "lon", "lat")
    joined = spatial_join_points_in_polygons(
        spark, pts, poly_fixture_pdf(), res=6)
    n_join = joined.count()
    n_tiles = build_pyramid(pages_coords_df(spark, 200_000),
                            base_zoom=6, min_zoom=4,
                            codec="deflate").count()
    print(json.dumps({
        "submitted_via": "spark-submit --py-files",
        "join_rows": int(n_join),
        "pyramid_tiles": int(n_tiles),
        "sec": round(time.time() - t0, 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
