"""MVT first-run cost breakdown: run ONE pipeline prefix as the
first real action of a fresh session (after the bench-style python
worker warmup), timing that first run and one repeat.
Usage: python tools/diag_mvt2.py src|cover|shuffle|full"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType)

    from gdal_spark.session import get_spark
    from gdal_spark.sources.mvt import _mvt_encode_frame, _mvt_prepare
    from gdal_spark.sources.pages import pages_coords_df

    which = sys.argv[1]
    spark = get_spark("diag-mvt2", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS), 8))
    spark.sparkContext.setLogLevel("ERROR")
    # bench-style warmup: spin python workers + a small shuffle
    from gdal_spark.sources.polygons import poly_fixture_pdf
    from gdal_spark.operators.spatial_join import (
        spatial_join_points_in_polygons)
    from gdal_spark.operators.tiling import build_pyramid
    warm = pages_coords_df(spark, 50_000)
    spatial_join_points_in_polygons(spark, warm, poly_fixture_pdf(),
                                    res=6).count()
    build_pyramid(warm, base_zoom=5, min_zoom=4,
                  codec="deflate").count()

    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
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

    def src():
        return pages_coords_df(spark, n_geo).mapInPandas(
            _to_wkb, pt_schema)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def piece():
        if which == "src":
            noop(src())
            return
        covered, fid_col, prop_cols, ftypes = _mvt_prepare(
            src(), "geometry", 6, 6, 4096, 0)
        if which == "cover":
            # cover kernel only: strip the repartition+sort by
            # rebuilding the kernel stage (prepare returns post-sort)
            noop(covered)  # includes shuffle+sort; see 'shuffle'
            return
        if which == "shuffle":
            noop(covered)
            return
        frame = _mvt_encode_frame(
            covered, path=None, layer="layer0", extent=4096,
            buffer=0, compress=True, simplification=None,
            fid_col=fid_col, prop_cols=prop_cols,
            field_types=ftypes, geometry_col="geometry")
        noop(frame)

    for i in range(3):
        t0 = time.perf_counter()
        piece()
        print({"which": which, "run": i,
               "t": round(time.perf_counter() - t0, 3)}, flush=True)


if __name__ == "__main__":
    main()
