"""Capture .explain("formatted") for the round-7 continuation's
touched queries (packed mvt, cutline hard cut, footprint/polygonize).
Usage: python tools/capture_plans_r07b.py <outdir> <suffix>
Run from the tree whose plans you want (a git worktree for _before).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def cap(df, path: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(path, "w") as fh:
        fh.write(buf.getvalue())
    print("wrote", path)


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    from gdal_spark.session import get_spark
    import __spark_entry__ as em
    from gdal_spark.sources.mvt import _mvt_encode_frame, _mvt_prepare
    from gdal_spark.sources.pages import pages_coords_df

    spark = get_spark("capture-r07b", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # --- packed mvt sink (bench shape: fid + geometry, no props) ---
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

    src = pages_coords_df(spark, 50_000).mapInPandas(_to_wkb,
                                                     pt_schema)
    covered, fid_col, prop_cols, ftypes = _mvt_prepare(
        src, "geometry", 6, 6, 4096, 0)
    blobs = _mvt_encode_frame(
        covered, path=None, layer="layer0", extent=4096, buffer=0,
        compress=True, simplification=None, fid_col=fid_col,
        prop_cols=prop_cols, field_types=ftypes,
        geometry_col="geometry")
    cap(blobs, os.path.join(outdir, f"mvt_tile_sink_{suffix}.txt"))

    # --- q44 cutline hard cut (the full declared query frame) ---
    cap(em.queries()["q44_cutline_mass"](spark, SF_DIR),
        os.path.join(outdir, f"cutline_mass_{suffix}.txt"))

    # --- q51 footprint (polygonize CCL consumer) ---
    cap(em.queries()["q51_footprint_px"](spark, SF_DIR),
        os.path.join(outdir, f"footprint_px_{suffix}.txt"))


if __name__ == "__main__":
    main()
