"""MVT sink cold-tail diagnosis: times (a) the cover+encode with
blob output (no files), (b) the file sink on /tmp, (c) the file sink
on /dev/shm, interleaved, in one session."""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
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
    from gdal_spark.sources.mvt import (
        _mvt_encode_frame, _mvt_prepare, write_mvt)
    from gdal_spark.sources.pages import pages_coords_df

    spark = get_spark("diag-mvt", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS), 8))
    spark.sparkContext.setLogLevel("ERROR")
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

    def run_blob():
        covered, fid_col, prop_cols, ftypes = _mvt_prepare(
            src(), "geometry", 6, 6, 4096, 0)
        frame = _mvt_encode_frame(
            covered, path=None, layer="layer0", extent=4096,
            buffer=0, compress=True, simplification=None,
            fid_col=fid_col, prop_cols=prop_cols,
            field_types=ftypes, geometry_col="geometry")
        frame.write.format("noop").mode("overwrite").save()

    def run_files(base):
        d = tempfile.mkdtemp(prefix="gs_diag_mvt_", dir=base)
        try:
            write_mvt(src(), os.path.join(d, "tiles.mvt"),
                      minzoom=6, maxzoom=6, buffer=0)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    for it in range(4):
        t0 = time.perf_counter(); run_blob()
        tb = time.perf_counter() - t0
        t0 = time.perf_counter(); run_files("/tmp")
        tt = time.perf_counter() - t0
        t0 = time.perf_counter(); run_files("/dev/shm")
        ts = time.perf_counter() - t0
        print({"iter": it, "blob_noop": round(tb, 3),
               "files_tmp": round(tt, 3),
               "files_shm": round(ts, 3)}, flush=True)


if __name__ == "__main__":
    main()
