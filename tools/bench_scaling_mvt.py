"""N -> 4N scaling pair for the packed MVT sink (single-JVM
local[2] -> local[8], the tools/bench_scaling.py convention for
plans containing a shuffle; understates multi-executor scaling by
the shared-JVM ceiling).

Workload: the bench's point shape (fid + 21-byte WKB points from
the page synthesis) at a fixed size, written as a z=7 directory
pyramid so per-parallelism work is identical; the tile count is
asserted equal across parallelisms.

Usage: python tools/bench_scaling_mvt.py [n_points] [reps]
"""
from __future__ import annotations

import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(sys.argv[1]) if len(sys.argv) > 1 else 800_000
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

_CODE = """
import os, shutil, tempfile, time, sys
sys.path.insert(0, {root!r})
import numpy as np
import pandas as pd
from pyspark.sql.types import BinaryType, LongType, StructField, StructType
from gdal_spark.session import get_spark
from gdal_spark.sources.mvt import write_mvt
from gdal_spark.sources.pages import pages_coords_df

P = {par}
spark = get_spark("mvt-scale", master=f"local[{{P}}]",
                  shuffle_partitions=P)
spark.sparkContext.setLogLevel("ERROR")
pt_schema = StructType([StructField("fid", LongType()),
                        StructField("geometry", BinaryType())])

def _to_wkb(batches):
    for b in batches:
        n = len(b)
        arr = np.empty(n, dtype=[("hdr", "S5"), ("x", "<f8"),
                                 ("y", "<f8")])
        arr["hdr"] = b"\\x01\\x01\\x00\\x00\\x00"
        arr["x"] = b["lon"].to_numpy()
        arr["y"] = b["lat"].to_numpy()
        raw = arr.tobytes()
        yield pd.DataFrame({{
            "fid": b["i"].to_numpy(),
            "geometry": [raw[i * 21:(i + 1) * 21] for i in range(n)],
        }})

src = pages_coords_df(spark, {n}).mapInPandas(_to_wkb, pt_schema) \
    .localCheckpoint(eager=True)
src.count()
best, tiles = None, None
for _ in range({reps}):
    d = tempfile.mkdtemp(prefix="mvt_scale_")
    try:
        t0 = time.perf_counter()
        stats = write_mvt(src, os.path.join(d, "t.mvt"),
                          minzoom=7, maxzoom=7, buffer=0)
        dt = time.perf_counter() - t0
    finally:
        shutil.rmtree(d, ignore_errors=True)
    tiles = stats["tiles"]
    best = dt if best is None or dt < best else best
print("RESULT", tiles, round(best, 3))
"""


def run(par: int) -> tuple[int, float]:
    code = _CODE.format(root=ROOT, par=par, n=N, reps=REPS)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True).stdout
    line = [ln for ln in out.splitlines()
            if ln.startswith("RESULT")][-1]
    _, tiles, t = line.split()
    return int(tiles), float(t)


def main() -> None:
    n2, t2 = run(2)
    n8, t8 = run(8)
    assert n2 == n8, (n2, n8)
    eff = (t2 / t8) / 4.0
    print({"n_points": N, "tiles": n2, "t2": t2, "t8": t8,
           "speedup": round(t2 / t8, 3),
           "efficiency_4x": round(eff, 3)})


if __name__ == "__main__":
    main()
