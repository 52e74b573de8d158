"""Container-sink N -> 4N scaling evidence (round-6 VERDICT ask #7).

The GeoPackage tile sink has two structurally different phases:

* ENCODE — PNG filters+zlib per tile, a distributed mapInPandas
  carry kernel (`tiling.tile_blob_frame`).  This is the part that
  must scale with executors.
* WRITER STREAM — SQLite is one-writer-per-file, so the driver
  streams finished blobs into a single connection
  (`geopackage.write_gpkg_tiles`).  This is a measured CONSTANT:
  its cost depends on blob count/bytes, not parallelism.

Protocol (same conventions as tools/bench_scaling.py): each
parallelism level runs in a FRESH subprocess JVM; the input tile
frame is persisted and counted BEFORE any timed phase so generation
cost never pollutes the measurement; each phase is best of
BENCH_REPS warm in-process repetitions.  t_encode times
tile_blob_frame(...).count() (blob bytes never leave executors);
t_full times the whole sink; writer-stream = t_full - t_encode.

Usage: python tools/bench_sink_scaling.py [n_tiles]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_TILES = int(sys.argv[1]) if len(sys.argv) > 1 else 512
REPS = int(os.environ.get("BENCH_REPS", "3"))

_CODE = """
import json, os, tempfile, time, sys
sys.path.insert(0, {root!r})
import numpy as np
import pandas as pd
from gdal_spark.session import get_spark
from gdal_spark.operators.tiling import TILE_SCHEMA, tile_blob_frame

P = {p}
N = {n}
spark = get_spark("sink-scaling", master=f"local[{{P}}]",
                  shuffle_partitions=max(P * 2, 4))
spark.sparkContext.setLogLevel("ERROR")

# deterministic 256x256 single-band tiles on a zoom wide enough to
# hold N distinct keys; generated distributed, then PERSISTED and
# counted so the timed phases never pay generation
zoom = max(int(np.ceil(np.log2(max(N, 2)) / 2)), 1)
side = 1 << zoom

def gen(batches):
    for b in batches:
        rows = {{f.name: [] for f in TILE_SCHEMA.fields}}
        for i in b["id"]:
            i = int(i)
            tx, ty = i % side, i // side
            yy, xx = np.mgrid[0:256, 0:256]
            v = ((xx * 31 + yy * 17 + i * 7) % 251).astype(np.float64)
            rows["zoom"].append(zoom)
            rows["tile_x"].append(tx)
            rows["tile_y"].append(ty)
            rows["band"].append(1)
            rows["data"].append(np.ascontiguousarray(v).tobytes())
            rows["dtype"].append("float64")
            rows["tile_size"].append(256)
        yield pd.DataFrame(rows)

tiles = (spark.range(0, N, 1, P * 2).mapInPandas(gen, TILE_SCHEMA)
         .persist())
assert tiles.count() == N

def best(fn, reps={reps}):
    ts = []
    for _ in range(reps):
        t0 = time.time(); fn(); ts.append(time.time() - t0)
    return min(ts)

t_encode = best(lambda: tile_blob_frame(tiles, format="png").count())

from gdal_spark.sources.geopackage import write_gpkg_tiles

def full():
    d = tempfile.mkdtemp(prefix="sinkscale_")
    write_gpkg_tiles(tiles, os.path.join(d, "t.gpkg"))

t_full = best(full)
print(json.dumps({{"p": P, "n": N, "t_encode": round(t_encode, 3),
                   "t_full": round(t_full, 3),
                   "t_writer": round(t_full - t_encode, 3)}}))
"""


def run(p: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c",
         _CODE.format(root=ROOT, p=p, n=N_TILES, reps=REPS)],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    r2 = run(2)
    r8 = run(8)
    eff = r2["t_encode"] / (4.0 * r8["t_encode"])
    print(json.dumps({
        "n_tiles": N_TILES,
        "local2": r2, "local8": r8,
        "encode_efficiency_2_to_8": round(eff, 3),
        "writer_constant_sec": [r2["t_writer"], r8["t_writer"]],
    }))


if __name__ == "__main__":
    main()
