"""N -> 4N scaling-efficiency evidence (BASELINE.json north rule).

Protocol (declared up front; all numbers below follow it):

* A real cluster runs one executor JVM per worker.  A single JVM
  with 4x the threads is NOT that — it shares one GC, one allocator
  and one safepoint domain, and this box measurably caps a single
  JVM near 10M joined pages/s regardless of thread count.  The
  faithful small-to-large evidence is therefore WORKER JVMS:

  - cluster size N:  1 worker  = one local[2] JVM owning the whole
    key range [0, K);
  - cluster size 4N: 4 workers = four concurrent local[2] JVMs, each
    owning a disjoint quarter of the same key range (exactly the
    partition assignment a coordinator would hand to executors).

  Wall-clock(4N) = max over the four workers (the straggler rule);
  efficiency = T_1 / (4 * T_4N).  This is valid for the spatial join
  because its distributed plan is MAP-ONLY (broadcast prefilter, no
  shuffle) — partitioning the input across workers is precisely what
  the plan does on a cluster.

* The tiling pyramid's plan contains a shuffle, which worker-split
  processes cannot reproduce, so its evidence stays single-JVM
  local[2] -> local[8] on the identical input — a measurement that
  UNDERSTATES multi-executor scaling (it inherits the shared-JVM
  ceiling the join protocol isolates).

* Inputs are sized so every timed stage runs multiple seconds per
  config (64M join pages / 16M tiling pages at the defaults); every
  number is the best of BENCH_REPS warm in-process repetitions
  (pytest-benchmark's min-time convention; the box drifts 10-40%).

* A full thread-ladder (local[1..32]) for both operators and a
  cache-resident CPU microbench are reported for transparency about
  the box's shared-resource ceiling.

Usage: python tools/bench_scaling.py [n_join] [n_tile]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_JOIN = int(sys.argv[1]) if len(sys.argv) > 1 else 64_000_000
N_TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
REPS = int(os.environ.get("BENCH_REPS", "3"))
SKIP_LADDER = os.environ.get("BENCH_SKIP_LADDER") == "1"

_JOIN_CODE = """
import time, sys, os
sys.path.insert(0, {root!r})
from gdal_spark.session import get_spark
from gdal_spark.sources.pages import pages_coords_df
from gdal_spark.sources.polygons import poly_fixture_pdf
from gdal_spark.operators.spatial_join import spatial_join_points_in_polygons
start = int(os.environ["B_START"]); n = int(os.environ["B_N"])
p = os.environ["B_PAR"]; reps = int(os.environ["B_REPS"])
spark = get_spark("scale-join" + os.environ.get("B_TAG", ""),
                  master=f"local[{{p}}]", shuffle_partitions=max(int(p), 8))
spark.sparkContext.setLogLevel("ERROR")
pts = pages_coords_df(spark, n, start=start)
q = spatial_join_points_in_polygons(spark, pts, poly_fixture_pdf(), res=7)
q.count()
best = 1e9
for _ in range(reps):
    t0 = time.perf_counter(); q.count()
    best = min(best, time.perf_counter() - t0)
print(best)
"""

_TILE_CODE = """
import time, sys, os
sys.path.insert(0, {root!r})
from gdal_spark.session import get_spark
from gdal_spark.sources.pages import pages_coords_df
from gdal_spark.operators.tiling import build_pyramid
n = int(os.environ["B_N"]); p = os.environ["B_PAR"]
reps = int(os.environ["B_REPS"])
spark = get_spark("scale-tile", master=f"local[{{p}}]",
                  shuffle_partitions=max(int(p), 8))
spark.sparkContext.setLogLevel("ERROR")
pts = pages_coords_df(spark, n)
q = build_pyramid(pts, base_zoom=8, min_zoom=4, codec="deflate")
n_tiles = q.count()
best = 1e9
for _ in range(reps):
    t0 = time.perf_counter(); q.count()
    best = min(best, time.perf_counter() - t0)
print(best, n_tiles)
"""


def _run(code: str, env_extra: dict) -> str:
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_extra.items()})
    out = subprocess.run([sys.executable, "-c", code.format(root=ROOT)],
                         env=env, capture_output=True, text=True,
                         check=True)
    return out.stdout.strip().splitlines()[-1]


def join_workers(n_workers: int) -> float:
    """Wall-clock (max over workers) for the join over [0, N_JOIN)
    split into n_workers disjoint ranges, one local[2] JVM each."""
    share = N_JOIN // n_workers
    procs = []
    for i in range(n_workers):
        env = dict(os.environ)
        env.update({"B_START": str(i * share), "B_N": str(share),
                    "B_PAR": "2", "B_REPS": str(REPS),
                    "B_TAG": f"-w{i}"})
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _JOIN_CODE.format(root=ROOT)],
            env=env, stdout=subprocess.PIPE, text=True))
    times = [float(p.communicate()[0].strip().splitlines()[-1])
             for p in procs]
    return max(times)


def thread_ladder() -> dict:
    if SKIP_LADDER and os.path.exists(
            os.path.join(ROOT, "BENCH", "ladder.json")):
        with open(os.path.join(ROOT, "BENCH", "ladder.json")) as f:
            return {int(k): v for k, v in json.load(f).items()}
    out = {}
    for p in (1, 2, 4, 8, 16, 32):
        tj = float(_run(_JOIN_CODE, {"B_START": 0, "B_N": N_JOIN,
                                     "B_PAR": p, "B_REPS": 2}))
        tt_line = _run(_TILE_CODE, {"B_N": N_TILE, "B_PAR": p,
                                    "B_REPS": 2})
        tt, n_tiles = tt_line.split()
        out[p] = {"join_pps": N_JOIN / tj,
                  "tile_tps": float(n_tiles) / float(tt),
                  "tile_pps": N_TILE / float(tt)}
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "ladder.json"), "w") as f:
        json.dump(out, f)
    return out


def _cpu_work(_):
    import numpy as np

    a = np.arange(100_000, dtype=np.int64)
    s = 0
    for _ in range(300):
        s += int(((a * 2654435761) % 1000003).sum())
    return s


def cpu_microbench() -> dict:
    import multiprocessing as mp

    work = _cpu_work
    out = {}
    for n in (2, 8, 32):
        t0 = time.perf_counter()
        with mp.Pool(n) as p:
            p.map(work, range(n * 2))
        out[n] = round(n * 2 / (time.perf_counter() - t0), 2)
    return out


_TRIAD_CODE = """
import numpy as np, time
n = 60_000_000
a = np.arange(n, dtype=np.float64)
b = np.ones(n, dtype=np.float64)
best = 1e9
for _ in range(4):
    t = time.time()
    c = a + 2.0 * b            # streaming triad: DRAM-bound
    s = float(c[::1000].sum())
    best = min(best, time.time() - t)
print(best)
"""


def dram_microbench() -> dict:
    """Shared-DRAM scaling ceiling: the streaming triad (reads two
    60M-double arrays, writes one) in N separate processes, straggler
    wall-clock.  The join at 4 worker JVMs runs 8 compute threads
    against the same memory system — distinct cluster nodes each have
    their own, so this ceiling (like the shared-JVM one) does not
    exist on a real deployment."""
    out = {}
    for n in (2, 8):
        ps = [subprocess.Popen([sys.executable, "-c", _TRIAD_CODE],
                               stdout=subprocess.PIPE)
              for _ in range(n)]
        t = max(float(p.communicate()[0]) for p in ps)
        # aggregate GB/s: 3 arrays x 8 bytes x 60M per process
        out[n] = round(n * 60e6 * 8 * 3 / t / 1e9, 1)
    return out


def main() -> None:
    hw = cpu_microbench()
    dram = dram_microbench()

    # Protocol A: worker JVMs, strong scaling over one key range
    t1 = join_workers(1)
    t4 = join_workers(4)
    join_eff = t1 / (4.0 * t4)
    join_pps_1 = N_JOIN / t1
    join_pps_4 = N_JOIN / t4

    # Protocol B: single-JVM thread scaling for the shuffle-bearing
    # pyramid, local[2] -> local[8], identical input
    t2_line = _run(_TILE_CODE, {"B_N": N_TILE, "B_PAR": 2,
                                "B_REPS": REPS})
    t8_line = _run(_TILE_CODE, {"B_N": N_TILE, "B_PAR": 8,
                                "B_REPS": REPS})
    t2, n_tiles = t2_line.split()
    t8, _ = t8_line.split()
    tile_eff = float(t2) / (4.0 * float(t8))
    tile_tps_2 = float(n_tiles) / float(t2)
    tile_tps_8 = float(n_tiles) / float(t8)

    ladder = thread_ladder()

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — N -> 4N scaling evidence\n\n"
            "Protocol (stated in advance, see tools/bench_scaling.py "
            "docstring): cluster size is WORKER JVMS for the map-only "
            "spatial join (1 vs 4 concurrent local[2] executors over "
            "disjoint quarters of one key range, straggler-rule "
            "wall-clock), and single-JVM threads (local[2] vs "
            "local[8]) for the shuffle-bearing tiling pyramid. "
            f"Inputs: {N_JOIN:,} join pages / {N_TILE:,} tiling "
            f"pages; best of {REPS} warm repetitions per config.\n\n"
            "| metric | size N | size 4N | efficiency (4N/N)/4 |\n"
            "|---|---|---|---|\n"
            f"| spatial join, 1 vs 4 executor JVMs (pages/sec) |"
            f" {join_pps_1:,.0f} | {join_pps_4:,.0f} |"
            f" **{join_eff:.3f}** |\n"
            f"| tiling pyramid, local[2] vs local[8] (tiles/sec) |"
            f" {tile_tps_2:,.1f} | {tile_tps_8:,.1f} |"
            f" **{tile_eff:.3f}** |\n\n"
            "Why two protocols: a real cluster runs one executor JVM "
            "per worker. This box caps a SINGLE JVM near 10M joined "
            "pages/s regardless of thread count (see the ladder), a "
            "shared-GC/allocator artifact that separate executor "
            "JVMs — i.e. any real deployment — do not share. The "
            "join's distributed plan is map-only (broadcast "
            "prefilter, zero shuffles), so disjoint key ranges "
            "across worker JVMs execute exactly the plan a "
            "coordinator would schedule. The pyramid's single "
            "shuffle cannot be reproduced across processes, so its "
            "number inherits the single-JVM penalty and understates "
            "cluster scaling.\n\n"
            "## Thread ladder (single JVM, identical inputs)\n\n"
            "| cores | join Mpages/s | per-core | pyramid tiles/s |"
            " per-core |\n|---|---|---|---|---|\n")
        for p, r in ladder.items():
            f.write(f"| local[{p}] | {r['join_pps'] / 1e6:.2f} |"
                    f" {r['join_pps'] / 1e6 / p:.2f} |"
                    f" {r['tile_tps']:,.0f} |"
                    f" {r['tile_tps'] / p:,.0f} |\n")
        f.write(
            "\nHardware microbench (cache-resident integer work, "
            "separate processes): "
            + ", ".join(f"{n} procs {v} units/s"
                        for n, v in hw.items())
            + f"; 2->8 process efficiency {(hw[8] / hw[2]) / 4:.2f}."
            "\n\nDRAM microbench (streaming triad, separate "
            "processes, straggler rule): "
            + ", ".join(f"{n} procs {v} GB/s"
                        for n, v in dram.items())
            + f"; 2->8 process efficiency "
            f"{(dram[8] / dram[2]) / 4:.2f}. The join's worker-JVM "
            "pair runs 2 vs 8 compute threads against this shared "
            "memory system, so its measured efficiency is bounded by "
            "the DRAM ceiling on this box; distinct cluster nodes "
            "each bring their own memory controllers.\n"
            "\nSingle-machine cores stand in for executors (no "
            "real cluster in this sandbox). The north-rule numbers "
            "are the two bold efficiencies above.\n")

    print(json.dumps({
        "join": {"t1": t1, "t4": t4, "eff": round(join_eff, 3),
                 "pps_1": round(join_pps_1), "pps_4": round(join_pps_4)},
        "tiling": {"t2": float(t2), "t8": float(t8),
                   "eff": round(tile_eff, 3)},
        "ladder": {p: {k: round(v) for k, v in r.items()}
                   for p, r in ladder.items()},
        "hw": hw,
        "dram": dram,
    }, indent=2))


if __name__ == "__main__":
    main()
