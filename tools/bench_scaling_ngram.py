"""N -> 4N scaling pair for ngram_jaccard_join's blocked chunk-pair
kernel (single-JVM local[2] -> local[8], the convention
tools/bench_scaling.py uses for plans containing a shuffle;
understates multi-executor scaling by the shared-JVM ceiling).

The corpus is the sf0.1 documents table replicated K times with
key-shifted doc_ids — identical texts across copies multiply the
passing-pair output ~K^2-fold, so the workload grows superlinearly
in BOTH the GEMM flops and the emitted pairs (a heavier test than
plain row growth for the chunk-pair tasks under test).

Usage: python tools/bench_scaling_ngram.py [K] [reps]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
K = int(sys.argv[1]) if len(sys.argv) > 1 else 2
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_CODE = """
import time, sys
sys.path.insert(0, {root!r})
from pyspark.sql import functions as F
from gdal_spark.session import get_spark
from gdal_spark.operators.dedup import ngram_jaccard_join

spark = get_spark("ng-scale", master="local[{par}]",
                  shuffle_partitions={par})
spark.sparkContext.setLogLevel("ERROR")
base = spark.read.parquet({sf!r} + "/documents.parquet")
docs = base.selectExpr("doc_id", "text")
n0 = docs.count()
parts = [docs.selectExpr(f"doc_id + {{i}} * {{n0}} as doc_id".format(
    i=i, n0=n0), "text") for i in range({k})]
corpus = parts[0]
for p in parts[1:]:
    corpus = corpus.unionByName(p)
corpus = corpus.repartition({par} * 4).localCheckpoint(eager=True)
best = None
for _ in range({reps}):
    t0 = time.perf_counter()
    n = ngram_jaccard_join(corpus, n=3, threshold=0.5).count()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print("RESULT", n, round(best, 3))
"""


def run(par: int) -> tuple[int, float]:
    code = _CODE.format(root=ROOT, par=par, sf=SF_DIR, k=K, reps=REPS)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True).stdout
    line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
    _, n, t = line.split()
    return int(n), float(t)


def main() -> None:
    n2, t2 = run(2)
    n8, t8 = run(8)
    assert n2 == n8, (n2, n8)
    eff = t2 / (4.0 * t8)
    print(json.dumps({"pairs": n2, "k_copies": K, "t2": t2, "t8": t8,
                      "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
