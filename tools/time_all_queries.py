"""Time every declared query's Spark side once (count/collect via
the same .count() the oracle gate forces), in one session at
SF_DIR.  Produces the per-query examination checklist for the
optimization round — NOT a benchmark (one shot, shared session,
order effects); outliers get isolated follow-ups."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from gdal_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("time-all", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS), 8))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = {}
    for name, fn in qs.items():
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).count()
            out[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001 - survey must finish
            out[name] = f"ERR {type(e).__name__}"
        print(name, out[name], flush=True)
    ok = {k: v for k, v in out.items() if isinstance(v, float)}
    print(json.dumps({"n": len(out), "total_sec": round(sum(ok.values()), 1),
                      "slowest": sorted(ok.items(), key=lambda kv: -kv[1])[:12]}))


if __name__ == "__main__":
    main()
