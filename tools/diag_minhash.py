"""Stage-level timing of minhash_lsh_dedup at SF_DIR (diagnostic,
not a bench).  Times each pipeline piece by forcing it with count()
in sequence, twice, in one session."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from gdal_spark.session import get_spark
    from gdal_spark.operators.dedup import (
        minhash_signatures, minhash_lsh_candidates, ngram_jaccard_pairs)

    spark = get_spark("diag-minhash", master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS), 8))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()
    print("n_docs", docs.count(), flush=True)

    for it in range(2):
        t = {}

        def tm(name, fn):
            t0 = time.perf_counter()
            out = fn()
            t[name] = round(time.perf_counter() - t0, 3)
            print(f"  [{it}] {name}: {t[name]}", flush=True)
            return out

        sigs = minhash_signatures(docs).persist(
            StorageLevel.MEMORY_AND_DISK)
        tm("sigs_persist", lambda: sigs.count())
        cand = minhash_lsh_candidates(sigs)
        tm("candidates", lambda: cand.count())
        sa = sigs.select(F.col("doc_id").alias("a"),
                         F.col("sig").alias("sig_a"))
        sb = sigs.select(F.col("doc_id").alias("b"),
                         F.col("sig").alias("sig_b"))
        joined = cand.join(sa, "a").join(sb, "b")
        tm("pair_sig_join", lambda: joined.count())
        import numpy as np
        import pandas as pd
        from pyspark.sql.types import StructField, StructType

        pre_schema = StructType([
            StructField("a", docs.schema["doc_id"].dataType),
            StructField("b", docs.schema["doc_id"].dataType),
        ])

        def est_kernel(batches):
            for b in batches:
                if not len(b):
                    continue
                va = np.array(b["sig_a"].tolist(), dtype=np.int64)
                vb = np.array(b["sig_b"].tolist(), dtype=np.int64)
                est = (va == vb).sum(axis=1) / 64.0
                keep = est >= 0.45
                if keep.any():
                    yield b.loc[keep, ["a", "b"]]

        pre = joined.mapInPandas(est_kernel, pre_schema)
        tm("prefilter", lambda: pre.count())
        ver = ngram_jaccard_pairs(docs, pre, "text", "doc_id", 5)
        tm("verify", lambda: ver.filter(
            F.col("jaccard") >= 0.7).count())
        verified = ver.filter(F.col("jaccard") >= 0.7).select("a", "b")
        drop = verified.groupBy("b").agg(F.min("a").alias("rep")) \
            .select(F.col("b").alias("doc_id"))
        tm("drop_checkpoint", lambda: drop.localCheckpoint(eager=True))
        sigs.unpersist()
        print({"iter": it, **t}, flush=True)


if __name__ == "__main__":
    main()
