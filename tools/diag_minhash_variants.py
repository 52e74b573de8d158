"""A/B variants of minhash_lsh_dedup (diagnostic).  Usage:
  python tools/diag_minhash_variants.py v0|v1|v3 [repeats]
Each run is a fresh session; the first timing is the cold number the
driver's bench records.  Asserts the surviving doc_id set matches v0
(computed via the shipped operator) when CHECK=1."""
from __future__ import annotations

import os
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def v0(spark, docs):
    from gdal_spark.operators.dedup import minhash_lsh_dedup
    return minhash_lsh_dedup(docs)


def v1(spark, docs, threshold=0.7, num_hashes=64, shingle=5,
       bands=16, seed=42):
    """Fuse est prefilter into the verify kernel: one join chain
    cand><sig_a><sig_b><text_a><text_b -> repartition -> ONE kernel
    (slot-count estimate, then exact jaccard only for survivors)."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, StructField, StructType

    from gdal_spark.operators.dedup import (
        _shingle_hashes, minhash_lsh_candidates, minhash_signatures)

    key_col, text_col = "doc_id", "text"
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, key_col, num_hashes,
                              shingle, seed).persist(
        StorageLevel.MEMORY_AND_DISK)
    cand = minhash_lsh_candidates(sigs, key_col, bands, rows)
    sa = sigs.select(F.col(key_col).alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(key_col).alias("b"), F.col("sig").alias("sig_b"))
    texts = docs.select(key_col, text_col)
    ta = texts.select(F.col(key_col).alias("a"),
                      F.col(text_col).alias("text_a"))
    tb = texts.select(F.col(key_col).alias("b"),
                      F.col(text_col).alias("text_b"))
    joined = (cand.join(sa, "a").join(sb, "b")
              .join(ta, "a").join(tb, "b")
              .repartition(spark.sparkContext.defaultParallelism))
    cut = max(threshold - 0.25, 0.0)
    schema = StructType([
        StructField("a", docs.schema[key_col].dataType),
        StructField("b", docs.schema[key_col].dataType),
        StructField("jaccard", DoubleType())])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            va = np.array(b["sig_a"].tolist(), dtype=np.int64)
            vb = np.array(b["sig_b"].tolist(), dtype=np.int64)
            est = (va == vb).sum(axis=1) / float(num_hashes)
            keep = est >= cut
            if not keep.any():
                continue
            sub = b.loc[keep]
            ga = _shingle_hashes(sub["text_a"], shingle)
            gb = _shingle_hashes(sub["text_b"], shingle)
            jac = np.array([
                len(np.intersect1d(x, y, assume_unique=True))
                / max(len(np.union1d(x, y)), 1)
                for x, y in zip(ga, gb)])
            yield pd.DataFrame({"a": sub["a"], "b": sub["b"],
                                "jaccard": jac})

    verified = (joined.mapInPandas(kernel, schema)
                .filter(F.col("jaccard") >= threshold).select("a", "b"))
    drop = verified.groupBy("b").agg(F.min("a").alias("rep")) \
        .select(F.col("b").alias(key_col)) \
        .localCheckpoint(eager=True)
    sigs.unpersist()
    return docs.join(drop, key_col, "left_anti")


def v3(spark, docs, threshold=0.7, num_hashes=64, shingle=5,
       bands=16, seed=42):
    """Carry sig through ONE (band,bucket) repartition; a single
    kernel computes bucket-min star pairs + the estimate; no window,
    no sig joins, no persist, no checkpoint."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, StructField, StructType

    from gdal_spark.operators.dedup import (
        _shingle_hashes, minhash_signatures)

    key_col, text_col = "doc_id", "text"
    rpb = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, key_col, num_hashes,
                              shingle, seed)
    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.xxhash64(F.slice("sig", i * rpb + 1, rpb)).alias("bucket"))
        for i in range(bands)]
    exploded = (sigs.select(key_col, "sig",
                            F.explode(F.array(*band_cols)).alias("bb"))
                .select(key_col, "sig", F.col("bb.band").alias("band"),
                        F.col("bb.bucket").alias("bucket")))
    par = spark.sparkContext.defaultParallelism
    parts = (exploded.repartition(par, "band", "bucket")
             .sortWithinPartitions("band", "bucket", key_col))
    cut = max(threshold - 0.25, 0.0)
    pair_schema = StructType([
        StructField("a", docs.schema[key_col].dataType),
        StructField("b", docs.schema[key_col].dataType)])

    def star_est(batches: Iterator[pd.DataFrame]
                 ) -> Iterator[pd.DataFrame]:
        carry_key = None          # (band, bucket) of the open group
        carry_rep = None          # rep key of the open group
        carry_sig = None          # rep sig (np.int64[H])
        for b in batches:
            n = len(b)
            if not n:
                continue
            bd = b["band"].to_numpy()
            bk = b["bucket"].to_numpy()
            ks = b[key_col].to_numpy()
            sg = np.array(b["sig"].tolist(), dtype=np.int64)
            new = np.ones(n, dtype=bool)
            new[1:] = (bd[1:] != bd[:-1]) | (bk[1:] != bk[:-1])
            cont = (carry_key is not None
                    and (bd[0], bk[0]) == carry_key)
            if cont:
                new[0] = False
            starts = np.flatnonzero(new)
            gid = np.cumsum(new) - 1          # -1 for carry segment
            rep_sig = np.empty_like(sg)
            rep_key = np.empty(n, dtype=ks.dtype)
            in_new = gid >= 0
            if starts.size:
                rep_rows = starts[gid[in_new]]
                rep_sig[in_new] = sg[rep_rows]
                rep_key[in_new] = ks[rep_rows]
            if cont and (~in_new).any():
                rep_sig[~in_new] = carry_sig
                rep_key[~in_new] = carry_rep
            eq = (sg == rep_sig).sum(axis=1)
            est = eq / float(num_hashes)
            is_rep = np.zeros(n, dtype=bool)
            if starts.size:
                is_rep[starts] = True
            emit = (~is_rep) & (est >= cut)
            # a continued group's rows are never its rep (rep was
            # the partition-sorted first row, already seen)
            if emit.any():
                yield pd.DataFrame({"a": rep_key[emit],
                                    "b": ks[emit]})
            if starts.size:
                last = starts[-1]
                carry_key = (bd[n - 1], bk[n - 1])
                carry_rep = ks[last]
                carry_sig = sg[last]
            # else: whole batch continued the open group; carry stays

    pre = parts.mapInPandas(star_est, pair_schema).distinct()
    texts = docs.select(key_col, text_col)
    ta = texts.select(F.col(key_col).alias("a"),
                      F.col(text_col).alias("text_a"))
    tb = texts.select(F.col(key_col).alias("b"),
                      F.col(text_col).alias("text_b"))
    joined = (pre.join(ta, "a").join(tb, "b")
              .repartition(par))
    jac_schema = StructType([
        StructField("a", docs.schema[key_col].dataType),
        StructField("b", docs.schema[key_col].dataType),
        StructField("jaccard", DoubleType())])

    def jac_kernel(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            ga = _shingle_hashes(b["text_a"], shingle)
            gb = _shingle_hashes(b["text_b"], shingle)
            jac = np.array([
                len(np.intersect1d(x, y, assume_unique=True))
                / max(len(np.union1d(x, y)), 1)
                for x, y in zip(ga, gb)])
            yield pd.DataFrame({"a": b["a"], "b": b["b"],
                                "jaccard": jac})

    verified = (joined.mapInPandas(jac_kernel, jac_schema)
                .filter(F.col("jaccard") >= threshold).select("a", "b"))
    drop = verified.groupBy("b").agg(F.min("a").alias("rep")) \
        .select(F.col("b").alias(key_col))
    return docs.join(drop, key_col, "left_anti")


def main() -> None:
    from gdal_spark.session import get_spark

    variant = sys.argv[1] if len(sys.argv) > 1 else "v0"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    fn = {"v0": v0, "v1": v1, "v3": v3}[variant]

    spark = get_spark("diag-mh-" + variant, master=f"local[{CPUS}]",
                      shuffle_partitions=max(int(CPUS), 8))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.count()
    # warm python workers like bench.py's preamble
    from gdal_spark.sources.pages import pages_coords_df
    from gdal_spark.sources.polygons import poly_fixture_pdf
    from gdal_spark.operators.spatial_join import (
        spatial_join_points_in_polygons)
    spatial_join_points_in_polygons(
        spark, pages_coords_df(spark, 50_000), poly_fixture_pdf(),
        res=6).count()

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        n = fn(spark, docs).count()
        times.append(round(time.perf_counter() - t0, 3))
    print({"variant": variant, "n": n, "times": times},
          flush=True)
    if os.environ.get("CHECK") == "1" and variant != "v0":
        keep = {r[0] for r in fn(spark, docs)
                .select("doc_id").collect()}
        base = {r[0] for r in v0(spark, docs)
                .select("doc_id").collect()}
        print({"match": keep == base, "n_new": len(keep),
               "n_base": len(base)}, flush=True)


if __name__ == "__main__":
    main()
