"""r7 minhash pipeline: the fused star+estimate kernel must produce
identical results when bucket groups span Arrow batch boundaries
(cross-batch rep carry) — stressed by shrinking maxRecordsPerBatch
far below the bucket-group size."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark.operators.dedup import minhash_lsh_dedup


@pytest.fixture()
def heavy_dup_docs():
    """Clusters of near-identical docs so every LSH bucket holds a
    whole cluster (bucket size >> tiny Arrow batch)."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    texts, ids = [], []
    k = 0
    for c in range(6):
        for m in range(25):
            # tiny suffix tweak keeps jaccard high inside a cluster
            texts.append(f"{base} cluster{c} " + ("pad " * (m % 3)))
            ids.append(k)
            k += 1
    for i in range(40):  # singletons
        texts.append(f"unique document number {i} with words "
                     f"{i * 7} {i * 13} {i * 29} nothing shared")
        ids.append(k)
        k += 1
    return pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                         "text": texts})


def test_star_carry_tiny_batches(spark, heavy_dup_docs):
    docs = spark.createDataFrame(heavy_dup_docs)
    expected = set(
        r[0] for r in minhash_lsh_dedup(docs).select("doc_id").collect())
    # clusters must actually dedup for the stress to mean anything
    assert len(expected) < len(heavy_dup_docs)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = set(
            r[0] for r in minhash_lsh_dedup(docs)
            .select("doc_id").collect())
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == expected
