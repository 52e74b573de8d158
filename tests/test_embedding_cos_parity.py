"""r7: embedding_dedup's exact-cosine verify moved from the
interpreted Catalyst zip_with/aggregate fold to a numpy kernel that
replays the SAME left-fold in the same IEEE op order (float32
element product, widen to double, accumulate in array order).  These
tests pin the bit-exact equivalence and the operator's drop set."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.similarity import cosine_sim_col, embedding_dedup


def _fold_cos(ma: np.ndarray, mb: np.ndarray) -> np.ndarray:
    """The kernel's law, replicated: float32 products widened to
    double, left-fold over the dimension axis."""
    n, d = ma.shape
    dot = np.zeros(n, dtype=np.float64)
    na = np.zeros(n, dtype=np.float64)
    nb = np.zeros(n, dtype=np.float64)
    for j in range(d):
        xa, xb = ma[:, j], mb[:, j]
        dot += (xa * xb).astype(np.float64)
        na += (xa * xa).astype(np.float64)
        nb += (xb * xb).astype(np.float64)
    return dot / (np.sqrt(na) * np.sqrt(nb))


def test_fold_matches_jvm_bitexact(spark):
    """Random + engineered pairs: the numpy fold must equal the JVM
    zip_with/aggregate cosine to the LAST BIT (no tolerance)."""
    rng = np.random.RandomState(11)
    n, d = 400, 64
    ma = rng.normal(size=(n, d)).astype(np.float32)
    mb = rng.normal(size=(n, d)).astype(np.float32)
    # knife-edge shapes: identical, scaled, tiny perturbations
    mb[:100] = ma[:100]
    mb[100:200] = (ma[100:200] * np.float32(2.5))
    mb[200:300] = ma[200:300] + rng.normal(
        scale=1e-4, size=(100, d)).astype(np.float32)
    pdf = pd.DataFrame({
        "i": np.arange(n, dtype=np.int64),
        "vec_a": [v.astype(np.float64).tolist() for v in ma],
        "vec_b": [v.astype(np.float64).tolist() for v in mb],
    })
    sdf = (spark.createDataFrame(pdf)
           .withColumn("vec_a", F.col("vec_a").cast("array<float>"))
           .withColumn("vec_b", F.col("vec_b").cast("array<float>")))
    got = (sdf.withColumn("cos", cosine_sim_col("vec_a", F.col("vec_b")))
           .select("i", "cos").toPandas().sort_values("i"))
    want = _fold_cos(ma, mb)
    jvm = got["cos"].to_numpy()
    assert np.array_equal(jvm.view(np.int64), want.view(np.int64)), (
        np.flatnonzero(jvm.view(np.int64) != want.view(np.int64))[:5])


def test_embedding_dedup_drop_set(spark):
    """Operator-level: clusters of float32 near-duplicates dedup to
    their min key; survivors counted against a brute-force fold-law
    verify over the same LSH candidate rule is unnecessary — the
    clusters are tight enough that every member pairs with its rep,
    so the expected survivor set is exact."""
    rng = np.random.RandomState(5)
    rows = []
    k = 0
    for c in range(10):
        base = rng.normal(size=64)
        base /= np.linalg.norm(base)
        for m in range(8):
            v = base + rng.normal(scale=1e-3, size=64)
            rows.append((k, (v / np.linalg.norm(v)).tolist(), c))
            k += 1
    emb = (spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]))
        .withColumn("embedding", F.col("embedding").cast("array<float>")))
    out = embedding_dedup(emb, 0.95, method="lsh")
    kept = sorted(r[0] for r in out.select("vec_id").collect())
    # each 8-member cluster keeps exactly its min key
    assert kept == [c * 8 for c in range(10)]
