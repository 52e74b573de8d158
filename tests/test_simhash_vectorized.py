"""r7: simhash_signatures' per-doc bits matrix + python word loop
was vectorized into per-bit reduceat passes over the batch's flat
gram stream.  The signature law is frozen (q20 oracle) — this test
pins bit-identity against the original per-doc formulation."""

import numpy as np
import pandas as pd

from gdal_spark.operators.dedup import _shingle_hashes, simhash_signatures


def _reference_simhash(texts, shingle=4) -> np.ndarray:
    """The pre-r7 per-doc loop, verbatim."""
    bit_idx = np.arange(64, dtype=np.uint64)
    shingles = _shingle_hashes(pd.Series(texts), shingle)
    out = np.zeros(len(texts), dtype=np.int64)
    for i, grams in enumerate(shingles):
        g = grams * np.uint64(0x9E3779B97F4A7C15)
        g ^= g >> np.uint64(31)
        bits = (g[:, None] >> bit_idx[None, :]) & np.uint64(1)
        score = bits.sum(axis=0) * 2 - len(g)
        word = np.uint64(0)
        for bi in np.nonzero(score > 0)[0]:
            word |= np.uint64(1) << np.uint64(bi)
        out[i] = np.int64(word.astype(np.int64))
    return out


def test_simhash_matches_reference(spark):
    rng = np.random.RandomState(3)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa", "mu", "nu"]
    texts = []
    for i in range(200):
        k = rng.randint(0, 30)
        texts.append(" ".join(rng.choice(words, size=k)) if k else "")
    texts += ["", " ", "ab", "abc", "abcd", "x" * 5000,
              "ABC def GHI  jkl", "\t\n  spaced \t out \n"]
    pdf = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts})
    got = (simhash_signatures(spark.createDataFrame(pdf))
           .toPandas().sort_values("doc_id")["simhash"].to_numpy())
    want = _reference_simhash(texts)
    assert np.array_equal(got, want)
