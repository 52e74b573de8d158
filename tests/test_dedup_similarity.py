"""Dedup + similarity over the driver testdata tables."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.operators.dedup import (
    exact_dedup, minhash_lsh_candidates, minhash_lsh_dedup,
    minhash_signatures, ngram_jaccard_pairs, simhash_candidates,
    simhash_signatures,
)
from gdal_spark.operators.similarity import (
    ann_lsh_topk, cosine_topk_bruteforce, cosine_topk_numpy,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_exact_dedup_keeps_min_key(spark):
    df = spark.createDataFrame(
        [(1, "Hello  world"), (2, "hello world"), (3, "other")],
        ["doc_id", "text"],
    )
    out = exact_dedup(df).toPandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 3]


def test_minhash_detects_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("quick", "swift")
    far = "completely different content about spark engines " * 8
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)], ["doc_id", "text"]
    )
    sigs = minhash_signatures(df, num_hashes=64)
    cand = minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
    pairs = {(r.a, r.b) for r in cand.collect()}
    assert (1, 4) in pairs  # identical
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup
    deduped = minhash_lsh_dedup(df, threshold=0.5)
    kept = sorted(r.doc_id for r in deduped.select("doc_id").collect())
    assert 3 in kept and 1 in kept and 4 not in kept


def test_ngram_jaccard(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghij"), (3, "zzzzzzzzzz")],
        ["doc_id", "text"],
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["a", "b"])
    out = {(r.a, r.b): r.jaccard
           for r in ngram_jaccard_pairs(df, pairs, n=3).collect()}
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] == 0.0


def test_simhash_close_for_near_dups(spark):
    base = "word" + " tokens repeated many times for stability " * 10
    df = spark.createDataFrame(
        [(1, base), (2, base + " x"), (3, "unrelated " * 30)],
        ["doc_id", "text"],
    )
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(df).collect()}
    ham12 = bin(sigs[1] ^ sigs[2]).count("1")
    ham13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert ham12 < ham13
    # with 8 bands any pair at hamming < 8 shares a band (pigeonhole)
    cand = simhash_candidates(simhash_signatures(df), n_bands=8)
    if ham12 < 8:
        assert (1, 2) in {(r.a, r.b) for r in cand.collect()}
    else:  # signature drifted more than expected: candidates may miss
        assert ham12 < ham13


def test_dedup_runs_on_documents_table(docs):
    n = docs.count()
    kept = exact_dedup(docs).count()
    assert 0 < kept <= n


def test_cosine_topk_numpy_matches_bruteforce(spark, emb):
    q = emb.limit(3).toPandas()
    queries = pd.DataFrame({
        "query_id": np.arange(3, dtype=np.int64),
        "query_vec": [list(map(float, v)) for v in q["embedding"]],
    })
    a = (
        cosine_topk_bruteforce(emb, queries, k=5)
        .select("query_id", "vec_id", "rank").toPandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    b = (
        cosine_topk_numpy(emb, queries, k=5)
        .select("query_id", "vec_id", "rank").toPandas()
        .sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # self-similarity: each query's top-1 is itself
    top1 = a[a["rank"] == 1]
    assert top1["vec_id"].tolist() == q["vec_id"].tolist()


def test_ann_lsh_recall(spark, emb):
    q = emb.limit(5).toPandas()
    queries = pd.DataFrame({
        "query_id": np.arange(5, dtype=np.int64),
        "query_vec": [list(map(float, v)) for v in q["embedding"]],
    })
    exact = cosine_topk_numpy(emb, queries, k=5).toPandas()
    approx = ann_lsh_topk(emb, queries, k=5, n_planes=16, n_bands=8).toPandas()
    # recall@5 over the 5 queries
    hits = 0
    for qid in range(5):
        e = set(exact[exact.query_id == qid]["vec_id"])
        a = set(approx[approx.query_id == qid]["vec_id"])
        hits += len(e & a)
    assert hits / 25 >= 0.5
    # top-1 self-match must survive LSH (identical vector, same buckets)
    top1 = approx[approx["rank"] == 1].sort_values("query_id")
    assert top1["vec_id"].tolist() == q["vec_id"].tolist()


def test_duplicate_clusters(spark):
    from gdal_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 1)], ["a", "b"])
    out = duplicate_clusters(pairs).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # components: {1,2,3,9} -> 1, {5,6} -> 5
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_duplicate_clusters_chain(spark):
    """A long chain needs label propagation across many hops."""
    from gdal_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["a", "b"])
    out = duplicate_clusters(pairs).toPandas()
    assert (out["cluster_id"] == 0).all()
    assert len(out) == 31


def test_embedding_dedup_exact_and_lsh(spark):
    """Exact mode matches a numpy oracle; LSH mode never drops a
    non-duplicate (drops subset of exact's) and catches the planted
    near-identical pairs."""
    import numpy as np
    import pandas as pd

    from gdal_spark.operators.similarity import embedding_dedup

    rng = np.random.RandomState(11)
    base = rng.randn(40, 16)
    vecs = [base[i] for i in range(40)]
    # plant near-duplicates: 41..50 are jittered copies of 0..9
    for i in range(10):
        vecs.append(base[i] + rng.randn(16) * 0.01)
    pdf = pd.DataFrame({
        "vec_id": np.arange(50, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in vecs],
        "label": np.zeros(50, dtype=np.int32),
    })
    emb = spark.createDataFrame(pdf)

    mat = np.array(vecs)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = matn @ matn.T
    dropped = set()
    for b in range(50):
        if any(sims[a, b] >= 0.95 for a in range(b)):
            dropped.add(b)

    exact = embedding_dedup(emb, 0.95, method="exact").toPandas()
    assert set(exact["vec_id"]) == set(range(50)) - dropped
    assert len(dropped) == 10  # exactly the planted copies

    lsh = embedding_dedup(emb, 0.95, method="lsh").toPandas()
    lsh_dropped = set(range(50)) - set(lsh["vec_id"])
    assert lsh_dropped <= dropped          # never a false drop
    assert len(lsh_dropped) >= 7           # catches most planted dups


def test_embedding_dedup_exact_blocked_no_driver_collect(spark,
                                                         monkeypatch):
    """The blocked exact mode must match the numpy all-pairs oracle
    on a corpus large enough to exercise every block pair, WITHOUT
    ever collecting the corpus to the driver (toPandas forbidden)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import DataFrame as SparkDF

    from gdal_spark.operators.similarity import embedding_dedup

    rng = np.random.RandomState(7)
    n = 600
    base = rng.randn(n, 12)
    # plant duplicates across block boundaries (keys i and i+303 for
    # i in 0..59 — 303 % 8 != 0 so pairs straddle blocks)
    for i in range(60):
        base[i + 303] = base[i] + rng.randn(12) * 0.005
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in base],
    })
    emb = spark.createDataFrame(pdf)

    matn = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = matn @ matn.T
    expect_drop = {
        b for b in range(n)
        if (sims[:b, b] >= 0.95).any()
    }
    assert len(expect_drop) >= 60

    def forbidden(self, *a, **k):
        raise AssertionError("exact embedding dedup collected to driver")

    monkeypatch.setattr(SparkDF, "toPandas", forbidden)
    out = embedding_dedup(emb, 0.95, method="exact", n_blocks=8)
    got = {r["vec_id"] for r in out.select("vec_id").collect()}
    assert got == set(range(n)) - expect_drop


def test_embedding_dedup_lsh_banded_recall(spark):
    """Banding must recover near-dup pairs that differ in a single
    plane sign (the unbanded whole-word scheme misses them): recall
    vs exact >= 0.9 on a jittered-copy corpus, and no false drop."""
    import numpy as np
    import pandas as pd

    from gdal_spark.operators.similarity import embedding_dedup

    rng = np.random.RandomState(23)
    n_base = 120
    base = rng.randn(n_base, 16)
    vecs = [base[i] for i in range(n_base)]
    for i in range(n_base):
        vecs.append(base[i] + rng.randn(16) * 0.02)
    n = len(vecs)
    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in vecs],
    })
    emb = spark.createDataFrame(pdf)

    mat = np.array(vecs)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = matn @ matn.T
    exact_drop = {b for b in range(n) if (sims[:b, b] >= 0.95).any()}

    lsh = embedding_dedup(emb, 0.95, method="lsh").toPandas()
    lsh_drop = set(range(n)) - set(lsh["vec_id"])
    assert lsh_drop <= exact_drop                    # never false-drop
    assert len(lsh_drop) / max(1, len(exact_drop)) >= 0.9


def test_ngram_jaccard_join_exact_and_jvm_only(spark):
    """ngram_jaccard_join: hand-computed 3-gram Jaccard on a tiny
    corpus, id_a < id_b ordering, threshold filter.  The equi-join
    fallback (dense_vocab_cap=0) keeps its pure-Catalyst contract
    (NO Python operator); the default blocked path must return the
    identical rows."""
    import pandas as pd

    from gdal_spark.operators.dedup import ngram_jaccard_join

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["abcd", "Abcde", "zzzz"],
    }))
    out = ngram_jaccard_join(docs, n=3, threshold=0.1,
                             dense_vocab_cap=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "MapInPandas" not in plan
    got = out.toPandas()
    # doc1 grams {abc,bcd}, doc2 (lowercased) {abc,bcd,cde}:
    # inter 2, union 3 -> 2/3; doc3 gram {zzz} disjoint
    assert got[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    assert abs(got["jaccard"].iloc[0] - round(2 / 3, 6)) < 1e-12
    dflt = ngram_jaccard_join(docs, n=3, threshold=0.1).toPandas()
    assert dflt.values.tolist() == got.values.tolist()


def test_ngram_jaccard_join_blocked_differential(spark):
    """The blocked small-vocab kernel (default path) is row-exact
    against the pure-JVM equi-join on a random templated corpus that
    forces MULTIPLE chunks (cross-chunk + same-chunk pair logic),
    at two thresholds, including jaccard VALUES."""
    import numpy as np
    import pandas as pd

    from gdal_spark.operators.dedup import ngram_jaccard_join

    rng = np.random.default_rng(7)
    words = ["market", "report", "lorem", "ipsum", "power", "tower",
             "brown", "fox", "jumps", "river", "stone", "cloud"]
    texts = [" ".join(rng.choice(words, size=rng.integers(5, 40)))
             for _ in range(300)]
    # duplicate cluster + near-dups to populate the >= 0.5 band
    texts[10] = texts[11] = texts[12]
    texts[20] = texts[21] + " extra"
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64), "text": texts}))
    for thr in (0.5, 0.2):
        new = ngram_jaccard_join(docs, n=3, threshold=thr).toPandas()
        old = ngram_jaccard_join(docs, n=3, threshold=thr,
                                 dense_vocab_cap=0).toPandas()
        assert new.values.tolist() == old.values.tolist(), thr
        assert len(new) > 0


def test_ngram_jaccard_join_string_keys_fallback(spark):
    """Non-integral keys dispatch to the equi-join path and still
    return the exact result."""
    import pandas as pd

    from gdal_spark.operators.dedup import ngram_jaccard_join

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": ["a", "b", "c"],
        "text": ["abcd", "Abcde", "zzzz"],
    }))
    got = ngram_jaccard_join(docs, n=3, threshold=0.1).toPandas()
    assert got[["id_a", "id_b"]].values.tolist() == [["a", "b"]]
    assert abs(got["jaccard"].iloc[0] - round(2 / 3, 6)) < 1e-12
