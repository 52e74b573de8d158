"""Similarity search over embedding columns (array<float>).

* cosine_topk_bruteforce — exact top-k per query, JVM-side
  (F.zip_with/F.aggregate dot products) — the baseline every ANN
  variant is verified against, and the DuckDB-oracle-checkable path.
* cosine_topk_numpy — exact top-k with a numpy GEMM kernel
  (mapInPandas over the corpus, queries broadcast): the fast exact
  path; one matmul per Arrow batch.
* ann_lsh_topk — approximate: random-hyperplane LSH buckets
  (SimHash-for-vectors), candidate union over bands, exact rerank.

Scale: corpus is scanned once, never shuffled; queries broadcast.
Top-k merge is a groupBy over (query_id) of per-partition top-k —
partial aggregation keeps the shuffle tiny.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StructField,
    StructType,
)


def cosine_sim_col(a: str | F.Column, b: F.Column) -> F.Column:
    """JVM-side cosine similarity of two array<float/double> columns."""
    a = F.col(a) if isinstance(a, str) else a
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"),
                            lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0).cast("double"),
                            lambda acc, v: acc + v * v))
    return dot / (na * nb)


def cosine_topk_bruteforce(
    corpus: DataFrame, queries_pdf: pd.DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id: str = "query_id", q_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k: broadcast queries x corpus, JVM-side cosine."""
    spark = corpus.sparkSession
    q = F.broadcast(spark.createDataFrame(queries_pdf))
    scored = corpus.crossJoin(q).withColumn(
        "cosine",
        cosine_sim_col(vec_col, F.col(q_vec).cast("array<double>")),
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(q_id, id_col, "cosine", "rank")
    )


def cosine_topk_numpy(
    corpus: DataFrame, queries_pdf: pd.DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id: str = "query_id", q_vec: str = "query_vec",
) -> DataFrame:
    """Exact top-k with a GEMM per Arrow batch + tiny top-k shuffle."""
    spark = corpus.sparkSession
    qids = queries_pdf[q_id].to_numpy(dtype=np.int64)
    qm = np.vstack(queries_pdf[q_vec].to_numpy()).astype(np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((qids, qm))
    schema = StructType([
        StructField(q_id, LongType()),
        StructField(id_col, corpus.schema[id_col].dataType),
        StructField("cosine", DoubleType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qm_ = bc.value
        for b in batches:
            if len(b) == 0:
                continue
            cm = np.vstack(b[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(cm, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            cm = cm / norms
            sims = cm @ qm_.T  # (batch, Q)
            # per-partition partial top-k per query
            kk = min(k, len(b))
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            rows = {q_id: [], id_col: [], "cosine": []}
            ids = b[id_col].to_numpy()
            for qi in range(len(qids_)):
                sel = part[:, qi]
                rows[q_id].extend([qids_[qi]] * len(sel))
                rows[id_col].extend(ids[sel])
                rows["cosine"].extend(sims[sel, qi])
            yield pd.DataFrame(rows)

    partial = corpus.select(id_col, vec_col).mapInPandas(kernel, schema)
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), id_col)
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(q_id, id_col, "cosine", "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42
                       ) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim))


# --- IVF (inverted-file) ANN: the partition-pruned scale path -------

def train_ivf_centroids(corpus: DataFrame, n_clusters: int = 16,
                        sample: int = 4096, iters: int = 10,
                        seed: int = 42,
                        vec_col: str = "embedding") -> np.ndarray:
    """k-means on a driver-side sample (Lloyd iterations on unit
    vectors) -> (n_clusters, dim) centroids."""
    pdf = corpus.select(vec_col).limit(sample).toPandas()
    x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    c = x[rng.choice(len(x), n_clusters, replace=False)]
    for _ in range(iters):
        sims = x @ c.T
        assign = np.argmax(sims, axis=1)
        for j in range(n_clusters):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
    return c


def ivf_topk(
    corpus: DataFrame, queries_pdf: pd.DataFrame, k: int = 5,
    centroids: np.ndarray | None = None, n_clusters: int = 16,
    n_probe: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id: str = "query_id", q_vec: str = "query_vec",
) -> DataFrame:
    """IVF ANN: corpus vectors are assigned to their nearest centroid
    (one GEMM per batch — a derived partition-pruning column); each
    query probes its ``n_probe`` nearest centroids and reranks
    exactly within those lists.

    At 100TB the assignment column becomes an Iceberg partition key,
    so a query scans only n_probe/n_clusters of the corpus.
    """
    spark = corpus.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(corpus, n_clusters, seed=seed,
                                        vec_col=vec_col)
    bc = spark.sparkContext.broadcast(centroids)
    assign_schema = StructType([
        StructField(id_col, corpus.schema[id_col].dataType),
        StructField("ivf_list", IntegerType()),
    ])

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for b in batches:
            if len(b) == 0:
                continue
            x = np.vstack(b[vec_col].to_numpy()).astype(np.float64)
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True),
                               1e-12)
            yield pd.DataFrame({
                id_col: b[id_col],
                "ivf_list": np.argmax(x @ c.T, axis=1).astype(np.int32),
            })

    lists = corpus.select(id_col, vec_col).mapInPandas(assign,
                                                       assign_schema)

    qm = np.vstack(queries_pdf[q_vec].to_numpy()).astype(np.float64)
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    probes = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    qrows = []
    for i, qid in enumerate(queries_pdf[q_id]):
        for p in probes[i]:
            qrows.append((int(qid), int(p)))
    qdf = F.broadcast(spark.createDataFrame(
        pd.DataFrame(qrows, columns=[q_id, "ivf_list"])))

    cand = lists.join(qdf, "ivf_list").select(q_id, id_col)
    scored = (
        cand.join(corpus.select(id_col, vec_col), id_col)
        .join(F.broadcast(spark.createDataFrame(
            queries_pdf[[q_id, q_vec]])), q_id)
        .withColumn(
            "cosine",
            cosine_sim_col(vec_col, F.col(q_vec).cast("array<double>")),
        )
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(q_id, id_col, "cosine", "rank")
    )


def ann_lsh_topk(
    corpus: DataFrame, queries_pdf: pd.DataFrame, k: int = 5,
    n_planes: int = 16, n_bands: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    q_id: str = "query_id", q_vec: str = "query_vec",
) -> DataFrame:
    """ANN: random-hyperplane LSH bucket prefilter + exact rerank.

    Scale path: corpus is bucketed once (a narrow derived column);
    per-query candidates come from matching any of n_bands bucket
    words, then exact cosine reranks.  Recall grows with bands.
    """
    spark = corpus.sparkSession
    dim = len(queries_pdf[q_vec].iloc[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    width = n_planes // n_bands
    bc = spark.sparkContext.broadcast(planes)

    sig_schema = StructType([
        StructField(id_col, corpus.schema[id_col].dataType),
        StructField("band", IntegerType()),
        StructField("bucket", LongType()),
    ])

    def bucketize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bc.value
        for b in batches:
            if len(b) == 0:
                continue
            cm = np.vstack(b[vec_col].to_numpy()).astype(np.float64)
            bits = (cm @ pl.T) > 0  # (n, planes)
            rows = {id_col: [], "band": [], "bucket": []}
            ids = b[id_col].to_numpy()
            for band in range(n_bands):
                word = np.zeros(len(b), dtype=np.int64)
                for j in range(width):
                    word |= bits[:, band * width + j].astype(np.int64) << j
                rows[id_col].extend(ids)
                rows["band"].extend([band] * len(b))
                rows["bucket"].extend(word)
            yield pd.DataFrame(rows)

    corpus_buckets = corpus.select(id_col, vec_col).mapInPandas(
        bucketize, sig_schema)

    qm = np.vstack(queries_pdf[q_vec].to_numpy()).astype(np.float64)
    qbits = (qm @ planes.T) > 0
    qrows = []
    for i, qid in enumerate(queries_pdf[q_id]):
        for band in range(n_bands):
            word = 0
            for j in range(width):
                word |= int(qbits[i, band * width + j]) << j
            qrows.append((int(qid), band, word))
    qb = F.broadcast(spark.createDataFrame(
        pd.DataFrame(qrows, columns=[q_id, "band", "bucket"])))

    cand = (
        corpus_buckets.join(qb, ["band", "bucket"])
        .select(q_id, id_col).distinct()
    )
    scored = (
        cand.join(corpus.select(id_col, vec_col), id_col)
        .join(F.broadcast(spark.createDataFrame(
            queries_pdf[[q_id, q_vec]])), q_id)
        .withColumn(
            "cosine",
            cosine_sim_col(vec_col, F.col(q_vec).cast("array<double>")),
        )
    )
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(q_id, id_col, "cosine", "rank")
    )


def embedding_dedup(
    emb: DataFrame, threshold: float = 0.95,
    key_col: str = "vec_id", vec_col: str = "embedding",
    method: str = "lsh", n_planes: int = 64, n_bands: int = 4,
    seed: int = 42, n_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate removal: drop every row whose
    vector has cosine >= threshold with a SMALLER-key row (the same
    min-representative rule as minhash_lsh_dedup).

    method "lsh" (default, the 100-TB path): BANDED random-hyperplane
    sign buckets (n_bands bands of n_planes/n_bands planes each — a
    near-dup pair only needs to agree on ONE band); each band-bucket
    links members to its min key (star pairing, O(k) per bucket);
    candidate pairs verify with EXACT cosine before any drop — LSH
    only affects recall, never the correctness of a drop.  Band width
    (16 planes by default) is chosen so a band-bucket ≈ a dup
    cluster: star pairing assumes the bucket min IS a cluster member,
    which narrow bands (big mixed buckets) would break.
    method "exact": upper-triangular BLOCKED all-pairs — keys hash
    into n_blocks blocks, every unordered block pair (i <= j) is one
    task holding 2·N/n_blocks vectors, cross-block (and triangular
    within-block) GEMMs emit dropped keys.  Exact recall, no driver
    round-trip anywhere, task memory bounded by (N/n_blocks)·dim —
    pick n_blocks ~ N·dim·8 / target_task_bytes at scale.
    """
    from pyspark.sql.types import (
        IntegerType, LongType, StructField, StructType,
    )

    spark = emb.sparkSession
    if method == "exact":
        nb = int(n_blocks)
        key_dt = emb.schema[key_col].dataType.simpleString()
        if key_dt not in ("tinyint", "smallint", "int", "bigint"):
            # pmod on a non-numeric key casts to NULL -> every row
            # lands in one NULL block; fail fast instead
            raise TypeError(
                f"embedding_dedup exact mode needs an integral "
                f"{key_col!r}; got {key_dt}")
        src = emb.select(key_col, vec_col).withColumn(
            "blk", F.pmod(F.col(key_col), F.lit(nb)).cast("int"))
        # one row per (block pair, participating block): the build
        # side of the replicate-join that co-locates each block pair
        prows = []
        for i in range(nb):
            for j in range(i, nb):
                prows.append((i, j, i))
                if j != i:
                    prows.append((i, j, j))
        pairs_long = F.broadcast(spark.createDataFrame(
            pd.DataFrame(prows, columns=["pi", "pj", "blk"])))
        repl = src.join(pairs_long, "blk")
        schema = StructType([StructField(key_col, LongType())])

        def pair_drops(key, pdf: pd.DataFrame) -> pd.DataFrame:
            pi, pj = int(key[0]), int(key[1])
            keys = pdf[key_col].to_numpy(np.int64)
            mat = np.array([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]])
            mat /= np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            blk = pdf["blk"].to_numpy()
            if pi == pj:
                sims = mat @ mat.T
                smaller = keys[None, :] < keys[:, None]
                dropped = ((sims >= threshold) & smaller).any(axis=1)
                out = keys[dropped]
            else:
                ai = blk == pi
                aj = blk == pj
                ki, kj = keys[ai], keys[aj]
                if len(ki) == 0 or len(kj) == 0:
                    return pd.DataFrame({key_col: np.array(
                        [], dtype=np.int64)})
                sims = mat[ai] @ mat[aj].T      # (Ni, Nj)
                hit = sims >= threshold
                # either side can be the larger key of a cross pair
                drop_j = (hit & (ki[:, None] < kj[None, :])).any(axis=0)
                drop_i = (hit & (kj[None, :] < ki[:, None])).any(axis=1)
                out = np.concatenate([ki[drop_i], kj[drop_j]])
            return pd.DataFrame({key_col: out})

        dropped = repl.groupBy("pi", "pj").applyInPandas(
            pair_drops, schema)
        return emb.join(dropped, key_col, "left_anti")

    # lsh: banded hyperplane sign buckets -> star pairs -> exact verify
    first = emb.select(vec_col).first()
    dim = len(first[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    width = max(1, n_planes // n_bands)
    bcp = spark.sparkContext.broadcast(planes)
    schema = StructType([StructField(key_col, LongType()),
                         StructField("band", IntegerType()),
                         StructField("bucket", LongType())])

    def bucketize(batches: Iterator[pd.DataFrame]
                  ) -> Iterator[pd.DataFrame]:
        pl = bcp.value
        for b in batches:
            if len(b) == 0:
                continue
            mat = np.array([np.asarray(v, dtype=np.float64)
                            for v in b[vec_col]])
            bits = (mat @ pl.T) >= 0
            ks = b[key_col].to_numpy(np.int64)
            for band in range(n_bands):
                word = np.zeros(len(b), dtype=np.int64)
                for j in range(width):
                    word |= bits[:, band * width + j].astype(
                        np.int64) << j
                yield pd.DataFrame({key_col: ks,
                                    "band": np.int32(band),
                                    "bucket": word})

    buckets = emb.select(key_col, vec_col).mapInPandas(bucketize, schema)
    w = Window.partitionBy("band", "bucket")
    pairs = (
        buckets.withColumn("rep", F.min(key_col).over(w))
        .filter(F.col(key_col) != F.col("rep"))
        .select(F.col("rep").alias("a"), F.col(key_col).alias("b"))
        .distinct()
    )
    va = emb.select(F.col(key_col).alias("a"),
                    F.col(vec_col).alias("vec_a"))
    vb = emb.select(F.col(key_col).alias("b"),
                    F.col(vec_col).alias("vec_b"))
    # exact-cosine verify in a numpy kernel that REPLAYS the JVM
    # left-fold bit-for-bit (the Catalyst zip_with/aggregate form
    # evaluates interpreted and pays seconds of first-run cost):
    # per-element float32 product (the array<float> element type),
    # widened to double and accumulated left-to-right — a j-loop of
    # vectorized ops preserves the exact IEEE op order per row, so a
    # knife-edge pair at the threshold decides identically (q40/q18
    # frozen-oracle contract).  BLAS/np.dot would change summation
    # order and is deliberately not used.
    elem_np = {"float": np.float32, "double": np.float64}[
        emb.schema[vec_col].dataType.elementType.simpleString()]
    thr = float(threshold)
    drop_schema = StructType([
        StructField("b", emb.schema[key_col].dataType)])

    def cos_verify(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            ma = np.array([np.asarray(v, dtype=elem_np)
                           for v in b["vec_a"]])
            mb = np.array([np.asarray(v, dtype=elem_np)
                           for v in b["vec_b"]])
            n, d = ma.shape
            dot = np.zeros(n, dtype=np.float64)
            na = np.zeros(n, dtype=np.float64)
            nb = np.zeros(n, dtype=np.float64)
            for j in range(d):
                xa = ma[:, j]
                xb = mb[:, j]
                dot += (xa * xb).astype(np.float64)
                na += (xa * xa).astype(np.float64)
                nb += (xb * xb).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dot / (np.sqrt(na) * np.sqrt(nb))
                keep = cos >= thr
            if keep.any():
                yield pd.DataFrame(
                    {"b": b["b"].to_numpy()[keep]})

    verified = (pairs.join(va, "a").join(vb, "b")
                .mapInPandas(cos_verify, drop_schema))
    drop = verified.distinct().withColumnRenamed("b", key_col)
    return emb.join(drop, key_col, "left_anti")


def kmeans(corpus: DataFrame, n_clusters: int = 8, iters: int = 2,
           *, id_col: str = "vec_id", vec_col: str = "embedding",
           round_digits: int = 6
           ) -> tuple[DataFrame, np.ndarray]:
    """Distributed Lloyd k-means over an embedding column — the
    semantic-clustering stage of an LLM curation pipeline (cluster
    -> per-cluster dedup/balance; the same math as
    train_ivf_centroids but EXACT and distributed: no sampling).

    Deterministic by construction so a SQL oracle can replay it:
    initial centroids are the vectors of the ``n_clusters`` smallest
    ids; after every update step centroids ROUND to ``round_digits``
    decimals (a declared quantization — it kills summation-order ulp
    drift between engines; ties at the 1e-6 grid edge are measure
    zero).  Each iteration is ONE map-side partial-sum pass
    (k x partitions rows reach the driver, never vectors) + a
    broadcast back; the final assignment is a stateless kernel.

    -> (assignments DataFrame (id, cluster), (k, dim) centroids)."""
    spark = corpus.sparkSession
    first = (corpus.orderBy(id_col).limit(n_clusters)
             .select(vec_col).toPandas())
    cents = np.vstack([np.asarray(v, dtype=np.float64)
                       for v in first[vec_col]])
    cents = np.round(cents, round_digits)
    k, dim = cents.shape

    part_schema = StructType([
        StructField("cluster", IntegerType()),
        StructField("n", LongType()),
        StructField("sums", ArrayType(DoubleType())),
    ])

    src = corpus.select(id_col, vec_col)

    for _ in range(int(iters)):
        bc = spark.sparkContext.broadcast(cents)

        def partials(batches: Iterator[pd.DataFrame],
                     _bc=bc) -> Iterator[pd.DataFrame]:
            c = _bc.value
            acc_n = np.zeros(len(c), dtype=np.int64)
            acc_s = np.zeros((len(c), c.shape[1]))
            for b in batches:
                if not len(b):
                    continue
                x = np.vstack([np.asarray(v, dtype=np.float64)
                               for v in b[vec_col]])
                d2 = ((x[:, None, :] - c[None, :, :]) ** 2) \
                    .sum(axis=2)
                a = np.argmin(d2, axis=1)
                np.add.at(acc_n, a, 1)
                np.add.at(acc_s, a, x)
            nz = np.flatnonzero(acc_n)
            yield pd.DataFrame({
                "cluster": nz.astype(np.int32),
                "n": acc_n[nz],
                "sums": [acc_s[j].tolist() for j in nz]})

        pdf = src.mapInPandas(partials, part_schema).toPandas()
        new = cents.copy()
        for j in range(k):
            rows = pdf[pdf["cluster"] == j]
            if len(rows):
                total = np.sum(
                    np.vstack(rows["sums"].to_numpy()), axis=0)
                new[j] = total / rows["n"].sum()
        cents = np.round(new, round_digits)

    bc = spark.sparkContext.broadcast(cents)
    out_schema = StructType([
        corpus.schema[id_col],
        StructField("cluster", IntegerType()),
    ])

    def assign(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        c = bc.value
        for b in batches:
            if not len(b):
                continue
            x = np.vstack([np.asarray(v, dtype=np.float64)
                           for v in b[vec_col]])
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame({
                id_col: b[id_col],
                "cluster": np.argmin(d2, axis=1)
                .astype(np.int32)})

    return src.mapInPandas(assign, out_schema), cents
