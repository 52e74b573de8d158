"""similarity.kmeans — distributed Lloyd clustering."""

def test_kmeans_recovers_separable_clusters(spark):
    """Three well-separated blobs: distributed Lloyd recovers the
    exact partition and the centroids land on the blob means."""
    import numpy as np
    import pandas as pd

    from gdal_spark.operators.similarity import kmeans

    rng = np.random.RandomState(5)
    blobs = []
    for c, center in enumerate([(0, 0), (10, 10), (-10, 5)]):
        pts = rng.normal(0, 0.2, (40, 2)) + np.array(center)
        blobs.append(pts)
    x = np.vstack(blobs)
    pdf = pd.DataFrame({
        "vec_id": np.arange(120, dtype=np.int64),
        "embedding": [list(map(float, v)) for v in x],
    })
    df = spark.createDataFrame(pdf).repartition(4)
    assigns, cents = kmeans(df, n_clusters=3, iters=5)
    a = assigns.toPandas().sort_values("vec_id")["cluster"] \
        .to_numpy()
    # each blob is one pure cluster
    for b in range(3):
        seg = a[b * 40:(b + 1) * 40]
        assert (seg == seg[0]).all()
    assert len(set(a[::40])) == 3
    # centroids sit on the blob means (quantized to 1e-6)
    means = np.vstack([b.mean(axis=0) for b in blobs])
    got = cents[[int(a[b * 40]) for b in range(3)]]
    np.testing.assert_allclose(got, means, atol=1e-5)
