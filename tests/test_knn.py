"""kNN golden suite (FIXTURES.md #8): k-ring expansion == brute-force
k-smallest haversine, k in {1, 5}."""

import numpy as np
import pandas as pd

from gdal_spark.operators.knn import knn_bruteforce, knn_cells
from gdal_spark.sources.pages import pages_df

RNG = np.random.RandomState(123)
TARGETS = pd.DataFrame({
    "target_id": np.arange(100, dtype=np.int64),
    "t_lon": RNG.uniform(-179, 179, 100),
    "t_lat": RNG.uniform(-80, 80, 100),
})


def test_knn_k1_matches_bruteforce(spark):
    pts = pages_df(spark, 1000, partitions=4).select("i", "lon", "lat")
    got = (
        knn_cells(pts, TARGETS, k=1, res=4)
        .select("i", "target_id").toPandas()
        .sort_values("i").reset_index(drop=True)
    )
    want = (
        knn_bruteforce(pts, TARGETS, k=1)
        .select("i", "target_id").toPandas()
        .sort_values("i").reset_index(drop=True)
    )
    assert len(got) == 1000
    pd.testing.assert_frame_equal(got, want)


def test_knn_k5_matches_bruteforce(spark):
    pts = pages_df(spark, 300, partitions=4).select("i", "lon", "lat")
    got = (
        knn_cells(pts, TARGETS, k=5, res=4)
        .select("i", "rank", "target_id").toPandas()
        .sort_values(["i", "rank"]).reset_index(drop=True)
    )
    want = (
        knn_bruteforce(pts, TARGETS, k=5)
        .select("i", "rank", "target_id").toPandas()
        .sort_values(["i", "rank"]).reset_index(drop=True)
    )
    assert len(want) == 1500
    pd.testing.assert_frame_equal(got, want)


def test_knn_small_target_fast_path(spark):
    """<=64 targets takes the direct distance-matrix path; results
    must still match brute force exactly (k=1 and k=3)."""
    small = TARGETS.iloc[:12].reset_index(drop=True)
    pts = pages_df(spark, 500, partitions=4).select("i", "lon", "lat")
    for k in (1, 3):
        got = (
            knn_cells(pts, small, k=k, res=4)
            .select("i", "rank", "target_id").toPandas()
            .sort_values(["i", "rank"]).reset_index(drop=True)
        )
        want = (
            knn_bruteforce(pts, small, k=k)
            .select("i", "rank", "target_id").toPandas()
            .sort_values(["i", "rank"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_knn_antimeridian_wrap(spark):
    """A point near the dateline whose true nearest target lies on
    the other side of +-180 — the ring search must not certify early
    (the wrap lower bound forces expansion / full scan)."""
    targets = pd.DataFrame({
        "target_id": np.array([0, 1], dtype=np.int64),
        "t_lon": [179.5, -120.0],
        "t_lat": [10.0, 10.0],
    })
    pts = spark.createDataFrame(
        pd.DataFrame({"i": np.array([0], dtype=np.int64),
                      "lon": [-179.5], "lat": [10.0]}))
    # force the ring path (>64 targets not needed: pad with far decoys)
    pad = pd.DataFrame({
        "target_id": np.arange(2, 72, dtype=np.int64),
        "t_lon": np.linspace(-60, 60, 70),
        "t_lat": np.full(70, -80.0),
    })
    tgts = pd.concat([targets, pad], ignore_index=True)
    got = knn_cells(pts, tgts, k=1, res=4).collect()[0]
    want = knn_bruteforce(pts, tgts, k=1).collect()[0]
    assert got.target_id == want.target_id == 0  # wraps the dateline
    assert abs(got.dist_m - want.dist_m) < 1e-6
