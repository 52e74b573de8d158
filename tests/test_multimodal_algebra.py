"""Multimodal plumbing + layer algebra kernels."""

import numpy as np
import pandas as pd

from gdal_spark.geometry.packed import geom_area
from gdal_spark.geometry.wkb import parse_wkb, polygon_wkb
from gdal_spark.operators.layer_algebra import (
    clip_ring_convex, erase_rect, intersection,
)
from gdal_spark.sources.multimodal import (
    decode_any, encode_fakeimg, extract_features, resize_images,
    sample_frames, synth_media_df,
)


def test_fakeimg_roundtrip():
    arr = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    assert np.array_equal(decode_any(encode_fakeimg(arr)), arr)


def test_media_features(spark):
    media = synth_media_df(spark, 20, partitions=2)
    feats = extract_features(media).toPandas().sort_values("media_id")
    assert len(feats) == 20
    # widths follow the deterministic formula 16 + (id%4)*8
    want_w = [16 + (i % 4) * 8 for i in range(20)]
    assert feats["width"].tolist() == want_w


def test_media_resize(spark):
    media = synth_media_df(spark, 6, partitions=2)
    resized = resize_images(media, 8, 8).toPandas()
    for _, r in resized.iterrows():
        arr = decode_any(bytes(r["payload"]))
        assert arr.shape == (8, 8, 3)


def test_frame_sampling(spark):
    media = synth_media_df(spark, 4, partitions=1).withColumn(
        "n_frames", __import__("pyspark.sql.functions",
                               fromlist=["lit"]).lit(10))
    frames = sample_frames(media, every_n=3).toPandas()
    assert sorted(frames["frame_idx"].unique()) == [0, 3, 6, 9]
    assert len(frames) == 4 * 4


SQ = np.array([(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)], dtype=float)


def test_clip_ring_convex_triangle():
    tri = np.array([(5, -5), (15, 5), (5, 15), (5, -5)])
    out = clip_ring_convex(SQ, tri)
    # clipped region area: intersection of square and triangle
    a = geom_area(parse_wkb(polygon_wkb([out])))
    assert 0 < a < 100
    # vs rectangle clip of the triangle (symmetric check)
    from gdal_spark.geometry.ops import clip_ring_rect

    out2 = clip_ring_rect(tri, 0, 0, 10, 10)
    a2 = geom_area(parse_wkb(polygon_wkb([out2])))
    np.testing.assert_allclose(a, a2)


def test_intersection_layer(spark):
    inputs = pd.DataFrame([
        {"fid": 0, "geometry": polygon_wkb([SQ])},
        {"fid": 1, "geometry": polygon_wkb([SQ + 100.0])},
    ])
    method = pd.DataFrame([
        {"fid": 7,
         "geometry": polygon_wkb([np.array([(5, 5), (20, 5), (20, 20),
                                            (5, 20), (5, 5)])])},
    ])
    out = intersection(spark, spark.createDataFrame(inputs), method) \
        .toPandas()
    assert len(out) == 1
    assert out.iloc[0]["fid"] == 0 and out.iloc[0]["method_fid"] == 7
    np.testing.assert_allclose(out.iloc[0]["area"], 25.0)  # 5x5 overlap


def test_erase_rect(spark):
    inputs = pd.DataFrame([{"fid": 0, "geometry": polygon_wkb([SQ])}])
    out = erase_rect(spark, spark.createDataFrame(inputs),
                     (2.0, 2.0, 8.0, 8.0)).toPandas()
    assert len(out) == 1
    np.testing.assert_allclose(out.iloc[0]["area"], 100.0 - 36.0)
    # erase with disjoint rect -> full area survives
    out2 = erase_rect(spark, spark.createDataFrame(inputs),
                      (50.0, 50.0, 60.0, 60.0)).toPandas()
    np.testing.assert_allclose(out2.iloc[0]["area"], 100.0)
