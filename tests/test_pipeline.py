"""Vector-pipeline read/write driver-registry dispatch."""


def test_pipeline_reads_and_writes_any_driver(spark, tmp_path):
    """`gdal vector pipeline read x.fgb ! ... ! write y.geojsonl`:
    the read/write steps dispatch through the driver registry."""
    import numpy as np
    import pandas as pd

    from gdal_spark.geometry.wkb import point_wkb
    from gdal_spark.plans.pipeline import run_vector_pipeline
    from gdal_spark.sources.registry import open_vector, write_vector

    pdf = pd.DataFrame({
        "fid": np.arange(1, 21, dtype=np.int64),
        "geometry": [point_wkb(float(i), float(i % 7))
                     for i in range(20)],
        "cat": np.arange(20, dtype=np.int64) % 3,
    })
    src = str(tmp_path / "src.fgb")
    write_vector(spark.createDataFrame(pdf), src, mode="single")
    dst = str(tmp_path / "out.geojsonl")
    run_vector_pipeline(
        spark, f"read {src} ! filter \"cat = 1\" ! write {dst}")
    back = open_vector(spark, dst)
    assert back.count() == len(pdf[pdf.cat == 1])
