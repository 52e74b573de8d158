"""gdal-style pipeline + geocode cache."""

import pytest

from gdal_spark.plans.pipeline import run_vector_pipeline
from gdal_spark.sources.geocode import geocode_with_cache
from gdal_spark.sources.pages import pages_df


def test_pipeline_end_to_end(spark, tmp_path, sf_dir):
    out = str(tmp_path / "out")
    run_vector_pipeline(
        spark,
        f"read {sf_dir}/orders.parquet"
        " ! filter \"o_totalprice > 1000 AND o_orderpriority = '1-URGENT'\""
        " ! select o_orderkey,o_totalprice"
        " ! sort o_totalprice desc ! limit 5"
        f" ! write {out}",
    )
    back = spark.read.parquet(out)
    assert back.count() == 5
    prices = [r.o_totalprice for r in back.orderBy("o_totalprice").collect()]
    assert prices == sorted(prices)


def test_pipeline_sql_and_reproject(spark):
    pts = pages_df(spark, 100, partitions=2).select("i", "lon", "lat")
    df = run_vector_pipeline(
        spark,
        "read pts ! reproject 4326->3857"
        " ! sql \"SELECT i, x, y FROM input WHERE i < 10\"",
        layers={"pts": pts},
    )
    rows = df.collect()
    assert len(rows) == 10
    assert all(abs(r.x) <= 20037508.35 for r in rows)


def test_pipeline_validation(spark):
    with pytest.raises(ValueError):
        run_vector_pipeline(spark, "filter \"a > 1\" ! write /tmp/x")
    with pytest.raises(ValueError):
        run_vector_pipeline(
            spark, "read a ! write /tmp/x ! filter \"a > 1\"")


def test_geocode_cache_roundtrip(spark, tmp_path):
    cache = str(tmp_path / "geocache")
    pages = pages_df(spark, 50, partitions=2).select("url", "html")
    first = geocode_with_cache(spark, pages, cache).toPandas()
    assert len(first) == 50
    assert not first["from_cache"].any()
    second = geocode_with_cache(spark, pages, cache).toPandas()
    assert len(second) == 50
    assert second["from_cache"].all()
    # cached coords identical to the first extraction
    a = first.set_index("url")[["lat", "lon"]].sort_index()
    b = second.set_index("url")[["lat", "lon"]].sort_index()
    assert ((a - b).abs().to_numpy() < 1e-12).all()
