"""Geocoding stage with a persistent cache table.

Mirrors the reference's OGRGeocode session design
(ogr/ogr_geocoding.cpp:118-197: query -> (lat, lon) with a local
cache so repeated queries never refetch), with deterministic
extraction instead of network calls (no network in tests):

* primary source: the html geo.position hint
  (gdal_spark.sources.pages.with_extracted_geo)
* fallback: the deterministic LCG hash of the url (the same function
  the correctness oracles use)
* cache: a parquet table keyed by url; ``geocode_with_cache`` left
  joins the cache first and only runs extraction for misses, then
  appends the new rows — the distributed rendering of the
  reference's per-session sqlite/CSV cache.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from gdal_spark.functions import geo


def extract_or_hash_geo(pages: DataFrame) -> DataFrame:
    """(url, lat, lon): html hint when present, else the url-hash
    fallback (deterministic, identical to the oracle LCG)."""
    from gdal_spark.sources.pages import with_extracted_geo

    with_hint = with_extracted_geo(pages)
    url_key = F.abs(F.xxhash64("url")) % F.lit(geo.LCG_M)
    return with_hint.select(
        "url",
        F.coalesce(
            F.col("geo_lat"),
            (url_key.cast("double") / geo.LCG_M * 170.0 - 85.0),
        ).alias("lat"),
        F.coalesce(
            F.col("geo_lon"),
            ((url_key * 2654435761 % geo.LCG_M).cast("double")
             / geo.LCG_M * 360.0 - 180.0),
        ).alias("lon"),
    )


def geocode_with_cache(spark: SparkSession, pages: DataFrame,
                       cache_path: str) -> DataFrame:
    """Geocode pages, reading/updating the cache table at
    ``cache_path``.  Returns (url, lat, lon, from_cache)."""
    has_cache = os.path.isdir(cache_path)
    if has_cache:
        cache = spark.read.parquet(cache_path)
        hits = pages.join(cache, "url", "inner").select(
            "url", "lat", "lon", F.lit(True).alias("from_cache"))
        misses = pages.join(cache.select("url"), "url", "left_anti")
    else:
        hits = None
        misses = pages
    fresh = extract_or_hash_geo(misses).select(
        "url", "lat", "lon", F.lit(False).alias("from_cache"))
    # append misses to the cache (idempotent per url by construction)
    fresh.select("url", "lat", "lon").write.mode("append") \
        .parquet(cache_path)
    return fresh.unionByName(hits) if hits is not None else fresh
