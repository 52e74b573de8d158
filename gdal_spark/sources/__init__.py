from gdal_spark.sources import pages, polygons  # noqa: F401
