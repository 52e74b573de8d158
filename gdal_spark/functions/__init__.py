from gdal_spark.functions import geo, hilbert, text  # noqa: F401
