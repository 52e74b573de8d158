from gdal_spark.geometry import ops, packed, pip, wkb  # noqa: F401
