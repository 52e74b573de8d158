from gdal_spark.plans.lineage import Pipeline  # noqa: F401
