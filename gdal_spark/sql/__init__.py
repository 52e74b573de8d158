from gdal_spark.sql.ogrsql import execute_ogr_sql  # noqa: F401
