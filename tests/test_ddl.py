"""Catalog DDL surface (dataset Create/Delete/Rename analogs,
gcore/gdaldataset.cpp:6984-7284): create a partitioned tile table,
insert tiles, prune by partition, rename, evolve schema, drop."""

import numpy as np
import pandas as pd


def test_tile_table_ddl_lifecycle(spark, tmp_path):
    from gdal_spark.operators.tiling import encode_tile
    from gdal_spark.sql import ddl

    name = "gdal_spark_ddl_test"
    name2 = name + "_renamed"
    ddl.drop_table(spark, name)
    ddl.drop_table(spark, name2)

    ddl.create_tile_table(spark, name,
                          location=str(tmp_path / "tiles"))
    assert spark.catalog.tableExists(name)

    rng = np.random.RandomState(1)
    rows = []
    for zoom, tx in [(1, 0), (1, 1), (2, 3)]:
        arr = rng.randint(0, 255, (8, 8)).astype(np.uint8)
        payload, dts = encode_tile(arr, None)
        rows.append({"zoom": zoom, "tile_x": tx, "tile_y": 0,
                     "band": 1, "data": payload, "dtype": dts,
                     "tile_size": 8})
    tiles = spark.createDataFrame(pd.DataFrame(rows)) \
        .select("zoom", "tile_x", "tile_y", "band", "data",
                "dtype", "tile_size")
    ddl.insert_tiles(tiles, name)

    # partition layout: one dir per zoom, prunable scan
    parts = ddl.table_partitions(spark, name)
    assert sorted(parts) == ["zoom=1", "zoom=2"]
    q = spark.sql(f"SELECT tile_x FROM {name} WHERE zoom = 1")
    assert sorted(r[0] for r in q.collect()) == [0, 1]
    plan = q.queryExecution().explainString("formatted") \
        if hasattr(q, "queryExecution") else \
        q._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution
            .ExplainMode.fromString("formatted"))
    # partition filter must reach the scan, not a post-filter
    assert "zoom" in plan

    # schema evolution + rename + drop
    ddl.add_column(spark, name, "checksum", "BIGINT")
    assert "checksum" in spark.table(name).columns
    ddl.rename_table(spark, name, name2)
    assert spark.catalog.tableExists(name2)
    assert not spark.catalog.tableExists(name)
    ddl.drop_table(spark, name2)
    assert not spark.catalog.tableExists(name2)


def test_feature_table_ddl(spark, tmp_path):
    from gdal_spark.sql import ddl

    name = "gdal_spark_ddl_features"
    ddl.drop_table(spark, name)
    ddl.create_feature_table(
        spark, name, "fid BIGINT, geometry BINARY, country STRING",
        partition_by="country", location=str(tmp_path / "feat"))
    spark.createDataFrame(pd.DataFrame({
        "fid": np.array([1, 2], dtype=np.int64),
        "geometry": [b"\x00", b"\x01"],
        "country": ["fr", "de"],
    })).select("fid", "geometry", "country") \
        .write.insertInto(name)
    assert sorted(ddl.table_partitions(spark, name)) \
        == ["country=de", "country=fr"]

    import pytest
    with pytest.raises(ValueError):
        ddl.drop_table(spark, "x; DROP TABLE y")
    with pytest.raises(ValueError):
        ddl.create_tile_table(spark, "t_bad",
                              table_format="parquet OPTIONS x")
    ddl.drop_table(spark, name)


def test_ddl_quoted_location_and_partial_overwrite(spark, tmp_path):
    """A quoted path in LOCATION must not break the statement, and
    insert_tiles(mode='overwrite') must replace ONLY the zoom
    partitions present in the frame (dynamic overwrite), never
    truncate the whole table."""
    import numpy as np
    import pandas as pd

    from gdal_spark.operators.tiling import encode_tile
    from gdal_spark.sql import ddl

    name = "gdal_spark_ddl_quoted"
    ddl.drop_table(spark, name)
    loc = tmp_path / "o'brien" / "back\\slash" / "tiles"
    ddl.create_tile_table(spark, name, location=str(loc))
    assert spark.catalog.tableExists(name)

    def tile_rows(zooms, val):
        rows = []
        for z in zooms:
            arr = np.full((4, 4), val, dtype=np.uint8)
            payload, dts = encode_tile(arr, None)
            rows.append({"zoom": z, "tile_x": 0, "tile_y": 0,
                         "band": 1, "data": payload, "dtype": dts,
                         "tile_size": 4})
        return spark.createDataFrame(pd.DataFrame(rows)) \
            .select("zoom", "tile_x", "tile_y", "band", "data",
                    "dtype", "tile_size")

    import pytest as _pt
    with _pt.raises(ValueError, match="control"):
        ddl.create_tile_table(spark, "t_ctl", location="/tmp/a\nb")
    ddl.insert_tiles(tile_rows([1, 2], 7), name)
    assert sorted(ddl.table_partitions(spark, name)) \
        == ["zoom=1", "zoom=2"]
    # overwrite only zoom 2: zoom 1 survives
    ddl.insert_tiles(tile_rows([2], 9), name, mode="overwrite")
    got = {r["zoom"]: r["cnt"] for r in
           spark.sql(f"SELECT zoom, COUNT(*) cnt FROM {name} "
                     "GROUP BY zoom").collect()}
    assert got == {1: 1, 2: 1}
    ddl.drop_table(spark, name)
