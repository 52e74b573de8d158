"""raster select / set-type / nodata-to-alpha / stack verbs
(operators/bandops.py) + the vector concat / set-geom-type /
explode-collections pipeline verbs."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gdal_spark.geometry import wkb as W
from gdal_spark.operators.bandops import (
    nodata_to_alpha, select_bands, set_dtype, stack_bands,
)
from gdal_spark.operators.tiling import TILE_SCHEMA, decode_tile


def _band_tiles(spark, nbands, base=0.0, dtype="float64"):
    rows = []
    for b in range(1, nbands + 1):
        arr = np.full((8, 8), base + b * 10, dtype=dtype)
        arr[0, 0] = base
        rows.append({"zoom": 0, "tile_x": 0, "tile_y": 0, "band": b,
                     "data": arr.tobytes(), "dtype": dtype,
                     "tile_size": 8})
    return spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)


def test_select_reorders_and_renumbers(spark):
    t = _band_tiles(spark, 3)
    out = select_bands(t, [3, 1]).toPandas() \
        .sort_values("band").reset_index(drop=True)
    assert out["band"].tolist() == [1, 2]
    a1 = decode_tile(out.loc[0, "data"], "float64", 8)
    a2 = decode_tile(out.loc[1, "data"], "float64", 8)
    assert a1[1, 1] == 30.0 and a2[1, 1] == 10.0     # 3 -> 1, 1 -> 2


def test_set_type_rounds_and_clamps(spark):
    rows = [{"zoom": 0, "tile_x": 0, "tile_y": 0, "band": 1,
             "data": np.array([[-5.7, 0.5, 130.4, 300.0]] * 4,
                              dtype=np.float64)[:4, :4].tobytes(),
             "dtype": "float64", "tile_size": 4}]
    t = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    out = set_dtype(t, "uint8").toPandas()
    a = decode_tile(out.loc[0, "data"], out.loc[0, "dtype"], 4)
    assert a.dtype == np.uint8
    # GDALCopyWord: round half AWAY from zero, clamp to [0, 255]
    assert a[0].tolist() == [0, 1, 130, 255]
    out2 = set_dtype(t, "int16").toPandas()
    b = decode_tile(out2.loc[0, "data"], out2.loc[0, "dtype"], 4)
    assert b[0].tolist() == [-6, 1, 130, 300]


def test_nodata_to_alpha_all_bands_rule(spark):
    t = _band_tiles(spark, 2, base=0.0)      # [0,0] == 0 in BOTH
    out = nodata_to_alpha(t, 0.0).toPandas()
    assert sorted(out["band"].tolist()) == [1, 2, 3]
    alpha = decode_tile(
        out[out["band"] == 3].iloc[0]["data"], "uint8", 8)
    assert alpha[0, 0] == 0 and (alpha.ravel()[1:] == 255).all()


def test_stack_concatenates_band_numbering(spark):
    a = _band_tiles(spark, 2, base=0.0)
    b = _band_tiles(spark, 3, base=100.0)
    out = stack_bands([a, b])
    assert sorted(r["band"] for r in
                  out.select("band").collect()) == [1, 2, 3, 4, 5]
    p = out.filter(F.col("band") == 4).toPandas()
    arr = decode_tile(p.loc[0, "data"], "float64", 8)
    assert arr[1, 1] == 120.0                # input-b band 2


def _feat_df(spark):
    pdf = pd.DataFrame({
        "fid": [1, 2],
        "geometry": [
            W.point_wkb(1.0, 2.0),
            W.multipolygon_wkb([
                [[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]],
                [[(10, 10), (12, 10), (12, 12), (10, 12),
                  (10, 10)]],
            ]),
        ],
    })
    return spark.createDataFrame(pdf)


def test_set_geom_type_multi_and_single(spark):
    from gdal_spark.plans.pipeline import run_vector_pipeline

    df = _feat_df(spark)
    up = run_vector_pipeline(spark, "read f ! set-geom-type multi",
                             layers={"f": df}).toPandas() \
        .set_index("fid")
    assert W.parse_wkb(bytes(up.loc[1, "geometry"])).kind \
        == W.MULTIPOINT
    assert W.parse_wkb(bytes(up.loc[2, "geometry"])).kind \
        == W.MULTIPOLYGON
    down = run_vector_pipeline(
        spark, "read f ! set-geom-type single",
        layers={"f": df}).toPandas().set_index("fid")
    g2 = W.parse_wkb(bytes(down.loc[2, "geometry"]))
    assert g2.kind == W.POLYGON
    assert g2.parts[0][:, 0].max() == 4.0    # first part kept


def test_concat_and_explode_collections(spark):
    from gdal_spark.plans.pipeline import run_vector_pipeline

    df = _feat_df(spark)
    other = spark.createDataFrame(pd.DataFrame({
        "fid": [7], "geometry": [W.point_wkb(9.0, 9.0)]}))
    out = run_vector_pipeline(
        spark, "read f ! concat g ! explode-collections",
        layers={"f": df, "g": other})
    pdf = out.toPandas()
    # 1 point + 2 multipolygon parts + 1 concat point
    assert len(pdf) == 4
    kinds = {W.parse_wkb(bytes(g)).kind for g in pdf["geometry"]}
    assert kinds == {W.POINT, W.POLYGON}


def test_raster_compare_reports_diffs(spark):
    from gdal_spark.operators.bandops import raster_compare

    a = _band_tiles(spark, 2)
    b = _band_tiles(spark, 2)
    rep = raster_compare(a, b)
    assert rep["identical"]
    # perturb one pixel of band 2 + drop band 1 on side b
    rows = []
    arr = np.full((8, 8), 20.0)
    arr[3, 3] = 21.5
    arr[0, 0] = 0.0
    rows.append({"zoom": 0, "tile_x": 0, "tile_y": 0, "band": 2,
                 "data": arr.tobytes(), "dtype": "float64",
                 "tile_size": 8})
    from gdal_spark.operators.tiling import TILE_SCHEMA
    b2 = spark.createDataFrame(pd.DataFrame(rows), TILE_SCHEMA)
    rep2 = raster_compare(a, b2)
    assert not rep2["identical"]
    assert rep2["bands"][2]["n_diff"] == 1
    assert rep2["bands"][2]["max_abs"] == pytest.approx(1.5)
    assert rep2["tiles_only_a"] == 1      # band 1 missing on b


def test_dataset_mgmt_sidecars(tmp_path):
    from gdal_spark.sources.dataset_mgmt import (
        dataset_copy, dataset_delete, dataset_files, dataset_rename,
    )

    for ext in (".shp", ".shx", ".dbf", ".prj"):
        (tmp_path / f"pts{ext}").write_bytes(b"x" * 10)
    src = str(tmp_path / "pts.shp")
    assert len(dataset_files(src)) == 4
    copied = dataset_copy(src, str(tmp_path / "c" / "pts2.shp"))
    assert len(copied) == 4
    assert (tmp_path / "c" / "pts2.dbf").exists()
    moved = dataset_rename(str(tmp_path / "c" / "pts2.shp"),
                           str(tmp_path / "c" / "pts3.shp"))
    assert len(moved) == 4
    assert not (tmp_path / "c" / "pts2.shp").exists()
    n = dataset_delete(str(tmp_path / "c" / "pts3.shp"))
    assert n == 4
    assert not any((tmp_path / "c").iterdir())
    import pytest as _pt
    with _pt.raises(FileNotFoundError):
        dataset_delete(str(tmp_path / "nope.shp"))


def test_blend_modes_match_formulas(spark):
    from gdal_spark.operators.bandops import blend_tiles

    base = np.full((8, 8), 100, dtype=np.uint8)
    over = np.full((8, 8), 200, dtype=np.uint8)
    rows_b = [{"zoom": 0, "tile_x": 0, "tile_y": 0, "band": 1,
               "data": base.tobytes(), "dtype": "uint8",
               "tile_size": 8}]
    rows_o = [{"zoom": 0, "tile_x": 0, "tile_y": 0, "band": 1,
               "data": over.tobytes(), "dtype": "uint8",
               "tile_size": 8}]
    db = spark.createDataFrame(pd.DataFrame(rows_b), TILE_SCHEMA)
    do = spark.createDataFrame(pd.DataFrame(rows_o), TILE_SCHEMA)

    def run(mode, opacity=100.0):
        out = blend_tiles(db, do, mode=mode,
                          opacity=opacity).toPandas()
        return decode_tile(out.iloc[0]["data"],
                           out.iloc[0]["dtype"], 8)[0, 0]

    b, o = 100 / 255.0, 200 / 255.0
    assert run("src-over") == 200
    assert run("src-over", 50.0) == int(np.trunc(
        (0.5 * b + 0.5 * o) * 255.0 + 0.5))
    assert run("multiply") == int(np.trunc(b * o * 255.0 + 0.5))
    assert run("screen") == int(np.trunc(
        (1 - (1 - b) * (1 - o)) * 255.0 + 0.5))
    assert run("darken") == 100 and run("lighten") == 200


def test_blend_disjoint_tiles_pass_through(spark):
    from gdal_spark.operators.bandops import blend_tiles

    rows_b = [{"zoom": 0, "tile_x": 0, "tile_y": 0, "band": 1,
               "data": np.full((4, 4), 7, np.uint8).tobytes(),
               "dtype": "uint8", "tile_size": 4}]
    rows_o = [{"zoom": 0, "tile_x": 5, "tile_y": 0, "band": 1,
               "data": np.full((4, 4), 9, np.uint8).tobytes(),
               "dtype": "uint8", "tile_size": 4}]
    db = spark.createDataFrame(pd.DataFrame(rows_b), TILE_SCHEMA)
    do = spark.createDataFrame(pd.DataFrame(rows_o), TILE_SCHEMA)
    out = blend_tiles(db, do, "multiply").toPandas() \
        .set_index("tile_x")
    assert decode_tile(out.loc[0, "data"], "uint8", 4)[0, 0] == 7
    assert decode_tile(out.loc[5, "data"], "uint8", 4)[0, 0] == 9


def test_create_and_update_verbs(spark):
    from gdal_spark.operators.bandops import create_tiles
    from gdal_spark.plans.raster_pipeline import run_raster_pipeline

    base = create_tiles(spark, 5.0, zoom=1, n_tx=2, n_ty=2,
                        tile_size=8)
    assert base.count() == 4
    patch = create_tiles(spark, 9.0, zoom=1, n_tx=1, n_ty=1,
                         tile_size=8)
    out = run_raster_pipeline(spark, "read b ! update p",
                              layers={"b": base, "p": patch})
    pdf = out.toPandas().set_index(["tile_x", "tile_y"])
    a00 = decode_tile(pdf.loc[(0, 0), "data"],
                      pdf.loc[(0, 0), "dtype"], 8)
    a11 = decode_tile(pdf.loc[(1, 1), "data"],
                      pdf.loc[(1, 1), "dtype"], 8)
    assert a00[0, 0] == 9.0 and a11[0, 0] == 5.0


def test_color_map_verb(spark):
    from gdal_spark.operators.bandops import create_tiles
    from gdal_spark.plans.raster_pipeline import run_raster_pipeline

    t = create_tiles(spark, 50.0, zoom=0, n_tx=1, n_ty=1,
                     tile_size=8)
    out = run_raster_pipeline(
        spark, "read t ! color-map 0:0:0:255,100:255:0:0",
        layers={"t": t}).toPandas()
    assert sorted(out["band"].tolist()) == [1, 2, 3]
    r = decode_tile(out[out["band"] == 1].iloc[0]["data"],
                    "uint8", 8)[0, 0]
    assert r == 127 or r == 128        # halfway up the ramp
