"""VRT surface tests (sources/vrt.py).

Parity model: the public VRT XML schema (frmts/vrt, gdalvrt.xsd)
and gdalbuildvrt's union-grid rules (apps/gdalbuildvrt_lib.cpp).
The distributed materialization must be PIXEL-EXACT against a
NumPy recomposition for: union mosaics (later source wins on
overlap), ComplexSource ScaleOffset/ScaleRatio/NODATA masking,
nearest SrcRect->DstRect resampling, and the built-in pixel
functions (sum/mean/min/max) of VRTDerivedRasterBand.
"""

import os

import numpy as np
import pytest

from gdal_spark.operators.gtiff import encode_gtiff
from gdal_spark.operators.rasterize import assemble_raster
from gdal_spark.sources.vrt import build_vrt, read_vrt, tiff_meta


def _gt(ox, oy, px=2.0):
    return (ox, px, 0.0, oy, 0.0, -px)


def _write(d, name, arr, gt, epsg=3857):
    p = os.path.join(d, name)
    with open(p, "wb") as fh:
        fh.write(encode_gtiff(arr, geotransform=gt, epsg=epsg))
    return p


def test_tiff_meta_header_only(tmp_path):
    arr = np.arange(5000, dtype=np.uint16).reshape(50, 100)
    p = _write(str(tmp_path), "m.tif", arr, _gt(10, 20))
    m = tiff_meta(p)
    assert m == {"width": 100, "height": 50, "dtype": "uint16",
                 "geotransform": (10.0, 2.0, 0.0, 20.0, 0.0, -2.0),
                 "epsg": 3857, "bands": 1}


def test_buildvrt_union_and_mosaic(spark, tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(3)
    a = rng.integers(1, 255, (80, 100)).astype(np.uint8)
    b = rng.integers(1, 255, (80, 100)).astype(np.uint8)
    c = rng.integers(1, 255, (40, 50)).astype(np.uint8)
    _write(d, "a.tif", a, _gt(0, 160))
    _write(d, "b.tif", b, _gt(200, 160))
    _write(d, "c.tif", c, _gt(150, 120))
    vp = os.path.join(d, "m.vrt")
    build_vrt(d, vp)                      # directory input form
    tiles, grid = read_vrt(spark, vp, tile_size=64)
    assert (grid.width, grid.height, grid.x0, grid.y1) == \
        (200, 80, 0.0, 160.0)
    full = assemble_raster(tiles.toPandas(), grid)
    exp = np.zeros((80, 200), dtype=np.uint8)
    exp[:, :100] = a
    exp[:, 100:] = b
    exp[20:60, 75:125] = c                # later source wins
    np.testing.assert_array_equal(full, exp)


def test_buildvrt_rejects_heterogeneous(tmp_path):
    d = str(tmp_path)
    a = np.zeros((10, 10), dtype=np.uint8)
    _write(d, "a.tif", a, _gt(0, 100, px=2.0))
    _write(d, "b.tif", a, _gt(100, 100, px=3.0))
    with pytest.raises(ValueError, match="pixel size"):
        build_vrt([os.path.join(d, "a.tif"),
                   os.path.join(d, "b.tif")])
    _write(d, "c.tif", a, _gt(100, 100), epsg=4326)
    with pytest.raises(ValueError, match="CRS"):
        build_vrt([os.path.join(d, "a.tif"),
                   os.path.join(d, "c.tif")])


def test_complexsource_scale_and_nodata(spark, tmp_path):
    d = str(tmp_path)
    arr = np.array([[0, 10], [20, 30]], dtype=np.uint8)
    _write(d, "s.tif", arr, _gt(0, 4, px=1.0))
    vp = os.path.join(d, "c.vrt")
    with open(vp, "w") as fh:
        fh.write("""<VRTDataset rasterXSize="2" rasterYSize="2">
  <GeoTransform>0.0, 1.0, 0.0, 4.0, 0.0, -1.0</GeoTransform>
  <VRTRasterBand dataType="Float64" band="1">
    <NoDataValue>-1.0</NoDataValue>
    <ComplexSource>
      <SourceFilename relativeToVRT="1">s.tif</SourceFilename>
      <SourceBand>1</SourceBand>
      <ScaleRatio>2.0</ScaleRatio>
      <ScaleOffset>5.0</ScaleOffset>
      <NODATA>0</NODATA>
    </ComplexSource>
  </VRTRasterBand>
</VRTDataset>""")
    tiles, grid = read_vrt(spark, vp, tile_size=2)
    full = assemble_raster(tiles.toPandas(), grid)
    # 0 is source-NODATA -> band NoDataValue; others scale 2x+5
    np.testing.assert_array_equal(
        full, np.array([[-1.0, 25.0], [45.0, 65.0]]))


def test_dstrect_nearest_resample(spark, tmp_path):
    d = str(tmp_path)
    arr = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    _write(d, "s.tif", arr, _gt(0, 4, px=1.0))
    vp = os.path.join(d, "r.vrt")
    with open(vp, "w") as fh:
        fh.write("""<VRTDataset rasterXSize="4" rasterYSize="4">
  <GeoTransform>0.0, 0.5, 0.0, 4.0, 0.0, -0.5</GeoTransform>
  <VRTRasterBand dataType="Byte" band="1">
    <SimpleSource>
      <SourceFilename relativeToVRT="1">s.tif</SourceFilename>
      <SourceBand>1</SourceBand>
      <SrcRect xOff="0" yOff="0" xSize="2" ySize="2"/>
      <DstRect xOff="0" yOff="0" xSize="4" ySize="4"/>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>""")
    tiles, grid = read_vrt(spark, vp, tile_size=4)
    full = assemble_raster(tiles.toPandas(), grid)
    np.testing.assert_array_equal(full, np.repeat(
        np.repeat(arr, 2, axis=0), 2, axis=1))


@pytest.mark.parametrize("fn,expect", [
    ("sum", np.array([[11.0, 22.0], [33.0, 44.0]])),
    ("mean", np.array([[5.5, 11.0], [16.5, 22.0]])),
    ("min", np.array([[1.0, 2.0], [3.0, 4.0]])),
    ("max", np.array([[10.0, 20.0], [30.0, 40.0]])),
])
def test_derived_band_pixel_functions(spark, tmp_path, fn, expect):
    d = str(tmp_path)
    a = np.array([[1, 2], [3, 4]], dtype=np.uint8)
    b = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    _write(d, "a.tif", a, _gt(0, 2, px=1.0))
    _write(d, "b.tif", b, _gt(0, 2, px=1.0))
    vp = os.path.join(d, f"{fn}.vrt")
    with open(vp, "w") as fh:
        fh.write(f"""<VRTDataset rasterXSize="2" rasterYSize="2">
  <GeoTransform>0.0, 1.0, 0.0, 2.0, 0.0, -1.0</GeoTransform>
  <VRTRasterBand dataType="Float64" band="1"
                 subClass="VRTDerivedRasterBand">
    <PixelFunctionType>{fn}</PixelFunctionType>
    <SimpleSource>
      <SourceFilename relativeToVRT="1">a.tif</SourceFilename>
      <SourceBand>1</SourceBand>
    </SimpleSource>
    <SimpleSource>
      <SourceFilename relativeToVRT="1">b.tif</SourceFilename>
      <SourceBand>1</SourceBand>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>""")
    tiles, grid = read_vrt(spark, vp, tile_size=2)
    full = assemble_raster(tiles.toPandas(), grid)
    np.testing.assert_array_equal(full, expect)


def test_unsupported_pixel_function_rejected(spark, tmp_path):
    vp = str(tmp_path / "bad.vrt")
    with open(vp, "w") as fh:
        fh.write("""<VRTDataset rasterXSize="2" rasterYSize="2">
  <VRTRasterBand dataType="Byte" band="1"
                 subClass="VRTDerivedRasterBand">
    <PixelFunctionType>fancy_unknown</PixelFunctionType>
  </VRTRasterBand>
</VRTDataset>""")
    with pytest.raises(ValueError, match="PixelFunctionType"):
        read_vrt(None, vp)


def test_multiband_sources(spark, tmp_path):
    d = str(tmp_path)
    rgb = np.stack([np.full((4, 4), v, dtype=np.uint8)
                    for v in (10, 20, 30)], axis=-1)
    _write(d, "rgb.tif", rgb, _gt(0, 8, px=2.0))
    vp = os.path.join(d, "rgb.vrt")
    build_vrt([os.path.join(d, "rgb.tif")], vp)
    tiles, grid = read_vrt(spark, vp, tile_size=4)
    pdf = tiles.toPandas()
    assert sorted(pdf["band"].unique()) == [1, 2, 3]
    for bnum, v in ((1, 10), (2, 20), (3, 30)):
        full = assemble_raster(pdf[pdf["band"] == bnum], grid)
        np.testing.assert_array_equal(
            full, np.full((4, 4), v, dtype=np.uint8))
