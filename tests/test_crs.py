"""UTM / transverse-Mercator CRS transforms (Krueger series) and the
EPSG:32631 -> 4326 warp — the reference's own warp benchmark pair
(autotest/benchmark/test_gdalwarp.py:24)."""

import numpy as np
import pytest

from gdal_spark.functions import crs


def test_utm_roundtrip_accuracy():
    rng = np.random.RandomState(1)
    lon = rng.uniform(0.01, 5.99, 5000)
    lat = rng.uniform(-80.0, 84.0, 5000)
    x, y = crs.from_4326("EPSG:32631")(lon, lat)
    lon2, lat2 = crs.to_4326("EPSG:32631")(x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_utm_anchors():
    fwd = crs.from_4326("EPSG:32631")
    # central meridian -> false easting exactly
    x, _ = fwd(np.array([3.0]), np.array([45.0]))
    assert x[0] == pytest.approx(500000.0, abs=1e-6)
    # equator -> northing 0 (north), 10^7 (south)
    _, y = fwd(np.array([4.5]), np.array([0.0]))
    assert y[0] == pytest.approx(0.0, abs=1e-6)
    _, ys = crs.from_4326("EPSG:32731")(np.array([4.5]), np.array([0.0]))
    assert ys[0] == pytest.approx(10000000.0, abs=1e-6)


def test_utm_northing_matches_meridian_arc():
    """Independent oracle: northing on the central meridian equals
    k0 x the meridian arc length (numerical quadrature)."""
    e2 = 0.0066943799901413165
    a = 6378137.0
    phi = np.radians(52.0)
    t = np.linspace(0.0, phi, 2_000_001)
    arc = a * (1 - e2) * np.trapz((1 - e2 * np.sin(t) ** 2) ** -1.5, t)
    _, y = crs.from_4326("EPSG:32631")(np.array([3.0]), np.array([52.0]))
    assert y[0] == pytest.approx(0.9996 * arc, abs=1e-6)


def test_transform_composition():
    fn = crs.transform("EPSG:32618", "EPSG:3857")
    back = crs.transform("EPSG:3857", "EPSG:32618")
    x0 = np.array([500000.0, 630000.0])
    y0 = np.array([4480000.0, 4500000.0])
    mx, my = fn(x0, y0)
    x1, y1 = back(mx, my)
    assert np.abs(x1 - x0).max() < 1e-4
    assert np.abs(y1 - y0).max() < 1e-4


def test_supported():
    assert crs.supported("EPSG:32601") and crs.supported("EPSG:32760")
    assert crs.supported("EPSG:4326") and crs.supported("EPSG:3857")
    for code in ("EPSG:2154", "EPSG:5070", "EPSG:3035", "EPSG:3031",
                 "EPSG:3413"):
        assert crs.supported(code)
    # datum-shifted CRS supported since round 3 (Helmert hub)
    for code in ("EPSG:27700", "EPSG:26717", "EPSG:31370",
                 "EPSG:4277", "EPSG:4267", "EPSG:4313"):
        assert crs.supported(code)
    assert not crs.supported("EPSG:9999")


def test_warp_utm_to_4326_matches_single_array(spark):
    """Distributed warp EPSG:32631 -> EPSG:4326 equals the single-array
    reference path (same inverse transform + resample kernel)."""
    from gdal_spark.operators.rasterize import GridSpec, assemble_raster
    from gdal_spark.operators.warp import (
        resample_patch, tiles_from_array, transform_fn, warp_tiles,
    )

    # src: 256x256 UTM31N raster, ~780 m pixels around lat 45
    sw, sh = 256, 256
    src_grid = GridSpec(400000.0, 5200000.0, 781.25, 781.25, sw, sh)
    ii, jj = np.meshgrid(np.arange(sw), np.arange(sh))
    arr = (np.sin(ii / 17.0) * 40 + jj * 0.3 + 50).astype(np.float64)
    tiles, _, _ = tiles_from_array(spark, arr, tile_size=64)

    # dst: 4326 grid over the back-projected bbox
    inv = transform_fn("EPSG:32631", "EPSG:4326")  # dst->src world
    to_ll = transform_fn("EPSG:4326", "EPSG:32631")  # src->dst world
    cx = np.array([400000.0, 600000.0, 400000.0, 600000.0])
    cy = np.array([5000000.0, 5000000.0, 5200000.0, 5200000.0])
    lons, lats = to_ll(cx, cy)
    dw, dh = 200, 180
    dst_grid = GridSpec(lons.min(), lats.max(),
                        (lons.max() - lons.min()) / dw,
                        (lats.max() - lats.min()) / dh, dw, dh)

    for resample in ("near", "bilinear"):
        out = warp_tiles(tiles, src_grid, dst_grid,
                         "EPSG:32631", "EPSG:4326",
                         resample=resample, nodata=-1.0, tile_size=64)
        got = assemble_raster(out.toPandas(), dst_grid)

        jj2, ii2 = np.mgrid[0:dh, 0:dw]
        wx = dst_grid.x0 + (ii2 + 0.5) * dst_grid.px_w
        wy = dst_grid.y1 - (jj2 + 0.5) * dst_grid.px_h
        sxw, syw = inv(wx, wy)
        spx = (sxw - src_grid.x0) / src_grid.px_w
        spy = (src_grid.y1 - syw) / src_grid.px_h
        want = resample_patch(arr, 0, 0, spx, spy, resample, -1.0)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)
        # the warp really did something: interior values present
        assert (got != -1.0).sum() > 0.5 * got.size


@pytest.mark.parametrize("code,lon_rng,lat_rng", [
    ("EPSG:2154", (-4, 8), (41.5, 50.5)),      # Lambert-93 (LCC 2SP)
    ("EPSG:5070", (-124, -67), (25, 49)),      # Conus Albers
    ("EPSG:3035", (-10, 35), (35, 70)),        # LAEA Europe
    ("EPSG:3031", (-180, 180), (-89, -60)),    # Antarctic PS
    ("EPSG:3413", (-180, 180), (60, 89)),      # Arctic PS
])
def test_conic_azimuthal_roundtrip(code, lon_rng, lat_rng):
    rng = np.random.RandomState(5)
    lon = rng.uniform(*lon_rng, 2000)
    lat = rng.uniform(*lat_rng, 2000)
    x, y = crs.from_4326(code)(lon, lat)
    lon2, lat2 = crs.to_4326(code)(x, y)
    dl = np.abs(((lon2 - lon + 180) % 360) - 180).max()
    assert dl < 1e-9 and np.abs(lat2 - lat).max() < 1e-9


def test_projection_anchors():
    # natural origins from the public EPSG registry definitions
    x, y = crs.from_4326("EPSG:2154")(np.array([3.0]), np.array([46.5]))
    assert (x[0], y[0]) == pytest.approx((700000.0, 6600000.0), abs=1e-6)
    x, y = crs.from_4326("EPSG:3035")(np.array([10.0]), np.array([52.0]))
    assert (x[0], y[0]) == pytest.approx((4321000.0, 3210000.0),
                                         abs=1e-6)
    x, y = crs.from_4326("EPSG:3031")(np.array([0.0]), np.array([-90.0]))
    assert (x[0], y[0]) == pytest.approx((0.0, 0.0), abs=1e-6)


def test_albers_preserves_area():
    """EPSG:5070 is equal-area: a small quad's projected area equals
    its ellipsoidal area (M*N*cos(phi) metric)."""
    lon0, lat0, d = -96.0, 37.0, 0.05
    f = crs.from_4326("EPSG:5070")
    c = np.array([(lon0, lat0), (lon0 + d, lat0),
                  (lon0 + d, lat0 + d), (lon0, lat0 + d)])
    x, y = f(c[:, 0], c[:, 1])
    area_proj = 0.5 * abs(sum(
        x[i] * y[(i + 1) % 4] - x[(i + 1) % 4] * y[i] for i in range(4)))
    e2, a = crs._E2, crs._A
    phi = np.radians(lat0 + d / 2)
    m = a * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    n = a / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    area_true = np.radians(d) * m * np.radians(d) * n * np.cos(phi)
    assert area_proj / area_true == pytest.approx(1.0, abs=1e-5)


def test_osgb36_projection_anchor():
    """OS worked example (A guide to coordinate systems in Great
    Britain, Annex C): OSGB36 geodetic -> National Grid to 0.5 mm."""
    import numpy as np

    from gdal_spark.functions import crs

    lat = 52 + 39 / 60 + 27.2531 / 3600
    lon = 1 + 43 / 60 + 4.5177 / 3600
    fwd, inv = crs.tm_crs(49.0, -2.0, 0.9996012717,
                          400000.0, -100000.0, crs.AIRY1830)
    x, y = fwd(np.array([lon]), np.array([lat]))
    assert abs(x[0] - 651409.903) < 5e-4
    assert abs(y[0] - 313177.270) < 5e-4
    lon2, lat2 = inv(x, y)
    assert abs(lon2[0] - lon) < 1e-11
    assert abs(lat2[0] - lat) < 1e-11


def test_greenwich_datum_shift_anchor():
    """The OSGB36 zero meridian sits ~5.3 arcsec (~102 m) east of the
    WGS84 meridian at Greenwich — the most publicized datum-shift
    anchor; single-Helmert tolerance is a few arcsec tenths."""
    import numpy as np

    from gdal_spark.functions import crs

    lon, lat = crs.OSGB36.to_wgs84(np.array([0.0]),
                                   np.array([51.4778]))
    assert -0.0020 < lon[0] < -0.0010          # ~ -0.00147 deg
    assert abs(lat[0] - 51.4778) < 0.002


def test_datum_crs_roundtrips():
    """Projected + geographic datum CRS round-trip through the 4326
    hub to < 5 mm (Helmert inverse second-order + series order)."""
    import numpy as np

    from gdal_spark.functions import crs

    cases = {
        "EPSG:27700": (np.array([400000.0, 651409.9]),
                       np.array([300000.0, 313177.3]), 5e-3),
        "EPSG:26717": (np.array([500000.0, 630000.0]),
                       np.array([4500000.0, 4700000.0]), 5e-3),
        "EPSG:31370": (np.array([150000.0, 200000.0]),
                       np.array([170000.0, 120000.0]), 5e-3),
        "EPSG:4277": (np.array([1.5, -3.0]),
                      np.array([51.0, 55.0]), 1e-7),
        "EPSG:4267": (np.array([-98.0, -81.0]),
                      np.array([39.0, 42.0]), 1e-7),
        "EPSG:4313": (np.array([4.35, 5.5]),
                      np.array([50.85, 50.0]), 1e-7),
    }
    for code, (xs, ys, tol) in cases.items():
        lon, lat = crs.to_4326(code)(xs, ys)
        x2, y2 = crs.from_4326(code)(lon, lat)
        assert np.abs(x2 - xs).max() < tol, code
        assert np.abs(y2 - ys).max() < tol, code
        assert crs.supported(code)


def test_datum_shift_magnitudes():
    """Shift magnitudes at well-known places fall in the published
    ranges (OSGB36 ~120 m East Anglia, NAD27 ~30 m Kansas,
    BD72 ~110 m Brussels)."""
    import math

    import numpy as np

    from gdal_spark.functions import crs

    def shift_m(datum, lon, lat):
        lo, la = datum.to_wgs84(np.array([lon]), np.array([lat]))
        return math.hypot((lo[0] - lon) * 111320
                          * math.cos(math.radians(lat)),
                          (la[0] - lat) * 111320)

    assert 80 < shift_m(crs.OSGB36, 1.7, 52.66) < 180
    assert 10 < shift_m(crs.NAD27, -98.0, 39.0) < 120
    assert 60 < shift_m(crs.BD72, 4.35, 50.85) < 160


def test_registry_tier2_zone_families():
    """Round-4 registry tier: zone families anchor against the
    already-anchored WGS84 UTM codes (GRS80 == WGS84 at < 1 mm) and
    roundtrip to sub-mm."""
    import numpy as np

    from gdal_spark.functions import crs

    rng = np.random.RandomState(2)

    def roundtrip(code, lon, lat, tol=1e-7):
        x, y = crs.from_4326(code)(lon, lat)
        lon2, lat2 = crs.to_4326(code)(x, y)
        np.testing.assert_allclose(lon2, lon, atol=tol)
        np.testing.assert_allclose(lat2, lat, atol=tol)
        return x, y

    # ETRS89 UTM 28-37 == WGS84 UTM north
    for z in (28, 31, 37):
        lon = rng.uniform(z * 6 - 186, z * 6 - 180, 5)
        lat = rng.uniform(35, 70, 5)
        xe, ye = roundtrip(f"EPSG:{25800 + z}", lon, lat)
        xw, yw = crs.from_4326(f"EPSG:{32600 + z}")(lon, lat)
        np.testing.assert_allclose(xe, xw, atol=1e-6)
        np.testing.assert_allclose(ye, yw, atol=1e-6)

    # NAD83 UTM 1-23 == WGS84 UTM north
    for z in (1, 15, 23):
        lon = rng.uniform(z * 6 - 186, z * 6 - 180, 5)
        lat = rng.uniform(25, 65, 5)
        xe, ye = roundtrip(f"EPSG:{26900 + z}", lon, lat)
        xw, yw = crs.from_4326(f"EPSG:{32600 + z}")(lon, lat)
        np.testing.assert_allclose(xe, xw, atol=1e-6)
        np.testing.assert_allclose(ye, yw, atol=1e-6)

    # GDA94 + GDA2020 MGA == WGS84 UTM south (Melbourne in zone 55)
    lon = np.array([144.9631, 147.0, 149.1])
    lat = np.array([-37.8136, -42.88, -35.28])
    for code in ("EPSG:28355", "EPSG:7855"):
        xm, ym = roundtrip(code, lon, lat)
        xw, yw = crs.from_4326("EPSG:32755")(lon, lat)
        np.testing.assert_allclose(xm, xw, atol=1e-6)
        np.testing.assert_allclose(ym, yw, atol=1e-6)

    # SIRGAS 2000 UTM 23S == WGS84 UTM 23S (Sao Paulo)
    lon = np.array([-46.6333, -43.2])
    lat = np.array([-23.55, -22.9])
    xs, ys = roundtrip("EPSG:31983", lon, lat)
    xw, yw = crs.from_4326("EPSG:32723")(lon, lat)
    np.testing.assert_allclose(xs, xw, atol=1e-6)
    np.testing.assert_allclose(ys, yw, atol=1e-6)


def test_registry_tier2_state_plane_and_gk():
    """State-plane LCC samples: grid origin maps to the false
    offsets, scale is true on both standard parallels.  DHDN
    Gauss-Krueger: central-meridian/FE anchor, k0=1 on the CM,
    datum-shift magnitude in the published ~100-250 m range for
    Germany, and sub-mm roundtrip through the Helmert hub."""
    import math

    import numpy as np

    from gdal_spark.functions import crs

    # ------- state plane (NAD83 meters, LCC 2SP) -------
    for code, lon0, lat0, fe, sps in [
            ("EPSG:26985", -77.0, 37.66666666666666, 400000.0,
             (38.3, 39.45)),
            ("EPSG:32118", -74.0, 40.16666666666666, 300000.0,
             (40.66666666666666, 41.03333333333333))]:
        fwd = crs.from_4326(code)
        x, y = fwd(np.array([lon0]), np.array([lat0]))
        assert abs(x[0] - fe) < 1e-6 and abs(y[0]) < 1e-6, code
        # scale on a standard parallel == 1 (finite-difference E-W)
        for sp in sps:
            d = 1e-6
            x1, y1 = fwd(np.array([lon0 - d / 2]), np.array([sp]))
            x2, y2 = fwd(np.array([lon0 + d / 2]), np.array([sp]))
            # parallel-circle radius on GRS80
            a, e2 = 6378137.0, 0.0066943800229
            nu = a / math.sqrt(1 - e2 * math.sin(math.radians(sp))**2)
            ground = math.radians(d) * nu * math.cos(math.radians(sp))
            k = math.hypot(x2[0] - x1[0], y2[0] - y1[0]) / ground
            assert abs(k - 1.0) < 1e-6, (code, sp, k)

    # ------- DHDN Gauss-Krueger zone 3 (EPSG:31467) -------
    fwd = crs.from_4326("EPSG:31467")
    inv = crs.to_4326("EPSG:31467")
    # roundtrip sub-mm through the Helmert hub
    lon = np.array([6.8, 9.0, 11.5])
    lat = np.array([48.7, 50.9, 53.5])
    x, y = fwd(lon, lat)
    lon2, lat2 = inv(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-8)
    np.testing.assert_allclose(lat2, lat, atol=1e-8)
    # the CM of zone 3 is 9E with FE 3_500_000; the DATUM-SHIFTED
    # CM image stays within the shift magnitude of the FE
    x, y = fwd(np.array([9.0]), np.array([51.0]))
    assert abs(x[0] - 3_500_000.0) < 300.0
    # shift magnitude for Germany in the published range
    lo, la = crs.DHDN.to_wgs84(np.array([9.0]), np.array([51.0]))
    shift = math.hypot((lo[0] - 9.0) * 111320
                       * math.cos(math.radians(51.0)),
                       (la[0] - 51.0) * 111320)
    assert 80 < shift < 300, shift


def test_warp_osgb_to_4326(spark):
    """Raster warp across a DATUM SHIFT (EPSG:27700 -> 4326, Airy ->
    WGS84 via Helmert): distributed result equals the single-array
    reference path, same pattern as the UTM warp test."""
    import numpy as np

    from gdal_spark.operators.rasterize import GridSpec, assemble_raster
    from gdal_spark.operators.warp import (
        resample_patch, tiles_from_array, transform_fn, warp_tiles,
    )

    sw, sh = 128, 128
    # ~1 km pixels over southern England in British National Grid
    src_grid = GridSpec(400000.0, 300000.0, 1000.0, 1000.0, sw, sh)
    ii, jj = np.meshgrid(np.arange(sw), np.arange(sh))
    arr = (np.cos(ii / 11.0) * 30 + jj * 0.5 + 60).astype(np.float64)
    tiles, _, _ = tiles_from_array(spark, arr, tile_size=64)

    inv = transform_fn("EPSG:27700", "EPSG:4326")   # dst->src world
    fwd = transform_fn("EPSG:4326", "EPSG:27700")   # src->dst world
    cx = np.array([400000.0, 528000.0, 400000.0, 528000.0])
    cy = np.array([172000.0, 172000.0, 300000.0, 300000.0])
    lons, lats = fwd(cx, cy)
    dw, dh = 150, 120
    dst_grid = GridSpec(lons.min(), lats.max(),
                        (lons.max() - lons.min()) / dw,
                        (lats.max() - lats.min()) / dh, dw, dh)

    out = warp_tiles(tiles, src_grid, dst_grid,
                     "EPSG:27700", "EPSG:4326",
                     resample="near", nodata=-1.0, tile_size=64)
    got = assemble_raster(out.toPandas(), dst_grid)

    jj2, ii2 = np.mgrid[0:dh, 0:dw]
    wx = dst_grid.x0 + (ii2 + 0.5) * dst_grid.px_w
    wy = dst_grid.y1 - (jj2 + 0.5) * dst_grid.px_h
    sxw, syw = inv(wx, wy)
    spx = (sxw - src_grid.x0) / src_grid.px_w
    spy = (src_grid.y1 - syw) / src_grid.px_h
    want = resample_patch(arr, 0, 0, spx, spy, "near", -1.0)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)
    assert (got != -1.0).sum() > 0.5 * got.size


def test_extended_epsg_registry_roundtrips():
    """Round-3 registry widening: ETRS89 UTM 32/33N, NZTM2000,
    Australian Albers (southern cone — exercises the sign(n) inverse),
    NAD83 UTM 10-19N. All round-trip < 1e-9 deg in-zone."""
    import numpy as np

    from gdal_spark.functions import crs

    cases = {
        "EPSG:25832": ([9.5, 11.0], [50.0, 54.0]),
        "EPSG:25833": ([15.5, 13.5], [52.5, 48.0]),
        "EPSG:2193": ([174.8, 168.0], [-36.8, -45.0]),
        "EPSG:3577": ([133.0, 147.0, 115.0], [-25.0, -35.0, -32.0]),
        "EPSG:26910": ([-123.0, -121.5], [45.0, 49.0]),
        "EPSG:26917": ([-81.0, -79.5], [40.0, 43.7]),
        "EPSG:26919": ([-69.0, -67.5], [44.0, 46.0]),
    }
    for code, (lons, lats) in cases.items():
        lons = np.array(lons)
        lats = np.array(lats)
        x, y = crs.from_4326(code)(lons, lats)
        lo, la = crs.to_4326(code)(x, y)
        assert np.abs(lo - lons).max() < 1e-9, code
        assert np.abs(la - lats).max() < 1e-9, code
        assert crs.supported(code)
