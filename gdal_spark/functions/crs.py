"""Coordinate reference systems without PROJ: vectorized closed
forms for the CRS family the engine supports.

The reference delegates to PROJ (ogr/ogrct.cpp:665
OGRCreateCoordinateTransformation); this container has no PROJ or
pyproj, so the transforms are implemented directly:

* EPSG:4326 (WGS84 geographic)
* EPSG:3857 (spherical web mercator, closed form)
* EPSG:326xx / 327xx (WGS84 UTM north/south, all 60 zones) via the
  Krueger series in Karney's formulation ("Transverse Mercator with
  an accuracy of a few nanometers", J. Geod. 85, 2011 — public
  math; order-6 alpha/beta flattening series, forward conformal
  latitude exact, inverse via the standard chi -> phi sine series).
* Lambert Conformal Conic 2SP (EPSG:2154 Lambert-93), Albers
  Equal-Area 2SP (EPSG:5070 Conus Albers), Lambert Azimuthal
  Equal-Area (EPSG:3035 LAEA Europe) and Polar Stereographic
  variant B (EPSG:3031/3413) from Snyder's USGS PP 1395 closed
  forms, on WGS84-equivalent datums (GRS80/ETRS89/NAD83).
* DATUM-SHIFTED CRS via 7-parameter Helmert transforms (EPSG
  guidance note 7-2, position-vector convention) composed through
  geocentric cartesian: OSGB36 / British National Grid (EPSG:27700,
  geographic 4277), NAD27 / UTM 17N (EPSG:26717, geographic 4267),
  Belge 1972 / Belgian Lambert 72 (EPSG:31370, geographic 4313) —
  projections run on each datum's own ellipsoid (Airy 1830,
  Clarke 1866, International 1924).

Every pair is routed through EPSG:4326 as the hub, so any supported
src -> dst composes.  All functions are vectorized numpy over
arbitrary array shapes — per-tile warp cost is one array pass, which
is why the reference's approximate-transformer corner trick
(alg/gdaltransformer.cpp:58) is unnecessary here.

Accuracy: round-trip < 1e-9 deg (~0.1 mm) inside a zone's normal
extent (tested), consistent with the series order.  Datum-shift
absolute accuracy is bounded by the published single-Helmert
parameters themselves (~2 m OSGB36, ~10 m NAD27 CONUS, ~0.2 m BD72
— PROJ without grid files has the same bound); the projection math
is still sub-mm (OS worked-example anchor tested to 0.1 mm).
"""

from __future__ import annotations

import numpy as np


class Ellipsoid:
    """Reference ellipsoid + derived constants, incl. the order-6
    Krueger flattening series (Karney 2011, eqs. 35/36) so transverse
    Mercator works on any datum's ellipsoid."""

    __slots__ = ("a", "f", "e2", "e", "n", "rect_a", "alpha", "beta")

    def __init__(self, a: float, inv_f: float):
        self.a = a
        self.f = 1.0 / inv_f
        self.e2 = self.f * (2.0 - self.f)
        self.e = np.sqrt(self.e2)
        n = self.f / (2.0 - self.f)
        self.n = n
        self.rect_a = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64
                                     + n**6 / 256)
        self.alpha = np.array([
            n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180
            - 127 * n**5 / 288 + 7891 * n**6 / 37800,
            13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440
            + 281 * n**5 / 630 - 1983433 * n**6 / 1935360,
            61 * n**3 / 240 - 103 * n**4 / 140 + 15061 * n**5 / 26880
            + 167603 * n**6 / 181440,
            49561 * n**4 / 161280 - 179 * n**5 / 168
            + 6601661 * n**6 / 7257600,
            34729 * n**5 / 80640 - 3418889 * n**6 / 1995840,
            212378941 * n**6 / 319334400,
        ])
        self.beta = np.array([
            n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360
            - 81 * n**5 / 512 + 96199 * n**6 / 604800,
            n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440 + 46 * n**5 / 105
            - 1118711 * n**6 / 3870720,
            17 * n**3 / 480 - 37 * n**4 / 840 - 209 * n**5 / 4480
            + 5569 * n**6 / 90720,
            4397 * n**4 / 161280 - 11 * n**5 / 504
            - 830251 * n**6 / 7257600,
            4583 * n**5 / 161280 - 108847 * n**6 / 3991680,
            20648693 * n**6 / 638668800,
        ])


# EPSG-registry ellipsoid constants (public)
WGS84 = Ellipsoid(6378137.0, 298.257223563)
AIRY1830 = Ellipsoid(6377563.396, 299.3249646)        # EPSG:7001
CLARKE1866 = Ellipsoid(6378206.4, 294.978698213898)   # EPSG:7008
INTL1924 = Ellipsoid(6378388.0, 297.0)                # EPSG:7022
BESSEL1841 = Ellipsoid(6377397.155, 299.1528128)      # EPSG:7004

# WGS84 aliases kept for the existing projection code
_A = WGS84.a
_F = WGS84.f
_E2 = WGS84.e2
_E = WGS84.e
_N = WGS84.n
_RECT_A = WGS84.rect_a
_ALPHA = WGS84.alpha
_BETA = WGS84.beta

_K0 = 0.9996
_FE = 500000.0
_FN_SOUTH = 10000000.0


def tm_forward(lon: np.ndarray, lat: np.ndarray, lon0_deg: float,
               ell: Ellipsoid = WGS84, k0: float = None
               ) -> tuple[np.ndarray, np.ndarray]:
    """Geographic (deg) -> transverse-Mercator (x east, y north in
    meters, no false offsets, scale k0 applied)."""
    if k0 is None:
        k0 = _K0
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sphi = np.sin(phi)
    # conformal latitude tau' (exact forward)
    tau = np.tan(phi)
    sigma = np.sinh(ell.e * np.arctanh(ell.e * sphi))
    taup = tau * np.sqrt(1 + sigma**2) - sigma * np.sqrt(1 + tau**2)
    xi_p = np.arctan2(taup, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(taup, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi += ell.alpha[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta += ell.alpha[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)
    return k0 * ell.rect_a * eta, k0 * ell.rect_a * xi


def tm_inverse(x: np.ndarray, y: np.ndarray, lon0_deg: float,
               ell: Ellipsoid = WGS84, k0: float = None
               ) -> tuple[np.ndarray, np.ndarray]:
    """Transverse-Mercator meters (no false offsets) -> (lon, lat)
    degrees."""
    if k0 is None:
        k0 = _K0
    eta = np.asarray(x, dtype=np.float64) / (k0 * ell.rect_a)
    xi = np.asarray(y, dtype=np.float64) / (k0 * ell.rect_a)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi_p -= ell.beta[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_p -= ell.beta[j] * np.cos(k * xi) * np.sinh(k * eta)
    taup = np.sin(xi_p) / np.sqrt(np.sinh(eta_p)**2 + np.cos(xi_p)**2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # conformal -> geodetic latitude (standard sine series in chi)
    chi = np.arctan(taup)
    e2 = ell.e2
    e4, e6, e8 = e2**2, e2**3, e2**4
    phi = (
        chi
        + (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360)
        * np.sin(2 * chi)
        + (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520)
        * np.sin(4 * chi)
        + (7 * e6 / 120 + 81 * e8 / 1120) * np.sin(6 * chi)
        + (4279 * e8 / 161280) * np.sin(8 * chi)
    )
    return np.degrees(lam) + lon0_deg, np.degrees(phi)


def _parse_utm(code: int) -> tuple[float, float] | None:
    """EPSG UTM code -> (central meridian deg, false northing)."""
    if 32601 <= code <= 32660:
        return (code - 32600) * 6.0 - 183.0, 0.0
    if 32701 <= code <= 32760:
        return (code - 32700) * 6.0 - 183.0, _FN_SOUTH
    return None


# web mercator (shared closed form)
_MERC_R = 6378137.0
_MERC_ORIGIN = np.pi * _MERC_R
_MERC_LAT_MAX = 85.051128779806589


def _merc_fwd(lon, lat):
    x = np.asarray(lon, dtype=np.float64) * _MERC_ORIGIN / 180.0
    la = np.clip(np.asarray(lat, dtype=np.float64),
                 -_MERC_LAT_MAX, _MERC_LAT_MAX)
    y = np.log(np.tan((90.0 + la) * np.pi / 360.0)) / np.pi * _MERC_ORIGIN
    return x, y


def _merc_inv(x, y):
    lon = np.asarray(x, dtype=np.float64) / _MERC_ORIGIN * 180.0
    lat = np.degrees(2.0 * np.arctan(
        np.exp(np.asarray(y, dtype=np.float64) / _MERC_ORIGIN * np.pi))
        - np.pi / 2.0)
    return lon, lat


def _epsg(code_str: str) -> int:
    s = code_str.upper().strip()
    if not s.startswith("EPSG:"):
        raise ValueError(f"unsupported CRS {code_str!r}")
    return int(s.split(":", 1)[1])


def _unsupported_msg(crs: str) -> str:
    """The registry IS the documented scope boundary: a closed,
    anchor-tested set instead of the reference's full PROJ corpus
    (ogr/ogrct.cpp:665).  New codes are one registry entry away when
    they are Helmert-or-null shifts over the implemented projection
    families."""
    return (
        f"unsupported CRS {crs!r}: this engine's CRS scope is the "
        "anchor-tested registry — 4326/3857, all 120 WGS84 UTM "
        "zones, zone families on WGS84-equivalent datums "
        "(ETRS89 25828-37, NAD83 26901-23, GDA94 MGA 28348-58, "
        "GDA2020 MGA 7846-59, SIRGAS2000 31977-85), conic/azimuthal "
        "nationals (2154, 5070, 3035, 3031, 3413, 3577, 2193, "
        "26985, 32118) and Helmert-shifted datums (OSGB36 27700/"
        "4277, NAD27 26717/4267, BD72 31370/4313, DHDN 31466-69/"
        "4314).  Grid-shift (NTv2/OSTN) accuracy and the full PROJ "
        "corpus are out of scope; add codes to "
        "gdal_spark.functions.crs._PROJ_REGISTRY with an anchor "
        "test."
    )


def to_4326(crs: str):
    """fn(x, y) -> (lon, lat) for the given CRS, or raise."""
    code = _epsg(crs)
    if code == 4326:
        return lambda x, y: (np.asarray(x, np.float64),
                             np.asarray(y, np.float64))
    if code == 3857:
        return _merc_inv
    utm = _parse_utm(code)
    if utm is not None:
        lon0, fn = utm

        def inv(x, y):
            return tm_inverse(np.asarray(x, np.float64) - _FE,
                              np.asarray(y, np.float64) - fn, lon0)
        return inv
    fns = _registry_fns(code)
    if fns is not None:
        return fns[1]
    raise ValueError(_unsupported_msg(crs))


def from_4326(crs: str):
    """fn(lon, lat) -> (x, y) for the given CRS, or raise."""
    code = _epsg(crs)
    if code == 4326:
        return lambda lon, lat: (np.asarray(lon, np.float64),
                                 np.asarray(lat, np.float64))
    if code == 3857:
        return _merc_fwd
    utm = _parse_utm(code)
    if utm is not None:
        lon0, fn = utm

        def fwd(lon, lat):
            x, y = tm_forward(lon, lat, lon0)
            return x + _FE, y + fn
        return fwd
    fns = _registry_fns(code)
    if fns is not None:
        return fns[0]
    raise ValueError(_unsupported_msg(crs))


def transform(src_crs: str, dst_crs: str):
    """fn(x, y in src) -> (x, y in dst), composed through 4326."""
    if (src_crs or "").upper() == (dst_crs or "").upper():
        return lambda x, y: (np.asarray(x, np.float64),
                             np.asarray(y, np.float64))
    inv = to_4326(src_crs)
    fwd = from_4326(dst_crs)

    def fn(x, y):
        lon, lat = inv(x, y)
        return fwd(lon, lat)
    return fn


def supported(crs: str) -> bool:
    try:
        to_4326(crs)
        return True
    except ValueError:
        return False


# --------------------------------------------------------------------
# conic / azimuthal projections (Snyder, "Map Projections — A Working
# Manual", USGS PP 1395 — public formulas), on WGS84-equivalent
# datums (GRS80/ETRS89/NAD83 differ from WGS84 by < 1 mm flattening)
# --------------------------------------------------------------------


def _m(phi, e2: float = _E2):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1 - e2 * s * s)


def _t(phi, e2: float = _E2):
    e = np.sqrt(e2)
    s = np.sin(phi)
    return (np.tan(np.pi / 4 - phi / 2)
            / ((1 - e * s) / (1 + e * s)) ** (e / 2))


def _q(phi):
    s = np.sin(phi)
    return (1 - _E2) * (s / (1 - _E2 * s * s)
                        - np.log((1 - _E * s) / (1 + _E * s))
                        / (2 * _E))


def _phi_from_t(t, e2: float = _E2):
    """Inverse of _t by fixed-point iteration (Snyder 7-9)."""
    e = np.sqrt(e2)
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        s = e * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - s) / (1 + s)) ** (e / 2))
    return phi


def _phi_from_q(q):
    """Inverse of _q by Newton iteration (Snyder 3-16)."""
    phi = np.arcsin(np.clip(q / 2, -1, 1))
    for _ in range(8):
        s = np.sin(phi)
        c = np.cos(phi)
        denom = 1 - _E2 * s * s
        # dq/dphi = 2(1-e^2)cos(phi)/(1-e^2 sin^2 phi)^2
        dq = 2 * (1 - _E2) * c / denom ** 2
        phi = phi + (q - _q(phi)) / np.where(dq == 0, 1, dq)
    return phi


def lcc_2sp(lat1: float, lat2: float, lat0: float, lon0: float,
            fe: float, fn: float, ell: Ellipsoid = WGS84):
    """Lambert Conformal Conic, 2 standard parallels (Snyder 15).
    Returns (fwd(lon, lat) -> x, y; inv(x, y) -> lon, lat)."""
    a, e2 = ell.a, ell.e2
    p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
    n = (np.log(_m(p1, e2)) - np.log(_m(p2, e2))) \
        / (np.log(_t(p1, e2)) - np.log(_t(p2, e2)))
    big_f = _m(p1, e2) / (n * _t(p1, e2) ** n)
    rho0 = a * big_f * _t(p0, e2) ** n

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64) - lon0)
        rho = a * big_f * _t(phi, e2) ** n
        th = n * lam
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)

    def inv(x, y):
        xp = np.asarray(x, np.float64) - fe
        yp = rho0 - (np.asarray(y, np.float64) - fn)
        rho = np.sign(n) * np.hypot(xp, yp)
        th = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
        t = (rho / (a * big_f)) ** (1 / n)
        return (np.degrees(th / n) + lon0,
                np.degrees(_phi_from_t(t, e2)))

    return fwd, inv


def albers_2sp(lat1: float, lat2: float, lat0: float, lon0: float,
               fe: float, fn: float):
    """Albers Equal-Area Conic, 2 standard parallels (Snyder 14)."""
    p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
    n = (_m(p1) ** 2 - _m(p2) ** 2) / (_q(p2) - _q(p1))
    big_c = _m(p1) ** 2 + n * _q(p1)
    rho0 = _A * np.sqrt(big_c - n * _q(p0)) / n

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64) - lon0)
        rho = _A * np.sqrt(big_c - n * _q(phi)) / n
        th = n * lam
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)

    def inv(x, y):
        xp = np.asarray(x, np.float64) - fe
        yp = rho0 - (np.asarray(y, np.float64) - fn)
        # southern cone (n < 0): rho and theta take n's sign
        # (Snyder 14-10/14-11 sign convention, as in the LCC inverse)
        rho = np.sign(n) * np.hypot(xp, yp)
        th = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
        q = (big_c - (rho * n / _A) ** 2) / n
        return (np.degrees(th / n) + lon0,
                np.degrees(_phi_from_q(q)))

    return fwd, inv


def laea(lat0: float, lon0: float, fe: float, fn: float):
    """Lambert Azimuthal Equal-Area, ellipsoidal (Snyder 24)."""
    p0 = np.radians(lat0)
    qp = _q(np.pi / 2)
    q0 = _q(p0)
    beta0 = np.arcsin(q0 / qp)
    rq = _A * np.sqrt(qp / 2)
    d = _A * np.cos(p0) / (np.sqrt(1 - _E2 * np.sin(p0) ** 2)
                           * rq * np.cos(beta0))

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64) - lon0)
        beta = np.arcsin(np.clip(_q(phi) / qp, -1, 1))
        b = rq * np.sqrt(2 / (1 + np.sin(beta0) * np.sin(beta)
                              + np.cos(beta0) * np.cos(beta)
                              * np.cos(lam)))
        x = b * d * np.cos(beta) * np.sin(lam)
        y = (b / d) * (np.cos(beta0) * np.sin(beta)
                       - np.sin(beta0) * np.cos(beta) * np.cos(lam))
        return fe + x, fn + y

    def inv(x, y):
        xp = (np.asarray(x, np.float64) - fe) / d
        yp = (np.asarray(y, np.float64) - fn) * d
        rho = np.hypot(xp, yp)
        ce = 2 * np.arcsin(np.clip(rho / (2 * rq), -1, 1))
        beta = np.arcsin(np.clip(
            np.cos(ce) * np.sin(beta0)
            + np.where(rho == 0, 0.0,
                       yp * np.sin(ce) * np.cos(beta0)
                       / np.where(rho == 0, 1, rho)), -1, 1))
        lam = np.arctan2(
            xp * np.sin(ce),
            rho * np.cos(beta0) * np.cos(ce)
            - yp * np.sin(beta0) * np.sin(ce))
        q = qp * np.sin(beta)
        return (np.degrees(lam) + lon0,
                np.degrees(_phi_from_q(q)))

    return fwd, inv


def polar_stereo(lat_ts: float, lon0: float, fe: float, fn: float,
                 south: bool):
    """Polar Stereographic variant B (Snyder 21, EPSG 9829)."""
    pts = np.radians(abs(lat_ts))
    tc = _t(pts)
    mc = _m(pts)

    def fwd(lon, lat):
        lat_ = np.asarray(lat, np.float64)
        lon_ = np.asarray(lon, np.float64)
        if south:
            lat_, lon_ = -lat_, -lon_
        phi = np.radians(lat_)
        lam = np.radians(lon_ - (lon0 if not south else -lon0))
        rho = _A * mc * _t(phi) / tc
        x = rho * np.sin(lam)
        y = -rho * np.cos(lam)
        if south:
            x, y = -x, -y
        return fe + x, fn + y

    def inv(x, y):
        xp = np.asarray(x, np.float64) - fe
        yp = np.asarray(y, np.float64) - fn
        if south:
            xp, yp = -xp, -yp
        rho = np.hypot(xp, yp)
        t = rho * tc / (_A * mc)
        phi = _phi_from_t(t)
        lam = np.arctan2(xp, -yp)
        lon = np.degrees(lam) + (lon0 if not south else -lon0)
        lat = np.degrees(phi)
        if south:
            lat, lon = -lat, -lon
        return lon, lat

    return fwd, inv


# --------------------------------------------------------------------
# datum shifts: geodetic <-> geocentric + 7-parameter Helmert
# (the transform family PROJ applies inside OGRProjCT,
# ogr/ogrct.cpp:665; formulas are the public EPSG guidance-note-7-2
# methods 9606 position vector / 9603 geocentric translations)
# --------------------------------------------------------------------


def geodetic_to_ecef(lon, lat, ell: Ellipsoid):
    """(deg, deg, h=0) -> geocentric cartesian meters."""
    phi = np.radians(np.asarray(lat, np.float64))
    lam = np.radians(np.asarray(lon, np.float64))
    s = np.sin(phi)
    nu = ell.a / np.sqrt(1 - ell.e2 * s * s)
    cphi = np.cos(phi)
    return (nu * cphi * np.cos(lam), nu * cphi * np.sin(lam),
            nu * (1 - ell.e2) * s)


def ecef_to_geodetic(x, y, z, ell: Ellipsoid):
    """Geocentric cartesian -> (lon, lat) degrees at h~0 (Bowring's
    closed form; sub-mm for near-surface points)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    z = np.asarray(z, np.float64)
    b = ell.a * (1 - ell.f)
    ep2 = (ell.a**2 - b**2) / b**2
    p = np.hypot(x, y)
    th = np.arctan2(z * ell.a, p * b)
    phi = np.arctan2(z + ep2 * b * np.sin(th) ** 3,
                     p - ell.e2 * ell.a * np.cos(th) ** 3)
    return np.degrees(np.arctan2(y, x)), np.degrees(phi)


def helmert_7(x, y, z, tx, ty, tz, rx_as, ry_as, rz_as, s_ppm):
    """7-parameter Helmert, POSITION VECTOR rotation convention
    (EPSG method 9606; rotations in arc-seconds, scale in ppm)."""
    rx = np.radians(rx_as / 3600.0)
    ry = np.radians(ry_as / 3600.0)
    rz = np.radians(rz_as / 3600.0)
    m = 1.0 + s_ppm * 1e-6
    x2 = tx + m * (x - rz * y + ry * z)
    y2 = ty + m * (rz * x + y - rx * z)
    z2 = tz + m * (-ry * x + rx * y + z)
    return x2, y2, z2


class Datum:
    """Ellipsoid + Helmert parameters TO WGS84 (position vector).
    The inverse applies negated parameters — second-order error
    O(rot*scale) < 0.1 mm for real-world parameter sizes."""

    __slots__ = ("ell", "params")

    def __init__(self, ell: Ellipsoid, params: tuple):
        self.ell = ell
        self.params = params

    def to_wgs84(self, lon, lat):
        x, y, z = geodetic_to_ecef(lon, lat, self.ell)
        x, y, z = helmert_7(x, y, z, *self.params)
        return ecef_to_geodetic(x, y, z, WGS84)

    def from_wgs84(self, lon, lat):
        x, y, z = geodetic_to_ecef(lon, lat, WGS84)
        x, y, z = helmert_7(x, y, z, *[-p for p in self.params])
        return ecef_to_geodetic(x, y, z, self.ell)


# EPSG-published datum->WGS84 parameters (position vector):
# OSGB36 -> WGS84: EPSG tfm 1314 (OSTN-free single Helmert, ~2 m)
OSGB36 = Datum(AIRY1830, (446.448, -125.157, 542.060,
                          0.1502, 0.2470, 0.8421, -20.4894))
# NAD27 -> WGS84 (CONUS): EPSG tfm 1173, geocentric translations
# (~10 m vs NADCON grids)
NAD27 = Datum(CLARKE1866, (-8.0, 160.0, 176.0, 0.0, 0.0, 0.0, 0.0))
# BD72 (Reseau National Belge 1972) -> WGS84: EPSG tfm 15929 (~0.2 m)
BD72 = Datum(INTL1924, (-106.8686, 52.2978, -103.7239,
                        0.3366, -0.4570, 1.8422, -1.2747))
# DHDN (Deutsches Hauptdreiecksnetz) -> WGS84: EPSG tfm 1777
# (whole-Germany single Helmert, ~3 m)
DHDN = Datum(BESSEL1841, (598.1, 73.7, 418.2,
                          0.202, 0.045, -2.455, 6.7))


def tm_crs(lat0: float, lon0: float, k0: float, fe: float, fn: float,
           ell: Ellipsoid):
    """Transverse-Mercator CRS with a natural-origin latitude (e.g.
    British National Grid's 49N): false offsets absorb the northing
    of the origin parallel."""
    # origin northing is evaluated ON the central meridian
    _, y0 = tm_forward(np.array([lon0]), np.array([lat0]), lon0,
                       ell, k0)
    y0 = float(y0[0])

    def fwd(lon, lat):
        x, y = tm_forward(lon, lat, lon0, ell, k0)
        return x + fe, y - y0 + fn

    def inv(x, y):
        return tm_inverse(np.asarray(x, np.float64) - fe,
                          np.asarray(y, np.float64) - fn + y0,
                          lon0, ell, k0)

    return fwd, inv


def _ident_pair():
    def f(a, b):
        return np.asarray(a, np.float64), np.asarray(b, np.float64)
    return f, f


# EPSG registry of supported non-UTM projected CRS (parameters from
# the public EPSG registry).  Entries return (fwd, inv) on a
# WGS84-equivalent datum, or (fwd, inv, datum) when a Helmert shift
# applies — _registry_fns composes the shift through the 4326 hub.
_PROJ_REGISTRY = {
    # RGF93 / Lambert-93 (France)
    2154: lambda: lcc_2sp(49.0, 44.0, 46.5, 3.0, 700000.0, 6600000.0),
    # NAD83 / Conus Albers
    5070: lambda: albers_2sp(29.5, 45.5, 23.0, -96.0, 0.0, 0.0),
    # ETRS89-extended / LAEA Europe
    3035: lambda: laea(52.0, 10.0, 4321000.0, 3210000.0),
    # WGS84 / Antarctic Polar Stereographic (lat_ts -71)
    3031: lambda: polar_stereo(-71.0, 0.0, 0.0, 0.0, south=True),
    # WGS84 / NSIDC Sea Ice Polar Stereographic North (lat_ts 70)
    3413: lambda: polar_stereo(70.0, -45.0, 0.0, 0.0, south=False),
    # --- datum-shifted CRS (Helmert through the 4326 hub) ---
    # OSGB36 / British National Grid
    27700: lambda: (*tm_crs(49.0, -2.0, 0.9996012717,
                            400000.0, -100000.0, AIRY1830), OSGB36),
    # OSGB36 geographic
    4277: lambda: (*_ident_pair(), OSGB36),
    # NAD27 / UTM zone 17N
    26717: lambda: (*_utm_pair(-81.0, 0.0, CLARKE1866), NAD27),
    # NAD27 geographic
    4267: lambda: (*_ident_pair(), NAD27),
    # Belge 1972 / Belgian Lambert 72
    31370: lambda: (*lcc_2sp(51.16666723, 49.8333339, 90.0,
                             4.367486667, 150000.013, 5400088.438,
                             INTL1924), BD72),
    # Belge 1972 geographic
    4313: lambda: (*_ident_pair(), BD72),
    # --- further WGS84-equivalent projected CRS (GRS80 datums differ
    # from WGS84 by < 1 mm flattening; registry params are public) ---
    # NZGD2000 / New Zealand Transverse Mercator 2000
    2193: lambda: tm_crs(0.0, 173.0, 0.9996, 1600000.0, 10000000.0,
                         WGS84),
    # GDA94 / Australian Albers
    3577: lambda: albers_2sp(-18.0, -36.0, 0.0, 132.0, 0.0, 0.0),
    # ETRS89 / UTM zones 28N-37N (EPSG 25828-25837, the full
    # European range incl. the German/Nordic workhorses 32/33)
    **{25800 + z: (lambda z=z: _utm_pair(z * 6.0 - 183.0, 0.0,
                                         WGS84))
       for z in range(28, 38)},
    # NAD83 / UTM zones 1N-23N (EPSG 26901-26923, CONUS + Alaska)
    **{26900 + z: (lambda z=z: _utm_pair(z * 6.0 - 183.0, 0.0,
                                         WGS84))
       for z in range(1, 24)},
    # GDA94 / MGA zones 48-58 (EPSG 28348-28358; southern UTM grid,
    # FN 10,000,000)
    **{28300 + z: (lambda z=z: _utm_pair(z * 6.0 - 183.0, 1e7,
                                         WGS84))
       for z in range(48, 59)},
    # GDA2020 / MGA zones 46-59 (EPSG 7846-7859; GDA2020 agrees with
    # WGS84/ITRF2014 at the registry's accuracy tier)
    **{7800 + z: (lambda z=z: _utm_pair(z * 6.0 - 183.0, 1e7,
                                        WGS84))
       for z in range(46, 60)},
    # SIRGAS 2000 / UTM zones 17S-25S (EPSG 31977-31985)
    **{31960 + z: (lambda z=z: _utm_pair(z * 6.0 - 183.0, 1e7,
                                         WGS84))
       for z in range(17, 26)},
    # NAD83 state-plane samples, METER variants (LCC 2SP)
    # Maryland (EPSG 26985): sp 38 18'/39 27', origin 37 40'N 77W
    26985: lambda: lcc_2sp(38.3, 39.45, 37.66666666666666, -77.0,
                           400000.0, 0.0),
    # New York Long Island (EPSG 32118): sp 40 40'/41 02',
    # origin 40 10'N 74W
    32118: lambda: lcc_2sp(40.66666666666666, 41.03333333333333,
                           40.16666666666666, -74.0, 300000.0, 0.0),
    # --- DHDN / Gauss-Krueger zones 2-5 (EPSG 31466-31469):
    # 3-degree TM (k0=1, FE zone*1e6+500000) on Bessel 1841,
    # Helmert-shifted through the 4326 hub ---
    **{31464 + z: (lambda z=z: (*tm_crs(0.0, 3.0 * z, 1.0,
                                        z * 1e6 + 500000.0, 0.0,
                                        BESSEL1841), DHDN))
       for z in range(2, 6)},
    # DHDN geographic
    4314: lambda: (*_ident_pair(), DHDN),
}
_PROJ_CACHE: dict = {}


def _utm_pair(lon0: float, fn: float, ell: Ellipsoid):
    def fwd(lon, lat):
        x, y = tm_forward(lon, lat, lon0, ell, _K0)
        return x + _FE, y + fn

    def inv(x, y):
        return tm_inverse(np.asarray(x, np.float64) - _FE,
                          np.asarray(y, np.float64) - fn, lon0, ell,
                          _K0)
    return fwd, inv


def _registry_fns(code: int):
    if code not in _PROJ_CACHE and code in _PROJ_REGISTRY:
        entry = _PROJ_REGISTRY[code]()
        if len(entry) == 2:
            _PROJ_CACHE[code] = entry
        else:
            fwd, inv, datum = entry

            def from4326(lon, lat, _f=fwd, _d=datum):
                lo, la = _d.from_wgs84(lon, lat)
                return _f(lo, la)

            def to4326(x, y, _i=inv, _d=datum):
                lo, la = _i(x, y)
                return _d.to_wgs84(lo, la)

            _PROJ_CACHE[code] = (from4326, to4326)
    return _PROJ_CACHE.get(code)
