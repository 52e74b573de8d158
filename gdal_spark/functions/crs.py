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

Every pair is routed through EPSG:4326 as the hub, so any supported
src -> dst composes.  All functions are vectorized numpy over
arbitrary array shapes — per-tile warp cost is one array pass, which
is why the reference's approximate-transformer corner trick
(alg/gdaltransformer.cpp:58) is unnecessary here.

Accuracy: round-trip < 1e-9 deg (~0.1 mm) inside a zone's normal
extent (tested), consistent with the series order.
"""

from __future__ import annotations

import numpy as np

# WGS84
_A = 6378137.0
_F = 1.0 / 298.257223563
_E2 = _F * (2.0 - _F)
_E = np.sqrt(_E2)
_N = _F / (2.0 - _F)

# rectifying radius A = a/(1+n) (1 + n^2/4 + n^4/64 + n^6/256)
_RECT_A = _A / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64 + _N**6 / 256)

# Krueger flattening series, order 6 (Karney 2011, eqs. 35/36)
_ALPHA = np.array([
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180
    - 127 * _N**5 / 288 + 7891 * _N**6 / 37800,
    13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440
    + 281 * _N**5 / 630 - 1983433 * _N**6 / 1935360,
    61 * _N**3 / 240 - 103 * _N**4 / 140 + 15061 * _N**5 / 26880
    + 167603 * _N**6 / 181440,
    49561 * _N**4 / 161280 - 179 * _N**5 / 168
    + 6601661 * _N**6 / 7257600,
    34729 * _N**5 / 80640 - 3418889 * _N**6 / 1995840,
    212378941 * _N**6 / 319334400,
])
_BETA = np.array([
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96 - _N**4 / 360
    - 81 * _N**5 / 512 + 96199 * _N**6 / 604800,
    _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440 + 46 * _N**5 / 105
    - 1118711 * _N**6 / 3870720,
    17 * _N**3 / 480 - 37 * _N**4 / 840 - 209 * _N**5 / 4480
    + 5569 * _N**6 / 90720,
    4397 * _N**4 / 161280 - 11 * _N**5 / 504
    - 830251 * _N**6 / 7257600,
    4583 * _N**5 / 161280 - 108847 * _N**6 / 3991680,
    20648693 * _N**6 / 638668800,
])

_K0 = 0.9996
_FE = 500000.0
_FN_SOUTH = 10000000.0


def tm_forward(lon: np.ndarray, lat: np.ndarray, lon0_deg: float
               ) -> tuple[np.ndarray, np.ndarray]:
    """Geographic (deg) -> transverse-Mercator (x east, y north in
    meters, no false offsets, scale k0 applied)."""
    lam = np.radians(np.asarray(lon, dtype=np.float64) - lon0_deg)
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    sphi = np.sin(phi)
    # conformal latitude tau' (exact forward)
    tau = np.tan(phi)
    sigma = np.sinh(_E * np.arctanh(_E * sphi))
    taup = tau * np.sqrt(1 + sigma**2) - sigma * np.sqrt(1 + tau**2)
    xi_p = np.arctan2(taup, np.cos(lam))
    eta_p = np.arcsinh(np.sin(lam) / np.hypot(taup, np.cos(lam)))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi += _ALPHA[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta += _ALPHA[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)
    return _K0 * _RECT_A * eta, _K0 * _RECT_A * xi


def tm_inverse(x: np.ndarray, y: np.ndarray, lon0_deg: float
               ) -> tuple[np.ndarray, np.ndarray]:
    """Transverse-Mercator meters (no false offsets) -> (lon, lat)
    degrees."""
    eta = np.asarray(x, dtype=np.float64) / (_K0 * _RECT_A)
    xi = np.asarray(y, dtype=np.float64) / (_K0 * _RECT_A)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(6):
        k = 2.0 * (j + 1)
        xi_p -= _BETA[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_p -= _BETA[j] * np.cos(k * xi) * np.sinh(k * eta)
    taup = np.sin(xi_p) / np.sqrt(np.sinh(eta_p)**2 + np.cos(xi_p)**2)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    # conformal -> geodetic latitude (standard sine series in chi)
    chi = np.arctan(taup)
    e2, e4 = _E2, _E2**2
    e6, e8 = _E2**3, _E2**4
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
    raise ValueError(f"unsupported CRS {crs!r}")


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
    raise ValueError(f"unsupported CRS {crs!r}")


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


def _m(phi):
    s = np.sin(phi)
    return np.cos(phi) / np.sqrt(1 - _E2 * s * s)


def _t(phi):
    s = np.sin(phi)
    return (np.tan(np.pi / 4 - phi / 2)
            / ((1 - _E * s) / (1 + _E * s)) ** (_E / 2))


def _q(phi):
    s = np.sin(phi)
    return (1 - _E2) * (s / (1 - _E2 * s * s)
                        - np.log((1 - _E * s) / (1 + _E * s))
                        / (2 * _E))


def _phi_from_t(t):
    """Inverse of _t by fixed-point iteration (Snyder 7-9)."""
    phi = np.pi / 2 - 2 * np.arctan(t)
    for _ in range(8):
        s = _E * np.sin(phi)
        phi = np.pi / 2 - 2 * np.arctan(
            t * ((1 - s) / (1 + s)) ** (_E / 2))
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
            fe: float, fn: float):
    """Lambert Conformal Conic, 2 standard parallels (Snyder 15).
    Returns (fwd(lon, lat) -> x, y; inv(x, y) -> lon, lat)."""
    p1, p2, p0 = map(np.radians, (lat1, lat2, lat0))
    n = (np.log(_m(p1)) - np.log(_m(p2))) / (np.log(_t(p1))
                                             - np.log(_t(p2)))
    big_f = _m(p1) / (n * _t(p1) ** n)
    rho0 = _A * big_f * _t(p0) ** n

    def fwd(lon, lat):
        phi = np.radians(np.asarray(lat, np.float64))
        lam = np.radians(np.asarray(lon, np.float64) - lon0)
        rho = _A * big_f * _t(phi) ** n
        th = n * lam
        return fe + rho * np.sin(th), fn + rho0 - rho * np.cos(th)

    def inv(x, y):
        xp = np.asarray(x, np.float64) - fe
        yp = rho0 - (np.asarray(y, np.float64) - fn)
        rho = np.sign(n) * np.hypot(xp, yp)
        th = np.arctan2(np.sign(n) * xp, np.sign(n) * yp)
        t = (rho / (_A * big_f)) ** (1 / n)
        return np.degrees(th / n) + lon0, np.degrees(_phi_from_t(t))

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
        rho = np.hypot(xp, yp)
        th = np.arctan2(xp, yp)
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


# EPSG registry of supported non-UTM projected CRS (all on
# WGS84-equivalent datums; parameters from the public EPSG registry)
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
}
_PROJ_CACHE: dict = {}


def _registry_fns(code: int):
    if code not in _PROJ_CACHE and code in _PROJ_REGISTRY:
        _PROJ_CACHE[code] = _PROJ_REGISTRY[code]()
    return _PROJ_CACHE.get(code)
