"""GCP transformers: polynomial (orders 1-3) and thin-plate spline.

Reference surfaces: GDALCreateGCPTransformer (alg/gdal_crs.c — least
squares polynomial fit of ground control points, orders 1/2/3) and
GDALCreateTPSTransformer (alg/thinplatespline.cpp — the VizGeoref
spline).  Both re-derived here from the public formulations: ordinary
least squares on the polynomial basis, and Bookstein's thin-plate
spline (Bookstein 1989, "Principal Warps") with kernel
U(r) = r^2 ln r^2 — the same radial basis the reference's
VizGeorefSpline2D uses.

Each fit returns a VECTORIZED ``f(x, y) -> (X, Y)`` closure over
numpy arrays, the exact callable shape `operators/warp.warp_tiles`
consumes as its inverse transform — so GCP/TPS warps run through the
same distributed tile machinery as the CRS warps.  Like the
reference (which fits one transformer per direction), fit the
inverse by swapping source and target points.

Solves run driver-side on the GCP list (tens to thousands of
points — the reference holds them in memory too); evaluation is
numpy-vectorized per tile on executors.
"""

from __future__ import annotations

import numpy as np

_N_TERMS = {1: 3, 2: 6, 3: 10}


def _poly_basis(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    cols = [np.ones_like(x), x, y]
    if order >= 2:
        cols += [x * y, x * x, y * y]
    if order >= 3:
        cols += [x * x * y, x * y * y, x ** 3, y ** 3]
    return np.stack(cols, axis=-1)


def fit_gcp_poly(src_xy: np.ndarray, dst_xy: np.ndarray,
                 order: int = 1):
    """Least-squares polynomial GCP transformer
    (GDALCreateGCPTransformer semantics, alg/gdal_crs.c): maps
    src points onto dst points; order 1 = affine (3 terms),
    2 = quadratic (6), 3 = cubic (10).  Returns f(x, y) -> (X, Y)."""
    order = int(order)
    if order not in _N_TERMS:
        raise ValueError("order must be 1, 2 or 3")
    src = np.asarray(src_xy, dtype=np.float64)
    dst = np.asarray(dst_xy, dtype=np.float64)
    need = _N_TERMS[order]
    if len(src) < need:
        raise ValueError(
            f"order {order} needs >= {need} GCPs, got {len(src)}")
    A = _poly_basis(src[:, 0], src[:, 1], order)
    cx, *_ = np.linalg.lstsq(A, dst[:, 0], rcond=None)
    cy, *_ = np.linalg.lstsq(A, dst[:, 1], rcond=None)

    def f(x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        B = _poly_basis(x, y, order)
        return B @ cx, B @ cy

    return f


def _tps_kernel(r2: np.ndarray) -> np.ndarray:
    # U(r) = r^2 * ln(r^2); U(0) = 0 (the limit) — same basis as the
    # reference's VizGeorefSpline2D base_func
    with np.errstate(divide="ignore", invalid="ignore"):
        out = r2 * np.log(r2)
    return np.where(r2 > 0.0, out, 0.0)


def fit_tps(src_xy: np.ndarray, dst_xy: np.ndarray,
            regularization: float = 0.0):
    """Thin-plate spline transformer (GDALCreateTPSTransformer
    semantics): interpolates every GCP exactly (regularization 0) and
    bends minimally between them.  Returns f(x, y) -> (X, Y)."""
    src = np.asarray(src_xy, dtype=np.float64)
    dst = np.asarray(dst_xy, dtype=np.float64)
    n = len(src)
    if n < 3:
        raise ValueError("TPS needs >= 3 GCPs")
    d2 = ((src[:, None, :] - src[None, :, :]) ** 2).sum(-1)
    K = _tps_kernel(d2)
    if regularization:
        K = K + regularization * np.eye(n)
    P = np.column_stack([np.ones(n), src])
    A = np.zeros((n + 3, n + 3))
    A[:n, :n] = K
    A[:n, n:] = P
    A[n:, :n] = P.T
    rhs = np.zeros((n + 3, 2))
    rhs[:n] = dst
    sol = np.linalg.solve(A, rhs)
    w, a = sol[:n], sol[n:]
    sx, sy = src[:, 0].copy(), src[:, 1].copy()

    def f(x, y):
        x = np.asarray(x, dtype=np.float64).ravel()
        y = np.asarray(y, dtype=np.float64).ravel()
        r2 = (x[:, None] - sx[None, :]) ** 2 \
            + (y[:, None] - sy[None, :]) ** 2
        U = _tps_kernel(r2)
        X = a[0, 0] + a[1, 0] * x + a[2, 0] * y + U @ w[:, 0]
        Y = a[0, 1] + a[1, 1] * x + a[2, 1] * y + U @ w[:, 1]
        return X, Y

    return f


def gcp_inverse_transformer(gcps, *, method: str = "tps",
                            order: int = 1):
    """The warp-ready INVERSE transform from a GCP list of
    (src_x, src_y, dst_x, dst_y): fits dst -> src, exactly the
    direction `warp_tiles` evaluates (dst pixel centers gather from
    the source), the same way the reference instantiates its
    transformer with bInverse for the warp path."""
    g = np.asarray(gcps, dtype=np.float64)
    dst, src = g[:, 2:4], g[:, 0:2]
    if method == "tps":
        return fit_tps(dst, src)
    if method == "poly":
        return fit_gcp_poly(dst, src, order)
    raise ValueError(f"unknown GCP method {method!r}")
