"""Derive literal golden tables for the rows-only driver queries.

q23/q24/q25/q29/q33/q34 output deterministic integers (tile
checksums, polygon counts, segment counts) that plain SQL cannot
re-derive.  This script computes them INDEPENDENTLY of the
distributed engine: inputs come from DuckDB (the same LCG point SQL
the oracles use), and every raster op runs through the repo's
single-array reference kernels (rasterize_chunk, edt_squared,
focal_kernel, resample_patch, marching_squares_segments,
polygonize_array, checksum_array) over plain numpy arrays — no
SparkSession anywhere.  The distributed queries must then reproduce
these values bit-for-bit through the driver's hash gate.

Writes goldens_sf001.py at the repo root.  Re-run when a fixture or
kernel changes: python tools/make_goldens.py
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import __spark_entry__ as entry  # noqa: E402
from gdal_spark.functions import geo  # noqa: E402
from gdal_spark.geometry.wkb import parse_wkb  # noqa: E402
from gdal_spark.operators.checksum import checksum_array  # noqa: E402
from gdal_spark.operators.contour import (  # noqa: E402
    marching_squares_segments,
)
from gdal_spark.operators.dem import focal_kernel  # noqa: E402
from gdal_spark.operators.polygonize import polygonize_array  # noqa: E402
from gdal_spark.operators.proximity import edt_squared  # noqa: E402
from gdal_spark.operators.rasterize import (  # noqa: E402
    GridSpec, rasterize_chunk,
)
from gdal_spark.operators.warp import (  # noqa: E402
    _cast_to, resample_patch, transform_fn,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TS = 256


def _density(con, zoom: int) -> tuple[np.ndarray, set]:
    """Dense density array at ``zoom`` + the set of OCCUPIED tiles
    (the only ones the sparse engine materializes)."""
    px_sql, py_sql = entry._pixel_sql(zoom)
    rows = con.execute(
        f"WITH pts AS ({entry._POINTS_SQL}) "
        f"SELECT {px_sql} AS px, {py_sql} AS py, COUNT(*) AS n "
        f"FROM pts GROUP BY 1, 2").fetchnumpy()
    n = (1 << zoom) * TS
    arr = np.zeros((n, n), dtype=np.int64)
    px = rows["px"].astype(np.int64)
    py = rows["py"].astype(np.int64)
    arr[py, px] = rows["n"].astype(np.int64)
    tiles = set(zip((px // TS).tolist(), (py // TS).tolist()))
    return arr, tiles


def _tile_rows(full: np.ndarray, tiles: list[tuple[int, int]],
               ts: int, zoom: int, band: int = 1,
               pad_value: float = 0.0) -> list[list]:
    """checksum rows (zoom, tile_x, tile_y, band, checksum) for the
    given tile list, slicing ``full`` (padding edge tiles)."""
    out = []
    h, w = full.shape
    for tx, ty in sorted(tiles):
        sl = full[ty * ts:(ty + 1) * ts, tx * ts:(tx + 1) * ts]
        if sl.shape != (ts, ts):
            padded = np.full((ts, ts), pad_value, dtype=full.dtype)
            padded[:sl.shape[0], :sl.shape[1]] = sl
            sl = padded
        out.append([zoom, tx, ty, band, int(checksum_array(sl))])
    return out


def _fixture_raster(polys_pdf, grid: GridSpec, burns, dtype,
                    merge_alg="replace"):
    """Full-array rasterize via the shared single-array kernel +
    the engine's materialized-tile rule (bbox cover per geometry)."""
    local = []
    covers = set()
    n_tx = (grid.width + 128 - 1) // 128
    n_ty = (grid.height + 128 - 1) // 128
    for (_, r), burn in zip(polys_pdf.iterrows(), burns):
        g = parse_wkb(bytes(r["geometry"]))
        rings_px = [grid.to_px(ring) for ring in g.rings()]
        local.append((rings_px, float(burn), g.kind))
        allc = np.vstack(rings_px)
        tx0 = max(int(allc[:, 0].min() // 128), 0)
        tx1 = min(int(allc[:, 0].max() // 128), n_tx - 1)
        ty0 = max(int(allc[:, 1].min() // 128), 0)
        ty1 = min(int(allc[:, 1].max() // 128), n_ty - 1)
        for tx in range(tx0, tx1 + 1):
            for ty in range(ty0, ty1 + 1):
                covers.add((tx, ty))
    arr = rasterize_chunk((grid.height, grid.width), local, dtype,
                          False, merge_alg)
    return arr, covers


def q23_golden():
    grid = GridSpec(-180.0, 85.0, 0.5, 0.5, 720, 340)
    tris = entry._tri_polys_pdf()
    arr, covers = _fixture_raster(tris, grid, [100.0, 200.0],
                                  "uint8", merge_alg="add")
    return (["zoom", "tile_x", "tile_y", "band", "checksum"],
            _tile_rows(arr, sorted(covers), 128, -1))


def q24_golden():
    grid = GridSpec(-180.0, 85.0, 0.5, 0.5, 720, 340)
    rects = entry._rect_polys_pdf()
    arr, _ = _fixture_raster(rects, grid, [10.0, 20.0, 30.0], "uint8")
    polys = polygonize_array(arr.astype(np.float64), grid.gt,
                             nodata=0.0)
    agg = polys.groupby("value").agg(
        n_polys=("value", "size"), n_pixels=("n_pixels", "sum"))
    return (["value", "n_polys", "n_pixels"],
            [[float(v), int(r["n_polys"]), int(r["n_pixels"])]
             for v, r in agg.sort_index().iterrows()])


def q25_golden(con):
    arr, src_tiles = _density(con, 5)
    n_px = 32 * TS
    res = 2 * geo.ORIGIN / n_px
    src = GridSpec(-geo.ORIGIN, geo.ORIGIN, res, res, n_px, n_px)
    dst = GridSpec(-180.0, 85.0, 0.125, 0.125, 2880, 1360)
    inv = transform_fn("EPSG:3857", "EPSG:4326")
    # the distributed render computes the full 256-aligned dst lattice
    dw = ((dst.width + TS - 1) // TS) * TS
    dh = ((dst.height + TS - 1) // TS) * TS
    jj, ii = np.mgrid[0:dh, 0:dw]
    wx = dst.x0 + (ii + 0.5) * dst.px_w
    wy = dst.y1 - (jj + 0.5) * dst.px_h
    sxw, syw = inv(wx, wy)
    spx = (sxw - src.x0) / src.px_w
    spy = (src.y1 - syw) / src.px_h
    out = resample_patch(arr.astype(np.float64), 0, 0, spx, spy,
                         "near", 0.0)
    out = _cast_to(out, np.dtype("uint32"))
    # dst tiles present = those whose padded back-projected cover
    # hits a MATERIALIZED src tile (the join drops the rest)
    present = []
    n_stx = n_sty = n_px // TS
    for dty in range(dh // TS):
        for dtx in range(dw // TS):
            xs = np.array([0, .5, 1, 0, 1, 0, .5, 1]) * TS + dtx * TS
            ys = np.array([0, 0, 0, .5, .5, 1, 1, 1]) * TS + dty * TS
            bx = dst.x0 + xs * dst.px_w
            by = dst.y1 - ys * dst.px_h
            sx, sy = inv(bx, by)
            bpx = (sx - src.x0) / src.px_w
            bpy = (src.y1 - sy) / src.px_h
            tx0 = int(np.clip((bpx.min() - 2) // TS, 0, n_stx - 1))
            tx1 = int(np.clip((bpx.max() + 2) // TS, 0, n_stx - 1))
            ty0 = int(np.clip((bpy.min() - 2) // TS, 0, n_sty - 1))
            ty1 = int(np.clip((bpy.max() + 2) // TS, 0, n_sty - 1))
            cover = {(sx_, sy_) for sx_ in range(tx0, tx1 + 1)
                     for sy_ in range(ty0, ty1 + 1)}
            if cover & src_tiles:
                present.append((dtx, dty))
    return (["zoom", "tile_x", "tile_y", "band", "checksum"],
            _tile_rows(out, present, TS, -1))


def q29_golden(con):
    arr, tiles = _density(con, 4)
    n = arr.shape[0]
    canvas = np.full((n + 2, n + 2), np.nan)
    for tx, ty in tiles:
        canvas[1 + ty * TS:1 + (ty + 1) * TS,
               1 + tx * TS:1 + (tx + 1) * TS] = \
            arr[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS]
    rows = []
    for tx, ty in sorted(tiles):
        sub = canvas[ty * TS:ty * TS + TS + 2,
                     tx * TS:tx * TS + TS + 2]
        shade = focal_kernel(sub, "hillshade", 1.0, 1.0, 1.0,
                             315.0, 45.0)
        shade = np.where(np.isnan(shade), 0.0, shade)
        rows.append([4, tx, ty, 1,
                     int(checksum_array(shade.astype(np.float64)))])
    return (["zoom", "tile_x", "tile_y", "band", "checksum"], rows)


def q33_golden():
    grid = GridSpec(-180.0, 85.0, 1.0, 1.0, 360, 170)
    tris = entry._tri_polys_pdf()
    arr, covers = _fixture_raster(tris, grid, [1.0, 1.0], "uint8")
    k = 10
    n_tx = (grid.width + 128 - 1) // 128
    n_ty = (grid.height + 128 - 1) // 128
    rows = []
    for tx, ty in sorted(covers):
        canvas = np.full((128 + 2 * k, 128 + 2 * k), np.nan)
        for nx in range(max(tx - 1, 0), min(tx + 1, n_tx - 1) + 1):
            for ny in range(max(ty - 1, 0), min(ty + 1, n_ty - 1) + 1):
                if (nx, ny) not in covers:
                    continue
                sl = arr[ny * 128:(ny + 1) * 128,
                         nx * 128:(nx + 1) * 128]
                tile = np.zeros((128, 128))
                tile[:sl.shape[0], :sl.shape[1]] = sl
                oy = (ny - ty) * 128 + k
                ox = (nx - tx) * 128 + k
                ys0, ys1 = max(oy, 0), min(oy + 128, 128 + 2 * k)
                xs0, xs1 = max(ox, 0), min(ox + 128, 128 + 2 * k)
                canvas[ys0:ys1, xs0:xs1] = \
                    tile[ys0 - oy:ys1 - oy, xs0 - ox:xs1 - ox]
        mask = np.isin(canvas, [1.0])
        d2, _, _ = edt_squared(mask)
        dist = np.sqrt(d2)[k:-k, k:-k]
        out = np.where(dist <= 10.0, dist, -1.0)
        rows.append([-1, tx, ty, 1,
                     int(checksum_array(out.astype(np.float64)))])
    return (["zoom", "tile_x", "tile_y", "band", "checksum"], rows)


def q34_golden(con):
    arr, tiles = _density(con, 5)
    n = arr.shape[0]
    canvas = np.full((n, n), np.nan)
    for tx, ty in tiles:
        canvas[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS] = \
            arr[ty * TS:(ty + 1) * TS, tx * TS:(tx + 1) * TS]
    segs = marching_squares_segments(canvas, 0.5)
    segs = segs[~np.isnan(segs).any(axis=1)]
    return (["level", "n_segments"], [[0.5, int(len(segs))]])


def q19_golden(con):
    """Single-node re-derivation of minhash-LSH dedup (threshold 0.6,
    the q19 parameters): same gram stream, same seeded permutations,
    banding by the signature-slice VALUES (Spark buckets on
    xxhash64(slice) — same grouping up to 2^-64 collisions), star
    pairs, estimate prefilter, exact n-gram Jaccard verify, drop every
    key that is the larger side of a verified pair.  numpy/pandas
    only — no SparkSession."""
    import pandas as pd

    from gdal_spark.operators.dedup import (
        _MERSENNE, _gram_stream, _shingle_hashes,
    )

    docs = con.execute(
        "SELECT doc_id, text, source FROM documents ORDER BY doc_id"
    ).fetchdf()
    num_hashes, shingle, bands, threshold, seed = 64, 5, 16, 0.6, 42
    rows_per_band = num_hashes // bands
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes,
                    dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_hashes,
                    dtype=np.int64).astype(np.uint64)
    flat, bounds = _gram_stream(docs["text"], shingle)
    mins = np.empty((num_hashes, len(docs)), dtype=np.uint64)
    for i in range(num_hashes):
        hv = (a[i] * flat + b[i]) % _MERSENNE
        mins[i] = np.minimum.reduceat(hv, bounds[:-1])
    sigs = mins.astype(np.int64).T                      # (n, H)
    keys = docs["doc_id"].to_numpy(np.int64)

    pairs = set()
    for band in range(bands):
        sl = sigs[:, band * rows_per_band:(band + 1) * rows_per_band]
        buckets: dict = {}
        for i in range(len(keys)):
            buckets.setdefault(tuple(sl[i]), []).append(i)
        for members in buckets.values():
            rep = min(members, key=lambda i: keys[i])
            for m in members:
                if keys[m] != keys[rep]:
                    pairs.add((int(keys[rep]), int(keys[m])))
    idx = {int(k): i for i, k in enumerate(keys)}
    est_keep = [
        (pa, pb) for pa, pb in pairs
        if (sigs[idx[pa]] == sigs[idx[pb]]).mean()
        >= max(threshold - 0.25, 0.0)
    ]
    shingles = _shingle_hashes(docs["text"], shingle)
    drop = set()
    for pa, pb in est_keep:
        sa, sb = shingles[idx[pa]], shingles[idx[pb]]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        if union and inter / union >= threshold:
            drop.add(pb)
    out = docs[~docs["doc_id"].isin(drop)].sort_values("doc_id")
    return (["doc_id", "source"],
            [[int(d), str(s)] for d, s in
             zip(out["doc_id"], out["source"])])


def q20_golden(con):
    """Single-node simhash signatures (shingle=4) — the same
    splitmix-spread sign-sum as the distributed kernel, over the
    shared gram-stream helper."""
    from gdal_spark.operators.dedup import _shingle_hashes

    docs = con.execute(
        "SELECT doc_id, text FROM documents ORDER BY doc_id"
    ).fetchdf()
    shingles = _shingle_hashes(docs["text"], 4)
    bit_idx = np.arange(64, dtype=np.uint64)
    rows = []
    for did, grams in zip(docs["doc_id"], shingles):
        g = grams * np.uint64(0x9E3779B97F4A7C15)
        g ^= g >> np.uint64(31)
        bits = (g[:, None] >> bit_idx[None, :]) & np.uint64(1)
        score = bits.sum(axis=0) * 2 - len(g)
        word = np.uint64(0)
        for bi in np.nonzero(score > 0)[0]:
            word |= np.uint64(1) << np.uint64(bi)
        rows.append([int(did), int(np.int64(word.astype(np.int64)))])
    return (["doc_id", "simhash"], rows)


def main() -> None:
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM"
                    f" '{SF_DIR}/{t}.parquet'")
    goldens = {
        "q23_rasterize_checksum": q23_golden(),
        "q24_polygonize_roundtrip": q24_golden(),
        "q25_warp_density": q25_golden(con),
        "q29_dem_hillshade": q29_golden(con),
        "q33_proximity": q33_golden(),
        "q34_contour": q34_golden(con),
        "q19_minhash_lsh_dedup": q19_golden(con),
        "q20_simhash": q20_golden(con),
    }
    path = os.path.join(ROOT, "goldens_sf001.py")
    with open(path, "w") as f:
        f.write('"""Literal golden tables for the rows-only driver\n'
                "queries, derived by tools/make_goldens.py from the\n"
                "single-array reference kernels + DuckDB inputs at\n"
                "sf0.01 — NO distributed code involved.  Regenerate\n"
                "with: python tools/make_goldens.py\n"
                '"""\n\n'
                "GOLDENS = {\n")
        for name, (cols, rows) in goldens.items():
            f.write(f"    {name!r}: (\n        {cols!r},\n        [\n")
            for row in rows:
                f.write(f"            {row!r},\n")
            f.write("        ],\n    ),\n")
        f.write("}\n")
    for name, (cols, rows) in goldens.items():
        print(f"{name}: {len(rows)} rows")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
