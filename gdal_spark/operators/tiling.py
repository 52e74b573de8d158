"""The tiling engine: z/x/y pyramid over WebMercatorQuad.

Re-creates ``gdal raster tile`` (apps/gdalalg_raster_tile.cpp) as
Spark dataflow:

* tile assignment uses the exact GetTileIndices math (:457-480 —
  floor((x - topLeftX)/(res*tileW) + 1e-3), clamped) as JVM column
  expressions;
* base-zoom rendering is a **salted two-phase aggregation**: a
  map-side combine (mapInPandas partial histograms per tile per
  input partition — the distributed analog of GDAL's per-chunk
  accumulation under the 64MB warp memory budget,
  alg/gdalwarpoperation.cpp:611) followed by a groupBy(tile) merge.
  Hot tiles (Zipf cities) arrive pre-reduced, so the shuffle carries
  at most n_partitions rows per tile instead of n_points — this is
  the "explicit salting of hot cells" of the north rule, with the
  input partition id as the salt;
* the shuffle into tile order is range-partitioned on (z, x, y)
  (repartitionByRange), mirroring the reference's Hilbert/row-major
  tile traversal locality (gdalalg_raster_tile.cpp tile loops);
* overview zooms are built from the zoom below
  (gdalalg_raster_tile.cpp:1552-1596): groupBy(parent) of 4 children
  with a 2x2 sum/average reduce — iterated down to zoom 0.

Tile rows: (zoom:int, tile_x:long, tile_y:long, band:int,
data:binary raw C-order, dtype:string, tile_size:int).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType
)

from gdal_spark.functions import geo

TILE_SCHEMA = StructType([
    StructField("zoom", IntegerType()),
    StructField("tile_x", LongType()),
    StructField("tile_y", LongType()),
    StructField("band", IntegerType()),
    StructField("data", BinaryType()),
    StructField("dtype", StringType()),
    StructField("tile_size", IntegerType()),
])

_PARTIAL_SCHEMA = StructType([
    StructField("zoom", IntegerType()),
    StructField("tile_x", LongType()),
    StructField("tile_y", LongType()),
    StructField("idx", BinaryType()),    # int32 flat pixel indices
    StructField("cnt", BinaryType()),    # int64 counts
])

# packed partials (r7): ONE row per (input partition, destination
# bucket) instead of one row per (input partition, tile).  A 1M-point
# pyramid shuffled ~520k tiny rows whose per-row overhead dominated
# the exchange; packing cuts that to a few thousand rows while the
# byte payload (the sparse entries themselves) is unchanged.  hdr
# packs int64 quads [zoom, tile_x, tile_y, n_entries] per tile;
# idx/cnt concatenate the per-tile entry arrays in hdr order.
_PACKED_SCHEMA = StructType([
    StructField("bucket", IntegerType()),
    StructField("hdr", BinaryType()),
    StructField("idx", BinaryType()),
    StructField("cnt", BinaryType()),
])

# distinct bucket values per output partition: >> 1 so the hash
# partitioner spreads buckets evenly (guide §2.5 — too few distinct
# synthetic keys leaves partitions empty under hash collisions)
_BUCKETS_PER_PART = 32


def _pack_frame(zs, txs, tys, lens, pix, csum,
                n_buckets: int) -> pd.DataFrame:
    """Per-tile sparse arrays -> packed one-row-per-bucket frame.

    ``zs/txs/tys/lens``: per-tile int64 arrays; ``pix``/``csum``:
    entries concatenated in tile order (int32 / int64).  Tiles map to
    buckets via a splitmix hash of the tile key, so every copy of a
    tile lands in the same bucket regardless of producer."""
    tile_key = ((zs << 58) + (txs << 29) + tys).astype(np.uint64)
    h = tile_key * np.uint64(0x9E3779B97F4A7C15)
    h ^= h >> np.uint64(29)
    bkt = (h % np.uint64(n_buckets)).astype(np.int64)
    order = np.argsort(bkt, kind="stable")
    lens_o = lens[order]
    starts = np.r_[0, np.cumsum(lens)[:-1]]
    # ragged gather of entry ranges in bucket order
    total = int(lens.sum())
    if total:
        off = np.repeat(starts[order] - np.r_[0, np.cumsum(lens_o)[:-1]],
                        lens_o)
        ent = np.arange(total, dtype=np.int64) + off
        pix_o = pix[ent]
        cnt_o = csum[ent]
    else:
        pix_o = pix[:0]
        cnt_o = csum[:0]
    bko = bkt[order]
    bstart = np.flatnonzero(np.r_[True, bko[1:] != bko[:-1]])
    bend = np.r_[bstart[1:], len(bko)]
    ent_bounds = np.r_[0, np.cumsum(lens_o)]
    rows = {"bucket": [], "hdr": [], "idx": [], "cnt": []}
    quads = np.column_stack([zs[order], txs[order], tys[order],
                             lens_o]).astype(np.int64)
    for s, e in zip(bstart, bend):
        rows["bucket"].append(int(bko[s]))
        rows["hdr"].append(quads[s:e].tobytes())
        lo, hi = ent_bounds[s], ent_bounds[e]
        rows["idx"].append(pix_o[lo:hi].tobytes())
        rows["cnt"].append(cnt_o[lo:hi].tobytes())
    return pd.DataFrame(rows)


def _merge_packed(packed: DataFrame, nparts: int,
                  dense: tuple | None = None) -> DataFrame:
    """Packed partials -> merged tiles: ONE hash exchange on the
    bucket id, then a per-partition numpy reduce.  The kernel buffers
    its partition's sparse entries (the same asymptotic bound as the
    sorted-merge carry — entries / nparts; callers size nparts for
    the scale via num_partitions)."""

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hdrs, idxs, cnts = [], [], []
        for b in batches:
            for hb, ib, cb in zip(b["hdr"], b["idx"], b["cnt"]):
                hdrs.append(np.frombuffer(hb, np.int64).reshape(-1, 4))
                idxs.append(np.frombuffer(ib, np.int32))
                cnts.append(np.frombuffer(cb, np.int64))
        if not hdrs:
            return
        hdr = np.vstack(hdrs)
        alli = np.concatenate(idxs)
        allc = np.concatenate(cnts)
        tile_key = (hdr[:, 0] << 58) + (hdr[:, 1] << 29) + hdr[:, 2]
        lens = hdr[:, 3]
        uniq_tiles, tile_ord = np.unique(tile_key, return_inverse=True)
        tiles_rep = np.repeat(tile_ord.astype(np.int64), lens)
        key = tiles_rep * (1 << 18) + alli
        order = np.argsort(key, kind="stable")
        ks = key[order]
        starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        uk = ks[starts]
        csum = (np.add.reduceat(allc[order], starts)
                if len(ks) else np.zeros(0, np.int64))
        tile = uniq_tiles[(uk >> 18)]
        pix = (uk & ((1 << 18) - 1)).astype(np.int32)
        tst = np.flatnonzero(np.r_[True, tile[1:] != tile[:-1]])
        ten = np.r_[tst[1:], len(tile)]
        csum64 = csum.astype(np.int64)
        # emit in bounded tile blocks so no Arrow column grows large
        block = 4096
        for bs in range(0, len(tst), block):
            be = min(bs + block, len(tst))
            rows = {"zoom": [], "tile_x": [], "tile_y": [], "idx": [],
                    "cnt": []}
            for s, e in zip(tst[bs:be], ten[bs:be]):
                t = int(tile[s])
                rows["zoom"].append(t >> 58)
                rows["tile_x"].append((t >> 29) & ((1 << 29) - 1))
                rows["tile_y"].append(t & ((1 << 29) - 1))
                rows["idx"].append(pix[s:e].tobytes())
                rows["cnt"].append(csum64[s:e].tobytes())
            pdf = pd.DataFrame(rows)
            if dense is not None:
                yield from _dense_pdf(pdf, dense[0], dense[1])
            else:
                yield pdf

    shuffled = packed.repartition(nparts, "bucket")
    schema = TILE_SCHEMA if dense is not None else _PARTIAL_SCHEMA
    return shuffled.mapInPandas(merge, schema)


def decode_tile(data: bytes, dtype: str, tile_size: int) -> np.ndarray:
    """Decode one tile payload.  ``dtype`` may carry a codec prefix:
    'deflate:uint32' (zlib-compressed, the engine's PNG-filter
    stand-in — gdal raster tile deflate-encodes its PNG tiles,
    apps/gdalalg_raster_tile.cpp:520-545)."""
    if dtype.startswith("deflate:"):
        import zlib

        raw = zlib.decompress(data)
        dt = np.dtype(dtype.split(":", 1)[1])
    elif dtype.startswith("const:"):
        # constant-tile encoding (r7): an all-equal tile ships as a
        # single value; consumers decode to the full array
        dt = np.dtype(dtype.split(":", 1)[1])
        val = np.frombuffer(data, dtype=dt)[0]
        return np.full((tile_size, tile_size), val, dtype=dt)
    else:
        raw = data
        dt = np.dtype(dtype)
    return np.frombuffer(raw, dtype=dt).reshape(tile_size, tile_size)


# ---- stitched-deflate fast path for sparse tiles -------------------
#
# zlib.compress scans every byte, so a mostly-zero 256 KB histogram
# costs ~450 us regardless of content — and densify()'s zlib was the
# measured bottleneck of the whole pyramid build (71,698 tiles at
# median 7 nonzero pixels = ~50 s of CPU scanning zeros).  Deflate
# streams are stitchable at Z_FULL_FLUSH boundaries (the flush resets
# the dictionary and aligns the stream on a byte), so the zero GAPS
# can reuse cached pre-deflated segments and only the nonzero spans
# compress live; the zlib trailer's adler32 over a zero run has the
# closed form b += n*a (mod 65521) with a unchanged.  The output is a
# STANDARD zlib stream — zlib.decompress(out) == buf, byte-for-byte
# equal raw data, only the compressed representation differs.

_Z_LADDER = (65536, 8192, 1024, 128, 16, 2, 1)
_ZERO_SEGS: dict[int, bytes] = {}
# live spans are merged when the gap between them is under this many
# BYTES, bounding the per-span compressobj overhead
_SPAN_MERGE_BYTES = 512
# above this nonzero fraction plain zlib.compress wins — spans stop
# being sparse and the stitch overhead dominates
_SPARSE_FRAC = 0.05


def _zero_seg(n: int) -> bytes:
    import zlib

    seg = _ZERO_SEGS.get(n)
    if seg is None:
        co = zlib.compressobj(1, zlib.DEFLATED, -15)
        seg = co.compress(b"\x00" * n) + co.flush(zlib.Z_FULL_FLUSH)
        _ZERO_SEGS[n] = seg
    return seg


def _adler_zeros(adler: int, n: int) -> int:
    a = adler & 0xFFFF
    b = (adler >> 16) & 0xFFFF
    b = (b + (n % 65521) * a) % 65521
    return (b << 16) | a


def _deflate_pieces(total_len: int,
                    pieces: list[tuple[int, bytes]]) -> bytes:
    """zlib stream of a ``total_len``-byte buffer that is zero
    everywhere except the given (byte_offset, chunk) pieces (sorted,
    non-overlapping).  The dense buffer is NEVER materialized — zero
    gaps come from the cached segment ladder, so cost is
    O(sum of piece sizes), not O(total_len)."""
    import zlib

    out = [b"\x78\x01"]          # zlib header, level-1 flags
    adler = 1
    pos = 0
    # ONE compressor for every live piece of this tile: each
    # Z_FULL_FLUSH resets the dictionary, so the cached zero
    # segments (themselves full-flush-terminated, fresh-state) can
    # interleave freely — and the zero ladder reaches 1, so gaps
    # never touch zlib at all
    co = zlib.compressobj(1, zlib.DEFLATED, -15)

    def emit_zeros(n: int) -> None:
        nonlocal adler
        if n <= 0:
            return
        adler = _adler_zeros(adler, n)
        for c in _Z_LADDER:
            q, n = divmod(n, c)
            if q:
                out.append(_zero_seg(c) * q)

    for s, chunk in pieces:
        emit_zeros(s - pos)
        out.append(co.compress(chunk) + co.flush(zlib.Z_FULL_FLUSH))
        adler = zlib.adler32(chunk, adler)
        pos = s + len(chunk)
    emit_zeros(total_len - pos)
    out.append(co.flush(zlib.Z_FINISH))   # final empty block
    out.append(adler.to_bytes(4, "big"))
    return b"".join(out)


# each live piece costs ~20 us (zeros+scatter+compress+flush+ladder);
# plain zlib costs ~450-700 us on a 256 KB tile, so past this many
# pieces the dense scan wins (measured breakeven ~24)
_MAX_PIECES = 24


def deflate_sparse_tile(idx: np.ndarray, vals: np.ndarray,
                        n_elems: int) -> bytes:
    """Deflate payload of a tile given its (sorted element index,
    value) sparse representation.  Returns the standard zlib stream
    of the dense ``n_elems``-element array of ``vals.dtype``; for
    genuinely sparse tiles (few merged pieces) the dense histogram
    is never allocated or scanned."""
    import zlib

    isz = vals.dtype.itemsize
    if len(idx) == 0:
        return _deflate_pieces(n_elems * isz, [])
    merge = max(_SPAN_MERGE_BYTES // isz, 1)
    brk = np.flatnonzero(np.diff(idx) > merge)
    if len(brk) + 1 > _MAX_PIECES:
        dense = np.zeros(n_elems, dtype=vals.dtype)
        dense[idx] = vals
        return zlib.compress(dense.tobytes(), 1)
    p0 = np.r_[0, brk + 1]               # piece start POSITIONS in idx
    p1 = np.r_[brk + 1, len(idx)]        # piece end positions
    pieces = []
    for a, b in zip(p0, p1):
        s = int(idx[a])
        e = int(idx[b - 1]) + 1
        seg = np.zeros(e - s, dtype=vals.dtype)
        seg[idx[a:b] - s] = vals[a:b]
        pieces.append((s * isz, seg.tobytes()))
    return _deflate_pieces(n_elems * isz, pieces)


def encode_tile(arr: np.ndarray, codec: str | None = None
                ) -> tuple[bytes, str]:
    """-> (payload, dtype-string) honoring the optional codec."""
    c = np.ascontiguousarray(arr)
    if codec == "deflate":
        import zlib

        dts = f"deflate:{arr.dtype}"
        flat = c.ravel()
        nz = np.flatnonzero(flat)
        if len(nz) <= _SPARSE_FRAC * flat.size:
            return deflate_sparse_tile(nz, flat[nz], flat.size), dts
        return zlib.compress(c.tobytes(), 1), dts
    return c.tobytes(), str(arr.dtype)


def tiles_to_arrays(pdf: pd.DataFrame) -> dict:
    """Decode tile rows -> {(zoom, x, y, band): np.ndarray}."""
    out = {}
    for _, r in pdf.iterrows():
        ts = int(r["tile_size"])
        out[(int(r["zoom"]), int(r["tile_x"]), int(r["tile_y"]),
             int(r["band"]))] = decode_tile(r["data"], r["dtype"], ts)
    return out


def page_density_tiles(
    points: DataFrame, zoom: int, tile_size: int = 256,
    lon: str = "lon", lat: str = "lat",
    num_partitions: int | None = None,
    codec: str | None = None,
) -> DataFrame:
    """Base-zoom page-density raster: count of points per pixel.
    The dense render fuses into the merge kernel (one Python stage
    fewer than densify(sparse_density(...)))."""
    return sparse_density(points, zoom, tile_size, lon, lat,
                          num_partitions, _dense=(tile_size, codec))


def sparse_density(
    points: DataFrame, zoom: int, tile_size: int = 256,
    lon: str = "lon", lat: str = "lat",
    num_partitions: int | None = None,
    _dense: tuple | None = None,
) -> DataFrame:
    """Sparse per-tile histogram: (tile_x, tile_y, idx, cnt) with one
    row per occupied tile.

    ``num_partitions`` sizes the tile shuffle explicitly: the sparse
    rows are tiny but downstream densification inflates ~1000x, so
    AQE's byte-based coalescing would collapse the exchange to one
    task.  An explicit count keeps the render stage wide (and at 100TB
    a caller sizes it to tiles/executor)."""
    n = 1 << zoom
    # global pixel coordinates at this zoom (pixel res = span/tile_size)
    res = geo.tile_span(zoom) / tile_size
    px = F.floor(
        (geo.merc_x(lon) + F.lit(geo.ORIGIN)) / F.lit(res) + F.lit(1e-3)
    )
    py = F.floor(
        (F.lit(geo.ORIGIN) - geo.merc_y(lat)) / F.lit(res) + F.lit(1e-3)
    )
    maxpx = n * tile_size - 1
    px = F.least(F.greatest(px, F.lit(0)), F.lit(maxpx))
    py = F.least(F.greatest(py, F.lit(0)), F.lit(maxpx))
    pix_bits = 2 * int(np.log2(tile_size))
    staged = points.select(
        (
            ((px / tile_size).cast("long") * F.lit(n)
             + (py / tile_size).cast("long")) * F.lit(1 << pix_bits)
            + ((py % tile_size) * tile_size + (px % tile_size)).cast("long")
        ).alias("key")
    )

    nparts = num_partitions or (
        points.sparkSession.sparkContext.defaultParallelism
    )
    n_buckets = nparts * _BUCKETS_PER_PART

    # ---- phase 1: map-side combine (per-partition sparse partials).
    # One np.unique per partition replaces per-point shuffle rows: a
    # hot tile leaves each partition as ONE (idx, cnt) sparse run, so
    # the shuffle is bounded by n_partitions x occupied_tiles — and
    # the runs PACK into one row per destination bucket (r7), so the
    # exchange moves thousands of rows, not one per tile.
    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks: list[np.ndarray] = []
        counts: list[np.ndarray] = []
        for b in batches:
            if len(b) == 0:
                continue
            k, c = np.unique(b["key"].to_numpy(), return_counts=True)
            chunks.append(k)
            counts.append(c)
        if not chunks:
            return
        allk = np.concatenate(chunks)
        allc = np.concatenate(counts)
        order = np.argsort(allk, kind="stable")
        allk, allc = allk[order], allc[order]
        uk, starts = np.unique(allk, return_index=True)
        csum = np.add.reduceat(allc, starts)
        tile = uk >> pix_bits
        pix = (uk & ((1 << pix_bits) - 1)).astype(np.int32)
        tstarts = np.flatnonzero(np.r_[True, tile[1:] != tile[:-1]])
        tends = np.r_[tstarts[1:], len(tile)]
        utile = tile[tstarts]
        yield _pack_frame(
            np.full(len(utile), zoom, dtype=np.int64),
            (utile // n).astype(np.int64),
            (utile % n).astype(np.int64),
            (tends - tstarts).astype(np.int64),
            pix, csum.astype(np.int64), n_buckets)

    packed = staged.mapInPandas(partial, _PACKED_SCHEMA)
    return _merge_packed(packed, nparts, dense=_dense)


def _dense_pdf(b: pd.DataFrame, tile_size: int,
               codec: str | None) -> Iterator[pd.DataFrame]:
    """Sparse (idx, cnt) rows -> dense TILE_SCHEMA frames (shared by
    densify() and the fused merge kernel), yielded in bounded blocks
    so no Arrow column exceeds its 2GB cap."""
    tsts = tile_size * tile_size
    umax = np.iinfo(np.uint32).max
    block = 256
    n = len(b)
    for s in range(0, n, block):
        e = min(s + block, n)
        payloads, dts_s = [], []
        for idx_b, cnt_b in zip(b["idx"].iloc[s:e],
                                b["cnt"].iloc[s:e]):
            idx = np.frombuffer(idx_b, dtype=np.int32)
            vals = np.minimum(
                np.frombuffer(cnt_b, dtype=np.int64), umax
            ).astype(np.uint32)
            if codec == "deflate" and \
                    len(idx) <= _SPARSE_FRAC * tsts:
                # straight from the sparse entries: the dense
                # histogram is never allocated (the zlib zero-scan
                # was the measured pyramid bottleneck)
                payloads.append(deflate_sparse_tile(
                    idx.astype(np.int64), vals, tsts))
                dts_s.append("deflate:uint32")
                continue
            hist = np.zeros(tsts, dtype=np.uint32)
            hist[idx] = vals
            payload, dts = encode_tile(
                hist.reshape(tile_size, tile_size), codec)
            payloads.append(payload)
            dts_s.append(dts)
        yield pd.DataFrame({
            "zoom": b["zoom"].iloc[s:e].to_numpy(),
            "tile_x": b["tile_x"].iloc[s:e].to_numpy(),
            "tile_y": b["tile_y"].iloc[s:e].to_numpy(),
            "band": 1,
            "data": payloads,
            "dtype": dts_s,
            "tile_size": tile_size,
        })


def _merge_sparse(partials: DataFrame, nparts: int,
                  dense: tuple | None = None) -> DataFrame:
    """Stream-merge sparse partials per tile (range partition + sort
    clusters each tile; the mapInPandas iterator merges across
    Arrow-batch boundaries within a partition, avoiding per-group
    pandas overhead on tens of thousands of tiles).  Output stays
    SPARSE: one (idx, cnt) row per tile — unless ``dense=(tile_size,
    codec)``, which densifies INSIDE the same kernel: every distinct
    pandas-UDF stage costs ~0.3-0.5 s fixed on this box (CLAUDE.md
    stage-count lesson), so the render fuses into the merge instead
    of crossing Arrow again."""

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # vectorized per batch: decode every partial, combine into one
        # (tile, pix) key array, unique-reduce, re-slice per tile.  A
        # tile split across batch boundaries is carried forward.
        carry: pd.DataFrame | None = None

        def reduce_frame(b: pd.DataFrame) -> pd.DataFrame:
            idx_list = [np.frombuffer(v, dtype=np.int32)
                        for v in b["idx"]]
            cnt_list = [np.frombuffer(v, dtype=np.int64)
                        for v in b["cnt"]]
            lens = np.fromiter((len(a) for a in idx_list), dtype=np.int64,
                               count=len(idx_list))
            tile_key = ((b["zoom"].to_numpy(np.int64) << 58)
                        + (b["tile_x"].to_numpy(np.int64) << 29)
                        + b["tile_y"].to_numpy(np.int64))
            # per-batch tile ordinals keep the combined key in int64
            # for any zoom (rows arrive tile-sorted, so ordinal order
            # == tile order)
            uniq_tiles, tile_ord = np.unique(tile_key,
                                             return_inverse=True)
            tiles_rep = np.repeat(tile_ord.astype(np.int64), lens)
            alli = (np.concatenate(idx_list) if idx_list
                    else np.zeros(0, np.int32))
            allc = (np.concatenate(cnt_list) if cnt_list
                    else np.zeros(0, np.int64))
            key = tiles_rep * (1 << 18) + alli
            order = np.argsort(key, kind="stable")
            ks = key[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
            uk = ks[starts]
            csum = np.add.reduceat(allc[order], starts) if len(ks) else \
                np.zeros(0, np.int64)
            tile = uniq_tiles[(uk >> 18)]
            pix = (uk & ((1 << 18) - 1)).astype(np.int32)
            tstarts = np.flatnonzero(np.r_[True, tile[1:] != tile[:-1]])
            tends = np.r_[tstarts[1:], len(tile)]
            rows = {"zoom": [], "tile_x": [], "tile_y": [], "idx": [],
                    "cnt": []}
            csum64 = csum.astype(np.int64)
            for s, e in zip(tstarts, tends):
                t = int(tile[s])
                rows["zoom"].append(t >> 58)
                rows["tile_x"].append((t >> 29) & ((1 << 29) - 1))
                rows["tile_y"].append(t & ((1 << 29) - 1))
                rows["idx"].append(pix[s:e].tobytes())
                rows["cnt"].append(csum64[s:e].tobytes())
            return pd.DataFrame(rows)

        for b in batches:
            if carry is not None:
                b = pd.concat([carry, b], ignore_index=True)
                carry = None
            reduced = reduce_frame(b)
            if len(reduced) > 1:
                carry = reduced.iloc[-1:]
                yield reduced.iloc[:-1]
            else:
                carry = reduced if len(reduced) else None
        if carry is not None and len(carry):
            yield carry

    def merge_dense(batches: Iterator[pd.DataFrame]
                    ) -> Iterator[pd.DataFrame]:
        ts, codec = dense
        for sparse_pdf in merge(batches):
            yield from _dense_pdf(sparse_pdf, ts, codec)

    # hash repartition, not range: RangePartitioner runs a sampling
    # job that recomputes the (expensive) partial stage twice; the
    # merge only needs same-tile co-location + in-partition order.
    # Sinks that want globally tile-ordered output (write_tiles) sort
    # at write time.
    shuffled = (
        partials.repartition(nparts, "zoom", "tile_x", "tile_y")
        .sortWithinPartitions("zoom", "tile_x", "tile_y")
    )
    if dense is not None:
        return shuffled.mapInPandas(merge_dense, TILE_SCHEMA)
    return shuffled.mapInPandas(merge, _PARTIAL_SCHEMA)


def sparse_overview(sparse: DataFrame, tile_size: int = 256,
                    num_partitions: int | None = None) -> DataFrame:
    """One pyramid level on the SPARSE representation: parent pixel =
    child global pixel >> 1 (sum reduce).  Shuffles only the sparse
    entries — O(occupied pixels), never O(tiles x tile bytes)."""

    def transform(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            idx_list = [np.frombuffer(v, dtype=np.int32)
                        for v in b["idx"]]
            cnt_list = [np.frombuffer(v, dtype=np.int64)
                        for v in b["cnt"]]
            lens = np.fromiter((len(a) for a in idx_list),
                               dtype=np.int64, count=len(b))
            txs = b["tile_x"].to_numpy(np.int64)
            tys = b["tile_y"].to_numpy(np.int64)
            zms = b["zoom"].to_numpy(np.int64)
            idx = np.concatenate(idx_list).astype(np.int64)
            cnt = np.concatenate(cnt_list)
            px = idx % tile_size + np.repeat(txs % 2, lens) * tile_size
            py = idx // tile_size + np.repeat(tys % 2, lens) * tile_size
            pidx = (py >> 1) * tile_size + (px >> 1)
            ptile = (np.repeat(zms - 1, lens) << 58) \
                + (np.repeat(txs // 2, lens) << 29) \
                + np.repeat(tys // 2, lens)
            uniq_tiles, tile_ord = np.unique(ptile, return_inverse=True)
            key = tile_ord.astype(np.int64) * (1 << 18) + pidx
            order = np.argsort(key, kind="stable")
            ks = key[order]
            st = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
            uk = ks[st]
            csum = np.add.reduceat(cnt[order], st).astype(np.int64)
            tile = uniq_tiles[(uk >> 18)]
            pix = (uk & ((1 << 18) - 1)).astype(np.int32)
            tst = np.flatnonzero(np.r_[True, tile[1:] != tile[:-1]])
            ten = np.r_[tst[1:], len(tile)]
            rows = {"zoom": [], "tile_x": [], "tile_y": [], "idx": [],
                    "cnt": []}
            for s, e in zip(tst, ten):
                t = int(tile[s])
                rows["zoom"].append(t >> 58)
                rows["tile_x"].append((t >> 29) & ((1 << 29) - 1))
                rows["tile_y"].append(t & ((1 << 29) - 1))
                rows["idx"].append(pix[s:e].tobytes())
                rows["cnt"].append(csum[s:e].tobytes())
            if rows["zoom"]:
                yield pd.DataFrame(rows)

    nparts = num_partitions or (
        sparse.sparkSession.sparkContext.defaultParallelism
    )
    return _merge_sparse(sparse.mapInPandas(transform, _PARTIAL_SCHEMA),
                         nparts)


def densify(sparse: DataFrame, zoom: int, tile_size: int = 256,
            codec: str | None = None) -> DataFrame:
    """Sparse (idx, cnt) rows -> dense TILE_SCHEMA rasters (map-side
    only; done at materialization time, never shuffled).  With
    ``codec='deflate'`` the payloads are zlib-compressed (the PNG
    stand-in), cutting Arrow/sink bytes ~100x on sparse tiles."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if "zoom" not in b.columns:
                b = b.assign(zoom=zoom)
            yield from _dense_pdf(b, tile_size, codec)

    return sparse.mapInPandas(kernel, TILE_SCHEMA)


def overview_reduce(tiles: DataFrame, agg: str = "sum") -> DataFrame:
    """One overview level: zoom z -> z-1, 2x2 block reduce.

    ``agg``: 'sum' (counts/density), 'average' (the reference's
    default overview resampling), 'max', 'min' — the overview subset
    of GDALResampleAlg (alg/gdalwarper.h:34-68).
    """

    def _reduce(children: list[tuple[int, int, bytes]], ts: int,
                dts: str):
        dt = np.dtype(dts.split(":")[-1])
        canvas = np.zeros((2 * ts, 2 * ts),
                          dtype=np.float64 if agg == "average" else dt)
        filled = np.zeros((2 * ts, 2 * ts), dtype=bool)
        for cx, cy, data in children:
            sub = decode_tile(data, dts, ts)
            ox, oy = cx % 2, cy % 2
            canvas[oy * ts:(oy + 1) * ts, ox * ts:(ox + 1) * ts] = sub
            filled[oy * ts:(oy + 1) * ts, ox * ts:(ox + 1) * ts] = True
        q = canvas.reshape(ts, 2, ts, 2)
        if agg == "sum":
            out = q.sum(axis=(1, 3))
        elif agg == "average":
            cnt = filled.reshape(ts, 2, ts, 2).sum(axis=(1, 3))
            cnt[cnt == 0] = 1
            out = q.sum(axis=(1, 3)) / cnt
        elif agg == "max":
            out = q.max(axis=(1, 3))
        elif agg == "min":
            out = q.min(axis=(1, 3))
        else:
            raise ValueError(f"unknown overview agg {agg}")
        return out.astype(dt)

    def reduce_stream(batches: Iterator[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
        cur = None
        children: list[tuple[int, int, bytes]] = []
        meta = {}
        out = {"zoom": [], "tile_x": [], "tile_y": [], "band": [],
               "data": [], "dtype": [], "tile_size": []}

        def flush():
            if cur is None:
                return
            ts = meta["ts"]
            dts = meta["dt"]
            arr = _reduce(children, ts, dts)
            out["zoom"].append(meta["zoom"] - 1)
            out["tile_x"].append(cur[0])
            out["tile_y"].append(cur[1])
            out["band"].append(meta["band"])
            out["data"].append(arr.tobytes())
            out["dtype"].append(str(arr.dtype))
            out["tile_size"].append(ts)

        for b in batches:
            for ptx, pty, ts_, dt_, zm, bd, ctx, cty, data in zip(
                b["ptile_x"], b["ptile_y"], b["tile_size"], b["dtype"],
                b["zoom"], b["band"], b["tile_x"], b["tile_y"], b["data"],
            ):
                t = (int(ptx), int(pty))
                if t != cur:
                    flush()
                    cur = t
                    children = []
                    if len(out["zoom"]) >= 64:
                        yield pd.DataFrame(out)
                        for k in out:
                            out[k] = []
                meta = {"ts": int(ts_), "dt": str(dt_),
                        "zoom": int(zm), "band": int(bd)}
                children.append((int(ctx), int(cty), data))
        flush()
        if out["zoom"]:
            yield pd.DataFrame(out)

    parents = tiles.withColumn(
        "ptile_x", (F.col("tile_x") / 2).cast("long")
    ).withColumn("ptile_y", (F.col("tile_y") / 2).cast("long"))
    # hash repartition, NOT repartitionByRange: range partitioning
    # runs a sampling job that recomputes the whole upstream stage
    # (CLAUDE.md lesson); the carry kernel only needs parent keys
    # colocated and contiguous, which hash + within-partition sort
    # provides (children fill disjoint quadrants, so their order
    # within a parent does not affect the reduce)
    nparts = tiles.sparkSession.sparkContext.defaultParallelism
    return (
        parents.repartition(nparts, "ptile_x", "ptile_y")
        .sortWithinPartitions("ptile_x", "ptile_y")
        .mapInPandas(reduce_stream, TILE_SCHEMA)
        .select(*[f.name for f in TILE_SCHEMA.fields])
    )


def sparse_pyramid(
    points: DataFrame, base_zoom: int, min_zoom: int = 0,
    tile_size: int = 256, lon: str = "lon", lat: str = "lat",
    num_partitions: int | None = None,
    _dense: tuple | None = None,
) -> DataFrame:
    """ALL pyramid levels in a single pass: phase 1 derives every
    zoom's (tile, pixel) key from the base-zoom key by bit shifts
    (parent pixel = child pixel >> 1), so the whole pyramid costs ONE
    shuffle of sparse entries instead of one per level.

    This is the engine's improvement over the reference's
    level-by-level overview build (gdalalg_raster_tile.cpp:1552 — a
    sequential dependency chain); the reduction is associative, so
    all levels aggregate concurrently."""
    res = geo.tile_span(base_zoom) / tile_size
    n_base = (1 << base_zoom) * tile_size
    px = F.floor(
        (geo.merc_x(lon) + F.lit(geo.ORIGIN)) / F.lit(res) + F.lit(1e-3)
    )
    py = F.floor(
        (F.lit(geo.ORIGIN) - geo.merc_y(lat)) / F.lit(res) + F.lit(1e-3)
    )
    px = F.least(F.greatest(px, F.lit(0)), F.lit(n_base - 1))
    py = F.least(F.greatest(py, F.lit(0)), F.lit(n_base - 1))
    staged = points.select(
        (px.cast("long") * F.lit(n_base) + py.cast("long")).alias("key")
    )
    pix_bits = 2 * int(np.log2(tile_size))
    log_nb = int(np.log2(n_base))
    nparts = num_partitions or (
        points.sparkSession.sparkContext.defaultParallelism
    )
    n_buckets = nparts * _BUCKETS_PER_PART

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks: list[np.ndarray] = []
        counts: list[np.ndarray] = []
        for b in batches:
            if len(b) == 0:
                continue
            k, c = np.unique(b["key"].to_numpy(), return_counts=True)
            chunks.append(k)
            counts.append(c)
        if not chunks:
            return
        allk = np.concatenate(chunks)
        allc = np.concatenate(counts)
        base_px = allk >> log_nb
        base_py = allk & (n_base - 1)
        zl, txl, tyl, lenl, pixl, cntl = [], [], [], [], [], []
        for z in range(min_zoom, base_zoom + 1):
            shift = base_zoom - z
            zpx = base_px >> shift
            zpy = base_py >> shift
            n = 1 << z
            tkey = ((zpx // tile_size) * n + (zpy // tile_size)) \
                * (1 << pix_bits) \
                + (zpy % tile_size) * tile_size + (zpx % tile_size)
            order = np.argsort(tkey, kind="stable")
            ks = tkey[order]
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
            uk = ks[starts]
            csum = np.add.reduceat(allc[order], starts)
            tile = uk >> pix_bits
            pix = (uk & ((1 << pix_bits) - 1)).astype(np.int32)
            tst = np.flatnonzero(np.r_[True, tile[1:] != tile[:-1]])
            ten = np.r_[tst[1:], len(tile)]
            utile = tile[tst]
            zl.append(np.full(len(utile), z, dtype=np.int64))
            txl.append((utile // n).astype(np.int64))
            tyl.append((utile % n).astype(np.int64))
            lenl.append((ten - tst).astype(np.int64))
            pixl.append(pix)
            cntl.append(csum.astype(np.int64))
        yield _pack_frame(
            np.concatenate(zl), np.concatenate(txl),
            np.concatenate(tyl), np.concatenate(lenl),
            np.concatenate(pixl), np.concatenate(cntl), n_buckets)

    packed = staged.mapInPandas(partial, _PACKED_SCHEMA)
    return _merge_packed(packed, nparts, dense=_dense)


def build_pyramid(points: DataFrame, base_zoom: int, min_zoom: int = 0,
                  tile_size: int = 256, lon: str = "lon", lat: str = "lat",
                  codec: str | None = None) -> DataFrame:
    """Full pyramid: base zoom rendered from points, overview zooms
    aggregated concurrently in the same single-shuffle pass
    (see sparse_pyramid); densified inside the merge kernel (no
    extra Arrow stage)."""
    return sparse_pyramid(points, base_zoom, min_zoom, tile_size,
                          lon, lat, _dense=(tile_size, codec))


def tiles_as_features(tiles: DataFrame, gt: list[float] | None = None,
                      skip_value: float | None = None) -> DataFrame:
    """Explode tiles into per-pixel feature rows — the engine's UDTF
    analog of ``gdal raster as-features``
    (apps/gdalalg_raster_as_features.cpp): one row per pixel with its
    global pixel coords, georeferenced center, and value.

    ``skip_value`` drops pixels of that value (e.g. 0 background) so
    sparse rasters don't explode into mostly-empty rows.
    """
    from pyspark.sql.types import DoubleType, LongType, StructField

    out_schema = StructType([
        StructField("zoom", IntegerType()),
        StructField("band", IntegerType()),
        StructField("px", LongType()),
        StructField("py", LongType()),
        StructField("x", DoubleType()),
        StructField("y", DoubleType()),
        StructField("value", DoubleType()),
    ])
    gt_ = gt

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for _, r in b.iterrows():
                ts = int(r["tile_size"])
                arr = decode_tile(r["data"], r["dtype"], ts) \
                    .astype(np.float64)
                jj, ii = np.mgrid[0:ts, 0:ts]
                keep = np.ones((ts, ts), dtype=bool)
                if skip_value is not None:
                    keep = arr != skip_value
                gx = int(r["tile_x"]) * ts + ii[keep]
                gy = int(r["tile_y"]) * ts + jj[keep]
                if gt_ is not None:
                    wx = gt_[0] + (gx + 0.5) * gt_[1] + (gy + 0.5) * gt_[2]
                    wy = gt_[3] + (gx + 0.5) * gt_[4] + (gy + 0.5) * gt_[5]
                else:
                    wx = gx + 0.5
                    wy = gy + 0.5
                yield pd.DataFrame({
                    "zoom": int(r["zoom"]), "band": int(r["band"]),
                    "px": gx.astype(np.int64),
                    "py": gy.astype(np.int64),
                    "x": wx.astype(np.float64),
                    "y": wy.astype(np.float64),
                    "value": arr[keep],
                })

    return tiles.mapInPandas(kernel, out_schema)


def tile_y_file(tiles: DataFrame, convention: str = "xyz") -> DataFrame:
    """Apply the XYZ/TMS file-name convention
    (gdalalg_raster_tile.cpp:509-514 GetFileY)."""
    if convention == "xyz":
        return tiles.withColumn("file_y", F.col("tile_y"))
    return tiles.withColumn(
        "file_y",
        F.expr("CAST(POWER(2, zoom) AS BIGINT) - 1 - tile_y"),
    )


def tile_blob_frame(tiles: DataFrame, format: str = "png",
                    quality: int = 75) -> DataFrame:
    """TILE_SCHEMA -> DataFrame(zoom, tile_x, tile_y, blob,
    tile_size): the distributed image-encode stage shared by every
    container tile sink (GeoPackage, MBTiles).

    Hash-partition on the tile key + band sort, one mapInPandas
    carry kernel stacks bands and runs the in-repo PNG/JPEG codec —
    the expensive encode never serializes through the driver; only
    finished blobs leave this frame."""
    if format not in ("png", "jpeg"):
        raise ValueError(f"tile blobs must be png or jpeg; got "
                         f"{format!r}")

    from pyspark.sql.types import LongType, StructField

    from gdal_spark.operators.jpeg import encode_jpeg
    from gdal_spark.operators.png import encode_png

    enc = (encode_png if format == "png"
           else lambda img: encode_jpeg(img, quality=quality))
    ok_bands = (1, 3, 4) if format == "png" else (1, 3)

    out_schema = StructType([
        StructField("zoom", IntegerType()),
        StructField("tile_x", LongType()),
        StructField("tile_y", LongType()),
        StructField("blob", BinaryType()),
        StructField("tile_size", IntegerType()),
    ])
    spark = tiles.sparkSession
    par = max(spark.sparkContext.defaultParallelism, 8)
    wt = (tiles.repartition(par, "zoom", "tile_x", "tile_y")
          .sortWithinPartitions("zoom", "tile_x", "tile_y", "band"))

    def encode_kernel(batches: Iterator[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
        cur = None
        chans: list = []
        cur_ts = 0

        def flush(rows):
            if cur is None:
                return
            if len(chans) not in ok_bands:
                raise ValueError(
                    f"{format} tile needs bands in {ok_bands}; "
                    f"got {len(chans)}")
            img = chans[0] if len(chans) == 1 \
                else np.stack(chans, axis=-1)
            rows["zoom"].append(cur[0])
            rows["tile_x"].append(cur[1])
            rows["tile_y"].append(cur[2])
            rows["blob"].append(enc(img))
            rows["tile_size"].append(cur_ts)

        for b in batches:
            rows = {"zoom": [], "tile_x": [], "tile_y": [],
                    "blob": [], "tile_size": []}
            for _, r in b.iterrows():
                key = (int(r["zoom"]), int(r["tile_x"]),
                       int(r["tile_y"]))
                if key != cur:
                    flush(rows)
                    cur = key
                    chans = []
                    cur_ts = int(r["tile_size"])
                arr = decode_tile(r["data"], r["dtype"], cur_ts)
                if arr.dtype != np.uint8:
                    arr = np.clip(np.round(arr.astype(np.float64)),
                                  0, 255).astype(np.uint8)
                chans.append(arr)
            if rows["zoom"]:
                yield pd.DataFrame(rows)
        rows = {"zoom": [], "tile_x": [], "tile_y": [],
                "blob": [], "tile_size": []}
        flush(rows)
        if rows["zoom"]:
            yield pd.DataFrame(rows)

    return wt.mapInPandas(encode_kernel, out_schema)


def bounded_local_stream(df: DataFrame, limit_rows: int = 100_000):
    """Driver-side row iterator for single-writer sinks (SQLite
    containers): materialize the frame ONCE (persist + count),
    ``collect()`` when provably small — ``toLocalIterator`` pays a
    ~0.1 s job launch PER PARTITION, which dominated the GeoPackage
    sink (0.6 s collect vs 4.3 s iterator for 256 tiles, measured) —
    else stream partitions from the cache with bounded driver
    memory.  Returns (iterator, row_count)."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    n = df.count()
    if n <= limit_rows:
        rows = df.collect()
        df.unpersist()
        return iter(rows), n

    def gen():
        try:
            yield from df.toLocalIterator(prefetchPartitions=True)
        finally:
            df.unpersist()

    return gen(), n


def write_tiles(tiles: DataFrame, path: str, convention: str = "xyz",
                mode: str = "overwrite", format: str = "parquet",
                quality: int = 75) -> None:
    """Tile sink.

    format="parquet" (default): zoom=*/... parquet layout (Hive
    scheme, the same layout as apps/gdalalg_vector_partition.cpp).

    format="png" | "jpeg" | "gtiff": real z/x/y.<ext> files (the
    slippy-map layout the reference's tile writer emits,
    apps/gdalalg_raster_tile.cpp:520-545; the png/jpeg/webp format
    option surfaces at :2564-2569) — every tile's bands stack into
    grey/RGB(/RGBA for png) channels, and each executor writes its
    own files (path must be a shared filesystem all executors can
    reach — same contract as the reference writing a local output
    directory).  png/jpeg clip+round values to Byte (the translate
    -ot Byte convention); gtiff keeps the NATIVE dtype and stamps
    each tile with its EPSG:3857 geotransform + GeoKeys, so the
    pyramid doubles as a georeferenced raster dataset.  All three
    codecs are in-repo spec implementations (operators/png.py,
    operators/jpeg.py — baseline JFIF, ``quality`` applies the IJG
    scaling — and operators/gtiff.py — TIFF 6.0 + GeoTIFF 1.1,
    deflate), so output decodes in any client; webp is declared out
    of scope (COVERAGE.md).
    """
    if format == "parquet":
        tile_y_file(tiles, convention).write.partitionBy("zoom") \
            .parquet(path, mode=mode)
        return
    if format not in ("png", "jpeg", "gtiff"):
        raise ValueError(f"unknown tile sink format {format!r}")

    if "://" in str(path):
        # the file branch writes with os.makedirs/open on executors
        # and driver-side shutil.rmtree — a URI-scheme path (hdfs://,
        # s3a://) would silently land on executor-local disks.  The
        # parquet branch goes through Hadoop FS and accepts them.
        raise ValueError(
            f"{format} tile sink needs a plain filesystem path, got "
            f"{path!r} (object-store/HDFS URIs are supported by the "
            f"parquet sink; for {format}, write locally and upload)")

    if mode == "overwrite":
        # match the parquet path's clean-replace semantics: stale
        # z/x/y.png files from a previous (larger) write must not
        # survive and serve mixed pyramids
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    elif mode != "append":
        raise ValueError(f"unknown png sink mode {mode!r}")

    from pyspark.sql.types import LongType, StructField

    from gdal_spark.operators.gtiff import encode_gtiff
    from gdal_spark.operators.jpeg import encode_jpeg
    from gdal_spark.operators.png import encode_png

    if format == "png":
        ext, ok_bands = "png", (1, 3, 4)
        enc = encode_png
    elif format == "jpeg":
        ext, ok_bands = "jpg", (1, 3)
        enc = lambda img: encode_jpeg(img, quality=quality)  # noqa: E731
    else:                       # gtiff: native dtype, georeferenced
        ext, ok_bands = "tif", (1, 2, 3, 4)
        enc = None              # needs the tile key; built in flush

    out_schema = StructType([
        StructField("zoom", IntegerType()),
        StructField("tile_x", IntegerType()),
        StructField("file_y", IntegerType()),
        StructField("nbytes", LongType()),
    ])
    wt = tile_y_file(tiles, convention)
    spark = tiles.sparkSession
    par = max(spark.sparkContext.defaultParallelism, 8)
    # hash-partition by tile key + sort so a tile's bands are
    # adjacent; one mapInPandas with a cross-batch carry writes
    # files (groupBy().applyInPandas would pay ~ms per tile at
    # millions of tiles — CLAUDE.md small-groups lesson)
    wt = wt.repartition(par, "zoom", "tile_x", "file_y") \
        .sortWithinPartitions("zoom", "tile_x", "file_y", "band")

    def write_files(batches: Iterator[pd.DataFrame]
                    ) -> Iterator[pd.DataFrame]:
        import os

        cur = None          # (zoom, tile_x, file_y)
        chans: list = []
        cur_ts = 0

        def flush(rows):
            if cur is None:
                return
            z, tx, fy = cur
            if len(chans) not in ok_bands:
                raise ValueError(
                    f"{format} tile needs bands in {ok_bands}; "
                    f"got {len(chans)}")
            img = chans[0] if len(chans) == 1 \
                else np.stack(chans, axis=-1)
            d = os.path.join(path, str(z), str(tx))
            os.makedirs(d, exist_ok=True)
            if format == "gtiff":
                # native dtype + EPSG:3857 georeferencing derived
                # from the tile key (the reference tile writer's
                # GeoTIFF output path)
                ty = fy if convention == "xyz" \
                    else (1 << z) - 1 - fy
                size = 2.0 * geo.ORIGIN / (1 << z)
                px = size / cur_ts
                gt = (-geo.ORIGIN + tx * size, px, 0.0,
                      geo.ORIGIN - ty * size, 0.0, -px)
                data = encode_gtiff(img, geotransform=gt, epsg=3857)
            else:
                data = enc(img)
            with open(os.path.join(d, f"{fy}.{ext}"), "wb") as fh:
                fh.write(data)
            rows["zoom"].append(z)
            rows["tile_x"].append(tx)
            rows["file_y"].append(fy)
            rows["nbytes"].append(len(data))

        for b in batches:
            rows = {"zoom": [], "tile_x": [], "file_y": [],
                    "nbytes": []}
            for _, r in b.iterrows():
                key = (int(r["zoom"]), int(r["tile_x"]),
                       int(r["file_y"]))
                if key != cur:
                    flush(rows)
                    cur = key
                    chans = []
                    cur_ts = int(r["tile_size"])
                arr = decode_tile(r["data"], r["dtype"], cur_ts)
                if arr.dtype != np.uint8 and format != "gtiff":
                    # png/jpeg are Byte formats (translate -ot Byte
                    # convention); gtiff keeps the native dtype
                    arr = np.clip(np.round(arr.astype(np.float64)),
                                  0, 255).astype(np.uint8)
                chans.append(arr)
            if rows["zoom"]:
                yield pd.DataFrame(rows)
        rows = {"zoom": [], "tile_x": [], "file_y": [], "nbytes": []}
        flush(rows)
        if rows["zoom"]:
            yield pd.DataFrame(rows)

    wt.mapInPandas(write_files, out_schema).count()
