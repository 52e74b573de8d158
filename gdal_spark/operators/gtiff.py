"""Pure-Python baseline TIFF 6.0 + GeoTIFF codec.

Re-derives the read/write surface of GDAL's flagship GTiff driver
(frmts/gtiff/geotiff.cpp — strip and tile layouts, Compression
NONE/LZW/DEFLATE/PackBits, the horizontal predictor, and the GeoTIFF
georeferencing tags frmts/gtiff/gt_citation.cpp consumes) from the
PUBLIC specs alone: TIFF 6.0 (Adobe, 1992) and OGC GeoTIFF 1.1.
Everything is stdlib struct/zlib + NumPy — no image library.

Supported:
  decode — II/MM byte order; strips or tiles; PlanarConfig chunky;
    Compression 1 (none), 5 (LZW, early-change), 8/32946 (deflate),
    32773 (PackBits); Predictor 2; SampleFormat uint/int/float at
    8/16/32/64 bits; ModelPixelScale+ModelTiepoint -> geotransform;
    GeoKeyDirectory -> EPSG (projected 3072 / geographic 2048).
  encode — little-endian, chunky, strips (default) or 256x256
    tiles, Compression none/deflate/lzw, Predictor 2 for integer
    samples, north-up geotransform + EPSG GeoKeys.

Out of scope (raise with a clear message): BigTIFF, PlanarConfig 2,
JPEG-in-TIFF, sub-byte samples, multi-IFD overview chains (the
pyramid lives as z/x/y levels in this engine, operators/tiling.py).

Golden anchors (tests/test_gtiff.py): the canonical byte.tif decodes
to checksum 4672 with geotransform (440720, 60, 0, 3751320, 0, -60)
and EPSG 26711 (autotest/gcore/tiff_read.py:45), and every
gcore dtype fixture (uint16/int16/uint32/float32/float64/rgbsmall)
decodes to the expected dtype and values.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# TIFF field types -> (struct code, byte size)
_TYPES = {1: ("B", 1), 2: ("c", 1), 3: ("H", 2), 4: ("I", 4),
          5: ("II", 8), 6: ("b", 1), 7: ("B", 1), 8: ("h", 2),
          9: ("i", 4), 10: ("ii", 8), 11: ("f", 4), 12: ("d", 8)}

_T_WIDTH, _T_HEIGHT = 256, 257
_T_BITS, _T_COMP, _T_PHOTO = 258, 259, 262
_T_STRIP_OFF, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_CNT = 273, 277, 278, 279
_T_PLANAR, _T_PREDICTOR = 284, 317
_T_TILE_W, _T_TILE_H, _T_TILE_OFF, _T_TILE_CNT = 322, 323, 324, 325
_T_SAMPLE_FORMAT = 339
_T_PIXEL_SCALE, _T_TIEPOINT, _T_GEO_KEYS = 33550, 33922, 34735

_KEY_MODEL_TYPE, _KEY_RASTER_TYPE = 1024, 1025
_KEY_GEOGRAPHIC_CS, _KEY_PROJECTED_CS = 2048, 3072

_CLEAR, _EOI = 256, 257


# ---------------------------------------------------------------- LZW

def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first codes, 9->12 bit widths with the
    spec's early-change convention (width bumps one code early)."""
    out = bytearray()
    total_bits = len(data) * 8
    bitpos = 0
    width = 9
    table: list[bytes] = []
    prev = -1

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            return _EOI
        byi = bitpos >> 3
        chunk = int.from_bytes(data[byi:byi + 4].ljust(4, b"\0"),
                               "big")
        val = (chunk >> (32 - (bitpos & 7) - width)) \
            & ((1 << width) - 1)
        bitpos += width
        return val

    while True:
        code = read_code()
        if code == _EOI:
            break
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            code = read_code()
            if code == _EOI:
                break
            out += table[code]
            prev = code
            continue
        if prev < 0:
            raise ValueError("LZW stream does not start with Clear")
        if code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        table.append(table[prev] + entry[:1])
        prev = code
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW encoder (matching _lzw_decode's early-change
    width convention)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1   # keep acc a small int

    # phrases keyed by (prefix_code, next_byte) — no byte-string
    # concatenation in the hot loop
    table: dict[tuple[int, int], int] = {}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    cur = -1
    for byte in data:
        if cur < 0:
            cur = byte
            continue
        code = table.get((cur, byte))
        if code is not None:
            cur = code
            continue
        emit(cur, width)
        table[(cur, byte)] = next_code
        next_code += 1
        # the decoder's table lags the encoder's by one entry (it
        # can't build the in-flight code), so to mirror its
        # early-change bump at len(table)==2^w-1 the encoder bumps
        # one add later, at next_code==2^w
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:          # table nearly full: reset
            emit(_CLEAR, width)
            table = {}
            next_code = 258
            width = 9
        cur = byte            # emitted phrase ends before this byte
    if cur >= 0:
        emit(cur, width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:
            out += data[i:i + h + 1]
            i += h + 1
        elif h > 128:
            out += bytes([data[i]]) * (257 - h)
            i += 1
    return bytes(out)


# ------------------------------------------------------------- decode

def _read_ifd(buf: bytes, bo: str, off: int) -> dict[int, tuple]:
    n = struct.unpack_from(bo + "H", buf, off)[0]
    tags: dict[int, tuple] = {}
    for i in range(n):
        base = off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, base)
        if typ not in _TYPES:
            continue
        code, size = _TYPES[typ]
        nbytes = size * cnt * (2 if typ in (5, 10) else 1)
        if typ in (5, 10):       # rationals: cnt pairs
            nbytes = 8 * cnt
        if nbytes <= 4:
            voff = base + 8
        else:
            voff = struct.unpack_from(bo + "I", buf, base + 8)[0]
        if typ == 2:
            vals: tuple = (buf[voff:voff + cnt].split(b"\0")[0],)
        elif typ in (5, 10):
            raw = struct.unpack_from(bo + ("I" if typ == 5 else "i")
                                     * 2 * cnt, buf, voff)
            vals = tuple(raw[2 * k] / (raw[2 * k + 1] or 1)
                         for k in range(cnt))
        else:
            vals = struct.unpack_from(bo + code * cnt, buf, voff)
        tags[tag] = vals
    return tags


def _dtype_for(bits: int, fmt: int, bo: str) -> np.dtype:
    pre = "<" if bo == "<" else ">"
    if fmt == 3:
        if bits == 32:
            return np.dtype(pre + "f4")
        if bits == 64:
            return np.dtype(pre + "f8")
        raise ValueError(f"float TIFF needs 32/64 bits, got {bits}")
    kind = "u" if fmt == 1 else "i"
    if bits not in (8, 16, 32, 64):
        raise ValueError(
            f"sub-byte / {bits}-bit TIFF samples are out of scope")
    return np.dtype(pre + kind + str(bits // 8))


def decode_gtiff(buf: bytes) -> tuple[np.ndarray, dict]:
    """Decode a TIFF byte string -> (array, meta).

    array: (h, w) for one sample/pixel else (h, w, spp), native
    byte order.  meta: {"geotransform": 6-tuple | None,
    "epsg": int | None}.
    """
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF: bad byte-order mark")
    magic = struct.unpack_from(bo + "H", buf, 2)[0]
    if magic == 43:
        raise ValueError("BigTIFF is out of scope")
    if magic != 42:
        raise ValueError(f"not a TIFF: magic {magic}")
    ifd_off = struct.unpack_from(bo + "I", buf, 4)[0]
    tags = _read_ifd(buf, bo, ifd_off)

    w = int(tags[_T_WIDTH][0])
    h = int(tags[_T_HEIGHT][0])
    spp = int(tags.get(_T_SPP, (1,))[0])
    bits_t = tags.get(_T_BITS, (8,) * spp)
    if len(set(bits_t)) != 1:
        raise ValueError(f"mixed BitsPerSample {bits_t}")
    bits = int(bits_t[0])
    comp = int(tags.get(_T_COMP, (1,))[0])
    fmt = int(tags.get(_T_SAMPLE_FORMAT, (1,) * spp)[0])
    planar = int(tags.get(_T_PLANAR, (1,))[0])
    predictor = int(tags.get(_T_PREDICTOR, (1,))[0])
    if planar not in (1, 2):
        raise ValueError(f"bad PlanarConfig {planar}")
    if predictor not in (1, 2):
        raise ValueError(f"Predictor {predictor} is out of scope")
    dt = _dtype_for(bits, fmt, bo)
    itemsize = dt.itemsize

    def decompress(raw: bytes) -> bytes:
        if comp == 1:
            return raw
        if comp in (8, 32946):
            return zlib.decompress(raw)
        if comp == 5:
            return _lzw_decode(raw)
        if comp == 32773:
            return _packbits_decode(raw)
        raise ValueError(
            f"TIFF compression {comp} is out of scope (supported: "
            "none/LZW/deflate/PackBits)")

    # per-block sample count: chunky blocks interleave all samples,
    # planar (PlanarConfig 2) blocks hold one band each, band-major
    bspp = spp if planar == 1 else 1

    def to_block(raw: bytes, bh: int, bw: int) -> np.ndarray:
        a = np.frombuffer(raw, dtype=dt, count=bh * bw * bspp)
        a = a.reshape(bh, bw, bspp)
        if predictor == 2:
            a = np.add.accumulate(a, axis=1, dtype=a.dtype)
        return a

    if _T_TILE_OFF in tags:
        tw = int(tags[_T_TILE_W][0])
        th = int(tags[_T_TILE_H][0])
        offs = tags[_T_TILE_OFF]
        cnts = tags[_T_TILE_CNT]
        ntx = (w + tw - 1) // tw
        nty = (h + th - 1) // th
        per_band = ntx * nty
        arr = np.zeros((nty * th, ntx * tw, spp), dtype=dt)
        for idx in range(len(offs)):
            band, grid = divmod(idx, per_band) if planar == 2 \
                else (0, idx)
            ty, tx = divmod(grid, ntx)
            raw = decompress(buf[offs[idx]:offs[idx] + cnts[idx]])
            blk = to_block(raw, th, tw)
            if planar == 2:
                arr[ty * th:(ty + 1) * th,
                    tx * tw:(tx + 1) * tw, band:band + 1] = blk
            else:
                arr[ty * th:(ty + 1) * th,
                    tx * tw:(tx + 1) * tw] = blk
        arr = arr[:h, :w]
    else:
        offs = tags[_T_STRIP_OFF]
        cnts = tags[_T_STRIP_CNT]
        rps = int(tags.get(_T_ROWS_PER_STRIP, (h,))[0])
        rps = min(rps, h) or h
        per_band = (h + rps - 1) // rps
        arr = np.zeros((h, w, spp), dtype=dt)
        for idx in range(len(offs)):
            band, stripi = divmod(idx, per_band) if planar == 2 \
                else (0, idx)
            r0 = stripi * rps
            bh = min(rps, h - r0)
            raw = decompress(buf[offs[idx]:offs[idx] + cnts[idx]])
            blk = to_block(raw, bh, w)
            if planar == 2:
                arr[r0:r0 + bh, :, band:band + 1] = blk
            else:
                arr[r0:r0 + bh] = blk

    arr = np.ascontiguousarray(arr.astype(dt.newbyteorder("=")))
    if spp == 1:
        arr = arr[:, :, 0]

    meta: dict = {"geotransform": None, "epsg": None}
    if _T_PIXEL_SCALE in tags and _T_TIEPOINT in tags:
        sx, sy = tags[_T_PIXEL_SCALE][0], tags[_T_PIXEL_SCALE][1]
        tp = tags[_T_TIEPOINT]
        # tiepoint (i, j, k, X, Y, Z): raster (i, j) pins model (X, Y)
        ox = tp[3] - tp[0] * sx
        oy = tp[4] + tp[1] * sy
        meta["geotransform"] = (float(ox), float(sx), 0.0,
                                float(oy), 0.0, -float(sy))
    if _T_GEO_KEYS in tags:
        keys = tags[_T_GEO_KEYS]
        nkeys = int(keys[3])
        for k in range(nkeys):
            kid, loc, cnt, val = keys[4 * (k + 1):4 * (k + 2)]
            if loc == 0 and kid in (_KEY_PROJECTED_CS,
                                    _KEY_GEOGRAPHIC_CS):
                if 1024 <= val < 32767:
                    meta["epsg"] = int(val)
                    if kid == _KEY_PROJECTED_CS:
                        break   # projected wins over geographic
    return arr, meta


# ------------------------------------------------------------- encode

def _apply_predictor(a: np.ndarray) -> np.ndarray:
    """Predictor 2 forward: horizontal difference per channel,
    wrapping in the sample dtype ((h, w, spp) in, same out)."""
    d = a.copy()
    d[:, 1:, :] = a[:, 1:, :] - a[:, :-1, :]
    return d


def encode_gtiff(arr: np.ndarray, geotransform=None,
                 epsg: int | None = None,
                 compression: str = "deflate",
                 predictor: bool | None = None,
                 tiled: bool = False, tile_size: int = 256,
                 level: int = 6) -> bytes:
    """Encode (h, w[, spp]) uint8..64/int/float to a little-endian
    baseline (Geo)TIFF.  Lossless for every supported dtype.

    geotransform: GDAL-order 6-tuple (north-up only: gt[2] and
    gt[4] must be 0 — rotated rasters raise).  epsg: written as
    ProjectedCSTypeGeoKey, or GeographicTypeGeoKey for geographic
    codes (4000..4999).  predictor None = auto (on for integer
    samples when compressing).
    """
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3:
        raise ValueError(f"unsupported shape {arr.shape}")
    if a.dtype.kind not in "uif" or a.itemsize not in (1, 2, 4, 8):
        raise ValueError(f"unsupported dtype {a.dtype}")
    if a.dtype.kind == "f" and a.itemsize not in (4, 8):
        raise ValueError(f"unsupported dtype {a.dtype}")
    a = np.ascontiguousarray(a.astype(a.dtype.newbyteorder("<")))
    h, w, spp = a.shape
    bits = a.itemsize * 8
    fmt = {"u": 1, "i": 2, "f": 3}[a.dtype.kind]
    comp_code = {"none": 1, "deflate": 8, "lzw": 5}.get(compression)
    if comp_code is None:
        raise ValueError(f"unknown compression {compression!r} "
                         "(none/deflate/lzw)")
    if predictor is None:
        predictor = comp_code != 1 and a.dtype.kind in "ui"
    if predictor and a.dtype.kind == "f":
        raise ValueError("Predictor 2 needs integer samples")

    def pack_block(block: np.ndarray) -> bytes:
        if predictor:
            block = _apply_predictor(block)
        raw = block.tobytes()
        if comp_code == 8:
            return zlib.compress(raw, level)
        if comp_code == 5:
            return _lzw_encode(raw)
        return raw

    blocks: list[bytes] = []
    if tiled:
        if tile_size % 16:
            raise ValueError("TIFF tile size must be a multiple "
                             "of 16")
        ntx = (w + tile_size - 1) // tile_size
        nty = (h + tile_size - 1) // tile_size
        padded = np.zeros((nty * tile_size, ntx * tile_size, spp),
                          dtype=a.dtype)
        padded[:h, :w] = a
        for ty in range(nty):
            for tx in range(ntx):
                blocks.append(pack_block(
                    padded[ty * tile_size:(ty + 1) * tile_size,
                           tx * tile_size:(tx + 1) * tile_size]))
    else:
        row_bytes = w * spp * a.itemsize
        rps = max(1, min(h, (256 * 1024) // max(row_bytes, 1)))
        for r0 in range(0, h, rps):
            blocks.append(pack_block(a[r0:r0 + rps]))

    # ---- IFD assembly (tag, type, count, values) sorted by tag id
    entries: list[tuple[int, int, int, tuple]] = [
        (_T_WIDTH, 4, 1, (w,)),
        (_T_HEIGHT, 4, 1, (h,)),
        (_T_BITS, 3, spp, (bits,) * spp),
        (_T_COMP, 3, 1, (comp_code,)),
        (_T_PHOTO, 3, 1, (2 if spp >= 3 else 1,)),
        (_T_SPP, 3, 1, (spp,)),
        (_T_PLANAR, 3, 1, (1,)),
        (_T_SAMPLE_FORMAT, 3, spp, (fmt,) * spp),
    ]
    if predictor:
        entries.append((_T_PREDICTOR, 3, 1, (2,)))
    nblk = len(blocks)
    if tiled:
        entries += [(_T_TILE_W, 3, 1, (tile_size,)),
                    (_T_TILE_H, 3, 1, (tile_size,)),
                    (_T_TILE_OFF, 4, nblk, None),
                    (_T_TILE_CNT, 4, nblk,
                     tuple(len(b) for b in blocks))]
    else:
        entries += [(_T_STRIP_OFF, 4, nblk, None),
                    (_T_ROWS_PER_STRIP, 4, 1, (rps,)),
                    (_T_STRIP_CNT, 4, nblk,
                     tuple(len(b) for b in blocks))]
    if geotransform is not None:
        gt = tuple(float(v) for v in geotransform)
        if gt[2] or gt[4]:
            raise ValueError("rotated geotransforms are out of "
                             "scope (north-up only)")
        if gt[5] >= 0:
            raise ValueError("north-up geotransform needs gt[5] < 0")
        entries.append((_T_PIXEL_SCALE, 12, 3, (gt[1], -gt[5], 0.0)))
        entries.append((_T_TIEPOINT, 12, 6,
                        (0.0, 0.0, 0.0, gt[0], gt[3], 0.0)))
    if epsg is not None:
        geographic = 4000 <= epsg <= 4999
        keys = [(_KEY_MODEL_TYPE, 0, 1, 2 if geographic else 1),
                (_KEY_RASTER_TYPE, 0, 1, 1),
                (_KEY_GEOGRAPHIC_CS if geographic
                 else _KEY_PROJECTED_CS, 0, 1, int(epsg))]
        kd = (1, 1, 0, len(keys)) + tuple(
            v for k in keys for v in k)
        entries.append((_T_GEO_KEYS, 3, len(kd), kd))
    entries.sort(key=lambda e: e[0])

    n = len(entries)
    ifd_off = 8
    data_off = ifd_off + 2 + n * 12 + 4
    # lay out out-of-line tag payloads, then block data
    payloads: dict[int, bytes] = {}
    pos = data_off
    for i, (tag, typ, cnt, vals) in enumerate(entries):
        code, size = _TYPES[typ]
        nbytes = size * cnt
        if nbytes > 4:
            if vals is None:
                pos += nbytes       # offsets array, filled below
            else:
                payloads[i] = struct.pack("<" + code * cnt, *vals)
                pos += nbytes
            pos += pos & 1          # word-align
    blk_offs = []
    for b in blocks:
        blk_offs.append(pos)
        pos += len(b) + (len(b) & 1)

    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", n)
    ext = bytearray()
    ext_pos = data_off

    def put_ext(raw: bytes) -> int:
        nonlocal ext_pos
        at = ext_pos
        ext.extend(raw)
        ext_pos += len(raw)
        if ext_pos & 1:
            ext.extend(b"\0")
            ext_pos += 1
        return at

    for i, (tag, typ, cnt, vals) in enumerate(entries):
        code, size = _TYPES[typ]
        if vals is None:            # block offsets
            vals = tuple(blk_offs)
        nbytes = size * cnt
        if nbytes <= 4:
            payload = struct.pack("<" + code * cnt, *vals)
            payload = payload.ljust(4, b"\0")
            out += struct.pack("<HHI", tag, typ, cnt) + payload
        else:
            at = put_ext(struct.pack("<" + code * cnt, *vals))
            out += struct.pack("<HHII", tag, typ, cnt, at)
    out += struct.pack("<I", 0)     # no next IFD
    out += ext
    for b in blocks:
        out += b
        if len(b) & 1:
            out += b"\0"
    return bytes(out)
