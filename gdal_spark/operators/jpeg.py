"""Baseline JPEG codec (encode + decode) in pure NumPy, from the
public spec (ITU-T T.81 / ISO 10918-1; JFIF 1.02 for the color
transform and APP0 header).

Gives ``write_tiles(format="jpeg")`` the second tile format of the
reference's tile sink (apps/gdalalg_raster_tile.cpp emits png/jpeg/
webp asset types, :2564-2569; the reference's JPEG driver wraps
libjpeg, frmts/jpeg/jpgdataset.cpp — this is a from-spec re-derivation
like operators/png.py, NOT a port).

Scope (declared): baseline sequential DCT, 8-bit, grayscale or
YCbCr 4:4:4 (no subsampling), standard Annex-K quantization and
Huffman tables, no restart markers, no progressive mode.  The
decoder reads exactly this profile (plus any other baseline 4:4:4 /
grayscale stream without restart markers).

Vectorization: the 2-D DCT/IDCT run as two 8x8 matrix products over
ALL blocks at once (einsum); only the entropy coding walks blocks in
Python, emitting into a bit accumulator.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# ---------------------------------------------------------------- DCT

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16.0)
_C *= 0.5
_C[0, :] *= 1.0 / np.sqrt(2.0)
# forward: F = C @ B @ C.T ; inverse: B = C.T @ F @ C


def _dct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ij,njk,lk->nil", _C, blocks, _C, optimize=True)


def _idct2(blocks: np.ndarray) -> np.ndarray:
    return np.einsum("ji,njk,kl->nil", _C, blocks, _C, optimize=True)


# ------------------------------------------------- tables (Annex K)

_QL = np.array([  # K.1 luminance
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int32)

_QC = np.array([  # K.2 chrominance
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.int32)

_ZIG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])
_UNZIG = np.argsort(_ZIG)

# Annex K.3 typical Huffman tables: (BITS counts per length 1..16,
# HUFFVAL symbol list)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _huff_codes(bits, vals):
    """symbol -> (code, length) from the BITS/HUFFVAL spec (C.2)."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


_ENC_DC_L = _huff_codes(*_DC_L)
_ENC_DC_C = _huff_codes(*_DC_C)
_ENC_AC_L = _huff_codes(*_AC_L)
_ENC_AC_C = _huff_codes(*_AC_C)


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (public libjpeg convention)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = (q * s + 50) // 100
    return np.clip(out, 1, 255).astype(np.int32)


class _BitWriter:
    __slots__ = ("acc", "nbits", "out")

    def __init__(self):
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:           # byte stuffing (B.1.1.5)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)   # pad with 1s


def _magnitude(v: int) -> tuple[int, int]:
    """(category SSSS, value bits) per F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _encode_block(bw: _BitWriter, blk: np.ndarray, prev_dc: int,
                  dc_tab: dict, ac_tab: dict) -> int:
    """Entropy-code ONE zigzag block (F.1.2); returns its DC for the
    caller's predictor.  Shared by the grayscale per-component scan
    and the interleaved color MCU scan."""
    diff = int(blk[0]) - prev_dc
    s, bits = _magnitude(diff)
    c, ln = dc_tab[s]
    bw.put(c, ln)
    if s:
        bw.put(bits, s)
    nz = np.nonzero(blk[1:])[0]
    pos = 0
    for idx in nz:
        run = int(idx) - pos
        pos = int(idx) + 1
        while run >= 16:
            c, ln = ac_tab[0xF0]            # ZRL
            bw.put(c, ln)
            run -= 16
        v = int(blk[1 + idx])
        s, bits = _magnitude(v)
        c, ln = ac_tab[(run << 4) | s]
        bw.put(c, ln)
        bw.put(bits, s)
    if pos < 63:
        c, ln = ac_tab[0x00]                # EOB
        bw.put(c, ln)
    return int(blk[0])


def _encode_component(bw: _BitWriter, coefs: np.ndarray,
                      dc_tab: dict, ac_tab: dict) -> None:
    """coefs: (nblocks, 64) zigzag-ordered quantized ints."""
    prev_dc = 0
    for blk in coefs:
        prev_dc = _encode_block(bw, blk, prev_dc, dc_tab, ac_tab)


def _blocks_of(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad to 8-multiples by edge replication (B.2.3 recommends
    replication so padding adds no ringing), return (nblocks,8,8)."""
    h, w = plane.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    p = np.pad(plane.astype(np.float64), ((0, H - h), (0, W - w)),
               mode="edge")
    b = (p.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3)
         .reshape(-1, 8, 8))
    return b, H // 8, W // 8


def _rgb_to_ycc(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycc_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def encode_jpeg(arr: np.ndarray, quality: int = 75) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF
    bytes (4:4:4, Annex-K tables scaled by IJG quality)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError(f"jpeg encodes uint8, got {arr.dtype}")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expected (h,w) gray or (h,w,3) RGB")
    h, w = arr.shape[:2]
    ql = _quality_scale(_QL, quality)
    qc = _quality_scale(_QC, quality)

    planes = [arr.astype(np.float64)] if gray else \
        [p for p in np.moveaxis(_rgb_to_ycc(arr), -1, 0)]
    qtabs = [ql] if gray else [ql, qc, qc]
    coefs = []
    for plane, qt in zip(planes, qtabs):
        blocks, _, _ = _blocks_of(plane)
        f = _dct2(blocks - 128.0)
        qz = np.round(f / qt[None, :, :]).astype(np.int64)
        coefs.append(qz.reshape(-1, 64)[:, _ZIG])

    out = bytearray()
    out += b"\xFF\xD8"                                  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" \
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    # DQT
    for tid, qt in enumerate([ql] if gray else [ql, qc]):
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(v) for v in qt.flatten()[_ZIG])
    # SOF0
    ncomp = 1 if gray else 3
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8,
                                     h, w, ncomp)
    for ci in range(ncomp):
        # 4:4:4 — every component 1x1 sampling
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    # DHT
    tabs = [(_DC_L, 0x00), (_AC_L, 0x10)] if gray else \
        [(_DC_L, 0x00), (_AC_L, 0x10), (_DC_C, 0x01), (_AC_C, 0x11)]
    for (bits, vals), tclass in tabs:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals))
        out += bytes([tclass]) + bytes(bits) + bytes(vals)
    # SOS
    out += b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += bytes([0, 63, 0])

    bw = _BitWriter()
    if gray:
        _encode_component(bw, coefs[0], _ENC_DC_L, _ENC_AC_L)
    else:
        # 4:4:4 interleaved MCU = one block per component
        n = len(coefs[0])
        prev = [0, 0, 0]
        dc_tabs = [_ENC_DC_L, _ENC_DC_C, _ENC_DC_C]
        ac_tabs = [_ENC_AC_L, _ENC_AC_C, _ENC_AC_C]
        for bi in range(n):
            for ci in range(3):
                prev[ci] = _encode_block(bw, coefs[ci][bi], prev[ci],
                                         dc_tabs[ci], ac_tabs[ci])
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"                                  # EOI
    return bytes(out)


# ------------------------------------------------------------ decode


class _BitReader:
    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1       # stuffed
            else:
                raise ValueError("unexpected marker in entropy data")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decoder(bits, vals):
    """(code, length) -> symbol lookup dict."""
    dec = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            dec[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return dec


def _read_symbol(br: _BitReader, dec: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.bit()
        s = dec.get((ln, code))
        if s is not None:
            return s
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(buf: bytes) -> np.ndarray:
    """Baseline 4:4:4 / grayscale JFIF -> uint8 (h, w) or (h, w, 3)."""
    if buf[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[int, dict] = {}
    comps = []  # (id, qtab_id)
    h = w = 0
    scan_comps = []
    while pos < len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("marker expected")
        m = buf[pos + 1]
        pos += 2
        if m == 0xD9:
            break
        ln = struct.unpack(">H", buf[pos:pos + 2])[0]
        seg = buf[pos + 2:pos + ln]
        if m == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                q = np.array(list(seg[p + 1:p + 65]),
                             dtype=np.int32)[_UNZIG].reshape(8, 8)
                qtabs[tq] = q
                p += 65
        elif m == 0xC0:
            _, hh, ww, nc = struct.unpack(">BHHB", seg[:6])
            h, w = hh, ww
            p = 6
            for _ in range(nc):
                cid, samp, tq = seg[p], seg[p + 1], seg[p + 2]
                if samp != 0x11:
                    raise ValueError("only 4:4:4 sampling supported")
                comps.append((cid, tq))
                p += 3
        elif m in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline SOF0 supported")
        elif m == 0xC4:
            p = 0
            while p < len(seg):
                tc = seg[p]
                bits = list(seg[p + 1:p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17:p + 17 + nv])
                htabs[tc] = _huff_decoder(bits, vals)
                p += 17 + nv
        elif m == 0xDD:
            raise ValueError("restart markers unsupported")
        elif m == 0xDA:
            ns = seg[0]
            p = 1
            for _ in range(ns):
                cid, tt = seg[p], seg[p + 1]
                scan_comps.append((cid, tt >> 4, tt & 15))
                p += 2
            pos += ln
            break
        pos += ln
    if not comps or not scan_comps:
        raise ValueError("missing SOF/SOS")

    br = _BitReader(buf[pos:])
    nbx = (w + 7) // 8
    nby = (h + 7) // 8
    nmcu = nbx * nby
    ncomp = len(comps)
    qt_of = {cid: qtabs[tq] for cid, tq in comps}
    out_coefs = [np.zeros((nmcu, 64), dtype=np.int64)
                 for _ in range(ncomp)]
    prev = [0] * ncomp
    for bi in range(nmcu):
        for ci, (cid, tdc, tac) in enumerate(scan_comps):
            dc_dec = htabs[tdc]
            ac_dec = htabs[0x10 | tac]
            s = _read_symbol(br, dc_dec)
            diff = _extend(br.bits(s), s) if s else 0
            prev[ci] += diff
            blk = out_coefs[ci][bi]
            blk[0] = prev[ci]
            kk = 1
            while kk < 64:
                rs = _read_symbol(br, ac_dec)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r == 15:
                        kk += 16
                        continue
                    break               # EOB
                kk += r
                blk[kk] = _extend(br.bits(s), s)
                kk += 1

    planes = []
    for ci, (cid, tq) in enumerate(comps):
        qt = qt_of[cid].astype(np.float64)
        z = out_coefs[ci][:, _UNZIG].reshape(-1, 8, 8)
        sp = _idct2(z * qt[None, :, :]) + 128.0
        full = (sp.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3)
                .reshape(nby * 8, nbx * 8))
        planes.append(full[:h, :w])
    if ncomp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    return np.clip(np.round(_ycc_to_rgb(ycc)), 0, 255).astype(np.uint8)
