"""WKB codec over packed coordinate arrays — pure numpy, no GEOS.

WKB is the engine's geometry interchange format, as it is the
reference's Arrow interchange format (geometry as WKB binary column,
ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp) and its driver-level codec
(OGRGeometry::importFromWkb ogr/ogrgeometry.cpp:1501, exportToWkb).

Supported: 2-D Point, LineString, Polygon, MultiPoint,
MultiLineString, MultiPolygon, GeometryCollection(v1: of the above),
both byte orders on read, little-endian on write.  Curved types are
out of scope v1 (linearize upstream), mirroring most OGR drivers.

The in-memory representation is *packed coordinate arrays* (the
north-star layout): a geometry is

    rings: list[np.ndarray (n_i, 2) float64]

for polygons (outer ring first per part, holes follow), or a single
(n, 2) array for points/linestrings.
"""

from __future__ import annotations

import struct

import numpy as np

POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

_NAME = {
    POINT: "POINT", LINESTRING: "LINESTRING", POLYGON: "POLYGON",
    MULTIPOINT: "MULTIPOINT", MULTILINESTRING: "MULTILINESTRING",
    MULTIPOLYGON: "MULTIPOLYGON",
}


class Geom:
    """Parsed geometry: ``kind`` (base WKB code) + parts.

    * POINT: parts = [(1,2) array]
    * LINESTRING: parts = [(n,2) array]
    * POLYGON: parts = [rings...] and ``part_offsets`` = [0, n_rings]
    * MULTI*: flattened parts with ``part_offsets`` delimiting members
    """

    __slots__ = ("kind", "parts", "part_offsets")

    def __init__(self, kind: int, parts: list[np.ndarray],
                 part_offsets: list[int] | None = None):
        self.kind = kind
        self.parts = parts
        self.part_offsets = part_offsets or [0, len(parts)]

    def rings(self) -> list[np.ndarray]:
        """All rings (polygon kinds) or coordinate arrays."""
        return self.parts

    def bbox(self) -> tuple[float, float, float, float]:
        allc = np.vstack(self.parts) if self.parts else np.zeros((0, 2))
        if len(allc) == 0:
            return (np.inf, np.inf, -np.inf, -np.inf)
        return (
            float(allc[:, 0].min()), float(allc[:, 1].min()),
            float(allc[:, 0].max()), float(allc[:, 1].max()),
        )


def parse_wkb(buf: bytes) -> Geom:
    geom, _ = _parse(memoryview(buf), 0)
    return geom


def _parse(mv: memoryview, off: int) -> tuple[Geom, int]:
    bo = "<" if mv[off] == 1 else ">"
    (raw_type,) = struct.unpack_from(bo + "I", mv, off + 1)
    off += 5
    # Strip Z/M flags in both ISO (1000/2000/3000 offsets) and
    # EWKB (high-bit) conventions; we read only XY.
    has_z = bool(raw_type & 0x80000000) or (raw_type % 10000) // 1000 in (1, 3)
    has_m = bool(raw_type & 0x40000000) or (raw_type % 10000) // 1000 in (2, 3)
    base = (raw_type & 0x0FFFFFFF) % 1000
    dim = 2 + int(has_z) + int(has_m)

    def read_coords(n: int, o: int) -> tuple[np.ndarray, int]:
        arr = np.frombuffer(mv, dtype=bo + "f8", count=n * dim, offset=o)
        o += n * dim * 8
        c = arr.reshape(n, dim)[:, :2]
        return np.ascontiguousarray(c.astype(np.float64)), o

    if base == POINT:
        c, off = read_coords(1, off)
        return Geom(POINT, [c]), off
    if base == LINESTRING:
        (n,) = struct.unpack_from(bo + "I", mv, off)
        c, off = read_coords(n, off + 4)
        return Geom(LINESTRING, [c]), off
    if base == POLYGON:
        (nr,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(bo + "I", mv, off)
            c, off = read_coords(n, off + 4)
            rings.append(c)
        return Geom(POLYGON, rings), off
    if base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        (ng,) = struct.unpack_from(bo + "I", mv, off)
        off += 4
        parts: list[np.ndarray] = []
        offsets = [0]
        for _ in range(ng):
            sub, off = _parse(mv, off)
            parts.extend(sub.parts)
            offsets.append(len(parts))
        return Geom(base, parts, offsets), off
    raise ValueError(f"unsupported WKB type {raw_type}")


def point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, POINT, x, y)


def linestring_wkb(coords) -> bytes:
    c = np.asarray(coords, dtype=np.float64)
    return struct.pack("<BII", 1, LINESTRING, len(c)) + c.tobytes()


def polygon_wkb(rings) -> bytes:
    out = [struct.pack("<BII", 1, POLYGON, len(rings))]
    for r in rings:
        c = np.asarray(r, dtype=np.float64)
        if len(c) and not np.array_equal(c[0], c[-1]):
            c = np.vstack([c, c[:1]])
        out.append(struct.pack("<I", len(c)))
        out.append(c.tobytes())
    return b"".join(out)


def multipoint_wkb(points) -> bytes:
    """points: iterable of (x, y)."""
    points = list(points)  # the count header needs a materialized len
    out = [struct.pack("<BII", 1, MULTIPOINT, len(points))]
    for p in points:
        out.append(point_wkb(float(p[0]), float(p[1])))
    return b"".join(out)


def multilinestring_wkb(parts) -> bytes:
    out = [struct.pack("<BII", 1, MULTILINESTRING, len(parts))]
    for c in parts:
        out.append(linestring_wkb(c))
    return b"".join(out)


def multipolygon_wkb(polys) -> bytes:
    out = [struct.pack("<BII", 1, MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(polygon_wkb(rings))
    return b"".join(out)


def to_wkt(geom: Geom, ndigits: int | None = 8) -> str:
    """WKT export (OGRGeometry::exportToWkt ogrgeometry.cpp:1968).

    ndigits=None formats via repr (shortest float64 round-trip) —
    the lossless mode drivers use for text interchange.
    """

    if ndigits is None:
        def fmt(c):
            return ",".join(f"{x!r} {y!r}" for x, y in c)
    else:
        def fmt(c):
            return ",".join(
                f"{round(x, ndigits):.{ndigits}f}".rstrip("0").rstrip(".")
                + " "
                + f"{round(y, ndigits):.{ndigits}f}".rstrip("0").rstrip(".")
                for x, y in c
            )

    k = geom.kind
    if k == POINT:
        return f"POINT ({fmt(geom.parts[0])})"
    if k == MULTIPOINT:
        return f"MULTIPOINT ({fmt([a[0] for a in geom.parts])})"
    if k == LINESTRING:
        return f"LINESTRING ({fmt(geom.parts[0])})"
    if k == POLYGON:
        inner = ",".join(f"({fmt(r)})" for r in geom.parts)
        return f"POLYGON ({inner})"
    if k == MULTILINESTRING:
        inner = ",".join(f"({fmt(p)})" for p in geom.parts)
        return f"MULTILINESTRING ({inner})"
    if k == MULTIPOLYGON:
        po = geom.part_offsets
        outs = []
        for i in range(len(po) - 1):
            rings = geom.parts[po[i]:po[i + 1]]
            outs.append("(" + ",".join(f"({fmt(r)})" for r in rings) + ")")
        return f"MULTIPOLYGON ({','.join(outs)})"
    raise ValueError(f"to_wkt: unsupported kind {k}")


# ----------------------------------------------------- WKT import

_WKT_HEAD = None          # compiled lazily (keeps module import light)


def _wkt_tree(s: str, i: int):
    """Parse one parenthesized WKT group starting at s[i] == '('.

    Returns (items, next_index) where each item is either a nested
    group (list) or a coordinate tuple (x, y) — extra Z/M ordinates
    drop (2-D engine, same declaration as the other drivers).
    """
    assert s[i] == "("
    items: list = []
    i += 1
    while True:
        while i < len(s) and s[i].isspace():
            i += 1
        if i >= len(s):
            raise ValueError("unbalanced WKT parentheses")
        if s[i] == "(":
            sub, i = _wkt_tree(s, i)
            items.append(sub)
        elif s[i] == ")":
            return items, i + 1
        else:
            j = i
            while j < len(s) and s[j] not in ",()":
                j += 1
            tok = s[i:j].split()
            if len(tok) < 2:
                raise ValueError(f"bad WKT coordinate {s[i:j]!r}")
            items.append((float(tok[0]), float(tok[1])))
            i = j
        while i < len(s) and s[i].isspace():
            i += 1
        if i < len(s) and s[i] == ",":
            i += 1
        elif i < len(s) and s[i] == ")":
            return items, i + 1


def parse_wkt(s: str) -> Geom | None:
    """WKT import (OGRGeometry::importFromWkt ogrgeometry.cpp) —
    the 6 homogeneous 2-D types; Z/M ordinates drop; EMPTY -> None;
    GEOMETRYCOLLECTION out of scope (homogeneous-WKB engine)."""
    import re
    global _WKT_HEAD
    if _WKT_HEAD is None:
        _WKT_HEAD = re.compile(r"\s*([A-Za-z]+)\s*(ZM|Z|M)?\s*",
                               re.IGNORECASE)
    m = _WKT_HEAD.match(s)
    if m is None or not m.group(1):
        raise ValueError(f"not WKT: {s[:40]!r}")
    name = m.group(1).upper()
    rest = s[m.end():].strip()
    if rest.upper() == "EMPTY":
        return None
    if name == "GEOMETRYCOLLECTION":
        raise ValueError(
            "GEOMETRYCOLLECTION WKT is out of scope (the engine's "
            "WKB model holds homogeneous geometries)")
    tree, _ = _wkt_tree(rest, rest.index("("))

    def arr(coords):
        return np.asarray(coords, dtype=np.float64).reshape(-1, 2)

    if name == "POINT":
        return Geom(POINT, [arr(tree[:1])])
    if name == "LINESTRING":
        return Geom(LINESTRING, [arr(tree)])
    if name == "POLYGON":
        return Geom(POLYGON, [arr(r) for r in tree],
                    [0, len(tree)])
    if name == "MULTIPOINT":
        # both spellings: (1 2,3 4) and ((1 2),(3 4))
        pts = [p if isinstance(p, tuple) else p[0] for p in tree]
        return Geom(MULTIPOINT, [arr([p]) for p in pts])
    if name == "MULTILINESTRING":
        return Geom(MULTILINESTRING, [arr(p) for p in tree])
    if name == "MULTIPOLYGON":
        parts, po = [], [0]
        for poly in tree:
            parts.extend(arr(r) for r in poly)
            po.append(len(parts))
        return Geom(MULTIPOLYGON, parts, po)
    raise ValueError(f"unknown WKT type {name!r}")


def wkt_wkb(s: str | None) -> bytes | None:
    """WKT text -> WKB bytes (None/EMPTY pass through as None)."""
    if s is None:
        return None
    g = parse_wkt(s)
    if g is None:
        return None
    if g.kind == POINT:
        return point_wkb(*g.parts[0][0])
    if g.kind == LINESTRING:
        return linestring_wkb(g.parts[0])
    if g.kind == POLYGON:
        return polygon_wkb(g.parts)
    if g.kind == MULTIPOINT:
        return multipoint_wkb([a[0] for a in g.parts])
    if g.kind == MULTILINESTRING:
        return multilinestring_wkb(g.parts)
    po = g.part_offsets
    return multipolygon_wkb(
        [g.parts[po[i]:po[i + 1]] for i in range(len(po) - 1)])
