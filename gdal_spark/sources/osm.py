"""OSM PBF driver — the reference's ogr/ogrsf_frmts/osm surface
re-derived from the PUBLIC OSM PBF specification
(wiki.openstreetmap.org/wiki/PBF_Format: BlobHeader/Blob framing,
PrimitiveBlock string table, DenseNodes delta coding, Way ref
deltas, Relation member deltas) and the driver's own default
osmconf.ini (ogr/ogrsf_frmts/osm/data/osmconf.ini: layer field
lists, closed_ways_are_polygons, ignored keys, the z_order
formula).

THE Spark-natural driver: a PBF file is a sequence of independently
decodable blobs, and way/relation geometry assembly — which the
single-node reference solves with a custom on-disk node database
(osm2osm pass) — is literally a distributed JOIN here:

  1. the driver scans ONLY the blob framing (4-byte length + ~32-
     byte BlobHeader per blob, seeking past payloads) to build the
     split index; tasks own blob ranges and decode in parallel;
  2. every element lands in ONE unified frame (kind/id/coords/refs/
     members/tags) — the three layers derive from it;
  3. ways explode their refs, join the node table on id (the ONE
     keyed shuffle the reference's node cache stands in for), and
     reassemble ordered coordinate arrays per way; missing refs
     drop, matching the reference's tolerant resolver;
  4. multipolygon relations join their member ways' assembled
     coords and ring-stitch outer/inner roles per group.

Layers: points / lines / multipolygons / multilinestrings
(other_relations is declared out — GeometryCollection sits outside
the homogeneous-WKB engine).  Old-style multipolygon tag
inheritance (untagged relation takes the outer way's tags) follows
the reference.  .osm XML files read through the engine's byte-range
XML split (node/way/relation cannot self-nest) into the SAME
element frame, so every layer builder is shared.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType,
    MapType, StringType, StructField, StructType,
)

from gdal_spark.sources.mvt import _read_uvarint, _unzz, _walk

# ------------------------------------------------- osmconf defaults

CLOSED_KEYS = {"aeroway", "amenity", "boundary", "building",
               "craft", "geological", "historic", "landuse",
               "leisure", "military", "natural", "office", "place",
               "shop", "sport", "tourism"}
CLOSED_KV = {("highway", "platform"),
             ("public_transport", "platform")}
IGNORE_KEYS = {"created_by", "converted_by", "source", "time",
               "ele", "note", "todo", "fixme", "FIXME"}
UNSIGNIFICANT = {"created_by", "converted_by", "source", "time",
                 "ele", "attribution"}

POINT_FIELDS = ["name", "barrier", "highway", "ref", "address",
                "is_in", "place", "man_made"]
LINE_FIELDS = ["name", "highway", "waterway", "aerialway",
               "barrier", "man_made", "railway"]
MPOLY_FIELDS = ["name", "type", "aeroway", "amenity", "admin_level",
                "barrier", "boundary", "building", "craft",
                "geological", "historic", "land_area", "landuse",
                "leisure", "man_made", "military", "natural",
                "office", "place", "shop", "sport", "tourism"]
MLINE_FIELDS = ["name", "type"]

_Z_ORDER_HW = {"minor": 3, "road": 3, "unclassified": 3,
               "residential": 3, "tertiary_link": 4, "tertiary": 4,
               "secondary_link": 6, "secondary": 6,
               "primary_link": 7, "primary": 7, "trunk_link": 8,
               "trunk": 8, "motorway_link": 9, "motorway": 9}

# --------------------------------------------------- blob framing

def scan_blobs(path: str) -> list[tuple[int, int, str]]:
    """(payload offset, payload size, type) per blob — reads ONLY
    the framing (the split index of the distributed read)."""
    out = []
    with open(path, "rb") as fh:
        while True:
            hdr = fh.read(4)
            if len(hdr) < 4:
                break
            (hlen,) = struct.unpack(">I", hdr)
            bh = fh.read(hlen)
            mv = memoryview(bh)
            btype, datasize = "", 0
            for f, _w, val in _walk(mv, 0, hlen):
                if f == 1:
                    btype = bytes(mv[val[0]:val[1]]).decode()
                elif f == 3:
                    datasize = val
            off = fh.tell()
            out.append((off, datasize, btype))
            fh.seek(off + datasize)
    return out


def _packed(pmv, rng, signed=False) -> np.ndarray:
    out, i = [], rng[0]
    while i < rng[1]:
        v, i = _read_uvarint(pmv, i)
        out.append(_unzz(v) if signed else v)
    return np.asarray(out, dtype=np.int64)


def _decode_block(raw: bytes):
    """One OSMData PrimitiveBlock -> element dicts."""
    pmv = memoryview(raw)
    st: list[str] = []
    groups = []
    gran, lat_off, lon_off = 100, 0, 0
    for f, _w, val in _walk(pmv, 0, len(raw)):
        if f == 1:
            for f2, _w2, v2 in _walk(pmv, *val):
                if f2 == 1:
                    st.append(bytes(pmv[v2[0]:v2[1]])
                              .decode("utf-8"))
        elif f == 2:
            groups.append(val)
        elif f == 17:
            gran = val
        elif f == 19:
            lat_off = val
        elif f == 20:
            lon_off = val

    elements = []
    for grng in groups:
        for f, _w, val in _walk(pmv, *grng):
            if f == 2:                       # DenseNodes
                ids = lats = lons = None
                kv = np.empty(0, dtype=np.int64)
                for f2, _w2, v2 in _walk(pmv, *val):
                    if f2 == 1:
                        ids = np.cumsum(_packed(pmv, v2, True))
                    elif f2 == 8:
                        lats = np.cumsum(_packed(pmv, v2, True))
                    elif f2 == 9:
                        lons = np.cumsum(_packed(pmv, v2, True))
                    elif f2 == 10:
                        kv = _packed(pmv, v2)
                if ids is None:
                    continue
                # kv runs are (k,v)* pairs 0-terminated per node
                tag_runs: list[dict] = []
                cur: dict = {}
                pending: int | None = None
                for v in kv:
                    if pending is not None:
                        cur[st[pending]] = st[v]
                        pending = None
                    elif v == 0:
                        tag_runs.append(cur)
                        cur = {}
                    else:
                        pending = int(v)
                while len(tag_runs) < len(ids):
                    tag_runs.append({})
                for i in range(len(ids)):
                    tags = tag_runs[i]
                    elements.append(
                        (0, int(ids[i]),
                         (lon_off + gran * int(lons[i])) * 1e-9,
                         (lat_off + gran * int(lats[i])) * 1e-9,
                         None, None, None, tags))
            elif f == 1:                     # plain Node
                nid = lat = lon = None
                keys = vals = np.empty(0, dtype=np.int64)
                for f2, _w2, v2 in _walk(pmv, *val):
                    if f2 == 1:
                        nid = _unzz(v2)
                    elif f2 == 2:
                        keys = _packed(pmv, v2)
                    elif f2 == 3:
                        vals = _packed(pmv, v2)
                    elif f2 == 8:
                        lat = _unzz(v2)
                    elif f2 == 9:
                        lon = _unzz(v2)
                tags = {st[k]: st[v] for k, v in zip(keys, vals)}
                elements.append(
                    (0, int(nid),
                     (lon_off + gran * lon) * 1e-9,
                     (lat_off + gran * lat) * 1e-9,
                     None, None, None, tags))
            elif f == 3:                     # Way
                wid = None
                keys = vals = refs = np.empty(0, dtype=np.int64)
                for f2, _w2, v2 in _walk(pmv, *val):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed(pmv, v2)
                    elif f2 == 3:
                        vals = _packed(pmv, v2)
                    elif f2 == 8:
                        refs = np.cumsum(_packed(pmv, v2, True))
                tags = {st[k]: st[v] for k, v in zip(keys, vals)}
                elements.append((1, int(wid), None, None,
                                 [int(r) for r in refs],
                                 None, None, tags))
            elif f == 4:                     # Relation
                rid = None
                keys = vals = roles = memids = types = \
                    np.empty(0, dtype=np.int64)
                for f2, _w2, v2 in _walk(pmv, *val):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        keys = _packed(pmv, v2)
                    elif f2 == 3:
                        vals = _packed(pmv, v2)
                    elif f2 == 8:
                        roles = _packed(pmv, v2)
                    elif f2 == 9:
                        memids = np.cumsum(_packed(pmv, v2, True))
                    elif f2 == 10:
                        types = _packed(pmv, v2)
                tags = {st[k]: st[v] for k, v in zip(keys, vals)}
                elements.append(
                    (2, int(rid), None, None,
                     [int(m) for m in memids],
                     [st[r] for r in roles],
                     [int(t) for t in types], tags))
    return elements


_ELEM_SCHEMA = StructType([
    StructField("kind", IntegerType()),   # 0 node 1 way 2 relation
    StructField("id", LongType()),
    StructField("lon", DoubleType()),
    StructField("lat", DoubleType()),
    StructField("refs", ArrayType(LongType())),
    StructField("roles", ArrayType(StringType())),
    StructField("mtypes", ArrayType(IntegerType())),
    StructField("tags", MapType(StringType(), StringType())),
])


def osm_elements(spark: SparkSession, path: str) -> DataFrame:
    """Unified element frame — one distributed decode pass over the
    blob index."""
    blobs = [(off, size) for off, size, btype in scan_blobs(path)
             if btype == "OSMData"]
    if not blobs:
        return spark.createDataFrame([], _ELEM_SCHEMA)
    pdf = pd.DataFrame(blobs, columns=["off", "size"])

    def decode(batches: Iterator[pd.DataFrame]
               ) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as fh:
            for b in batches:
                rows = []
                for off, size in zip(b["off"], b["size"]):
                    fh.seek(int(off))
                    payload = fh.read(int(size))
                    mv = memoryview(payload)
                    raw = None
                    for f, _w, val in _walk(mv, 0, len(payload)):
                        if f == 1:
                            raw = bytes(mv[val[0]:val[1]])
                        elif f == 3:
                            raw = zlib.decompress(
                                bytes(mv[val[0]:val[1]]))
                    if raw is not None:
                        rows.extend(_decode_block(raw))
                if rows:
                    yield pd.DataFrame(
                        rows, columns=[f.name for f in
                                       _ELEM_SCHEMA.fields])

    par = min(len(blobs), 64)
    return (spark.createDataFrame(pdf).repartition(par)
            .mapInPandas(decode, _ELEM_SCHEMA))


# ------------------------------------------------ layer assembly

def _hstore(tags_col, drop: list[str]):
    """remaining tags as the reference's other_tags hstore string
    ('"k"=>"v",...'), ignoring configured + promoted keys."""
    items = F.map_entries(tags_col)
    kept = F.filter(
        items, lambda e: ~e["key"].isin(drop + sorted(IGNORE_KEYS)))
    return F.when(
        F.size(kept) > 0,
        F.array_join(
            F.transform(kept, lambda e: F.concat(
                F.lit('"'), e["key"], F.lit('"=>"'), e["value"],
                F.lit('"'))), ","))


def _point_wkb_kernel(df: DataFrame, out_fields) -> DataFrame:
    schema = StructType(
        [f for f in df.schema.fields
         if f.name not in ("lon", "lat")]
        + [StructField("geometry", BinaryType())])

    def kern(batches: Iterator[pd.DataFrame]
             ) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            arr = np.empty(n, dtype=[("hdr", "S5"), ("x", "<f8"),
                                     ("y", "<f8")])
            arr["hdr"] = b"\x01\x01\x00\x00\x00"
            arr["x"] = b["lon"].to_numpy()
            arr["y"] = b["lat"].to_numpy()
            raw = arr.tobytes()
            out = b.drop(columns=["lon", "lat"])
            out["geometry"] = [raw[i * 21:(i + 1) * 21]
                               for i in range(n)]
            yield out

    return df.mapInPandas(kern, schema)


def osm_points(elements: DataFrame) -> DataFrame:
    """points layer: nodes with at least one SIGNIFICANT tag."""
    nodes = elements.filter(F.col("kind") == 0)
    sig = F.size(F.filter(
        F.map_keys("tags"),
        lambda k: ~k.isin(sorted(UNSIGNIFICANT)))) > 0
    pts = nodes.filter(F.size(F.map_keys("tags")) > 0).filter(sig)
    cols = [F.col("id").alias("osm_id")] + \
        [F.col("tags")[f].alias(f) for f in POINT_FIELDS] + \
        [_hstore(F.col("tags"), POINT_FIELDS).alias("other_tags"),
         "lon", "lat"]
    return _point_wkb_kernel(pts.select(*cols), POINT_FIELDS)


def _is_area(tags_col, closed_col):
    explicit_no = tags_col["area"] == "no"
    explicit_yes = tags_col["area"] == "yes"
    keys = F.map_keys(tags_col)
    closed_key = F.size(F.filter(
        keys, lambda k: k.isin(sorted(CLOSED_KEYS)))) > 0
    kv = (tags_col["highway"] == "platform") \
        | (tags_col["public_transport"] == "platform")
    return closed_col & ~F.coalesce(explicit_no, F.lit(False)) & (
        F.coalesce(explicit_yes, F.lit(False))
        | closed_key | F.coalesce(kv, F.lit(False)))


_COORD_SCHEMA_FIELDS = [
    StructField("id", LongType()),
    StructField("xs", BinaryType()),      # packed float64 lon
    StructField("ys", BinaryType()),      # packed float64 lat
    StructField("n_pts", IntegerType()),
]


def assemble_way_coords(elements: DataFrame) -> DataFrame:
    """(way id, packed coord arrays) via the node JOIN — the
    distributed stand-in for the reference's node database.
    Missing refs DROP (the reference's tolerant resolver).

    groupBy().applyInPandas pays ~ms per group (CLAUDE.md lesson) —
    ruinous for the many-tiny-ways shape — so the fold is a sorted
    mapInPandas carry over one (id) hash repartition instead: same
    per-way output, cross-batch id carry, bounded task memory."""
    ways = elements.filter(F.col("kind") == 1) \
        .select("id", F.posexplode("refs").alias("pos", "ref"))
    nodes = elements.filter(F.col("kind") == 0) \
        .select(F.col("id").alias("ref"), "lon", "lat")
    joined = ways.join(nodes, "ref")

    schema = StructType(_COORD_SCHEMA_FIELDS)

    def fold_stream(batches) -> "pd.DataFrame":
        cur = None
        xs_c: list = []
        ys_c: list = []
        out = {"id": [], "xs": [], "ys": [], "n_pts": []}

        def flush():
            if cur is None:
                return
            xs = np.asarray(xs_c, np.float64)
            ys = np.asarray(ys_c, np.float64)
            out["id"].append(cur)
            out["xs"].append(xs.tobytes())
            out["ys"].append(ys.tobytes())
            out["n_pts"].append(len(xs))

        for b in batches:
            if not len(b):
                continue
            ids = b["id"].to_numpy()
            lons = b["lon"].to_numpy(np.float64)
            lats = b["lat"].to_numpy(np.float64)
            chg = np.flatnonzero(ids[1:] != ids[:-1]) + 1
            starts = np.concatenate(([0], chg)).tolist()
            ends = np.concatenate((chg, [len(b)])).tolist()
            for s, e in zip(starts, ends):
                wid = int(ids[s])
                if wid != cur:
                    flush()
                    cur = wid
                    xs_c, ys_c = [], []
                xs_c.extend(lons[s:e].tolist())
                ys_c.extend(lats[s:e].tolist())
            if len(out["id"]) >= 4096:
                yield pd.DataFrame(out)
                out = {"id": [], "xs": [], "ys": [], "n_pts": []}
        flush()
        if out["id"]:
            yield pd.DataFrame(out)

    par = elements.sparkSession.sparkContext.defaultParallelism
    return (joined.repartition(par, "id")
            .sortWithinPartitions("id", "pos")
            .mapInPandas(fold_stream, schema))


def _line_wkb(xs: np.ndarray, ys: np.ndarray) -> bytes:
    coords = np.column_stack([xs, ys])
    return (struct.pack("<BII", 1, 2, len(coords))
            + coords.tobytes())


def osm_lines(elements: DataFrame,
              way_coords: DataFrame | None = None) -> DataFrame:
    """lines layer: non-area ways with tags, z_order computed per
    the osmconf formula."""
    ways = elements.filter(F.col("kind") == 1)
    closed = (F.size("refs") >= 2) & \
        (F.element_at("refs", 1) == F.element_at("refs", -1))
    keep = ways.filter(F.size(F.map_keys("tags")) > 0) \
        .filter(~_is_area(F.col("tags"), closed))
    if way_coords is None:
        way_coords = assemble_way_coords(elements)
    t = F.col("tags")
    hw = t["highway"]
    z = F.lit(0)
    for name, rank in _Z_ORDER_HW.items():
        z = F.when(hw == name, rank).otherwise(z)
    z = z + F.when(t["bridge"].isin("yes", "true", "1"), 10) \
        .otherwise(0)
    z = z + F.when(t["tunnel"].isin("yes", "true", "1"), -10) \
        .otherwise(0)
    z = z + F.when(t["railway"].isNotNull(), 5).otherwise(0)
    z = z + F.when(t["layer"].isNotNull(),
                   10 * t["layer"].cast("int")).otherwise(0)
    cols = [F.col("id").alias("osm_id")] + \
        [t[f].alias(f) for f in LINE_FIELDS] + \
        [z.cast("int").alias("z_order"),
         _hstore(t, LINE_FIELDS).alias("other_tags"), "id"]
    tagged = keep.select(*cols)
    joined = tagged.join(way_coords, "id").filter(
        F.col("n_pts") >= 2)

    out_schema = StructType(
        [f for f in joined.schema.fields
         if f.name not in ("id", "xs", "ys", "n_pts")]
        + [StructField("geometry", BinaryType())])

    def kern(batches: Iterator[pd.DataFrame]
             ) -> Iterator[pd.DataFrame]:
        for b in batches:
            geoms = [
                _line_wkb(np.frombuffer(x, np.float64),
                          np.frombuffer(y, np.float64))
                for x, y in zip(b["xs"], b["ys"])]
            out = b.drop(columns=["id", "xs", "ys", "n_pts"])
            out["geometry"] = geoms
            yield out

    return joined.mapInPandas(kern, out_schema)


def _stitch_rings(parts: list[np.ndarray]) -> list[np.ndarray]:
    """Join open way segments into closed rings by endpoint
    matching (the OSM multipolygon assembly rule)."""
    segs = [p for p in parts if len(p) >= 2]
    rings = []
    while segs:
        cur = segs.pop(0)
        while not np.array_equal(cur[0], cur[-1]):
            for i, s in enumerate(segs):
                if np.array_equal(s[0], cur[-1]):
                    cur = np.vstack([cur, s[1:]])
                    segs.pop(i)
                    break
                if np.array_equal(s[-1], cur[-1]):
                    cur = np.vstack([cur, s[::-1][1:]])
                    segs.pop(i)
                    break
            else:
                break                    # unclosable: drop
        if len(cur) >= 4 and np.array_equal(cur[0], cur[-1]):
            rings.append(cur)
    return rings


def osm_multipolygons(elements: DataFrame) -> DataFrame:
    """multipolygons layer: type=multipolygon/boundary relations
    (member ways ring-stitched, outer/inner roles; old-style tag
    inheritance from the outer way) + standalone closed area ways
    (osm_way_id).  Inner rings attach to the outer whose bbox
    contains them."""
    from gdal_spark.geometry.wkb import multipolygon_wkb

    coords = assemble_way_coords(elements)
    ways = elements.filter(F.col("kind") == 1)
    rels = elements.filter(F.col("kind") == 2).filter(
        F.col("tags")["type"].isin("multipolygon", "boundary"))

    # relation members of type way, keyed by way id
    members = rels.select(
        F.col("id").alias("rel_id"), "tags",
        F.posexplode(F.arrays_zip("refs", "roles", "mtypes"))
        .alias("pos", "m")).filter(F.col("m.mtypes") == 1) \
        .select("rel_id", "tags", "pos",
                F.col("m.refs").alias("id"),
                F.col("m.roles").alias("role"))
    member_way_ids = members.select("id").distinct()

    # member ways bring their coords + tags (for inheritance)
    way_tags = ways.select(F.col("id"),
                           F.col("tags").alias("wtags"))
    mem_full = (members.join(coords, "id", "left")
                .join(way_tags, "id", "left"))

    rel_schema = StructType([
        StructField("osm_id", LongType()),
        StructField("tags",
                    MapType(StringType(), StringType())),
        StructField("geometry", BinaryType()),
    ])

    def build_rel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos")
        outers, inners = [], []
        inherit = None
        for _, r in pdf.iterrows():
            if r["xs"] is None:
                continue
            pts = np.column_stack([
                np.frombuffer(r["xs"], np.float64),
                np.frombuffer(r["ys"], np.float64)])
            role = r["role"] or "outer"
            if role == "inner":
                inners.append(pts)
            else:
                outers.append(pts)
                if inherit is None and r["wtags"]:
                    inherit = dict(r["wtags"])
        oring = _stitch_rings(outers)
        iring = _stitch_rings(inners)
        if not oring:
            return pd.DataFrame(
                {f.name: [] for f in rel_schema.fields})
        polys = []
        for o in oring:
            holes = []
            ox0, oy0 = o[:, 0].min(), o[:, 1].min()
            ox1, oy1 = o[:, 0].max(), o[:, 1].max()
            for h in iring:
                if (h[:, 0].min() >= ox0 and h[:, 0].max() <= ox1
                        and h[:, 1].min() >= oy0
                        and h[:, 1].max() <= oy1):
                    holes.append(h)
            polys.append([o] + holes)
        tags = dict(pdf.iloc[0]["tags"] or {})
        # old-style inheritance: only type (+ignored) on the
        # relation -> outer way's tags fill in
        sig = {k: v for k, v in tags.items()
               if k != "type" and k not in IGNORE_KEYS}
        if not sig and inherit:
            for k, v in inherit.items():
                if k not in ("area",) and k not in tags:
                    tags[k] = v
        return pd.DataFrame({
            "osm_id": [int(key[0])],
            "tags": [tags],
            "geometry": [multipolygon_wkb(polys)],
        })

    rel_feats = (mem_full.groupBy("rel_id")
                 .applyInPandas(build_rel, rel_schema))

    # standalone closed area ways NOT consumed by any relation
    closed = (F.size("refs") >= 2) & \
        (F.element_at("refs", 1) == F.element_at("refs", -1))
    area_ways = (ways.filter(F.size(F.map_keys("tags")) > 0)
                 .filter(_is_area(F.col("tags"), closed))
                 .join(member_way_ids, "id", "left_anti")
                 .select("id", "tags")
                 .join(coords, "id")
                 .filter(F.col("n_pts") >= 4))

    sa_schema = StructType([
        StructField("osm_way_id", LongType()),
        StructField("tags",
                    MapType(StringType(), StringType())),
        StructField("geometry", BinaryType()),
    ])

    def build_way(batches: Iterator[pd.DataFrame]
                  ) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            geoms, ids, tags = [], [], []
            for _, r in b.iterrows():
                pts = np.column_stack([
                    np.frombuffer(r["xs"], np.float64),
                    np.frombuffer(r["ys"], np.float64)])
                geoms.append(multipolygon_wkb([[pts]]))
                ids.append(int(r["id"]))
                tags.append(dict(r["tags"]))
            yield pd.DataFrame({"osm_way_id": ids, "tags": tags,
                                "geometry": geoms})

    way_feats = area_ways.mapInPandas(build_way, sa_schema)

    t = F.col("tags")
    rel_out = rel_feats.select(
        F.col("osm_id"),
        F.lit(None).cast("long").alias("osm_way_id"),
        *[t[f].alias(f) for f in MPOLY_FIELDS],
        _hstore(t, MPOLY_FIELDS + ["area"]).alias("other_tags"),
        "geometry")
    way_out = way_feats.select(
        F.lit(None).cast("long").alias("osm_id"),
        F.col("osm_way_id"),
        *[t[f].alias(f) for f in MPOLY_FIELDS],
        _hstore(t, MPOLY_FIELDS + ["area"]).alias("other_tags"),
        "geometry")
    return rel_out.unionByName(way_out)


def osm_multilinestrings(elements: DataFrame) -> DataFrame:
    """multilinestrings layer: type=route relations, member ways
    concatenated as MULTILINESTRING."""
    from gdal_spark.geometry.wkb import multilinestring_wkb

    coords = assemble_way_coords(elements)
    rels = elements.filter(F.col("kind") == 2).filter(
        F.col("tags")["type"] == "route")
    members = rels.select(
        F.col("id").alias("rel_id"), "tags",
        F.posexplode(F.arrays_zip("refs", "roles", "mtypes"))
        .alias("pos", "m")).filter(F.col("m.mtypes") == 1) \
        .select("rel_id", "tags", "pos",
                F.col("m.refs").alias("id"))
    joined = members.join(coords, "id", "left")

    schema = StructType([
        StructField("osm_id", LongType()),
        StructField("tags",
                    MapType(StringType(), StringType())),
        StructField("geometry", BinaryType()),
    ])

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos")
        parts = []
        for _, r in pdf.iterrows():
            if r["xs"] is None:
                continue
            pts = np.column_stack([
                np.frombuffer(r["xs"], np.float64),
                np.frombuffer(r["ys"], np.float64)])
            if len(pts) >= 2:
                parts.append(pts)
        if not parts:
            return pd.DataFrame(
                {f.name: [] for f in schema.fields})
        return pd.DataFrame({
            "osm_id": [int(key[0])],
            "tags": [dict(pdf.iloc[0]["tags"] or {})],
            "geometry": [multilinestring_wkb(parts)],
        })

    feats = joined.groupBy("rel_id").applyInPandas(build, schema)
    t = F.col("tags")
    return feats.select(
        "osm_id", *[t[f].alias(f) for f in MLINE_FIELDS],
        _hstore(t, MLINE_FIELDS).alias("other_tags"), "geometry")


LAYERS = ("points", "lines", "multipolygons", "multilinestrings")


def read_osm(spark: SparkSession, path: str,
             layer: str = "points") -> DataFrame:
    """Open one OSM layer from a .pbf file (reference layer model:
    points/lines/multipolygons/multilinestrings;
    other_relations declared out)."""
    if layer not in LAYERS:
        raise ValueError(
            f"unknown OSM layer {layer!r}; valid: {LAYERS} "
            "(other_relations is declared out — "
            "GeometryCollection)")
    if path.lower().endswith(".osm"):
        elements = osm_elements_xml(spark, path)
    else:
        elements = osm_elements(spark, path)
    if layer == "points":
        return osm_points(elements)
    # way/relation layers scan the element table 3-5 times (tagged
    # ways, the refs explode, the node side of the join, relation
    # members): materialize the decode ONCE instead of re-parsing
    # every pbf blob per scan — the distributed analog of the
    # reference's temp node database, and the same budget (O(file)
    # storage traded against repeated whole-file decodes)
    elements = elements.localCheckpoint()
    if layer == "lines":
        return osm_lines(elements)
    if layer == "multipolygons":
        return osm_multipolygons(elements)
    return osm_multilinestrings(elements)


# ------------------------------------------- fixture-scale writer

def write_osm_pbf(path: str, nodes, ways=(), relations=(),
                  nodes_per_blob: int = 512) -> int:
    """Deterministic fixture synthesis: write nodes/ways as a valid
    OSM PBF (zlib blobs, DenseNodes delta coding, packed way refs).
    Driver-side and fixture-scale BY DESIGN — the reference driver
    is read-only too; this exists so oracle fixtures exercise the
    real distributed DECODE path (one blob per ``nodes_per_blob``
    nodes -> many independent splits).  Returns the blob count.

    nodes: iterable of (id, lon, lat, {tags}); ways: iterable of
    (id, [refs], {tags}); relations: iterable of
    (id, [(role, member_id, mtype)], {tags})."""
    from gdal_spark.sources.mvt import _key, _ld
    from gdal_spark.sources.mvt import _packed as _pk
    from gdal_spark.sources.mvt import _uvarint, _zz

    def blob(btype: str, payload: bytes) -> bytes:
        z = zlib.compress(payload)
        body = _key(2, 0) + _uvarint(len(payload)) + _ld(3, z)
        hdr = _ld(1, btype.encode()) + _key(3, 0) \
            + _uvarint(len(body))
        return struct.pack(">I", len(hdr)) + hdr + body

    def string_table(strings: list[str]) -> bytes:
        return _ld(1, b"".join(_ld(1, s.encode("utf-8"))
                               for s in strings))

    out = []
    out.append(blob("OSMHeader",
                    _ld(4, b"OsmSchema-V0.6")))

    nodes = list(nodes)
    ways = list(ways)
    n_blobs = 1
    for s in range(0, len(nodes), nodes_per_blob):
        chunk = nodes[s:s + nodes_per_blob]
        strings = [""]
        sidx: dict[str, int] = {}

        def sid(t: str) -> int:
            if t not in sidx:
                sidx[t] = len(strings)
                strings.append(t)
            return sidx[t]

        ids, lats, lons, kv = [], [], [], []
        prev_i = prev_la = prev_lo = 0
        for nid, lon, lat, tags in chunk:
            raw_la = int(round(lat * 1e7))
            raw_lo = int(round(lon * 1e7))
            ids.append(nid - prev_i)
            lats.append(raw_la - prev_la)
            lons.append(raw_lo - prev_lo)
            prev_i, prev_la, prev_lo = nid, raw_la, raw_lo
            for k, v in tags.items():
                kv.append(sid(k))
                kv.append(sid(v))
            kv.append(0)
        dense = (_pk(1, [_zz(d) for d in ids])
                 + _pk(8, [_zz(d) for d in lats])
                 + _pk(9, [_zz(d) for d in lons])
                 + (_pk(10, kv) if kv else b""))
        group = _ld(2, dense)
        block = string_table(strings) + _ld(2, group)
        out.append(blob("OSMData", block))
        n_blobs += 1

    if ways:
        strings = [""]
        sidx = {}

        def sid(t: str) -> int:
            if t not in sidx:
                sidx[t] = len(strings)
                strings.append(t)
            return sidx[t]

        wmsgs = b""
        for wid, refs, tags in ways:
            keys = [sid(k) for k in tags]
            vals = [sid(v) for v in tags.values()]
            deltas = []
            prev = 0
            for r in refs:
                deltas.append(_zz(r - prev))
                prev = r
            msg = (_key(1, 0) + _uvarint(wid)
                   + (_pk(2, keys) if keys else b"")
                   + (_pk(3, vals) if vals else b"")
                   + _pk(8, deltas))
            wmsgs += _ld(3, msg)
        block = string_table(strings) + _ld(2, wmsgs)
        out.append(blob("OSMData", block))
        n_blobs += 1

    relations = list(relations)
    if relations:
        strings = [""]
        sidx = {}

        def sid(t: str) -> int:
            if t not in sidx:
                sidx[t] = len(strings)
                strings.append(t)
            return sidx[t]

        rmsgs = b""
        for rid, members, tags in relations:
            keys = [sid(k) for k in tags]
            vals = [sid(v) for v in tags.values()]
            roles = [sid(m[0]) for m in members]
            deltas = []
            prev = 0
            for _role, mid, _mt in members:
                deltas.append(_zz(mid - prev))
                prev = mid
            types = [m[2] for m in members]
            msg = (_key(1, 0) + _uvarint(rid)
                   + (_pk(2, keys) if keys else b"")
                   + (_pk(3, vals) if vals else b"")
                   + (_pk(8, roles) if roles else b"")
                   + _pk(9, deltas) + _pk(10, types))
            rmsgs += _ld(4, msg)
        block = string_table(strings) + _ld(2, rmsgs)
        out.append(blob("OSMData", block))
        n_blobs += 1

    with open(path, "wb") as fh:
        for b in out:
            fh.write(b)
    return n_blobs


# ------------------------------------------------ .osm XML variant

def osm_elements_xml(spark: SparkSession, path: str) -> DataFrame:
    """.osm XML -> the same unified element frame, through the
    engine's byte-range XML split (sources/xmlgeo.py: node/way/
    relation elements cannot self-nest, so tasks own even byte
    ranges with no driver file scan).  One pass per element kind,
    unioned."""
    from gdal_spark.sources.xmlgeo import _range_reader

    def node_rows(pos, el):
        tags = {t.get("k"): t.get("v") for t in el if
                t.tag.rpartition("}")[2] == "tag"}
        return [{"kind": 0, "id": int(el.get("id")),
                 "lon": float(el.get("lon")),
                 "lat": float(el.get("lat")),
                 "refs": None, "roles": None, "mtypes": None,
                 "tags": tags}]

    def way_rows(pos, el):
        refs, tags = [], {}
        for ch in el:
            t = ch.tag.rpartition("}")[2]
            if t == "nd":
                refs.append(int(ch.get("ref")))
            elif t == "tag":
                tags[ch.get("k")] = ch.get("v")
        return [{"kind": 1, "id": int(el.get("id")),
                 "lon": None, "lat": None, "refs": refs,
                 "roles": None, "mtypes": None, "tags": tags}]

    _T = {"node": 0, "way": 1, "relation": 2}

    def rel_rows(pos, el):
        refs, roles, mtypes, tags = [], [], [], {}
        for ch in el:
            t = ch.tag.rpartition("}")[2]
            if t == "member":
                refs.append(int(ch.get("ref")))
                roles.append(ch.get("role") or "")
                mtypes.append(_T.get(ch.get("type"), 0))
            elif t == "tag":
                tags[ch.get("k")] = ch.get("v")
        return [{"kind": 2, "id": int(el.get("id")),
                 "lon": None, "lat": None, "refs": refs,
                 "roles": roles, "mtypes": mtypes, "tags": tags}]

    parts = [
        _range_reader(spark, path, ".osm", b"node", 1 << 22,
                      node_rows, _ELEM_SCHEMA),
        _range_reader(spark, path, ".osm", b"way", 1 << 22,
                      way_rows, _ELEM_SCHEMA),
        _range_reader(spark, path, ".osm", b"relation", 1 << 22,
                      rel_rows, _ELEM_SCHEMA),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
