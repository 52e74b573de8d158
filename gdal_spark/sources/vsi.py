"""``gdal vsi list / copy / move / delete / sync`` — virtual
filesystem utilities.

Reference: apps/gdalalg_vsi_list.cpp / _copy.cpp / _move.cpp /
_delete.cpp / _sync.cpp, which route through the VSIFile API so one
command works on /vsis3/, /vsigs/, local paths, ...  The Spark-native
analog of that abstraction is the Hadoop FileSystem API the active
session already carries: the same five verbs here work on any scheme
the cluster's Hadoop configuration knows (file:, hdfs://, s3a://,
gs://, abfss://) — which is exactly how this engine's parquet/tile
datasets address storage.

``gdal vsi sozip`` (seek-optimized zip) is declared OUT of scope
(COVERAGE.md): a zip-member packing format is orthogonal to a
DataFrame engine whose containers are parquet/tile directories.
"""

from __future__ import annotations


def _fs(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def vsi_list(spark, path: str, recursive: bool = False) -> list[dict]:
    """gdal vsi list: [{"name", "size", "is_dir", "mtime_ms"}]."""
    fs, hp, jvm = _fs(spark, path)
    if not fs.exists(hp):
        raise FileNotFoundError(path)
    out = []
    if recursive:
        it = fs.listFiles(hp, True)
        while it.hasNext():
            st = it.next()
            out.append({"name": st.getPath().toString(),
                        "size": int(st.getLen()), "is_dir": False,
                        "mtime_ms": int(st.getModificationTime())})
        return out
    for st in fs.listStatus(hp):
        out.append({"name": st.getPath().toString(),
                    "size": int(st.getLen()),
                    "is_dir": bool(st.isDirectory()),
                    "mtime_ms": int(st.getModificationTime())})
    return out


def vsi_copy(spark, src: str, dst: str,
             overwrite: bool = False) -> None:
    """gdal vsi copy (recursive for directories)."""
    fs_s, hp_s, jvm = _fs(spark, src)
    fs_d, hp_d, _ = _fs(spark, dst)
    util = jvm.org.apache.hadoop.fs.FileUtil
    if not util.copy(fs_s, hp_s, fs_d, hp_d,
                     False,          # deleteSource
                     overwrite,
                     spark._jsc.hadoopConfiguration()):
        raise IOError(f"copy {src} -> {dst} failed")


def vsi_move(spark, src: str, dst: str) -> None:
    """gdal vsi move: rename within one filesystem, else
    copy+delete (the reference's VSIMove does the same)."""
    fs_s, hp_s, jvm = _fs(spark, src)
    fs_d, hp_d, _ = _fs(spark, dst)
    if fs_s.getUri().equals(fs_d.getUri()):
        if not fs_s.rename(hp_s, hp_d):
            raise IOError(f"move {src} -> {dst} failed")
        return
    vsi_copy(spark, src, dst, overwrite=False)
    vsi_delete(spark, src, recursive=True)


def vsi_delete(spark, path: str, recursive: bool = False) -> None:
    """gdal vsi delete [-r]."""
    fs, hp, _ = _fs(spark, path)
    if not fs.exists(hp):
        raise FileNotFoundError(path)
    if not fs.delete(hp, recursive):
        raise IOError(f"delete {path} failed")


def vsi_sync(spark, src: str, dst: str) -> int:
    """gdal vsi sync: one-way mirror src -> dst; a file copies when
    it is absent at dst or its (size, mtime) differ — the
    reference's default strategy (timestamp) with the size check
    VSISync also applies.  Returns the number of files copied."""
    fs_s, _hp_s, jvm = _fs(spark, src)
    fs_d, _hp_d, _ = _fs(spark, dst)
    src_files = vsi_list(spark, src, recursive=True)
    dst_index = {}
    try:
        for e in vsi_list(spark, dst, recursive=True):
            rel = e["name"].split(dst.rstrip("/") + "/", 1)[-1]
            dst_index[rel] = e
    except FileNotFoundError:
        pass
    n = 0
    base = src.rstrip("/") + "/"
    for e in src_files:
        rel = e["name"].split(base, 1)[-1]
        have = dst_index.get(rel)
        if have and have["size"] == e["size"] \
                and have["mtime_ms"] >= e["mtime_ms"]:
            continue
        target = dst.rstrip("/") + "/" + rel
        fs_d.mkdirs(jvm.org.apache.hadoop.fs.Path(
            target.rsplit("/", 1)[0]))
        vsi_copy(spark, e["name"], target, overwrite=True)
        n += 1
    return n
