"""``gdal dataset copy / rename / delete / identify`` — driver-aware
dataset file management.

Reference: apps/gdalalg_dataset_copy.cpp / _rename.cpp /
_delete.cpp / _identify.cpp, which route through each driver's
GDALCopyDatasetFiles (the point being that a "dataset" is often
SEVERAL files: a shapefile is .shp/.shx/.dbf/.prj/.cpg, a tile
pyramid is a directory tree).  This module re-derives the sidecar
groups for the engine's drivers; everything is metadata-speed
driver-side I/O (there is nothing to distribute in a rename).
"""

from __future__ import annotations

import os
import shutil

# extensions that travel together, keyed by the primary extension
_SIDECARS = {
    ".shp": [".shp", ".shx", ".dbf", ".prj", ".cpg"],
    ".csv": [".csv", ".csvt", ".prj"],
    ".tif": [".tif", ".tfw", ".aux.xml"],
    ".tiff": [".tiff", ".tfw", ".aux.xml"],
}


def dataset_files(path: str) -> list[str]:
    """GetFileList analog: every file belonging to the dataset at
    ``path`` (sidecars included; a directory dataset is returned as
    the directory itself)."""
    if os.path.isdir(path):
        return [path]
    base, ext = os.path.splitext(path)
    exts = _SIDECARS.get(ext.lower())
    if exts is None:
        return [path] if os.path.exists(path) else []
    out = []
    for e in exts:
        for cand in (base + e, base + e.upper()):
            if os.path.exists(cand):
                out.append(cand)
                break
    return out


def _dest_for(src_file: str, src: str, dst: str) -> str:
    sbase, _ = os.path.splitext(src)
    dbase, _ = os.path.splitext(dst)
    return dbase + src_file[len(sbase):]


def dataset_copy(src: str, dst: str, overwrite: bool = False) -> list[str]:
    """gdal dataset copy: copy the dataset INCLUDING sidecars (or a
    whole directory dataset).  Returns the files written."""
    files = dataset_files(src)
    if not files:
        raise FileNotFoundError(src)
    if os.path.exists(dst) and not overwrite:
        raise FileExistsError(f"{dst} exists (pass overwrite=True)")
    written = []
    if os.path.isdir(src):
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
        return [dst]
    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    for f in files:
        d = _dest_for(f, src, dst)
        shutil.copy2(f, d)
        written.append(d)
    return written


def dataset_rename(src: str, dst: str) -> list[str]:
    """gdal dataset rename: move the dataset and every sidecar."""
    files = dataset_files(src)
    if not files:
        raise FileNotFoundError(src)
    if os.path.isdir(src):
        shutil.move(src, dst)
        return [dst]
    moved = []
    for f in files:
        d = _dest_for(f, src, dst)
        shutil.move(f, d)
        moved.append(d)
    return moved


def dataset_delete(path: str) -> int:
    """gdal dataset delete: remove the dataset + sidecars; returns
    the number of filesystem entries removed."""
    files = dataset_files(path)
    if not files:
        raise FileNotFoundError(path)
    n = 0
    for f in files:
        if os.path.isdir(f):
            shutil.rmtree(f)
        else:
            os.remove(f)
        n += 1
    return n


def dataset_identify(path: str, recursive: bool = False
                     ) -> list[dict]:
    """``gdal dataset identify`` (apps/gdalalg_dataset_identify.cpp):
    driver short-name per path — the reference's GDALIdentifyDriver
    loop re-expressed over this engine's probe functions.  Returns
    [{"name": path, "driver": short_name | None}]; ``recursive``
    walks a directory the way the reference's -r flag does."""
    from gdal_spark.sources.registry import sniff_vector_driver

    def probe(p: str) -> str | None:
        if os.path.isdir(p) and (
                os.path.exists(os.path.join(p, ".zarray"))
                or os.path.exists(os.path.join(p, ".zgroup"))):
            return "Zarr"
        if os.path.isfile(p):
            with open(p, "rb") as fh:
                head = fh.read(8)
            if head[:4] in (b"II*\x00", b"MM\x00*") or \
                    head[:4] in (b"II+\x00", b"MM\x00+"):
                return "GTiff"
            if head == b"\x89PNG\r\n\x1a\n":
                return "PNG"
            if head[:3] == b"\xff\xd8\xff":
                return "JPEG"
        try:
            return sniff_vector_driver(p)
        except (ValueError, OSError):
            return None

    targets = [path]
    if recursive and os.path.isdir(path):
        # identified directory datasets stop the walk (the reference
        # doesn't descend into a recognized dataset)
        targets = []
        for root, dirs, files in os.walk(path):
            d = probe(root)
            if d is not None:
                targets.append(root)
                dirs[:] = []
                continue
            targets.extend(os.path.join(root, f) for f in sorted(files))
    return [{"name": t, "driver": probe(t)} for t in targets]


def dataset_check(spark, path: str, driver: str | None = None
                  ) -> dict:
    """``gdal dataset check`` (apps/gdalalg_dataset_check.cpp
    CheckDataset): fully READ the dataset's content — every feature
    through the driver's scan (the reference's ArrowStream walk),
    every tile decoded — and report {"driver", "n_features" |
    "n_tiles", "errors": [...]}.  The read is the engine's normal
    distributed scan, so the integrity pass scales with executors
    exactly like a query over the same dataset."""
    from gdal_spark.sources.registry import (
        open_vector, raster_info, sniff_vector_driver,
    )

    errors: list[str] = []
    # raster container / pyramid first (tile datasets are
    # directories or sqlite files the vector probe would misread)
    try:
        info = raster_info(path)
        is_raster = True
    except Exception:
        info, is_raster = None, False
    if is_raster and (driver is None or driver == info.get("driver")):
        try:
            from gdal_spark.sources.tile_datasource import (
                register_tile_source,
            )

            if os.path.isdir(path):
                register_tile_source(spark)
                tiles = (spark.read.format("tile_pyramid")
                         .option("path", path).load())
                n = tiles.count()
            else:
                n = 1  # single raster file: decoded by raster_info
            return {"driver": info.get("driver"), "n_tiles": int(n),
                    "errors": errors}
        except Exception as exc:  # noqa: BLE001
            errors.append(f"{type(exc).__name__}: {exc}")
            return {"driver": info.get("driver"), "n_tiles": 0,
                    "errors": errors}
    try:
        drv = driver or sniff_vector_driver(path)
        n = open_vector(spark, path, driver=drv).count()
        return {"driver": drv, "n_features": int(n), "errors": errors}
    except Exception as exc:  # noqa: BLE001
        errors.append(f"{type(exc).__name__}: {exc}")
        return {"driver": driver, "n_features": 0, "errors": errors}
