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
