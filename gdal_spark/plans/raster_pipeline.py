"""gdal-style raster pipeline: ``read ... ! step ... ! write ...``.

Mirrors the reference's raster pipeline surface
(``gdal raster pipeline read ... ! hillshade ... ! write ...``,
apps/gdalalg_raster_pipeline.cpp) over the engine's TILE_SCHEMA
frames, with the same validation rules as the vector pipeline.

Steps (each cites its standalone algorithm):
  read <path|layer>              — tile parquet scan / named layer
  hillshade | slope | aspect | tpi | tri | roughness
                                 — DEM focal ops
                                   (apps/gdalalg_raster_hillshade.cpp
                                   etc. -> operators/dem.focal_tiles)
  calc "<numpy expr in A>"       — pixel function
                                   (apps/gdalalg_raster_calc.cpp)
  scale <mul> <add>              — linear rescale
                                   (apps/gdalalg_raster_scale.cpp)
  resize <w> <h> [alg]           — whole-raster pixel resample
                                   (apps/gdalalg_raster_resize.cpp;
                                   translate -outsize full-window)
  unscale [scale] [offset]       — apply the band's stored
                                   scale/offset (or explicit args)
                                   and clear them
                                   (apps/gdalalg_raster_unscale.cpp)
  edit crs=.. nodata=.. scale=.. metadata K=V
                                 — metadata-only override, no pixel
                                   rewrite (apps/gdalalg_raster_edit.cpp)
  reclassify lo:hi:out[,...] [default]
                                 — range LUT
                                   (apps/gdalalg_raster_reclassify.cpp)
  proximity <target> <max_dist>  — distance raster
                                   (apps/gdalalg_raster_proximity.cpp)
  fill-nodata <nodata> <max_dist> [smoothing_iters]
                                 — (apps/gdalalg_raster_fill_nodata.cpp)
  sieve <threshold>              — (apps/gdalalg_raster_sieve.cpp)
  overview <agg>                 — one 2x reduction level
                                   (apps/gdalalg_raster_overview.cpp)
  polygonize [nodata]            — raster -> vector terminal step
                                   (apps/gdalalg_raster_polygonize.cpp)
  write <path>                   — partitioned tile sink
  tile <path> [png|jpeg|parquet] [xyz|tms]
                                 — z/x/y pyramid sink, real PNG
                                   files by default
                                   (apps/gdalalg_raster_tile.cpp)

``calc`` expressions run vectorized numpy with the current raster
bound to ``A`` — never per-pixel Python.  Every step is a tile-frame
transformation; chains fuse into one Catalyst plan exactly as the
reference streams blocks through its pipeline algorithms.
"""

from __future__ import annotations

import shlex

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def run_raster_pipeline(spark: SparkSession, pipeline: str,
                        layers: dict[str, DataFrame] | None = None,
                        gt: list[float] | None = None
                        ) -> DataFrame | None:
    """Execute a raster pipeline.  ``gt`` (geotransform) is required
    by the polygonize step."""
    from gdal_spark.operators.dem import focal_tiles, raster_calc, \
        reclassify
    from gdal_spark.operators.polygonize import polygonize_tiles
    from gdal_spark.operators.proximity import (
        fillnodata_tiles, proximity_tiles, sieve_tiles,
    )
    from gdal_spark.operators.tiling import overview_reduce, write_tiles

    steps = [s.strip() for s in pipeline.split("!")]
    if not steps or not steps[0].startswith("read"):
        raise ValueError("pipeline must start with a read step")
    writes = [i for i, s in enumerate(steps) if s.startswith("write")]
    if writes and writes != [len(steps) - 1]:
        raise ValueError("write must be the last step")
    for s in steps[1:-1]:
        if s.startswith("read"):
            raise ValueError("read must be the first step")

    focal_ops = {"hillshade", "hillshade-combined",
                 "hillshade-multidirectional", "hillshade-igor",
                 "slope", "aspect", "tpi", "tri", "roughness"}
    df: DataFrame | None = None
    for step in steps:
        argv = shlex.split(step)
        verb, args = argv[0], argv[1:]
        if verb == "read":
            name = args[0]
            if layers and name in layers:
                df = layers[name]
            elif len(args) > 1 and args[1] == "tile_pyramid":
                # read <path> tile_pyramid [xyz|tms]: z/x/y PNG
                # pyramid via the pushdown data source
                from gdal_spark.sources.tile_datasource import (
                    register_tile_source,
                )

                register_tile_source(spark)
                rd = spark.read.format("tile_pyramid") \
                    .option("path", name)
                if len(args) > 2:
                    rd = rd.option("convention", args[2])
                df = rd.load()
            else:
                df = spark.read.parquet(name)
        elif verb in focal_ops:
            # optional gradient algorithm: "slope zt" / "aspect zt"
            df = focal_tiles(df, verb,
                             alg=(args[0] if args else "horn"))
        elif verb == "neighbors":
            # gdal raster neighbors (gdalalg_raster_neighbors.cpp):
            # "neighbors <kernel> [method] [size] [nodata]"
            from gdal_spark.operators.neighbors import neighbors_tiles
            df = neighbors_tiles(
                df, kernel=args[0],
                method=(args[1] if len(args) > 1 and
                        args[1] != "-" else None),
                size=(int(args[2]) if len(args) > 2 else 0),
                nodata=(float(args[3]) if len(args) > 3 else None))
        elif verb == "calc":
            expr = args[0]
            code = compile(expr, "<raster-calc>", "eval")

            def fn(A, _code=code):
                return eval(_code, {"np": np, "A": A})  # noqa: S307
            df = raster_calc({"A": df}, fn)
        elif verb == "scale":
            mul, add = float(args[0]), float(args[1])
            df = raster_calc({"A": df},
                             lambda A, m=mul, a=add: A * m + a)
        elif verb == "unscale":
            # gdal raster unscale (apps/gdalalg_raster_unscale.cpp):
            # value = raw * scale + offset using the band's STORED
            # scale/offset (set here via "edit scale=.. offset=..",
            # Spark column metadata on the data column — the band
            # metadata analog), or explicit "unscale <scale> <off>".
            # The stored scale/offset are cleared afterwards, like
            # the reference unsetting band scale on the output.
            meta = dict(df.schema["data"].metadata or {})
            if args:
                mul, add = float(args[0]), \
                    float(args[1]) if len(args) > 1 else 0.0
            else:
                mul = float(meta.get("scale", 1.0))
                add = float(meta.get("offset", 0.0))
            df = raster_calc({"A": df},
                             lambda A, m=mul, a=add: A * m + a)
            meta.pop("scale", None)
            meta.pop("offset", None)
            df = df.withMetadata("data", meta)
        elif verb == "resize":
            # gdal raster resize (apps/gdalalg_raster_resize.cpp):
            # whole-raster pixel-space resample to <w> x <h> —
            # gdal_translate -outsize with a full-frame window.  The
            # source extent derives from the tile lattice (one
            # bounded metadata agg), so no georeferencing is needed.
            from pyspark.sql import functions as _F

            from gdal_spark.operators.rasterize import GridSpec
            from gdal_spark.operators.warp import translate_tiles

            row = df.agg(
                _F.min("tile_x"), _F.min("tile_y"),
                _F.max("tile_x"), _F.max("tile_y"),
                _F.max("tile_size")).collect()[0]
            if row[0] is None:
                raise ValueError("resize: empty raster frame")
            ts = int(row[4])
            mnx, mny = int(row[0]), int(row[1])
            w_px = (int(row[2]) - mnx + 1) * ts
            h_px = (int(row[3]) - mny + 1) * ts
            # pixel-space grid over the whole tile lattice (world
            # == global pixel coords, y down); the occupied region
            # is the -srcwin
            lat_w = (int(row[2]) + 1) * ts
            lat_h = (int(row[3]) + 1) * ts
            src_grid = GridSpec(0.0, 0.0, 1.0, -1.0, lat_w, lat_h)
            df = translate_tiles(
                df, src_grid, (mnx * ts, mny * ts, w_px, h_px),
                outsize=(int(args[0]), int(args[1])),
                resample=(args[2] if len(args) > 2 else "near"),
                tile_size=ts, crs="PIXEL")
        elif verb == "edit":
            # gdal raster edit (apps/gdalalg_raster_edit.cpp):
            # in-place metadata override, NO pixel rewrite — crs=,
            # nodata=, scale=, offset=, metadata K=V — stored as
            # Spark column metadata on the data column (the band
            # metadata analog; persists into parquet field metadata).
            from gdal_spark.plans.pipeline import _edit_metadata
            df = _edit_metadata(df, args, anchor_col="data")
        elif verb == "select":
            # gdal raster select: "select <b1,b2,...>"
            from gdal_spark.operators.bandops import select_bands
            df = select_bands(df,
                              [int(v) for v in args[0].split(",")])
        elif verb == "set-type":
            from gdal_spark.operators.bandops import set_dtype
            df = set_dtype(df, args[0])
        elif verb == "nodata-to-alpha":
            from gdal_spark.operators.bandops import nodata_to_alpha
            df = nodata_to_alpha(df, float(args[0]))
        elif verb == "stack":
            # gdal raster stack: "stack <layer2> [layer3...]" —
            # current frame's bands first, then each named layer's
            from gdal_spark.operators.bandops import stack_bands
            extra = [layers[name] for name in args]
            df = stack_bands([df] + extra)
        elif verb == "blend":
            # gdal raster blend: "blend <layer> <mode> [opacity]"
            from gdal_spark.operators.bandops import blend_tiles
            df = blend_tiles(
                df, layers[args[0]],
                mode=(args[1] if len(args) > 1 else "src-over"),
                opacity=(float(args[2]) if len(args) > 2
                         else 100.0))
        elif verb == "update":
            # gdal raster update: overlay pixels overwrite the base
            from gdal_spark.operators.dem import mosaic
            df = mosaic([df, layers[args[0]]], rule="last")
        elif verb == "color-map":
            # gdal raster color-map: "color-map v:r:g:b,v:r:g:b,..."
            from gdal_spark.operators.dem import color_relief
            ramp = [tuple(float(x) if i == 0 else int(x)
                          for i, x in enumerate(part.split(":")))
                    for part in args[0].split(",")]
            df = color_relief(df, ramp,
                              interpolate=(len(args) < 2 or
                                           args[1] != "nearest"))
        elif verb == "rgb-to-palette":
            # gdal raster rgb-to-palette (median cut):
            # "rgb-to-palette [n_colors]"
            from gdal_spark.operators.palette import rgb_to_palette
            df, _pal = rgb_to_palette(
                df, n_colors=(int(args[0]) if args else 256))
        elif verb == "reclassify":
            rules = [tuple(float(v) for v in part.split(":"))
                     for part in args[0].split(",")]
            default = float(args[1]) if len(args) > 1 else None
            df = reclassify(df, rules, default=default)
        elif verb == "clean-collar":
            # gdal raster clean-collar (nearblack flood fill):
            # "clean-collar <black|white|v[,v...]> [thr] [set]"
            from gdal_spark.operators.nearblack import (
                clean_collar_tiles,
            )
            spec = args[0] if args else "black"
            named = {"black": [0.0], "white": [255.0]}
            cols = named.get(
                spec, None) or [float(v) for v in spec.split(",")]
            df = clean_collar_tiles(
                df, color=cols,
                threshold=(float(args[1]) if len(args) > 1
                           else 15.0),
                set_value=(float(args[2]) if len(args) > 2
                           else None))
        elif verb == "proximity":
            df = proximity_tiles(df, [float(args[0])],
                                 max_dist=float(args[1]))
        elif verb == "fill-nodata":
            df = fillnodata_tiles(
                df, nodata=float(args[0]), max_dist=float(args[1]),
                smoothing_iterations=(int(args[2]) if len(args) > 2
                                      else 0))
        elif verb == "sieve":
            df = sieve_tiles(df, int(args[0]), gt=gt)
        elif verb == "overview":
            df = overview_reduce(df, agg=(args[0] if args else "sum"))
        elif verb == "polygonize":
            if gt is None:
                raise ValueError("polygonize needs the gt= argument")
            df = polygonize_tiles(
                df, gt, nodata=(float(args[0]) if args else None))
        elif verb == "write":
            write_tiles(df, args[0])
            return None
        elif verb == "tile":
            # gdal raster tile (apps/gdalalg_raster_tile.cpp):
            # terminal z/x/y sink;
            # "tile <path> [png|jpeg|parquet] [xyz|tms]"
            write_tiles(df, args[0],
                        convention=(args[2] if len(args) > 2
                                    else "xyz"),
                        format=(args[1] if len(args) > 1
                                else "png"))
            return None
        else:
            raise ValueError(f"unknown raster pipeline step {verb}")
    return df
