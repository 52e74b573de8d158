"""Checkpointed stage pipeline with per-partition lineage + metrics.

The north rule requires every stage to "resume idempotently from
checkpoint with per-partition lineage + metrics".  The reference has
no cluster analog — its resumability is process-level (chunked warp
restarts, apps/gdalalg_raster_tile.cpp spawn jobs); this module is
the distributed rendering:

* each stage writes its output parquet under
  ``{base}/{stage}/data`` via a staging directory + atomic rename,
  so a crashed run never leaves a half-written stage visible;
* a ``manifest.json`` records the stage fingerprint =
  sha256(stage name, params, input manifests' fingerprints) — the
  lineage chain.  On re-run, a stage whose fingerprint matches is
  skipped and its output is read back (idempotent resume); any
  upstream change invalidates every downstream fingerprint;
* per-partition metrics (partition_id, rows, bytes, wall_ms) are
  collected in the same pass with a mapInPandas tap and written to
  ``{base}/{stage}/metrics`` — the queryable lineage/metrics table.

Note: the metric sidecar files assume executors share the checkpoint
filesystem (local mode, NFS, or a fuse-mounted object store).  On a
shared-nothing cluster, point ``base_path`` at a distributed FS —
the tap writes through the same path — or the metrics table is
simply empty while data/manifest resume still works.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _fingerprint(stage: str, params: dict, input_fps: list[str]) -> str:
    payload = json.dumps(
        {"stage": stage, "params": params, "inputs": sorted(input_fps)},
        sort_keys=True, default=str,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


@dataclass
class _Stage:
    name: str
    fn: Callable[..., DataFrame]
    deps: list[str]
    params: dict = field(default_factory=dict)


class Pipeline:
    """A DAG of named stages with checkpointed, resumable outputs.

    >>> p = Pipeline(spark, "/path/ckpt")
    >>> p.stage("pts", lambda spark: ...)
    >>> p.stage("joined", lambda spark, pts: ..., deps=["pts"])
    >>> outputs = p.run()

    ``run()`` executes stages topologically; completed stages with
    matching fingerprints are loaded from their checkpoint, not
    recomputed.
    """

    def __init__(self, spark: SparkSession, base_path: str):
        self.spark = spark
        self.base = base_path
        self.stages: dict[str, _Stage] = {}
        self.executed: list[str] = []   # stages actually computed

    def stage(self, name: str, fn: Callable[..., DataFrame],
              deps: list[str] | None = None,
              params: dict | None = None) -> "Pipeline":
        if name in self.stages:
            raise ValueError(f"duplicate stage {name}")
        self.stages[name] = _Stage(name, fn, deps or [], params or {})
        return self

    # -- paths --

    def _dir(self, stage: str) -> str:
        return os.path.join(self.base, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._dir(stage), "manifest.json")

    def _read_manifest(self, stage: str) -> dict | None:
        try:
            with open(self._manifest_path(stage)) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    # -- execution --

    def run(self) -> dict[str, DataFrame]:
        order = self._topo_order()
        fps: dict[str, str] = {}
        outs: dict[str, DataFrame] = {}
        self.executed = []
        for name in order:
            st = self.stages[name]
            fp = _fingerprint(name, st.params,
                              [fps[d] for d in st.deps])
            fps[name] = fp
            man = self._read_manifest(name)
            data_dir = os.path.join(self._dir(name), "data")
            if man and man.get("fingerprint") == fp \
                    and os.path.isdir(data_dir):
                outs[name] = self.spark.read.parquet(data_dir)
                continue
            inputs = [outs[d] for d in st.deps]
            t0 = time.perf_counter()
            df = st.fn(self.spark, *inputs, **st.params) \
                if st.params else st.fn(self.spark, *inputs)
            self._write_stage(name, df, fp, st, t0)
            outs[name] = self.spark.read.parquet(data_dir)
            self.executed.append(name)
        return outs

    def _write_stage(self, name: str, df: DataFrame, fp: str,
                     st: _Stage, t0: float) -> None:
        stage_dir = self._dir(name)
        staging = stage_dir + ".staging"
        shutil.rmtree(staging, ignore_errors=True)
        os.makedirs(staging, exist_ok=True)

        # metrics tap: same pass, per input partition
        schema = df.schema
        metrics_schema = (
            "partition_id long, rows long, bytes_approx long, wall_ms double"
        )

        def tap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from pyspark import TaskContext

            pid = TaskContext.get().partitionId()
            rows = 0
            nbytes = 0
            start = time.perf_counter()
            for b in batches:
                rows += len(b)
                nbytes += int(b.memory_usage(deep=False).sum())
                yield b
            pd.DataFrame([{
                "partition_id": pid, "rows": rows,
                "bytes_approx": nbytes,
                "wall_ms": (time.perf_counter() - start) * 1e3,
            }]).to_json(
                os.path.join(staging, f"metrics-{pid}.json"),
                orient="records",
            )

        tapped = df.mapInPandas(tap, schema)
        tapped.write.mode("overwrite").parquet(
            os.path.join(staging, "data"))

        # gather per-partition metric sidecars into one table
        metrics = []
        for fn_ in sorted(os.listdir(staging)):
            if fn_.startswith("metrics-"):
                metrics.extend(
                    json.load(open(os.path.join(staging, fn_))))
                os.remove(os.path.join(staging, fn_))
        if metrics:
            self.spark.createDataFrame(
                pd.DataFrame(metrics), metrics_schema
            ).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(staging, "metrics"))

        with open(os.path.join(staging, "manifest.json"), "w") as f:
            json.dump({
                "stage": name,
                "fingerprint": fp,
                "deps": st.deps,
                "params": {k: str(v) for k, v in st.params.items()},
                "wall_s": time.perf_counter() - t0,
                "n_partitions": len(metrics),
                "rows": int(sum(m["rows"] for m in metrics)),
            }, f, indent=2)

        # atomic publish
        shutil.rmtree(stage_dir, ignore_errors=True)
        os.rename(staging, stage_dir)

    def metrics(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(
            os.path.join(self._dir(stage), "metrics"))

    def lineage(self) -> pd.DataFrame:
        rows = []
        for name in self.stages:
            man = self._read_manifest(name)
            if man:
                rows.append(man)
        return pd.DataFrame(rows)

    def _topo_order(self) -> list[str]:
        seen: dict[str, int] = {}
        order: list[str] = []

        def visit(n: str) -> None:
            state = seen.get(n, 0)
            if state == 1:
                raise ValueError(f"cycle at stage {n}")
            if state == 2:
                return
            seen[n] = 1
            for d in self.stages[n].deps:
                if d not in self.stages:
                    raise ValueError(f"unknown dep {d} of {n}")
                visit(d)
            seen[n] = 2
            order.append(n)

        for n in self.stages:
            visit(n)
        return order
