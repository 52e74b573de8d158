"""Deterministic sampling for training-data pipelines.

A 100-TB corpus pipeline samples constantly — quota per language /
quality bucket, fixed-rate holdouts — and it must be DETERMINISTIC
(reruns select the same rows; no RAND() that changes under retry) and
engine-replayable.  Both operators key on a multiplicative integer
hash h(key) = (key * 2654435761) % 2^32 (Knuth's constant): exact
64-bit integer arithmetic, so any engine (DuckDB oracle included)
reproduces the selection bit-for-bit — unlike python's process-salted
hash() (see CLAUDE.md) or Spark's rand(seed), whose stream depends on
partitioning.

Scale shapes: stratified_sample is ONE window shuffle on the group
key; sample_fraction is a map-only filter (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_MIX = 2654435761          # Knuth multiplicative hash constant
_MOD = 2 ** 32


def _h(key_col: str):
    return (F.col(key_col).cast("long") * F.lit(_MIX)) % F.lit(_MOD)


def stratified_sample(df: DataFrame, by: list[str] | str,
                      n_per_group: int,
                      key_col: str = "doc_id") -> DataFrame:
    """Quota sampling: the ``n_per_group`` rows with the smallest
    mixed-hash keys per group — a deterministic uniform draw.  One
    window shuffle on the group key; ties broken by the key itself
    so the result is unique regardless of partitioning."""
    keys = [by] if isinstance(by, str) else list(by)
    w = Window.partitionBy(*keys).orderBy(_h(key_col),
                                          F.col(key_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n_per_group)
            .drop("__rn"))


def sample_fraction(df: DataFrame, fraction: float,
                    key_col: str = "doc_id") -> DataFrame:
    """Fixed-rate deterministic sample: keep rows whose mixed hash
    falls below fraction * 2^32.  Map-only (pure filter, no
    shuffle); the same row set on every rerun and every engine."""
    cut = int(fraction * _MOD)
    return df.filter(_h(key_col) < F.lit(cut))
