"""Deterministic sampling + Gopher repetition metrics."""

import numpy as np
import pandas as pd

from gdal_spark.functions.text import repetition_stats
from gdal_spark.operators.sampling import (
    sample_fraction, stratified_sample,
)


def _docs(spark, n=200):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "grp": [f"g{i % 4}" for i in range(n)],
        "text": [f"doc {i}" for i in range(n)],
    }))


def test_stratified_sample_quota_and_determinism(spark):
    df = _docs(spark)
    a = stratified_sample(df, "grp", 5).toPandas()
    b = stratified_sample(df.repartition(7), "grp", 5).toPandas()
    assert len(a) == 20
    assert a.groupby("grp").size().tolist() == [5, 5, 5, 5]
    # identical selection regardless of partitioning
    assert sorted(a["doc_id"]) == sorted(b["doc_id"])
    # quota larger than the stratum returns the whole stratum
    small = stratified_sample(df.filter("doc_id < 6"), "grp", 5)
    assert small.count() == 6


def test_sample_fraction_rate_and_stability(spark):
    df = _docs(spark, 2000)
    s = sample_fraction(df, 0.25, key_col="doc_id")
    n = s.count()
    assert abs(n / 2000 - 0.25) < 0.05          # uniform-ish
    assert s.count() == n                        # rerun identical
    # subset property: a higher rate contains the lower rate
    hi = set(r["doc_id"] for r in
             sample_fraction(df, 0.5).select("doc_id").collect())
    lo = set(r["doc_id"] for r in
             s.select("doc_id").collect())
    assert lo <= hi


def test_repetition_stats_known_doc(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.array([1, 2], dtype=np.int64),
        "text": ["the cat the cat sat on the cat",
                 "one word only here"],
    }))
    got = (repetition_stats(df, n=2).orderBy("doc_id")
           .toPandas().set_index("doc_id"))
    # "the cat" occurs 3x in 8 words; chars: "thecat"=6, total=23
    assert got.loc[1, "top_gram"] == "the cat"
    assert int(got.loc[1, "top_count"]) == 3
    assert abs(got.loc[1, "top_frac"] - round(18 / 23, 6)) < 1e-9
    assert abs(got.loc[1, "dup_frac"] - round(18 / 23, 6)) < 1e-9
    # all-unique grams: top_count 1, dup_frac 0
    assert int(got.loc[2, "top_count"]) == 1
    assert got.loc[2, "dup_frac"] == 0.0


def test_repetition_stats_short_doc_empty(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.array([1], dtype=np.int64),
        "text": ["single"],
    }))
    assert repetition_stats(df, n=2).count() == 0


def test_decontaminate_flags_and_drops(spark):
    from gdal_spark.functions.text import decontaminate

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi")                 # 14 words
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.array([1, 2, 3], dtype=np.int64),
        "text": [base + " omicron",                  # shares 13-gram
                 "totally different words " * 5,
                 base],                              # the eval doc
    }))
    eval_df = df.filter("doc_id = 3")
    got = (decontaminate(df, eval_df, n=13).orderBy("doc_id")
           .toPandas().set_index("doc_id"))
    assert bool(got.loc[1, "contaminated"])          # prefix overlap
    assert not bool(got.loc[2, "contaminated"])
    assert bool(got.loc[3, "contaminated"])          # self
    clean = decontaminate(df, eval_df, n=13, mode="drop")
    assert [r["doc_id"] for r in clean.collect()] == [2]
    assert "contaminated" not in clean.columns
    # short docs (< n words) can never be contaminated
    short = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.array([9], dtype=np.int64),
        "text": ["alpha beta"]}))
    g = decontaminate(short, eval_df, n=13).toPandas()
    assert not bool(g.iloc[0]["contaminated"])
