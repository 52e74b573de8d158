"""Structured Streaming wrappers: stream == batch parity, resume."""

import pandas as pd

from gdal_spark.operators.spatial_join import (
    spatial_join_points_in_polygons,
)
from gdal_spark.sources.pages import pages_df
from gdal_spark.sources.polygons import poly_fixture_pdf
from gdal_spark.streaming.events import (
    spatial_join_stream, stream_parquet_source, windowed_counts,
)


def test_stream_spatial_join_matches_batch(spark, tmp_path):
    src = str(tmp_path / "pages_in")
    out = str(tmp_path / "joined_out")
    ckpt = str(tmp_path / "ckpt")
    pts = pages_df(spark, 2000, partitions=4).select("i", "lon", "lat")
    pts.write.parquet(src)
    polys = poly_fixture_pdf()

    stream = stream_parquet_source(spark, src, pts.schema,
                                   max_files_per_trigger=2)
    q = spatial_join_stream(stream, polys, out, ckpt, res=6)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out).select("i", "fid").toPandas()
        .sort_values(["i", "fid"]).reset_index(drop=True)
    )
    want = (
        spatial_join_points_in_polygons(spark, pts, polys, res=6)
        .select("i", "fid").toPandas()
        .sort_values(["i", "fid"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)

    # resume: re-running with the same checkpoint adds nothing
    stream2 = stream_parquet_source(spark, src, pts.schema)
    q2 = spatial_join_stream(stream2, polys, out, ckpt, res=6)
    q2.awaitTermination(120)
    again = spark.read.parquet(out).count()
    assert again == len(want)


def test_windowed_counts_matches_batch(spark, tmp_path, sf_dir):
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "events_in")
    ev.write.parquet(src)
    stream = stream_parquet_source(spark, src, ev.schema)
    agg = windowed_counts(stream, "ts", "1 hour", "2 hours",
                          ["event_type"])
    out = str(tmp_path / "win_out")
    ckpt = str(tmp_path / "win_ckpt")
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet").option("path", out).start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    want = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type").count()
    )
    # append mode emits only windows closed by the watermark; every
    # emitted row must match the batch count for its window
    w = want.select(
        F.col("window.start").alias("w_start"),
        "event_type", F.col("count").alias("want_n"),
    )
    j = got.join(w, ["w_start", "event_type"], "left")
    assert j.filter("want_n IS NULL OR want_n <> n").count() == 0
    assert got.count() > 0


def test_stateful_sessionize_stream(spark, tmp_path, sf_dir):
    """applyInPandasWithState sessionization: closed sessions match
    the batch lag/cumsum sessionization for users whose sessions are
    definitely closed."""
    from pyspark.sql import functions as F

    from gdal_spark.streaming.events import sessionize_stream

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    src = str(tmp_path / "sess_in")
    # single file -> one micro-batch; only sessions closed WITHIN the
    # batch are emitted (the final open session per user stays in
    # state), matching batch sessionization minus each user's last
    ev.coalesce(1).write.parquet(src)
    stream = stream_parquet_source(spark, src, ev.schema,
                                   max_files_per_trigger=10)
    # finite replay: no processing-time timers, so the availableNow
    # query terminates at end-of-data instead of idling out the
    # awaitTermination budget
    sess = sessionize_stream(stream, gap_seconds=1800,
                             timeout_mode="none")
    out = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    q = (
        sess.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet").option("path", out).start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).toPandas()
    assert len(got) > 0
    # batch oracle: sessions per user via lag/cumsum
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn("new_s", F.when(
            F.col("prev").isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp("prev") > 1800),
            1).otherwise(0))
        .withColumn("sid", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "sid").agg(F.count("*").alias("n_events"))
        .groupBy("user_id").agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_total"))
        .toPandas().set_index("user_id")
    )
    got_per_user = got.groupby("user_id").agg(
        n_closed=("n_events", "size"), n_ev=("n_events", "sum"))
    for uid, row in got_per_user.iterrows():
        # closed sessions = all sessions minus the one still open
        assert row["n_closed"] == batch.loc[uid, "n_sessions"] - 1


def test_stream_dedup_matches_batch(spark, tmp_path):
    """Streaming first-wins exact dedup == batch exact_dedup on the
    same corpus, including duplicates split ACROSS microbatches (the
    state store carries the seen markers between triggers)."""
    import numpy as np

    from gdal_spark.operators.dedup import exact_dedup
    from gdal_spark.streaming.events import dedup_stream

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "dedup_out")
    ckpt = str(tmp_path / "dedup_ckpt")

    texts = [f"document body {i % 7}  with   spaces" for i in range(60)]
    pdf = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "text": texts,
    })
    # two files so duplicates straddle microbatches
    docs = spark.createDataFrame(pdf)
    docs.filter("doc_id < 30").coalesce(1).write.parquet(
        src, mode="append")
    docs.filter("doc_id >= 30").coalesce(1).write.parquet(
        src, mode="append")

    stream = stream_parquet_source(spark, src, docs.schema,
                                   max_files_per_trigger=1)
    q = (
        dedup_stream(stream)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet").option("path", out).start()
    )
    q.awaitTermination(120)

    got = set(spark.read.parquet(out).toPandas()["doc_id"])
    want = set(exact_dedup(docs).toPandas()["doc_id"])
    assert got == want
    assert len(got) == 7          # one survivor per distinct body
    assert got == set(range(7))   # first arrival (min key) wins


def test_stream_density_pyramid_matches_batch(spark, tmp_path):
    """Incremental sparse-density maintenance: after the stream
    drains (multiple micro-batches), the published state densifies to
    EXACTLY the batch pyramid of all points; resuming on the same
    checkpoint adds nothing; per-batch work never rescans raw
    points (state holds sparse rows only)."""
    import numpy as np

    from gdal_spark.operators.rasterize import assemble_raster
    from gdal_spark.operators.tiling import densify, page_density_tiles
    from gdal_spark.streaming.events import (
        density_pyramid_stream, read_density_state,
    )

    src = str(tmp_path / "pts_in")
    state = str(tmp_path / "density_state")
    ckpt = str(tmp_path / "ckpt_density")
    pts = pages_df(spark, 3000, partitions=6).select("i", "lon", "lat")
    pts.write.parquet(src)

    stream = stream_parquet_source(spark, src, pts.schema,
                                   max_files_per_trigger=2)
    q = density_pyramid_stream(stream, zoom=3, state_path=state,
                               checkpoint=ckpt)
    q.awaitTermination(120)

    got_tiles = densify(read_density_state(spark, state), zoom=3) \
        .toPandas()
    want_tiles = page_density_tiles(pts, zoom=3).toPandas()

    def as_map(p):
        from gdal_spark.operators.tiling import decode_tile

        return {(int(r["tile_x"]), int(r["tile_y"])):
                decode_tile(r["data"], r["dtype"],
                            int(r["tile_size"]))
                for _, r in p.iterrows()}

    gm, wm = as_map(got_tiles), as_map(want_tiles)
    assert set(gm) == set(wm)
    for k in wm:
        np.testing.assert_array_equal(gm[k], wm[k])
    # total mass == number of points
    assert sum(a.sum() for a in gm.values()) == 3000

    # resume on the same checkpoint: no new state version content
    before = sum(a.sum() for a in gm.values())
    stream2 = stream_parquet_source(spark, src, pts.schema)
    q2 = density_pyramid_stream(stream2, zoom=3, state_path=state,
                                checkpoint=ckpt)
    q2.awaitTermination(120)
    gm2 = as_map(densify(read_density_state(spark, state), zoom=3)
                 .toPandas())
    assert sum(a.sum() for a in gm2.values()) == before

    # at-least-once REPLAY of an already-published batch id is a
    # no-op: a fresh checkpoint re-issues batch_id 0 (single batch),
    # but v*_b0 is already published, so the state must not change
    state2 = str(tmp_path / "density_state_replay")
    ck_a = str(tmp_path / "ck_replay_a")
    ck_b = str(tmp_path / "ck_replay_b")
    s1 = stream_parquet_source(spark, src, pts.schema,
                               max_files_per_trigger=100)
    density_pyramid_stream(s1, zoom=3, state_path=state2,
                           checkpoint=ck_a).awaitTermination(120)
    m1 = sum(a.sum() for a in as_map(
        densify(read_density_state(spark, state2), zoom=3)
        .toPandas()).values())
    assert m1 == 3000
    s2 = stream_parquet_source(spark, src, pts.schema,
                               max_files_per_trigger=100)
    density_pyramid_stream(s2, zoom=3, state_path=state2,
                           checkpoint=ck_b).awaitTermination(120)
    m2 = sum(a.sum() for a in as_map(
        densify(read_density_state(spark, state2), zoom=3)
        .toPandas()).values())
    assert m2 == 3000  # replayed batch id skipped, not re-merged

    # replay of a batch whose VERSION DIR was already pruned
    # (keep_versions=1): the applied-batch ledger, which pruning
    # never touches, must still block the re-merge
    state3 = str(tmp_path / "density_state_pruned")
    ck_c = str(tmp_path / "ck_pruned_a")
    ck_d = str(tmp_path / "ck_pruned_b")
    s3 = stream_parquet_source(spark, src, pts.schema,
                               max_files_per_trigger=2)
    density_pyramid_stream(s3, zoom=3, state_path=state3,
                           checkpoint=ck_c,
                           keep_versions=1).awaitTermination(120)
    import os

    vdirs = [d for d in os.listdir(state3) if d.startswith("v")]
    assert len(vdirs) == 1          # older versions pruned
    assert not vdirs[0].endswith("_b0")   # batch 0's dir is gone
    s4 = stream_parquet_source(spark, src, pts.schema,
                               max_files_per_trigger=100)
    density_pyramid_stream(s4, zoom=3, state_path=state3,
                           checkpoint=ck_d,
                           keep_versions=1).awaitTermination(120)
    m3 = sum(a.sum() for a in as_map(
        densify(read_density_state(spark, state3), zoom=3)
        .toPandas()).values())
    assert m3 == 3000  # pruned-batch replay still a no-op


def test_stream_near_dedup_matches_batch(spark, tmp_path):
    """Streaming MinHash-LSH near-dedup == batch minhash_lsh_dedup
    survivors on the same corpus, with near-duplicates split ACROSS
    microbatches (the bucket state carries cluster representatives
    between triggers)."""
    import numpy as np

    from gdal_spark.operators.dedup import minhash_lsh_dedup
    from gdal_spark.streaming.events import near_dedup_stream

    src = str(tmp_path / "nd_in")
    out = str(tmp_path / "nd_out")
    ckpt = str(tmp_path / "nd_ckpt")

    rng = np.random.RandomState(17)
    words = [f"w{i:03d}" for i in range(400)]
    bases = [" ".join(rng.choice(words, 60)) for _ in range(8)]
    texts, ids = [], []
    k = 0
    for b, base in enumerate(bases):
        toks = base.split()
        for copy in range(3):           # original + 2 near-copies
            t = list(toks)
            if copy:
                t[copy * 5] = f"mut{b}_{copy}"
            texts.append(" ".join(t))
            ids.append(k)
            k += 1
    pdf = pd.DataFrame({"doc_id": ids, "text": texts})
    docs = spark.createDataFrame(pdf)
    # split so each cluster straddles the trigger boundary
    docs.filter("doc_id % 3 = 0").coalesce(1).write.parquet(
        src, mode="append")
    docs.filter("doc_id % 3 != 0").coalesce(1).write.parquet(
        src, mode="append")

    from gdal_spark.streaming.events import stream_parquet_source

    stream = stream_parquet_source(spark, src, docs.schema,
                                   max_files_per_trigger=1)
    q = near_dedup_stream(stream, out, ckpt, threshold=0.5)
    q.awaitTermination(180)

    got = set(spark.read.parquet(out).toPandas()["doc_id"])
    want = set(minhash_lsh_dedup(docs).toPandas()["doc_id"])
    # batch keeps each cluster's min key; streaming keeps the first
    # arrival — with min-key-first arrival order these coincide
    assert got == want
    assert got == {0, 3, 6, 9, 12, 15, 18, 21}

    # replay with the same checkpoint adds nothing
    stream2 = stream_parquet_source(spark, src, docs.schema)
    q2 = near_dedup_stream(stream2, out, ckpt, threshold=0.5)
    q2.awaitTermination(180)
    assert spark.read.parquet(out).count() == len(want)


def test_remove_duplicate_passages_first_owner(spark):
    """(batch op, placed here with its streaming siblings): removal
    keeps the first owner intact and cuts exactly the copied span;
    sub-window docs pass through untouched."""
    from gdal_spark.functions.text import remove_duplicate_passages

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [
            "alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa unique tail",
            "prefix words alpha beta gamma delta epsilon zeta eta "
            "theta iota kappa suffix",
            "tiny doc",
        ]}))
    out = remove_duplicate_passages(docs, window=8) \
        .orderBy("doc_id").toPandas()
    assert out.iloc[0]["n_removed"] == 0
    assert out.iloc[0]["clean_text"].startswith("alpha beta")
    assert out.iloc[1]["clean_text"] == "prefix words suffix"
    assert out.iloc[1]["n_removed"] == 10
    assert out.iloc[2]["n_removed"] == 0
    assert out.iloc[2]["clean_text"] == "tiny doc"
