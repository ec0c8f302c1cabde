"""Structured Streaming operators driven with Trigger.AvailableNow —
results must equal their batch equivalents (the oracle-parity
contract for the streaming surface)."""

from datetime import datetime

from pyspark.sql import functions as F


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Session windows merged by the state store == the batch lag/cumsum
    sessionizer, including the exact-gap boundary (1800s gap MERGES:
    sessions fuse when their [ts, ts+gap) ranges touch)."""
    from openeo_processes_dask_ml_spark.operators.asof import sessionize
    from openeo_processes_dask_ml_spark.streaming.rollup import (
        run_stream_sessionize_once,
    )

    rows = [
        ("u", datetime(2024, 1, 1, 0, 0, 0), 1.0),
        ("u", datetime(2024, 1, 1, 0, 30, 0), 2.0),   # exactly gap -> merge
        ("u", datetime(2024, 1, 1, 2, 0, 0), 4.0),    # > gap -> new session
        ("v", datetime(2024, 1, 1, 0, 0, 0), 8.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "value"])
    path = str(tmp_path / "events_stream")
    df.write.parquet(path)

    out = run_stream_sessionize_once(
        spark, path, df.schema, ts_col="ts", key="user_id",
        value_col="value", gap="30 minutes",
    )
    got = {
        (r["user_id"], str(r["session_start"])): (
            str(r["session_end"]), r["n_events"], r["sum_value"],
        )
        for r in out.collect()
    }
    assert got == {
        ("u", "2024-01-01 00:00:00"): ("2024-01-01 01:00:00", 2, 3.0),
        ("u", "2024-01-01 02:00:00"): ("2024-01-01 02:30:00", 1, 4.0),
        ("v", "2024-01-01 00:00:00"): ("2024-01-01 00:30:00", 1, 8.0),
    }

    # batch equivalence: same session boundaries from the cumsum path
    batch = sessionize(df, key="user_id", ts_col="ts", gap_seconds=1800.0)
    agg = (
        batch.groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start"), F.count("*").alias("n"))
        .collect()
    )
    batch_sessions = {(r["user_id"], str(r["start"])): r["n"] for r in agg}
    assert batch_sessions == {
        (u, s): n for (u, s), (_, n, _v) in got.items()
    }


def test_stream_dedup_matches_batch_distinct(spark, tmp_path):
    """dropDuplicatesWithinWatermark over the file stream emits exactly
    the batch-DISTINCT key set when the watermark covers the span."""
    from openeo_processes_dask_ml_spark.streaming.rollup import (
        run_stream_dedup_once,
    )

    rows = [
        ("u", "click", datetime(2024, 1, 1, 0, 0, 0), 1.0),
        ("u", "click", datetime(2024, 1, 2, 0, 0, 0), 2.0),  # dup key
        ("u", "view", datetime(2024, 1, 1, 0, 0, 0), 3.0),
        ("v", "click", datetime(2024, 1, 3, 0, 0, 0), 4.0),
        ("v", "click", datetime(2024, 1, 3, 0, 0, 1), 5.0),  # dup key
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts", "value"])
    path = str(tmp_path / "events_dedup")
    df.write.parquet(path)
    out = run_stream_dedup_once(
        spark, path, df.schema, ts_col="ts", keys=["user_id", "event_type"]
    )
    got = {(r["user_id"], r["event_type"]) for r in out.collect()}
    assert got == {("u", "click"), ("u", "view"), ("v", "click")}
    assert out.count() == 3


def test_spend_alerts_state_carries_across_batches(spark, tmp_path):
    """applyInPandasWithState: the running total persists in the state
    store between micro-batches (two files, maxFilesPerTrigger=1 forces
    two batches). Alerts fire exactly at threshold crossings."""
    import os

    from openeo_processes_dask_ml_spark.streaming.rollup import (
        run_stream_spend_alerts_once,
    )

    batch1 = [(1, 7, "click", datetime(2024, 1, 1, 9, 0, 0), 60.0),
              (2, 7, "click", datetime(2024, 1, 1, 9, 10, 0), 30.0)]
    batch2 = [(3, 7, "click", datetime(2024, 1, 2, 9, 0, 0), 20.0),   # 110 -> crosses 100
              (4, 7, "click", datetime(2024, 1, 2, 9, 30, 0), 95.0),  # 205 -> crosses 200
              (5, 8, "click", datetime(2024, 1, 2, 9, 0, 0), 50.0)]
    cols = ["event_id", "user_id", "event_type", "ts", "value"]
    path = str(tmp_path / "spend")
    os.makedirs(path)
    df1 = spark.createDataFrame(batch1, cols)
    df2 = spark.createDataFrame(batch2, cols)
    df1.coalesce(1).write.parquet(path, mode="append")
    df2.coalesce(1).write.parquet(path, mode="append")

    out = run_stream_spend_alerts_once(
        spark, path, df1.schema, threshold=100.0, max_files_per_trigger=1
    )
    got = {(r["user_id"], r["level"]): r["total"] for r in out.collect()}
    # user 7: 60, 90 (no alert), then +20 -> 110 (level 1), +95 -> 205
    # (level 2) — the 90 carried over from batch 1's state. user 8: none.
    # (file order is nondeterministic, but totals are order-independent
    # here because each file crosses its own threshold exactly once)
    assert set(k[0] for k in got) == {7}
    assert len(got) == 2
    assert sorted(lvl for _, lvl in got) == [1, 2]
    assert max(got.values()) == 205.0


def test_spend_alerts_survive_checkpoint_restart(spark, tmp_path):
    """The production stop/resume lifecycle (VERDICT r6 item 7): kill
    the query after batch 1, append new data, restart from the SAME
    checkpoint dir. Both halves of the checkpoint must hold:

    * source offsets survive — the restarted query processes ONLY the
      new file, so batch 1's level-1 alert is NOT re-emitted (a lost
      offset log would replay it);
    * the state store survives — the new file's 95.0 alone is below the
      100.0 threshold, so the level-2 alert can only fire if the 110.0
      running total persisted across the restart.

    The restartable path uses a parquet file sink (the memory sink
    cannot recover from a checkpoint), whose output is cumulative
    across runs — so the run-2 read must show exactly ONE new row.
    """
    import os

    from openeo_processes_dask_ml_spark.streaming.rollup import (
        run_stream_spend_alerts_once,
    )

    batch1 = [(1, 7, "click", datetime(2024, 1, 1, 9, 0, 0), 60.0),
              (2, 7, "click", datetime(2024, 1, 1, 9, 10, 0), 50.0)]  # 110 -> level 1
    batch2 = [(3, 7, "click", datetime(2024, 1, 2, 9, 0, 0), 95.0)]   # 205 -> level 2
    cols = ["event_id", "user_id", "event_type", "ts", "value"]
    path = str(tmp_path / "spend_restart")
    cp = str(tmp_path / "ckpt")
    out = str(tmp_path / "alerts_out")
    os.makedirs(path)
    df1 = spark.createDataFrame(batch1, cols)
    df1.coalesce(1).write.parquet(path, mode="append")

    run1 = run_stream_spend_alerts_once(
        spark, path, df1.schema, threshold=100.0,
        checkpoint_dir=cp, output_dir=out,
    )
    got1 = {(r["user_id"], r["level"]): r["total"] for r in run1.collect()}
    assert got1 == {(7, 1): 110.0}

    # the first query object is gone (awaitTermination returned); new
    # data lands while nothing is running
    spark.createDataFrame(batch2, cols).coalesce(1).write.parquet(
        path, mode="append"
    )

    run2 = run_stream_spend_alerts_once(
        spark, path, df1.schema, threshold=100.0,
        checkpoint_dir=cp, output_dir=out,
    )
    rows2 = run2.collect()
    got2 = {(r["user_id"], r["level"]): r["total"] for r in rows2}
    # cumulative output = old alert + exactly ONE new one: a replayed
    # batch 1 would duplicate the level-1 row (3 rows), and the 205.0
    # total proves the 110.0 state survived the restart
    assert len(rows2) == 2
    assert got2 == {(7, 1): 110.0, (7, 2): 205.0}


def test_spend_alerts_zero_alert_run_returns_empty_frame(spark, tmp_path):
    """A restartable run that emits no alerts writes only
    _spark_metadata; the read must return an empty frame with the alert
    schema, not a schema-inference error (ADVICE r7)."""
    import os

    from openeo_processes_dask_ml_spark.streaming.rollup import (
        run_stream_spend_alerts_once,
    )

    rows = [(1, 7, "click", datetime(2024, 1, 1, 9, 0, 0), 60.0)]
    cols = ["event_id", "user_id", "event_type", "ts", "value"]
    path = str(tmp_path / "spend_zero")
    os.makedirs(path)
    df = spark.createDataFrame(rows, cols)
    df.coalesce(1).write.parquet(path, mode="append")

    out = run_stream_spend_alerts_once(
        spark, path, df.schema, threshold=1e9,
        checkpoint_dir=str(tmp_path / "ckpt0"),
        output_dir=str(tmp_path / "alerts0"),
    )
    assert out.collect() == []
    assert set(out.columns) >= {"user_id", "total", "level"}


def test_stream_interval_join_attribution(spark, tmp_path):
    """Purchases pair with same-user clicks inside the lookback window
    (inclusive bounds), and with nothing outside it."""
    from openeo_processes_dask_ml_spark.streaming.rollup import (
        run_stream_interval_join_once,
    )

    rows = [
        (1, "u", "click", datetime(2024, 1, 1, 9, 0, 0), 1.0),
        (2, "u", "click", datetime(2024, 1, 1, 9, 30, 0), 1.0),
        (3, "u", "purchase", datetime(2024, 1, 1, 10, 0, 0), 9.0),
        (4, "u", "click", datetime(2024, 1, 1, 10, 30, 0), 1.0),  # after
        (5, "v", "click", datetime(2024, 1, 1, 9, 59, 0), 1.0),  # other user
        (6, "w", "purchase", datetime(2024, 1, 1, 12, 0, 0), 2.0),  # no clicks
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "ts", "value"]
    )
    path = str(tmp_path / "events_ijoin")
    df.write.parquet(path)
    out = run_stream_interval_join_once(
        spark, path, df.schema, key="user_id", ts_col="ts",
        left_type="purchase", right_type="click", lookback="1 hour",
    )
    pairs = {(r["event_id"], r["r_event_id"]) for r in out.collect()}
    # click at 9:00 is exactly ts - 1h -> inclusive lower bound
    assert pairs == {(3, 1), (3, 2)}


def test_stream_static_enrich_matches_batch(spark):
    """Stream-static enrichment equals the batch join+agg, and the
    static side is planned as a broadcast join (no stream-stream join
    state)."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_ml_spark.io.load import load_table
    from openeo_processes_dask_ml_spark.streaming.rollup import (
        run_stream_static_enrich_once,
    )

    sf = "/root/testdata/sf0.001"
    schema = spark.read.parquet(f"{sf}/events.parquet").schema
    cust = load_table(spark, sf, "customer")
    got = {
        (str(r["window_start"]), r["segment"]): (r["n_events"], round(r["sum_value"], 6))
        for r in run_stream_static_enrich_once(
            spark, f"{sf}/events.parquet", schema, cust
        ).collect()
    }
    ev = load_table(spark, sf, "events")
    expect = {
        (str(r["w"]), r["segment"]): (r["n"], round(r["s"], 6))
        for r in ev.join(
            cust, ev.user_id == cust.c_custkey
        )
        .groupBy(
            F.date_trunc("day", "ts").alias("w"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == expect and len(got) > 0


def test_stream_incremental_dedup_across_microbatches(spark, tmp_path):
    """Stream-static incremental dedup: duplicates of the historical
    corpus are flagged in whatever micro-batch they arrive (two files,
    maxFilesPerTrigger=1 forces two batches), novels pass; the join is
    stateless so batch boundaries cannot change the result."""
    import os

    from pyspark.sql import functions as F

    from openeo_processes_dask_ml_spark.streaming.rollup import (
        run_stream_incremental_dedup_once,
    )

    d = str(tmp_path / "docs")
    os.makedirs(d)
    spark.createDataFrame(
        [(0, "shared history text alpha"), (1, "Shared  History text ALPHA "),
         (2, "only in history")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(d + "/f1")
    spark.createDataFrame(
        [(3, "brand new content"), (4, "ONLY in history"),
         (5, "shared history text alpha")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(d + "/f2")
    # flatten the two writes into one directory of parquet files
    import glob
    import shutil

    for i, f in enumerate(sorted(glob.glob(d + "/f*/*.parquet"))):
        shutil.move(f, f"{d}/part{i}.parquet")
    shutil.rmtree(d + "/f1")
    shutil.rmtree(d + "/f2")

    out = {
        r["doc_id"]: r
        for r in run_stream_incremental_dedup_once(
            spark, d, max_files_per_trigger=1
        ).collect()
    }
    # odd ids are the stream: 1 dups 0 (normalization collapses case/
    # whitespace), 3 is novel, 5 dups 0
    assert set(out) == {1, 3, 5}
    assert out[1]["is_novel"] is False and out[1]["dup_of"] == 0
    assert out[3]["is_novel"] is True and out[3]["dup_of"] is None
    assert out[5]["is_novel"] is False and out[5]["dup_of"] == 0
