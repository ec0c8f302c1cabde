"""Structured Streaming operators.

The reference is strictly batch (SURVEY §2.9) — streaming is part of
the beyond-reference scale surface. The shapes here follow the standard
Spark pattern: readStream -> event-time watermark -> windowed
aggregation -> sink. ``run_stream_rollup_once`` drives the stream with
Trigger.AvailableNow into a memory sink, which replays the full input
in one deterministic pass — the result equals the batch computation, so
the operator stays oracle-checkable while exercising the real streaming
engine (state store, watermarks, incremental execution).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events(
    spark: SparkSession,
    path: str,
    schema,
    ts_col: str = "ts",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a parquet path (nanos timestamps get the
    same long->micros conversion as the batch loader). A single-file
    path is turned into directory + glob, since the streaming source
    requires a directory basePath. ``max_files_per_trigger`` forces
    multi-micro-batch execution (tests use it to prove state carries
    across batches)."""
    from openeo_processes_dask_ml_spark.io.load import pin_session_confs

    pin_session_confs(spark)
    import os

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path.endswith(".parquet") and os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    stream = reader.parquet(path)
    if dict(stream.dtypes).get(ts_col) == "bigint":
        stream = stream.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    return stream


def windowed_rollup(
    stream: DataFrame,
    ts_col: str,
    keys: list[str],
    value_col: str,
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling-window aggregation with an event-time watermark: the
    canonical late-data-tolerant streaming rollup. State for windows
    older than the watermark is dropped — bounded memory at any input
    rate."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    stream: DataFrame,
    ts_col: str,
    key: str,
    value_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Custom stateful streaming operator: per-key SESSION windows — a
    dynamic-gap window the state store merges as events arrive (two
    sessions fuse when their [ts, ts+gap) ranges touch). The batch
    equivalent is the lag/cumulative-sum sessionizer in
    operators/asof.py — same boundaries, so the streaming result stays
    oracle-checkable."""
    return (
        stream.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col(key),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_stream_sessionize_once(
    spark: SparkSession,
    path: str,
    schema,
    ts_col: str = "ts",
    key: str = "user_id",
    value_col: str = "value",
    gap: str = "30 minutes",
) -> DataFrame:
    """Execute session windows with Trigger.AvailableNow into a memory
    sink (complete mode keeps every session in state, so end-of-stream
    emits all of them) and return the static result."""
    stream = stream_events(spark, path, schema, ts_col)
    sessions = session_windows(stream, ts_col, key, value_col, gap)
    table = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    query = (
        sessions.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table)


def streaming_dedup(
    stream: DataFrame,
    ts_col: str,
    keys: list[str],
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: keep the first occurrence of each
    key combination, with state bounded by the event-time watermark
    (``dropDuplicatesWithinWatermark`` — duplicate suppression is
    guaranteed only within the watermark horizon, which is exactly the
    bound that keeps state finite at an unbounded input rate)."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def run_stream_dedup_once(
    spark: SparkSession,
    path: str,
    schema,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    watermark: str = "40 days",
) -> DataFrame:
    """Execute streaming dedup with Trigger.AvailableNow into a memory
    sink and return the static result. The default watermark exceeds
    the test data's full 30-day event span, so no key state is evicted
    mid-stream and the emitted keys equal batch ``dropDuplicates`` —
    oracle-checkable regardless of micro-batch boundaries."""
    keys = keys if keys is not None else ["user_id", "event_type"]
    stream = stream_events(spark, path, schema, ts_col)
    deduped = streaming_dedup(stream, ts_col, keys, watermark)
    table = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    query = (
        deduped.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table)


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream INTERVAL join: pair each left event with the right
    events of the same key whose timestamp falls in
    ``[left_ts - lookback, left_ts]`` (the attribution-window shape,
    e.g. purchases joined to the clicks that preceded them).

    Both sides carry event-time watermarks and the join condition bounds
    the time skew, so Spark can evict state for rows past the watermark
    + lookback horizon — the requirement for an unbounded stream-stream
    join to run in finite memory. The join is key-equi + time-range:
    state is hash-partitioned on the key, never a cross join."""
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__lts"),
        *[c for c in left.columns if c not in (key, left_ts)],
    ).withWatermark("__lts", watermark)
    r = right.select(
        F.col(key).alias("__rk"),
        F.col(right_ts).alias("__rts"),
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in (key, right_ts)
        ],
    ).withWatermark("__rts", watermark)
    cond = (
        (F.col("__k") == F.col("__rk"))
        & (F.col("__rts") >= F.col("__lts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("__rts") <= F.col("__lts"))
    )
    return (
        l.join(r, cond, "inner")
        .drop("__rk")
        .withColumnRenamed("__k", key)
        .withColumnRenamed("__lts", left_ts)
        .withColumnRenamed("__rts", f"r_{right_ts}")
    )


def run_stream_interval_join_once(
    spark: SparkSession,
    path: str,
    schema,
    key: str = "user_id",
    ts_col: str = "ts",
    left_type: str = "purchase",
    right_type: str = "click",
    lookback: str = "1 hour",
) -> DataFrame:
    """Attribution join driven with Trigger.AvailableNow: purchases
    joined to the same user's clicks within the lookback window —
    equals the batch range join, so the stream-stream join state
    machine is oracle-checkable."""
    stream = stream_events(spark, path, schema, ts_col)
    left = stream.filter(F.col("event_type") == left_type).drop("event_type")
    right = stream.filter(F.col("event_type") == right_type).drop("event_type")
    joined = stream_interval_join(
        left, right, key, ts_col, ts_col, lookback=lookback
    )
    table = f"stream_ijoin_{uuid.uuid4().hex[:8]}"
    query = (
        joined.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table)


def spend_alert_stream(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    threshold: float = 500.0,
) -> DataFrame:
    """CUSTOM stateful streaming operator via ``applyInPandasWithState``
    — semantics no built-in window expresses: a per-key running total
    carried across micro-batches in the state store, emitting one alert
    row whenever the cumulative value crosses another multiple of
    ``threshold``.

    Within a batch the rows are folded in (ts, id) order, so the float
    accumulation is a deterministic left fold — the batch twin (window
    running sum + lag) produces bit-identical doubles and the operator
    stays oracle-checkable. State per key is ONE double; memory is
    O(active keys) regardless of stream length.
    """
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("total", T.DoubleType()),
            T.StructField("level", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("total", T.DoubleType())])

    def fn(key_tuple, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0.0
        uid = key_tuple[0]
        out_ts, out_tot, out_lvl = [], [], []
        for pdf in pdf_iter:
            pdf = pdf.sort_values([ts_col, id_col])
            for ts, v in zip(pdf[ts_col], pdf[value_col]):
                before = total
                total = total + float(v)
                if math.floor(total / threshold) > math.floor(
                    before / threshold
                ):
                    out_ts.append(ts)
                    out_tot.append(total)
                    out_lvl.append(int(math.floor(total / threshold)))
        state.update((total,))
        yield pd.DataFrame(
            {
                "user_id": [uid] * len(out_ts),
                "ts": out_ts,
                "total": out_tot,
                "level": out_lvl,
            }
        )

    return stream.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def run_stream_spend_alerts_once(
    spark: SparkSession,
    path: str,
    schema,
    threshold: float = 500.0,
    max_files_per_trigger: int | None = None,
    checkpoint_dir: str | None = None,
    output_dir: str | None = None,
) -> DataFrame:
    """Drive the custom stateful operator with Trigger.AvailableNow and
    return the static alert set.

    ``checkpoint_dir`` + ``output_dir`` (both required together) switch
    from the ephemeral memory sink to a restartable parquet file sink:
    a later call with the SAME directories resumes from the persisted
    source offsets and state store — only files that arrived since the
    last run are processed, per-key running totals survive the restart,
    and already-emitted alerts are not re-written (the file sink's
    ``_spark_metadata`` log makes the output exactly-once). That is the
    production lifecycle — a spend monitor that stops and resumes must
    not re-alert or forget totals. The memory sink cannot recover from
    a checkpoint (Spark rejects it at start), so the default
    no-checkpoint call stays on memory and replays everything. Returns
    the cumulative alert set across all runs sharing ``output_dir``."""
    if (checkpoint_dir is None) != (output_dir is None):
        raise ValueError(
            "checkpoint_dir and output_dir must be passed together: "
            "restart needs a recoverable (file) sink"
        )
    stream = stream_events(
        spark, path, schema, "ts", max_files_per_trigger=max_files_per_trigger
    )
    alerts = spend_alert_stream(stream, threshold=threshold)
    if checkpoint_dir is not None:
        query = (
            alerts.writeStream.format("parquet")
            .option("path", output_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
        # explicit schema (ADVICE r7): a run that emits zero alerts
        # writes only _spark_metadata, and a schema-inferring read of
        # that directory fails instead of returning an empty frame
        return spark.read.schema(alerts.schema).parquet(output_dir)
    table = f"stream_alerts_{uuid.uuid4().hex[:8]}"
    query = (
        alerts.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table)


def run_stream_rollup_once(
    spark: SparkSession,
    path: str,
    schema,
    ts_col: str = "ts",
    keys: list[str] | None = None,
    value_col: str = "value",
    window: str = "1 day",
) -> DataFrame:
    """Execute the rollup with Trigger.AvailableNow into a memory sink
    and return the (now static) result."""
    keys = keys if keys is not None else ["event_type"]
    stream = stream_events(spark, path, schema, ts_col)
    rolled = windowed_rollup(stream, ts_col, keys, value_col, window)
    table = f"stream_rollup_{uuid.uuid4().hex[:8]}"
    query = (
        rolled.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table)


def stream_static_enrich(
    stream: DataFrame,
    static_df: DataFrame,
    stream_key: str,
    static_key: str,
    ts_col: str,
    segment_col: str,
    value_col: str,
    window: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-STATIC enrichment join + downstream windowed aggregate —
    the third join mode next to stream-stream (interval join) and
    stateful dedup. The static dimension broadcasts into every
    micro-batch (no join state at all, unlike stream-stream), then the
    watermarked tumbling window aggregates the enriched stream per
    (window, segment)."""
    dim = F.broadcast(
        static_df.select(
            F.col(static_key).alias("__k"), F.col(segment_col).alias("segment")
        )
    )
    enriched = stream.join(dim, stream[stream_key] == F.col("__k"), "inner")
    return (
        enriched.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
            "sum_value",
        )
    )


def run_stream_static_enrich_once(
    spark: SparkSession,
    path: str,
    schema,
    static_df: DataFrame,
    stream_key: str = "user_id",
    static_key: str = "c_custkey",
    ts_col: str = "ts",
    segment_col: str = "c_mktsegment",
    value_col: str = "value",
    window: str = "1 day",
) -> DataFrame:
    """Drive the enrichment with Trigger.AvailableNow into a memory
    sink (complete mode emits every window at end-of-stream), equal to
    the batch join+agg — oracle-checkable."""
    stream = stream_events(spark, path, schema, ts_col)
    agg = stream_static_enrich(
        stream, static_df, stream_key, static_key, ts_col, segment_col,
        value_col, window,
    )
    table = f"stream_enrich_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table)


def stream_incremental_dedup(
    stream: DataFrame,
    seen_min: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming crawl-ingestion dedup: each micro-batch of NEW
    documents checks its normalized-text hash against a STATIC
    pre-aggregated historical index (hash -> smallest ingested id) —
    the streaming twin of ``scale.dedup.incremental_dedup``.

    Stream-static left joins are STATELESS (the static side is just a
    broadcast or shuffled table per micro-batch, no state store), so
    this runs at unbounded ingest rates; the historical index is the
    same persist-once snapshot artifact the batch op uses. Emits
    (doc_id, is_novel, dup_of) per new document."""
    from openeo_processes_dask_ml_spark.scale.dedup import (
        normalized_text_hash,
    )

    hashed = stream.select(
        F.col(id_col).alias("doc_id"),
        normalized_text_hash(F.col(text_col)).alias("h"),
    )
    return hashed.join(F.broadcast(seen_min), "h", "left").select(
        "doc_id",
        F.col("dup_of").isNull().alias("is_novel"),
        "dup_of",
    )


def run_stream_incremental_dedup_once(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drive streaming incremental dedup with Trigger.AvailableNow:
    odd-id documents stream in as the 'new crawl', even-id documents
    form the static historical index — the result equals the batch
    ``incremental_dedup`` on the same split, so the stream-static plan
    is oracle-checkable."""
    import os

    from openeo_processes_dask_ml_spark.scale.dedup import seen_text_index

    batch = spark.read.parquet(path)
    seen_min = seen_text_index(
        batch.filter(F.col(id_col) % 2 == 0), text_col, id_col
    )
    reader = spark.readStream.schema(batch.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    spath = path
    if spath.endswith(".parquet") and os.path.isfile(spath):
        reader = reader.option("pathGlobFilter", os.path.basename(spath))
        spath = os.path.dirname(spath)
    stream = reader.parquet(spath).filter(F.col(id_col) % 2 == 1)
    out = stream_incremental_dedup(stream, seen_min, text_col, id_col)
    table = f"stream_incr_dedup_{uuid.uuid4().hex[:8]}"
    query = (
        out.writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table)


def run_stream_topk_once(
    spark: SparkSession,
    path: str,
    schema,
    ts_col: str = "ts",
    key: str = "event_type",
    value_col: str = "value",
    window: str = "1 day",
    k: int = 3,
) -> DataFrame:
    """Windowed TOP-K over a stream — the standard two-layer shape:
    the STREAM maintains the per-(window, key) counts incrementally
    (bounded state: watermark drops closed windows), and the RANKING
    runs as a batch query over the sink, because a global per-window
    rank cannot be emitted incrementally in append mode (a late row
    can reorder the board until the window closes). This is how
    production leaderboards work: streaming pre-aggregation + rank at
    serving time. Driven with Trigger.AvailableNow, the composition is
    deterministic and equals the batch computation — oracle-checkable.
    """
    from pyspark.sql import Window

    rolled = run_stream_rollup_once(
        spark, path, schema, ts_col, [key], value_col, window
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col(key)
    )
    return (
        rolled.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.to_date("window_start").alias("day"),
            key,
            "n_events",
            F.col("rank").cast("int").alias("rank"),
        )
    )
