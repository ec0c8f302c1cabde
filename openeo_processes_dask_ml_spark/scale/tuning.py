"""Scale-adaptive physical-plan helpers shared by the pipeline
operators (r16 optimization round; guide §2.5 input parallelism, §5
reuse-vs-recompute).

Both helpers change PLAN SHAPE only — never values: every consumer
downstream of them is a key-hashed aggregation/join or an exact
integer/md5 derivation, so results are partition-layout independent.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition UP to the session's default parallelism
    when the frame has fewer partitions; a no-op otherwise.

    Why: a CPU-heavy projection (shingling, hashing, PQ encode) runs
    inside the stage of its upstream scan, and a single-file /
    single-row-group parquet input (the sf fixture; equally the tail
    of a small object-store listing) yields a ONE-task scan — the
    derivation then serializes on one core of the whole cluster. At
    warehouse scale a scan already carries >= cores partitions and
    this returns the input unchanged, so the fan-out is
    scale-adaptive, not a local-mode constant.

    The exchange moves only the narrow pre-derivation rows (ids +
    text), never derived output. Round-robin repartition is
    deterministic under retries (sort-before-repartition, on by
    default since SPARK-23207), and every consumer is key-hashed
    downstream, so values are unchanged.
    """
    sc = df.sparkSession.sparkContext
    want = int(target or sc.defaultParallelism)
    if df.rdd.getNumPartitions() >= want:
        return df
    return df.repartition(want)


def local_rows_df(
    spark,
    rows,
    schema,
    rows_per_slice: int = 20_000,
) -> DataFrame:
    """``createDataFrame`` for small driver-side row lists without the
    32-empty-Python-task scan.

    ``SparkSession.createDataFrame(list)`` parallelizes the rows over
    ``defaultParallelism`` slices no matter how few there are, so every
    materialization of a tiny local table (broadcast ordinal/axis
    tables, codebooks, ADC literals, query batches) runs one Python
    task per CORE — measured 0.4-0.5 s warm and ~1.5 s on the first
    touch of a session's worker pool, PER build, for 2-4 actual rows
    (r17 profile: the zarr sink's three axis tables were 3 x 32-task
    broadcast-build jobs per micro-batch). Slicing by a target
    rows-per-slice instead gives tiny tables ONE task (~0.25 s) while
    genuinely large lists (e.g. a 500k-word driver-trained BPE
    dictionary) still fan out to ``defaultParallelism``. Values are
    identical — only the slice count changes. NOT for data whose
    DOWNSTREAM is per-row heavy (e.g. synthetic binary payloads feeding
    a decode) — those want one slice per core regardless of row count;
    keep plain createDataFrame there."""
    rows = rows if isinstance(rows, list) else list(rows)
    sc = spark.sparkContext
    slices = max(
        1,
        min(
            (len(rows) + rows_per_slice - 1) // rows_per_slice,
            sc.defaultParallelism,
        ),
    )
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string

        schema = _parse_datatype_string(schema)
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(sc.parallelize(rows, slices), schema)


def materialize(df: DataFrame) -> DataFrame:
    """Mark a multi-consumer intermediate for query-lifetime reuse
    (MEMORY_AND_DISK persist).

    The pair/verify pipelines consume their derived index (shingle
    rows, term postings) from 2-3 places in one plan plus one eager
    bounded collect; without this Spark re-derives it from the corpus
    scan per consumer — at 100 TB that is 2-3 extra full tokenize
    passes, traded here for one spill-to-disk materialization that
    lives only for the query (the bench harness unpersists between
    reps; otherwise blocks are reclaimed by the ContextCleaner when
    the plan is dropped — same lifecycle as the localCheckpoint use in
    scale/bpe.py). This is reuse of an intermediate INSIDE one timed
    computation, not cross-run caching.
    """
    return df.persist(StorageLevel.MEMORY_AND_DISK)


def materialize_eager(df: DataFrame) -> DataFrame:
    """``materialize`` for intermediates whose consumers launch
    CONCURRENTLY (e.g. several broadcast-exchange builds): a lazy
    persist only dedupes sequential consumers — parallel jobs race,
    each recomputing the full lineage before the cache lands. Eagerly
    computing the blocks first (one parallel job, localCheckpoint)
    guarantees every consumer reads the materialized rows, and the
    truncated lineage also keeps downstream plan analysis flat. Same
    query-lifetime storage posture as ``materialize`` (the
    MEMORY_AND_DISK-backed blocks are reclaimed when the plan drops;
    the bench harness unpersists between reps)."""
    return df.localCheckpoint(eager=True)
