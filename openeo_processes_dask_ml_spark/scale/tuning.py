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
