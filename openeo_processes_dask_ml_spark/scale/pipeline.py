"""Training-data pipeline operators: decontamination, sequence
packing, shard export, per-group top-k.

These are the corpus-preparation steps that sit between dedup/quality
filtering (scale/dedup.py, scale/text.py) and the training job itself.
All are built for the 100 TB shape:

- decontaminate: the benchmark blocklist is tiny relative to the
  corpus (MBs of eval n-grams vs TBs of training text), so the
  blocklist side is broadcast and the corpus is scanned exactly once —
  no corpus shuffle at all.
- pack_sequences: concat-and-chunk packing (the standard LLM
  pretraining layout — documents are concatenated per stream and the
  token stream is sliced into fixed-size context windows, documents
  crossing chunk boundaries). A pure prefix-sum window per stream key:
  one shuffle, no Python.
- training_shards: deterministic md5-hash shard assignment — stable
  across runs and engines, so a re-run writes byte-identical shard
  membership. One hash agg for the stats; the writer pays one
  repartition (the shuffle that buys shard-aligned files).
- top_per_group: the grouped top-k pattern (row_number over a
  per-group window with an id tie-break) — returns k rows per group
  without a global sort.

Hashes derive from md5 so the DuckDB oracle replicates them
bit-for-bit (see scale/dedup.py::hash60).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.scale.dedup import hash60, shingle_rows, tokens_expr
from openeo_processes_dask_ml_spark.scale.tuning import (
    fan_out,
    local_rows_df,
    materialize,
    materialize_eager,
)
from openeo_processes_dask_ml_spark.utils.rounding import dround


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Flag training documents that share any word ``n``-gram with the
    evaluation set (benchmark decontamination, as in GPT-3 appendix C /
    Gopher section A.3 — those use n=13; the synthetic test corpus is
    short-doc so tests use n=3).

    Shape: the eval side collapses to DISTINCT n-grams (the blocklist)
    and is broadcast; the training corpus explodes to (doc_id, gram)
    rows once (paying the one shingle-window shuffle every shingle op
    pays) and equi-joins the blocklist map-side — the join itself moves
    no corpus data, and the final aggregation only sees matching rows
    (corpus-tiny).

    Returns one row per contaminated doc: ``doc_id``, ``n_hits`` (how
    many distinct blocklisted grams appear in it), ``sample_gram``
    (lexicographic min, for auditability).
    """
    blocklist = (
        shingle_rows(eval_docs, text_col, id_col, n)
        .select("shingle")
        .distinct()
    )
    grams = shingle_rows(train, text_col, id_col, n)
    return (
        grams.join(F.broadcast(blocklist), "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("shingle").alias("sample_gram"),
        )
    )


def pack_sequences(
    df: DataFrame,
    capacity: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    stream_col: str | None = None,
    n_streams: int = 256,
) -> DataFrame:
    """Concat-and-chunk sequence packing: per stream, documents are
    laid end-to-end in ``id_col`` order and the token stream is cut
    into context windows of ``capacity`` tokens.

    Emits, per document: its token count, its byte-offset analogue
    ``stream_start`` (tokens before it in the stream), the first and
    last chunk indexes it lands in, how many chunks it spans, and
    whether it crosses a chunk boundary (the fraction of
    boundary-crossing docs is the packing-efficiency metric).

    Pure prefix sum: one window shuffle keyed on the stream. The
    DEFAULT stream key is the deterministic md5 shard (``shard_expr``
    over ``n_streams`` shards) so the cumsum parallelizes across
    ``n_streams`` independent windows — a natural-key default like
    language would cap parallelism at the number of distinct languages
    and serialize at 100 TB. Pass ``stream_col`` explicitly (e.g.
    ``"lang"``) when streams must follow a semantic grouping.
    """
    if stream_col is None:
        stream = (
            hash60(F.col(id_col).cast("string"), "shard") % F.lit(n_streams)
        )
    else:
        stream = F.col(stream_col)
    n_tokens = F.size(tokens_expr(F.col(text_col)))
    w = (
        Window.partitionBy(stream)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_end = df.select(
        F.col(id_col).alias("doc_id"),
        stream.alias("stream"),
        n_tokens.alias("n_tokens"),
        F.sum(n_tokens).over(w).alias("stream_end"),
    )
    start = (F.col("stream_end") - F.col("n_tokens")).alias("stream_start")
    first_chunk = F.floor((F.col("stream_end") - F.col("n_tokens")) / capacity)
    last_chunk = F.floor((F.col("stream_end") - 1) / capacity)
    return with_end.select(
        "doc_id",
        "stream",
        "n_tokens",
        start,
        first_chunk.alias("first_chunk"),
        last_chunk.alias("last_chunk"),
        (last_chunk - first_chunk + 1).alias("n_chunks"),
        (last_chunk > first_chunk).alias("crosses_boundary"),
    )


def shard_expr(id_col: str, n_shards: int) -> F.Column:
    """Deterministic shard id in [0, n_shards): md5-derived, engine-
    portable (DuckDB: ``('0x'||substr(md5(id||'#shard'),1,15))::BIGINT
    % n``)."""
    return (
        hash60(F.col(id_col).cast("string"), "shard") % F.lit(n_shards)
    ).alias("shard")


def training_shards(
    df: DataFrame,
    n_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard statistics for a deterministic hash-sharded export:
    doc count, token total, id range. One hash aggregation (map-side
    combine shrinks each partition to ``n_shards`` rows before the
    shuffle), so this scales as a pure scan."""
    n_tokens = F.size(tokens_expr(F.col(text_col)))
    return (
        df.select(shard_expr(id_col, n_shards), F.col(id_col), n_tokens.alias("nt"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
            F.min(id_col).alias("min_doc_id"),
            F.max(id_col).alias("max_doc_id"),
        )
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    mode: str = "overwrite",
) -> None:
    """Materialize the sharded training layout: one directory per
    shard (``shard=K/``), rows sorted by id within each shard so a
    reader streams deterministically. The single repartition on the
    shard column is the only shuffle — it aligns file boundaries with
    shard boundaries so each training worker reads exactly its files.
    """
    (
        df.withColumn("shard", shard_expr(id_col, n_shards))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def top_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int = 3,
    descending: bool = True,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Top-k rows per group via row_number — the scalable grouped
    top-k (each group's window sorts locally after one hash partition;
    no global sort, no collect). A deterministic tie-break column keeps
    ranks engine-portable (memory: rankings need an id tie-break)."""
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    keys = [order]
    if tiebreak_col is not None:
        keys.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*keys)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .withColumn("rk", F.col("rk").cast("bigint"))
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple = (90, 5, 5),
) -> DataFrame:
    """Group-aware train/val/test assignment: the split key is the
    duplicate CLUSTER, not the document, so near-duplicates can never
    straddle a split boundary — the eval-contamination guard of a
    dedup-aware training pipeline. Singleton documents are their own
    cluster. Assignment is the deterministic md5 bucket of the cluster
    id against ``fractions`` (percent train/val/test).

    Scale shape: connected components over the pair graph (pointer-
    doubled label propagation), one left join to pull every document
    in, and a pure-codegen bucket projection — the corpus shuffles
    once on doc_id for the join.
    """
    from openeo_processes_dask_ml_spark.scale.dedup import (
        duplicate_clusters,
        hash60,
    )

    f_train, f_val, f_test = fractions
    if f_train + f_val + f_test != 100:
        raise ValueError("fractions must sum to 100")
    clusters = duplicate_clusters(pairs)
    labeled = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )
    bucket = hash60(F.col("cluster_id").cast("string"), "split") % F.lit(100)
    split = (
        F.when(bucket < f_train, F.lit("train"))
        .when(bucket < f_train + f_val, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return labeled.select("doc_id", "cluster_id", split.alias("split"))


def mixture_sample(
    df: DataFrame,
    targets: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic mixture re-weighting: down-sample each source so
    the SURVIVING token mass matches the ``targets`` proportions (the
    static mixture-balancing step of corpus assembly; data-dependent
    rates, unlike ``stratified_sample``'s fixed ones).

    rate(source) = min(1, target_share * limiting_mass / source_mass),
    where the limiting source is the one whose full token mass is the
    binding constraint — so rates are maximal (no source is cut more
    than the mixture requires, at least one rate is 1.0). Selection is
    the md5 hash bucket of the doc id against the source's rate:
    deterministic, re-runnable, engine-portable.

    Scale shape: one hash agg for per-source token mass (rows =
    #sources, broadcast back), one codegen projection for the keep
    decision. Nothing collects.
    """
    total_targets = sum(targets.values())
    shares = {s: v / total_targets for s, v in targets.items()}
    n_tokens = F.size(tokens_expr(F.col(text_col)))
    mass = (
        df.select(F.col(source_col).alias("source"), n_tokens.alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("mass"))
    )
    share_col = F.coalesce(
        *[F.when(F.col("source") == s, F.lit(p)) for s, p in shares.items()],
        F.lit(0.0),
    )
    with_share = mass.withColumn("share", share_col)
    # limiting source: minimal mass/share ratio == the scale everything
    # else must shrink to
    scale = with_share.filter(F.col("share") > 0).agg(
        F.min(F.col("mass") / F.col("share")).alias("__scale")
    )
    rates = (
        with_share.crossJoin(F.broadcast(scale))
        .select(
            "source",
            "mass",
            F.when(
                F.col("share") > 0,
                F.least(
                    F.lit(1.0),
                    F.col("share") * F.col("__scale") / F.col("mass"),
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("rate"),
        )
    )
    bucket = hash60(F.col(id_col).cast("string"), "mix") % F.lit(1000000)
    return (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.col(source_col).alias("source"),
            n_tokens.alias("n_tokens"),
        )
        .join(F.broadcast(rates), "source")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            dround(F.col("rate"), 6).alias("rate"),
            (bucket < F.col("rate") * 1000000).alias("keep"),
        )
    )


def decontaminate_fuzzy(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Fuzzy benchmark decontamination: flag training documents whose
    exact Jaccard similarity to some EVAL document reaches
    ``threshold`` — catches paraphrased/partial eval leakage that the
    exact n-gram blocklist (``decontaminate``) misses when no single
    13-gram survives the paraphrase verbatim.

    Same machinery as cross-snapshot near-dup
    (``dedup.incremental_minhash_dedup`` with the eval set as the
    'seen' side): eval-side LSH bands are tiny and effectively
    broadcast, candidates are train x eval band collisions only, exact
    verification touches candidates. Returns one row per CONTAMINATED
    training doc: (doc_id, eval_id, jaccard) with the best-matching
    eval doc — the drop list a pipeline applies before training.
    """
    from openeo_processes_dask_ml_spark.scale.dedup import (
        incremental_minhash_dedup,
    )

    flagged = incremental_minhash_dedup(
        train, eval_docs, text_col, id_col, threshold=threshold
    )
    return flagged.filter(~F.col("is_novel")).select(
        "doc_id",
        F.col("dup_of").alias("eval_id"),
        "jaccard",
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Benchmark decontamination with a Bloom-filter prefilter — the
    variant of ``decontaminate`` for when the eval blocklist is too
    large to broadcast as raw strings (a full benchmark union can be
    10^9 13-grams ~ 100 GB of text, but 2^32 Bloom BITS is 512 MB —
    broadcastable). Classic Bloom + verify (Bloom 1970; same shape as
    Spark's own runtime bloom-filter join pruning): no false negatives,
    and every Bloom HIT is re-verified with the exact equi-join, so
    the OUTPUT IS BIT-IDENTICAL to ``decontaminate`` — the filter only
    prunes the join's probe side. The DuckDB oracle is therefore the
    plain exact-join query: the Bloom layer is an optimization that
    must not (and provably cannot) change the result.

    Build: eval grams -> k double-hashed bit positions (h1 + i*h2, h2
    forced odd so it is coprime with the power-of-2 m) -> (word, bit)
    -> bit_or per 64-bit word -> collect SET words only (bounded by
    min(k*|blocklist|, m/64) rows, never by corpus size) -> dense
    numpy bitset broadcast once.  Probe: train grams compute the same
    k positions JVM-side (codegen), one Arrow-vectorized pandas UDF
    tests all k bits against the broadcast bitset, and only surviving
    grams enter the verify join keyed on the gram — at the default
    sizing (<1% FP) the shuffle carries true hits almost exclusively.
    """
    from pyspark.sql.functions import pandas_udf

    from openeo_processes_dask_ml_spark.scale.dedup import hash60

    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    mask = m_bits - 1

    def positions(gram: F.Column) -> list[F.Column]:
        h1 = hash60(gram, "#bloom1").bitwiseAND(F.lit(mask))
        h2 = (hash60(gram, "#bloom2").bitwiseAND(F.lit(mask))).bitwiseOR(
            F.lit(1)
        )
        return [
            (h1 + F.lit(i) * h2).bitwiseAND(F.lit(mask))
            for i in range(k_hashes)
        ]

    # persisted: fully evaluated once for the bitset build, reused by
    # the verify join — without this the eval tokenize/distinct
    # pipeline (the operator's 10^9-gram motivating case) runs twice
    blocklist = (
        shingle_rows(eval_docs, text_col, id_col, n)
        .select("shingle")
        .distinct()
        .persist()
    )
    words = (
        blocklist.select(
            F.explode(F.array(*positions(F.col("shingle")))).alias("pos")
        )
        .select(
            F.shiftright("pos", 6).alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()
    )
    bitset = np.zeros(m_bits >> 6, dtype=np.int64)
    for r in words:
        bitset[r["word"]] = r["bits"]
    spark = train.sparkSession
    bc = spark.sparkContext.broadcast(bitset)

    @pandas_udf("boolean")
    def maybe_hit(pos: pd.Series) -> pd.Series:
        bs = bc.value
        pv = np.stack(pos.values).astype(np.int64)  # (rows, k)
        hit = (bs[pv >> 6] >> (pv & 63)) & 1 == 1
        return pd.Series(hit.all(axis=1))

    # probe side fanned out (r16): the shingling + k-bit membership UDF
    # otherwise fuse into the train scan's stage — one task on a
    # single-split input while every other core idles. Downstream is a
    # doc_id-keyed aggregation, so layout cannot move values.
    grams = shingle_rows(fan_out(train), text_col, id_col, n)
    pos_arr = F.array(*positions(F.col("shingle")))
    candidates = grams.filter(maybe_hit(pos_arr))
    return (
        candidates.join(blocklist, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("shingle").alias("sample_gram"),
        )
    )


def bin_pack_sequences(
    df: DataFrame,
    capacity: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_streams: int = 256,
) -> DataFrame:
    """Greedy next-fit BIN PACKING of documents into fixed-capacity
    training sequences — the no-split sibling of ``pack_sequences``
    (that one concatenates and CUTS; this one never splits a
    document, the padding-free "sample packing" layout of T5 /
    GPT-NeoX-style pretraining). Per stream, documents are taken in
    ``id_col`` order; a document joins the current bin iff it fits in
    the remaining capacity, else it opens a new bin. A document longer
    than ``capacity`` gets a bin of its own (callers decide whether to
    truncate — the operator reports, it does not destroy data).

    Emits (doc_id, stream, n_tokens, bin_idx, bin_fill): bin_idx is
    per-stream, bin_fill the bin's running token count through this
    doc — sum of per-bin waste = capacity*bins - sum(n_tokens) is the
    padding the layout saves.

    Scale shape: next-fit is PREFIX-DEPENDENT (each placement depends
    on the previous fill), so no window expression computes it; this
    is the documented applyInPandas case — one shuffle keyed on the
    md5 stream, a sequential numpy pass per stream, parallel across
    ``n_streams`` independent streams. Size n_streams so a stream's
    (doc_id, n_tokens) rows fit an Arrow batch comfortably: at 10^12
    docs and n_streams=2^20 a stream is ~10^6 8-byte pairs. The
    DuckDB twin is a recursive CTE over the same per-stream order —
    greedy next-fit is deterministic, so both engines agree exactly.
    """
    from pyspark.sql import types as T

    stream = (
        hash60(F.col(id_col).cast("string"), "shard") % F.lit(n_streams)
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        stream.alias("stream"),
        F.size(tokens_expr(F.col(text_col))).cast("bigint").alias("n_tokens"),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("stream", T.LongType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("bin_idx", T.LongType()),
            T.StructField("bin_fill", T.LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins = np.empty(len(pdf), dtype=np.int64)
        fills = np.empty(len(pdf), dtype=np.int64)
        b, f = 0, 0
        for i, n in enumerate(pdf["n_tokens"].to_numpy()):
            if f > 0 and f + n > capacity:
                b += 1
                f = 0
            f += n
            bins[i] = b
            fills[i] = f
        pdf["bin_idx"] = bins
        pdf["bin_fill"] = fills
        return pdf

    return base.groupBy("stream").applyInPandas(pack, schema=schema)


def weighted_sample(
    df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Deterministic weighted sampling without replacement, per group:
    Efraimidis-Spirakis priority sampling (Efraimidis & Spirakis 2006)
    with md5-derived uniforms — each row gets priority u^(1/w) (here
    compared as ln(u)/w, the monotone-equivalent form), and the top-k
    priorities per group are the sample. Weight = token count, so the
    sample is token-mass-proportional — the standard way to draw a
    corpus-representative subset for eval/inspection without a global
    shuffle of the data itself.

    Deterministic: u comes from md5(id), so every engine, run, and
    retry draws the SAME sample (the property random() never gives a
    distributed pipeline). One window per group + id tie-break; no
    global sort. At 100 TB the window shuffles (group, priority) pairs
    only — the text stays where it is and is re-joined by id
    downstream if needed.
    """
    two60 = float(1 << 60)
    w = F.size(tokens_expr(F.col(text_col))).cast("double")
    u = (hash60(F.col(id_col).cast("string"), "wsample") + F.lit(1)).cast(
        "double"
    ) / F.lit(two60)
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("doc_id"),
        w.alias("w"),
        (F.log(u) / w).alias("priority"),
    ).filter(F.col("w") > 0)
    wnd = Window.partitionBy("grp").orderBy(
        F.col("priority").desc(), F.col("doc_id")
    )
    return (
        base.withColumn("rank", F.row_number().over(wnd))
        .filter(F.col("rank") <= k)
        .select(
            F.col("grp").alias(group_col),
            "doc_id",
            F.col("w").cast("bigint").alias("n_tokens"),
            F.col("rank").cast("int").alias("rank"),
            dround(F.col("priority"), 6).alias("priority"),
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot diff between two corpus versions: one row per document
    id with status 'added' (only in new), 'removed' (only in old),
    'changed' (normalized text hash differs) or 'unchanged' — the
    dataset-versioning primitive behind incremental retraining
    decisions and crawl-to-crawl audit reports.

    Scale shape: both sides reduce to (id, normalized hash) narrow
    rows before ONE full-outer equi-join on the id (co-partitioned
    hash shuffle, no text movement); status is pure codegen. Content
    identity is ``normalized_text_hash`` — the same identity
    incremental_dedup and the streaming twin use, so diff and dedup
    can never disagree about what "changed" means."""
    from openeo_processes_dask_ml_spark.scale.dedup import (
        normalized_text_hash,
    )

    o = old.select(
        F.col(id_col).alias("doc_id"),
        normalized_text_hash(F.col(text_col)).alias("h_old"),
    )
    n = new.select(
        F.col(id_col).alias("doc_id"),
        normalized_text_hash(F.col(text_col)).alias("h_new"),
    )
    status = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return o.join(n, "doc_id", "full_outer").select(
        "doc_id", status.alias("status")
    )


def decontaminate_semantic(
    train_emb: DataFrame,
    eval_emb: DataFrame,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-space benchmark decontamination — the third rung of
    the ladder after exact n-gram (``decontaminate``) and token-Jaccard
    (``decontaminate_fuzzy``): flag training items whose embedding
    cosine against ANY eval item reaches ``threshold``, catching
    reworded/translated/reformatted leakage where no token overlap
    survives (the failure mode n-gram methods cannot see; same signal
    SemDeDup exploits for dedup).

    Plan: the eval suite is benchmark-sized and BROADCASTS; the
    training corpus never shuffles — scoring is a map-side cross join
    fused into codegen, and only rows at/above threshold reach the
    per-train-item top-1 window (cosine desc, eval_id asc for
    deterministic ties). Returns one row per CONTAMINATED training
    item: (train_id, eval_id, cosine) with its best-matching eval
    item — the drop list.
    """
    from openeo_processes_dask_ml_spark.scale.similarity import cosine_expr

    base = train_emb.select(
        F.col(id_col).alias("train_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("tv"),
    )
    ev = eval_emb.select(
        F.col(id_col).alias("eval_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("ev"),
    )
    cos = dround(cosine_expr(F.col("tv"), F.col("ev"), dim), 6)
    scored = (
        base.crossJoin(F.broadcast(ev))
        .select("train_id", "eval_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    w = Window.partitionBy("train_id").orderBy(
        F.col("cosine").desc(), F.col("eval_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select("train_id", "eval_id", "cosine")
    )


def _dsir_bucket_rows(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(doc_id, bucket) rows of hashed uni+bigram features — the DSIR
    featurization (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): every unigram and bigram
    hashes into one of ``n_buckets`` buckets, COUNTS kept (not
    distinct). Shape (r15): a PURE PROJECTION — two lookahead
    ``regexp_extract_all`` passes over the normalized text (unigrams,
    then overlapping bigrams — the shingle_rows trick) concatenated
    and exploded, all codegen, ZERO exchanges; the previous
    posexplode + lead() spelling paid a window shuffle on doc_id per
    evaluation and dsir_select evaluates the featurization on both
    sides. Empty/whitespace-only docs now contribute no grams (the
    old token-split emitted one ''-gram for them; the oracle twin
    carries the same guard)."""
    norm = (
        f"regexp_replace(trim(lower(`{text_col}`)), '\\\\s+', ' ')"
    )
    uni = F.expr(f"regexp_extract_all({norm}, '(\\\\S+)', 1)")
    bi = F.expr(
        f"regexp_extract_all({norm}, '(?=(\\\\S+ \\\\S+))\\\\S+ ?', 1)"
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.concat(uni, bi)).alias("gram"),
    ).select(
        "doc_id",
        F.pmod(hash60(F.col("gram"), "dsir"), F.lit(n_buckets)).alias("bucket"),
    )


def _dsir_dist(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int,
    text_col: str,
    id_col: str,
    eager: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(doc_bucket, dist): the per-(doc, bucket) count table and the
    per-bucket (t_cnt, r_cnt) distribution table — the SHARED
    featurization core of :func:`dsir_select` and its bisect gate
    :func:`dsir_bucket_hist`. One definition, so the gate's
    'verbatim-intermediate' contract cannot drift.

    ``eager``: dsir_select consumes ``doc_bucket`` from concurrent
    broadcast builds (totals, ratios) plus the weight join — a lazy
    persist lets those race, each recomputing the full featurization
    before any cache lands (profiled: three 65-task passes at sf0.1).
    It passes eager=True (one localCheckpoint job, every consumer
    reads cached blocks). dsir_bucket_hist consumes it exactly once,
    where forced materialization is pure overhead — it stays lazy.
    """
    # fanned out + materialized once (r16): the featurization (two
    # regexp passes + one md5 per gram) is the dominant per-row cost
    # — measured 2.6 s of 1-task broadcast-build time at sf0.1 without
    # the fan_out
    mat = materialize_eager if eager else materialize
    doc_bucket = mat(
        _dsir_bucket_rows(fan_out(raw), text_col, id_col, n_buckets)
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    t_dist = (
        _dsir_bucket_rows(target, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("t_cnt"))
    )
    r_dist = doc_bucket.groupBy("bucket").agg(F.sum("cnt").alias("r_cnt"))
    dist = t_dist.join(r_dist, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
        F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
    )
    return doc_bucket, dist


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int = 50,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    values: bool = True,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): pick the ``k`` raw
    documents whose hashed-n-gram distribution looks most like a small
    TARGET domain sample, via importance resampling.

    1. Featurize both sides into hashed uni+bigram bucket counts.
    2. Fit add-one-smoothed bucket distributions p (target) and q
       (raw); per-bucket log ratio ln(p_b) - ln(q_b).
    3. Per-doc importance log-weight = sum over its grams of the
       bucket log ratio.
    4. Gumbel top-k: score = logw + Gumbel(md5 uniform) — sampling
       proportional to softmax of the log-weights, DETERMINISTIC
       across engines/runs/retries (same md5-uniform posture as
       ``weighted_sample``; ties broken by doc_id).

    100 TB shape: the per-(doc, bucket) count aggregation is ONE
    shuffle whose exchange is REUSED by both consumers (the raw
    distribution rollup and the weight join read the same shuffle
    output), the bucket-distribution table is at most ``n_buckets``
    rows and broadcasts into the weight join, the target side is
    domain-sample-sized by construction, and the final selection is a
    per-partition top-k merge (TakeOrderedAndProject), never a global
    sort of the corpus. Float posture (tightened r11 after the r10
    driver hash-red): the per-doc log-weight is a FOLD-ORDERED sum —
    the (bucket, term) pairs are collected, sorted by bucket, and
    left-folded with ``F.aggregate`` so the float addition order is
    identical on every engine/partitioning (the ``ann_ivf_trained`` /
    ``bpe_merges`` posture; a per-doc list is bounded by ``n_buckets``
    so the collect is small). Outputs dround(6); ties broken by id.

    ``values=False`` returns only the integer columns (doc_id,
    n_grams, rank) — the selection-only bisect twin (oracle-gotchas
    protocol): if the picks match while the full query diverges, the
    chosen set is right and only the reported floats differ.
    """
    doc_bucket, dist = _dsir_dist(
        raw, target, n_buckets, text_col, id_col, eager=True
    )
    totals = dist.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("r_cnt").alias("r_tot")
    )
    B = float(n_buckets)
    log_ratio = F.log(
        (F.col("t_cnt") + F.lit(1.0)) / (F.col("t_tot") + F.lit(B))
    ) - F.log((F.col("r_cnt") + F.lit(1.0)) / (F.col("r_tot") + F.lit(B)))
    ratios = dist.crossJoin(F.broadcast(totals)).select(
        "bucket", log_ratio.alias("log_ratio")
    )
    weights = (
        doc_bucket.join(F.broadcast(ratios), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("bucket").alias("bucket"),
                        (F.col("cnt") * F.col("log_ratio")).alias("term"),
                    )
                )
            ).alias("terms"),
            F.sum("cnt").alias("n_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.aggregate(
                "terms", F.lit(0.0), lambda acc, x: acc + x["term"]
            ).alias("logw"),
        )
    )
    two60 = float(1 << 60)
    u = (hash60(F.col("doc_id").cast("string"), "dsirg") + F.lit(1)).cast(
        "double"
    ) / F.lit(two60)
    gumbel = -F.log(-F.log(u))
    # quantize-before-order (r12, VERDICT r11 #1 defense-in-depth): rank
    # over floor(score*1e6 + 0.5) — an exact IEEE-754 integer — so the
    # ordering can never inherit sub-microunit transcendental noise from
    # ln(); the reported score is qscore/1e6, identical to dround(.,6).
    scored = weights.select(
        "doc_id",
        "n_grams",
        F.col("logw"),
        F.floor((F.col("logw") + gumbel) * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("qscore"),
    )
    top = scored.orderBy(F.col("qscore").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("qscore").desc(), F.col("doc_id"))
    ranked = top.withColumn("rank", F.row_number().over(w))
    if not values:
        return ranked.select(
            "doc_id", "n_grams", F.col("rank").cast("int").alias("rank")
        )
    return ranked.select(
        "doc_id",
        "n_grams",
        dround(F.col("logw"), 6).alias("log_weight"),
        (F.col("qscore").cast("double") / F.lit(1e6)).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


def dsir_bucket_hist(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The `dist` intermediate of :func:`dsir_select`, verbatim, as an
    all-integer gate table (VERDICT r11 directive 1a): one row per
    occupied hash bucket with the target and raw gram counts. At most
    ``n_buckets`` rows. If this table matches the oracle while the full
    selection diverges, the featurization (tokenize → bigram → md5 →
    bucket) is proven identical and the divergence is downstream in
    scoring/ordering."""
    _, dist = _dsir_dist(raw, target, n_buckets, text_col, id_col)
    return dist


def dsir_doc_grams(
    raw: DataFrame,
    n_buckets: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document total gram count of :func:`dsir_select` — the
    `n_grams` intermediate for every raw doc, all-integer (VERDICT r11
    directive 1b). Green here + green bucket_hist ⇒ every discrete
    input to the weight computation matches across engines."""
    return (
        _dsir_bucket_rows(raw, text_col, id_col, n_buckets)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"))
    )


class _Rev:
    """Order-reversing comparable wrapper (desc keys in the bisect
    bucket path). Only __lt__/__eq__ — all tuple comparison needs."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


def global_sorted_index(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank",
    n_partitions: int | None = None,
    sample_per_partition: int = 64,
    max_expr_terms: int = 256,
) -> DataFrame:
    """Deterministic 0-based GLOBAL ordinal under a total order,
    without ever funnelling the data through one partition — the
    scale-safe spelling of ``row_number() OVER (ORDER BY ...)``
    (whose naive plan is a single-partition window: the one shape
    that cannot survive 100 TB).

    Design (pure-function partitioning): the bucket a row belongs to
    is computed from the ROW ALONE against an md5-sampled boundary
    list collected once driver-side (deterministic: the sample
    predicate is a hash threshold, not an RNG), so no job, retry, or
    physical layout can disagree about any row's bucket — the earlier
    repartitionByRange design needed a localCheckpoint pin because
    Spark re-samples range boundaries per job (a 200k-row probe
    showed 188k wrong ranks un-pinned), and the pin cost a full
    materialization at 100 TB. Bucket computation is an unrolled
    lexicographic-compare expression while ``(n_partitions - 1) *
    n_cols <= max_expr_terms`` (whole-stage codegen, zero Python);
    past that budget — thousands of buckets would blow Janino's 64 KB
    codegen limit and cost O(n) compares per row — it switches to an
    Arrow-vectorized ``bisect`` over the same boundary tuples
    (O(log n) per row, constant plan size). Both paths produce
    identical buckets from identical boundaries.

    Plan (r16): one bottom-k-by-md5 boundary sample (per-partition
    top-k, no shuffle, no prior count needed), one bucket-counts
    aggregation that doubles as the null validation, then ONE shuffle
    hash-partitioned on the bucket id feeding the per-bucket window,
    plus a broadcast join of the bucket-offset table — two driver
    actions and two full passes, down from three of each.

    Preconditions (validated where cheap): ``order_cols`` entries are
    column NAMES, optionally ``(name, "asc"|"desc")`` tuples —
    expression keys must be materialized as columns first; key
    columns must be NON-NULL (checked in the counts pass — null
    comparisons would silently corrupt buckets); the composite key
    must be a total order (add an id tiebreak); and ``df`` must be
    deterministically recomputable (file-backed, no unseeded
    sample/rand upstream) — the function runs multiple actions over
    it, like any multi-action Spark computation."""
    from pyspark.sql import Window

    spec: list[tuple[str, bool]] = []
    for c in order_cols:
        if isinstance(c, tuple):
            name, direction = c
            if direction not in ("asc", "desc"):
                raise ValueError(
                    f"direction for {name!r} must be 'asc' or 'desc', "
                    f"got {direction!r}"
                )
            spec.append((name, direction == "asc"))
        elif isinstance(c, str):
            spec.append((c, True))
        else:
            raise TypeError(
                "order_cols entries must be column names or "
                "(name, 'asc'|'desc') tuples — materialize expression "
                f"keys as columns first (got {type(c).__name__})"
            )
    names = [name for name, _ in spec]
    sort_cols = [
        F.col(name) if asc else F.col(name).desc() for name, asc in spec
    ]
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism

    # deterministic bounded boundary sample in ONE job (r16, guide §5
    # driver round-trips): the k rows with the smallest md5 of the key
    # tuple — a uniform hash-ordered bottom-k that needs NO prior
    # count, compiled to TakeOrderedAndProject (per-partition top-k +
    # driver merge; no shuffle, no escalating limit re-runs, and the
    # same rows under any retry or layout because the order key is a
    # pure function of the data). Replaces the old shape's separate
    # count/null-stats pass + threshold-filtered full-sort sample —
    # one full pass over the data fewer; the null validation now rides
    # the bucket-counts aggregation below. Boundary CHOICE only moves
    # bucket balance, never ranks: a row's bucket is #{boundaries <
    # row}, monotone in the key order for ANY boundary set, and
    # offsets come from the actual bucket counts.
    key_str = F.concat_ws(
        "\x1f", *[F.col(name).cast("string") for name in names]
    )
    hash60 = F.conv(F.substring(F.md5(key_str), 1, 15), 16, 10).cast(
        "bigint"
    )
    k_rows = max(sample_per_partition * n, 1)
    sample = (
        df.select(*names, hash60.alias("__h60"))
        # null keys are a precondition violation, raised by the counts
        # pass below — keep them out of the boundary sample so the
        # driver-side sort stays total
        .where(
            reduce(
                lambda a, b: a & b,
                [F.col(name).isNotNull() for name in names],
            )
        )
        .orderBy("__h60", *sort_cols)
        .limit(k_rows)
        .collect()
    )
    # driver-side key-order sort (tuple compare == the engine's
    # lexicographic column order; _Rev flips desc entries) — boundary
    # spacing steers balance only, see above
    sample.sort(
        key=lambda r: tuple(
            r[name] if asc else _Rev(r[name]) for name, asc in spec
        )
    )
    boundaries = [
        sample[(i * len(sample)) // n]
        for i in range(1, n)
        if sample
    ]
    if (
        n > 1
        and len(sample) == k_rows
        and boundaries
        and all(
            tuple(b[nm] for nm in names)
            == tuple(boundaries[0][nm] for nm in names)
            for b in boundaries
        )
    ):
        raise RuntimeError(
            "boundary sample is a single repeated key on a non-trivial "
            "input — the key tuple likely has (near-)constant string "
            "form, so bucketing would silently funnel into one "
            "partition; check the total-order precondition"
        )

    if (len(boundaries)) * len(spec) <= max_expr_terms:
        # codegen path: unrolled lexicographic compares
        def row_gt(bound) -> F.Column:
            expr = F.lit(False)
            for name, asc in reversed(spec):
                c, b = F.col(name), F.lit(bound[name])
                gt = (c > b) if asc else (c < b)
                expr = gt | ((c == b) & expr)
            return expr

        bucket = F.lit(0)
        for b in boundaries:
            bucket = bucket + F.when(row_gt(b), 1).otherwise(0)
        bucket = bucket.cast("int")
    else:
        # scale path: Arrow-vectorized bisect over the SAME boundary
        # tuples — O(log n) per row, constant-size plan
        import bisect

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        dirs = [asc for _, asc in spec]
        cmp_bounds = sorted(
            tuple(
                b[name] if asc else _Rev(b[name])
                for (name, asc) in spec
            )
            for b in boundaries
        )

        @pandas_udf("int")
        def bucket_udf(*cols: pd.Series) -> pd.Series:
            out = []
            for vals in zip(*cols):
                key = tuple(
                    v if asc else _Rev(v) for v, asc in zip(vals, dirs)
                )
                out.append(bisect.bisect_left(cmp_bounds, key))
            return pd.Series(out, dtype="int32")

        bucket = bucket_udf(*[F.col(name) for name in names])

    keyed = df.withColumn("__bucket", bucket)

    # tiny: one (bucket, count [, null counts]) row per bucket reaches
    # the driver; bucket ids are monotone in the key order by
    # construction. The per-key-column null validation rides THIS
    # aggregation (r16 — it was a separate full count pass before):
    # a null key comparison yields NULL -> the when() folds to 0, so
    # null rows land in bucket 0 and are counted here, and we raise
    # before anything downstream can silently misrank them.
    count_rows = (
        keyed.groupBy("__bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            *[
                F.sum(F.col(name).isNull().cast("int")).alias(
                    f"__null_{i}"
                )
                for i, name in enumerate(names)
            ],
        )
        .collect()
    )
    for i, name in enumerate(names):
        nulls = sum(r[f"__null_{i}"] for r in count_rows)
        if nulls:
            raise ValueError(
                f"key column {name!r} contains {nulls} NULLs — the "
                "composite key must be a non-null total order (null "
                "comparisons would silently corrupt bucket assignment)"
            )
    counts = dict((r["__bucket"], r["cnt"]) for r in count_rows)
    if not counts:
        return df.withColumn(rank_col, F.lit(0).cast("bigint"))
    offsets, acc = [], 0
    for bid in sorted(counts):
        offsets.append((bid, acc))
        acc += counts[bid]
    off_df = local_rows_df(
        df.sparkSession, offsets, "__bucket int, __offset long"
    )
    w = Window.partitionBy("__bucket").orderBy(*sort_cols)
    return (
        keyed.join(F.broadcast(off_df), "__bucket")
        .withColumn(
            rank_col,
            (F.row_number().over(w) - 1 + F.col("__offset")).cast(
                "bigint"
            ),
        )
        .drop("__bucket", "__offset")
    )
