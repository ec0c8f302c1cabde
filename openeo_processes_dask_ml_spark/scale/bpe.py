"""Distributed BPE tokenizer training (byte-pair-encoding merge
learning) — beyond-reference LLM-pipeline operator.

The classic single-node trainer (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") keeps a dict of word
frequencies and repeatedly merges the most frequent adjacent symbol
pair. The distributed shape here follows the same two-level reduction
every production trainer uses:

1. ONE corpus-scale pass reduces the corpus to its unique-word
   frequency table (``word_frequencies``) — a map-side-combinable
   groupBy. This is the only stage proportional to corpus bytes; at
   100 TB the word table is ~10^7-10^8 rows (Heaps' law), i.e. tiny
   relative to the corpus and comfortably distributed.
2. Each merge iteration runs entirely on the word table:
   - pair counting: explode adjacent symbol pairs weighted by word
     frequency, groupBy(left, right) + sum — map-side combined, all
     JVM codegen;
   - global argmax: orderBy(count desc, left, right).limit(1) — one
     driver row, deterministic tie-break so every engine/run learns
     the identical merge sequence;
   - rewrite: a left-to-right non-overlapping merge pass expressed as
     an ``F.aggregate`` fold over the symbol array — no Python UDF,
     stays inside whole-stage codegen.
   The word table is localCheckpointed per iteration so the k-deep
   lineage never replays (same discipline as
   scale/dedup.py::duplicate_clusters).

Encoding then becomes a dictionary join against the trained word table
(word -> final symbol sequence; broadcast when small — AQE decides, see
``bpe_encode``): at inference the corpus never folds merges
symbol-by-symbol — unseen words fall back to character splits with the
merge fold applied only to that (rare) remainder.

Oracle SQL twin: the argmax-then-rewrite iteration IS expressible as
one SQL statement by unrolling the fixed 20 merge rounds into chained
MATERIALIZED CTE stages (``__spark_entry__._bpe_oracle``) — pair
counts, deterministic argmax, and the non-overlapping rewrite via
run-parity window functions. Correctness is additionally pinned by
unit tests against a pure-Python reference implementation
(tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-split words — the one corpus-scale
    stage; everything after runs on unique words only."""
    return (
        df.select(
            F.explode(
                F.split(F.trim(F.col(text_col)), r"\s+")
            ).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _char_symbols(word: Column) -> Column:
    """Initial symbol sequence: characters plus a terminal end-of-word
    marker (the Sennrich convention, so merges can't cross words)."""
    return F.concat(
        F.split(word, ""),  # Spark: per-character split
        F.array(F.lit(END_OF_WORD)),
    )


def _merge_pass(syms: Column, left: str, right: str) -> Column:
    """One left-to-right, non-overlapping application of merge rule
    (left, right) -> left+right, as a JVM-side fold.

    Replace-last is exact for a single rule per pass: a freshly merged
    token equals ``left + right`` which can never equal ``left``
    (``right`` is non-empty), so a merge output never chains into a
    second merge within the same pass — matching the reference
    trainer's one-rule-per-iteration semantics.
    """
    merged = F.lit(left + right)

    def step(acc: Column, s: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right))
        )
        return F.when(
            hit,
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def _pair_counts(words: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent-pair counts weighted by word freq.
    Overlapping occurrences all count (standard BPE counting)."""
    pairs = words.where(F.size("syms") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i - 1] as left, syms[i] as right))"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(F.sum("freq").alias("cnt"))


def bpe_train(
    df: DataFrame,
    num_merges: int = 30,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``num_merges`` BPE merges; returns (merges_df, words_df).

    merges_df: (rank, left, right, merged, pair_count) — the learned
    merge table in application order. words_df: (word, freq, syms) —
    every seen word already encoded under all learned merges (the
    broadcast encode dictionary).

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (merging hapax pairs only memorizes
    noise). Determinism: ties broken by (count desc, left asc,
    right asc), so reruns and other cluster sizes learn the same
    table.
    """
    spark = df.sparkSession
    words = (
        word_frequencies(df, text_col)
        .withColumn("syms", _char_symbols(F.col("word")))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    for rank in range(num_merges):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], best[0]["cnt"]
        merges.append((rank, left, right, left + right, int(cnt)))
        words = words.withColumn(
            "syms", _merge_pass(F.col("syms"), left, right)
        ).localCheckpoint(eager=True)
        # No explicit unpersist of the previous iteration: localCheckpoint
        # persists the INTERNAL RDD directly (not via the cache manager),
        # so DataFrame.unpersist() cannot release it — the blocks are
        # reclaimed by the ContextCleaner once the superseded RDD becomes
        # unreferenced here (ADVICE r6). The lifetime is bounded and
        # small: the word table is corpus-vocabulary-sized (~10^4-10^6
        # narrow rows, NOT corpus-sized), stored MEMORY_AND_DISK, and at
        # most a GC-lag's worth of superseded iterations is ever held.
    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count bigint"
    )
    return merges_df, words


def bpe_vocab(merges_df: DataFrame, words_df: DataFrame) -> DataFrame:
    """(token, freq) final subword vocabulary: every symbol surviving
    in the encoded word table, frequency-weighted."""
    return (
        words_df.select(F.explode("syms").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").alias("freq"))
    )


def save_bpe_artifacts(
    merges_df: DataFrame, words_df: DataFrame, path: str
) -> None:
    """Persist a trained tokenizer: ``<path>/merges`` (the k-row merge
    table) and ``<path>/words`` (the encoded word dictionary) as
    parquet — the build-once/encode-many lifecycle (same pattern as
    the PQ/IVF index artifacts in scale/similarity.py). The word
    dictionary is the expensive part to recompute; persisting it means
    encode sessions never replay the merge loop."""
    merges_df.write.mode("overwrite").parquet(f"{path}/merges")
    words_df.select("word", "freq", "syms").write.mode("overwrite").parquet(
        f"{path}/words"
    )


def load_bpe_artifacts(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """(merges_df, words_df) from ``save_bpe_artifacts`` output."""
    return (
        spark.read.parquet(f"{path}/merges"),
        spark.read.parquet(f"{path}/words"),
    )


def bpe_encode(
    df: DataFrame,
    merges_df: DataFrame,
    words_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents under a trained BPE table: (id, tokens).

    The corpus joins its words against the trained dictionary — no
    merge folding on the hot path. The join strategy is deliberately
    left to Catalyst/AQE: on toy corpora the dictionary broadcasts on
    its size; at crawl scale the word table is ~10^8 rows (too big to
    broadcast) and the equi-join shuffles both sides on the word key,
    which is the correct plan there. Unseen words (possible when
    encoding a different corpus than the training one) fall back to
    character symbols with the merge table folded over them, applied
    only to the OOV remainder; the fold expression nests one level per
    merge, so for very large merge tables prefer re-training-corpus
    coverage (the dictionary path) over deep OOV folds.
    """
    merges = [
        (r["left"], r["right"]) for r in merges_df.orderBy("rank").collect()
    ]
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "word"
        ),
    ).where(F.col("word") != "")
    dictionary = words_df.select("word", F.col("syms").alias("dict_syms"))
    joined = toks.join(dictionary, "word", "left")
    oov = _char_symbols(F.col("word"))
    for left, right in merges:
        oov = _merge_pass(oov, left, right)
    encoded = joined.withColumn(
        "syms", F.coalesce(F.col("dict_syms"), oov)
    )
    grouped = (
        encoded.groupBy("id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "syms"))
                    ),
                    lambda s: s["syms"],
                )
            ).alias("tokens")
        )
    )
    # keep one row per input document: empty/whitespace-only texts have
    # no words, so they vanish before the groupBy — join them back with
    # tokens = [] instead of silently dropping ids (ADVICE r6)
    ids = df.select(F.col(id_col).alias("id")).distinct()
    return ids.join(grouped, "id", "left").select(
        "id",
        F.coalesce(
            F.col("tokens"), F.array().cast("array<string>")
        ).alias("tokens"),
    )
