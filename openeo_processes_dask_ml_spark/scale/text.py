"""Text analysis operators for training-data pipelines.

language-ID (marker-word scores), quality scoring, token counting, and
document fingerprinting — all pure Catalyst expressions (no Python
UDFs), so they fuse into one whole-stage-codegen projection over the
documents scan and survive any scale-up: the cost is one pass over the
text bytes, embarrassingly parallel, zero shuffle.

Every expression has an exact DuckDB twin (replace/length arithmetic,
regexp with RE2-safe patterns) for the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.scale.dedup import hash60, shingle_rows, tokens_expr
from openeo_processes_dask_ml_spark.scale.tuning import fan_out, local_rows_df
from openeo_processes_dask_ml_spark.utils.rounding import dround

# Marker words per language. The count trick — (len(s) - len(replace(s,
# marker, ''))) / len(marker) — is exact and identical in both engines.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "et", "les"),
    "es": ("el", "los", "de"),
}


def _occurrences(padded: Column, word: str) -> Column:
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.regexp_replace(padded, needle, " ")))
        / (len(needle) - 1)
    ).cast("bigint")


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-occurrence score per language over the padded, lowercased,
    whitespace-collapsed text."""
    padded = F.concat(
        F.lit(" "), F.regexp_replace(F.trim(F.lower(text)), r"\s+", " "), F.lit(" ")
    )
    return {
        lang: sum(_occurrences(padded, w) for w in words)  # Column sum via +
        for lang, words in LANG_MARKERS.items()
    }


def language_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Predicted language = argmax marker score, ties broken by the
    fixed language order en > de > fr > es (deterministic in both
    engines via a greatest + case chain)."""
    scores = lang_scores(F.col(text_col))
    order = list(LANG_MARKERS)
    best = F.greatest(*[scores[lang] for lang in order])
    pred = F.when(F.lit(False), F.lit(""))
    for lang in order:
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return df.select(
        F.col(id_col).alias("doc_id"),
        *[scores[lang].alias(f"score_{lang}") for lang in order],
        pred.alias("pred_lang"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: char/token counts, mean token length,
    alpha ratio, stopword ratio, plus a composite [0,1] score."""
    text = F.col(text_col)
    lowered = F.trim(F.lower(text))
    n_chars = F.length(text)
    toks = F.split(lowered, r"\s+")
    n_tokens = F.size(toks)
    alpha_only = F.regexp_replace(lowered, "[^a-z]", "")
    alpha_ratio = F.length(alpha_only) / F.greatest(n_chars, F.lit(1))
    mean_tok_len = (F.length(F.regexp_replace(lowered, r"\s+", ""))) / F.greatest(
        n_tokens, F.lit(1)
    )
    padded = F.concat(F.lit(" "), F.regexp_replace(lowered, r"\s+", " "), F.lit(" "))
    stop_hits = sum(
        _occurrences(padded, w) for w in ("the", "a", "and", "of", "in")
    )
    stop_ratio = stop_hits / F.greatest(n_tokens, F.lit(1))
    score = (
        F.least(n_tokens / F.lit(64.0), F.lit(1.0)) * 0.4
        + alpha_ratio * 0.4
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.2
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        dround(mean_tok_len, 4).alias("mean_token_len"),
        dround(alpha_ratio, 4).alias("alpha_ratio"),
        dround(stop_ratio, 4).alias("stopword_ratio"),
        dround(score, 4).alias("quality_score"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate (words are
    split every 4 chars, the coarse byte-pair proxy).

    The subword sum — sum over tokens of ceil(len/4) — is pure length
    arithmetic: greedily replacing each run of 1-4 non-space chars with
    ONE sentinel turns a token of length l into exactly ceil(l/4)
    sentinels, so (len after chunk-replace) - (len with tokens removed)
    IS the subword total. Two codegen regexp passes instead of an
    interpreted higher-order fold (the measured ~1s/100k-doc pitfall)."""
    text = F.col(text_col)
    n_tokens = F.size(tokens_expr(text))
    chunked = F.length(F.regexp_replace(text, r"\S{1,4}", "\x01"))
    stripped = F.length(F.regexp_replace(text, r"\S+", ""))
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_tokens.cast("bigint").alias("n_tokens"),
        (chunked - stripped).cast("bigint").alias("n_subwords"),
    )


def chunk_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 8,
) -> DataFrame:
    """Cross-corpus boilerplate removal: split every document into
    non-overlapping ``chunk_words``-word chunks, keep only the FIRST
    occurrence of each distinct chunk corpus-wide (ordered by doc id,
    then chunk position), and report per-document totals + kept ratio.

    Plan shape: one posexplode, one chunk-reassembly aggregation, a
    first-occurrence window partitioned BY CHUNK HASH (cardinality ~
    distinct chunks, so no single hot partition), one per-doc
    aggregation. All shuffles are hash-partitioned on high-cardinality
    keys — the classic exact paragraph/boilerplate dedup at corpus
    scale."""
    toks = tokens_expr(F.col(text_col))
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "word")
    )
    chunks = (
        exploded.withColumn("chunk_id", (F.col("pos") / chunk_words).cast("long"))
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "word"))
                    ),
                    lambda s: s["word"],
                ),
            ).alias("chunk_text")
        )
        .withColumn("chunk_hash", F.md5(F.col("chunk_text")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_id")
    flagged = chunks.withColumn(
        "kept", (F.row_number().over(w) == 1).cast("int")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("kept").cast("bigint").alias("n_kept"),
        )
        .withColumn(
            "kept_ratio",
            dround(F.col("n_kept") / F.col("n_chunks"), 4),
        )
    )


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 1
) -> DataFrame:
    """Top-k terms per document by tf-idf.

    tf = in-doc term count; idf = N / docfreq (the rational variant,
    not log-scaled — integer division is bit-exact across engines,
    where ln() differs in the last ulp and can flip near-tie ranks).
    Ranking breaks ties by term. Shape: one explode + two hash
    aggregations + a broadcast idf join — no cross joins, scales with
    corpus size."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = (
        tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_count"))
    )
    n_docs = df.select(F.col(id_col)).distinct().count()
    scored = tf.join(F.broadcast(docfreq), "term").select(
        "doc_id",
        "term",
        (F.col("tf").cast("double") * F.lit(float(n_docs)) / F.col("df_count")).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", dround(F.col("tfidf"), 6).alias("tfidf"), "rank")
    )


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Training-data PII scrubbing: mask emails then phone-like digit
    runs with typed placeholders, and count what was masked.

    Pure codegen regex passes (both patterns are RE2-safe, so a DuckDB
    oracle replicates them exactly); emails scrub FIRST so their digit
    fragments can't half-match as phones. At 100 TB this is a narrow
    projection — no shuffle at all."""
    text = F.col(text_col)
    n_emails = F.regexp_count(text, F.lit(PII_EMAIL_RE))
    no_email = F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>")
    n_phones = F.regexp_count(no_email, F.lit(PII_PHONE_RE))
    scrubbed = F.regexp_replace(no_email, PII_PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col).alias("doc_id"),
        n_emails.cast("bigint").alias("n_emails"),
        n_phones.cast("bigint").alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters: distinct-token ratio, the
    fraction held by the most frequent token, and the fraction of
    bigram slots held by the most frequent bigram — the standard
    repetitious-document signals for training-data curation.

    Shape: one posexplode + lead window (the shingle plan), two hash
    aggregations — everything whole-stage codegen, shuffles keyed on
    doc_id / (doc_id, gram)."""
    from pyspark.sql import Window

    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_expr(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    nxt = F.lead("tok").over(w)
    grams = ex.select(
        "doc_id",
        "tok",
        F.when(nxt.isNotNull(), F.concat_ws(" ", F.col("tok"), nxt)).alias(
            "bigram"
        ),
    )
    tok_stats = (
        grams.groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_tokens"),
            F.countDistinct("tok").alias("n_distinct"),
            F.max("count").alias("top_tok"),
        )
    )
    big_stats = (
        grams.filter(F.col("bigram").isNotNull())
        .groupBy("doc_id", "bigram")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bigram"), F.sum("count").alias("n_bigrams"))
    )
    joined = tok_stats.join(big_stats, "doc_id", "left")
    return joined.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        dround(F.col("n_distinct") / F.col("n_tokens"), 6).alias("distinct_ratio"),
        dround(F.col("top_tok") / F.col("n_tokens"), 6).alias("top_token_fraction"),
        dround(
            F.coalesce(F.col("top_bigram") / F.col("n_bigrams"), F.lit(0.0)), 6
        ).alias("top_bigram_fraction"),
    )


def document_fingerprints(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content fingerprint (md5 of the normalized text) plus a
    min-shingle-hash (the 1-hash MinHash — a rolling-window content
    signature robust to local edits)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    mins = (
        shingle_rows(df, text_col, id_col, 3)
        .groupBy("doc_id")
        .agg(F.min(hash60(F.col("shingle"), 0)).alias("min_shingle_hash"))
    )
    fps = df.select(
        F.col(id_col).alias("doc_id"), F.md5(norm).alias("fingerprint")
    )
    return fps.join(mins, "doc_id", "left")


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 30,
    max_words: int = 100_000,
    min_mean_wl: float = 3.0,
    max_mean_wl: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_stop_hits: int = 2,
    carry: tuple = (),
) -> DataFrame:
    """Gopher-style rule filter: word-count bounds, mean-word-length
    bounds, symbol-to-word ratio ('#' and '...'), and a distinct-
    stopword floor. Emits the per-rule verdicts AND the combined keep
    flag so downstream pipelines can audit why a document dropped.

    Two stages with an exchange barrier between them: stage 1 is ONE
    narrow projection over the text bytes where every regex count is
    computed exactly once (CollapseProject would otherwise inline the
    whitespace-collapse regex into every downstream consumer — the
    measured ~10x recompute pitfall); stage 2 is pure scalar arithmetic
    over ~50-byte feature rows. The tiny-feature shuffle doubles as the
    collapse barrier AND spreads the single-file scan across cores; at
    100 TB it moves (id, 6 ints) per KB-sized document — negligible
    next to the scan. The DuckDB twin mirrors the formulas
    term-for-term.

    ``carry`` names extra columns to keep on the output rows (they
    ride the feature shuffle — one narrow pass — instead of a
    join-back of the whole table; see q_pipeline_web_ingest).
    """
    text = F.col(text_col)
    c = F.regexp_replace(F.trim(text), r"\s+", " ")
    # '#'/'...' counts and stopword indicators don't care about
    # whitespace collapse — compute them over the raw text (one regex
    # pass each, no shared subtree to duplicate).
    n_hash = F.length(text) - F.length(F.regexp_replace(text, "#", ""))
    n_ell3 = F.length(text) - F.length(F.regexp_replace(text, r"\.\.\.", ""))
    stop_flags = [
        F.lower(text).rlike(rf"(^|\s){w}(\s|$)").cast("int").alias(f"s_{w}")
        for w in ("the", "a", "and", "of", "in")
    ]
    feats = df.select(
        F.col(id_col).alias("doc_id"),
        *carry,
        F.length(c).alias("len_c"),
        F.length(F.regexp_replace(c, " ", "")).alias("n_chars"),
        n_hash.alias("n_hash"),
        n_ell3.alias("n_ell3"),
        *stop_flags,
    )
    from openeo_processes_dask_ml_spark.utils.partitioning import spread

    feats = spread(feats)

    n_words = F.when(F.col("len_c") == 0, F.lit(0)).otherwise(
        F.col("len_c") - F.col("n_chars") + 1
    )
    mean_wl = F.when(n_words > 0, F.col("n_chars") / n_words).otherwise(F.lit(0.0))
    symbol_ratio = F.when(
        n_words > 0, (F.col("n_hash") + F.col("n_ell3") / 3) / n_words
    ).otherwise(F.lit(0.0))
    stop_hits = sum(F.col(f"s_{w}") for w in ("the", "a", "and", "of", "in"))
    ok_words = (n_words >= min_words) & (n_words <= max_words)
    ok_wl = (mean_wl >= min_mean_wl) & (mean_wl <= max_mean_wl)
    ok_sym = symbol_ratio <= max_symbol_ratio
    ok_stop = stop_hits >= min_stop_hits
    return feats.select(
        F.col("doc_id"),
        *carry,
        n_words.cast("bigint").alias("n_words"),
        dround(mean_wl, 6).alias("mean_word_len"),
        dround(symbol_ratio, 6).alias("symbol_ratio"),
        stop_hits.cast("int").alias("stop_hits"),
        ok_words.alias("ok_words"),
        ok_wl.alias("ok_word_len"),
        ok_sym.alias("ok_symbols"),
        ok_stop.alias("ok_stopwords"),
        (ok_words & ok_wl & ok_sym & ok_stop).alias("keep"),
    )


def duplicated_spans(
    df: DataFrame,
    span_tokens: int = 20,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    shape: str = "window",
) -> DataFrame:
    """ExactSubstr-style duplicated-span statistics (public method:
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499). Every ``span_tokens``-token sliding
    window is fingerprinted; a span whose fingerprint occurs at least
    ``min_count`` times across the corpus (any document, self-repeats
    included) is duplicated text. Returns per-document
    (doc_id, n_spans, n_dup_spans, dup_frac).

    Scale shape: explode + window-lead span build (whole-stage
    codegen), ONE hash aggregation on the span fingerprint (map-side
    combined — a boilerplate span shared by millions of docs is one
    carrying-a-count row, never a quadratic group), one shuffle join
    back on the fingerprint, one per-doc agg. No pairwise document
    join anywhere; this is the aggregate-side equivalent of the
    reference method's suffix array.
    """
    from pyspark.sql import Window

    from openeo_processes_dask_ml_spark.scale.dedup import ngram_array_expr

    # span build is a pure projection (r15 — ngram_array_expr): the
    # posexplode + lead() spelling paid a doc_id window shuffle per
    # evaluation, and the "combine" shape evaluates the build twice.
    # fan_out (r16): the ngram regexp + md5 otherwise run inside the
    # scan's task count — 1 task on a single-file input (0.95 s of the
    # combine shape's 2.0 s wall, profiled); all consumers are exact
    # integer aggregations on the fingerprint, layout-independent
    df = fan_out(df)
    spans = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(ngram_array_expr(text_col, span_tokens)).alias("span"),
    ).select("doc_id", F.md5(F.col("span")).alias("h"))
    # Two plan shapes for the occurrence count, chosen by ``shape``
    # (ADVICE r6: real web crawls DO have one boilerplate span in
    # >>10^7 docs, so the crawl-scale caller must be able to pick the
    # combine-friendly plan):
    #  - "window" (default): count over a window on the fingerprint
    #    partition — builds the explode+lead spans ONCE and pays one
    #    shuffle on h (1.7 -> 1.1 s at sf0.1 vs join-back), but a
    #    pathologically hot fingerprint buffers all its occurrences in
    #    one spill-safe window partition.
    #  - "combine": groupBy(h) + join back — the hot span map-side
    #    combines into one carrying-a-count row per partition (no
    #    buffering, no skewed partition; AQE skew-join splits the join
    #    side), at the cost of evaluating the span build twice
    #    (shared-subtree duplication). At crawl scale this is the
    #    shape that survives.
    if shape == "combine":
        # filter to DUPLICATED fingerprints before the join-back: the
        # join side shrinks from every distinct span (mostly
        # singletons) to only the dup spans, so AQE can usually
        # broadcast it and the spans side never shuffles; when the dup
        # set is still huge the shuffle join runs on a strictly
        # smaller side (r16 — the combine shape pays the span build
        # twice, so its join is the part worth shrinking)
        counts = (
            spans.groupBy("h")
            .agg(F.count(F.lit(1)).alias("n_occ"))
            .filter(F.col("n_occ") >= min_count)
        )
        flagged = spans.join(counts, "h", "left").select(
            "doc_id", F.col("n_occ").isNotNull().alias("dup")
        )
    elif shape == "window":
        flagged = spans.withColumn(
            "n_occ", F.count(F.lit(1)).over(Window.partitionBy("h"))
        ).select("doc_id", (F.col("n_occ") >= min_count).alias("dup"))
    else:
        raise ValueError(f"shape must be 'window' or 'combine', got {shape!r}")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("dup").cast("bigint")).alias("n_dup_spans"),
        )
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            dround(
                F.col("n_dup_spans").cast("double") / F.col("n_spans"), 6
            ).alias("dup_frac"),
        )
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 65536,
    smoothing: float = 0.5,
) -> DataFrame:
    """Language-model quality proxy (public method: Wenzek et al. 2020,
    CCNet, arXiv:1911.00359 — perplexity filtering; unigram variant):
    train a unigram model on the corpus itself — top ``vocab_size``
    tokens by frequency with add-k smoothing and an OOV bucket — and
    score every document by its mean negative log2 token probability.
    Low score = fluent, common text; high = rare/gibberish. The usual
    use is a percentile cut, like ``quality_filter``'s rule verdicts.

    Scale shape: one explode + hash agg for token counts, a top-k for
    the vocabulary (BOUNDED by vocab_size, so the probability table is
    genuinely broadcastable at any corpus size — unlike a full vocab
    join), one broadcast join back, one per-doc agg. Total/vocab-size
    scalars ride along on a broadcast 1-row frame; nothing collects.
    """
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("t"),
    )
    counts = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    vocab = counts.orderBy(F.col("c").desc(), F.col("t")).limit(vocab_size)
    totals = counts.agg(
        F.sum("c").alias("__total"), F.count(F.lit(1)).alias("__nv")
    ).crossJoin(vocab.agg(F.count(F.lit(1)).alias("__v")))
    k = float(smoothing)
    denom = F.col("__total") + k * (F.col("__v") + 1)
    p = (F.coalesce(F.col("c"), F.lit(0)).cast("double") + k) / denom
    scored = (
        tok.join(F.broadcast(vocab), "t", "left")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", F.log2(p).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (-F.avg("lp")).alias("raw"),
        )
        .select(
            "doc_id",
            "n_tokens",
            dround(F.col("raw"), 6).alias("lm_score"),
        )
    )


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 65536,
    cuts: tuple = (1.0 / 3.0, 2.0 / 3.0),
) -> DataFrame:
    """The CCNet head/middle/tail split (Wenzek et al. 2020): documents
    bucketed by corpus percentiles of the unigram LM score — head =
    most fluent third, tail = least. Returns (doc_id, lm_score,
    bucket).

    The two cut values are one exact-percentile aggregation over the
    scores (at extreme scale swap in percentile_approx — the t-digest
    cut moves by at most the sketch rank error); they broadcast as a
    1-row frame into a pure-codegen bucket projection.
    """
    scores = unigram_logprob(df, text_col, id_col, vocab_size)
    lo, hi = float(cuts[0]), float(cuts[1])
    cuts_df = scores.agg(
        F.expr(f"percentile(lm_score, {lo!r})").alias("__lo"),
        F.expr(f"percentile(lm_score, {hi!r})").alias("__hi"),
    )
    bucket = (
        F.when(F.col("lm_score") <= F.col("__lo"), F.lit("head"))
        .when(F.col("lm_score") <= F.col("__hi"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scores.crossJoin(F.broadcast(cuts_df)).select(
        "doc_id", "lm_score", bucket.alias("bucket")
    )


def remove_duplicated_spans(
    df: DataFrame,
    span_tokens: int = 20,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    shape: str = "window",
) -> DataFrame:
    """ExactSubstr span REMOVAL (the rewrite half of Lee et al. 2022,
    arXiv:2107.06499): where ``duplicated_spans`` only measures, this
    emits the cleaned corpus. Every ``span_tokens``-token window whose
    fingerprint occurs >= ``min_count`` times corpus-wide is duplicated
    text; the occurrence with the smallest (doc_id, position) is kept
    as canonical, every other occurrence becomes a removal interval,
    and a token is dropped iff some removal interval covers it.
    Output: (doc_id, clean_text, n_tokens, n_removed) over NORMALIZED
    (trim/lower/single-space) tokens — the form every other text
    operator in this module scores.

    Scale shape: the span build is the duplicated_spans explode+lead
    (codegen); canonical selection is a min-struct
    window on the fingerprint partition (one shuffle on h, span build
    evaluated once); interval coverage is evaluated per document
    with an indexed array filter — intervals per doc are bounded by
    its own span count, so no range join and no pairwise work.
    """
    from pyspark.sql import Window

    from openeo_processes_dask_ml_spark.scale.dedup import ngram_array_expr

    # fan_out (r16, as in duplicated_spans): the span build (ngram
    # regexp + md5) and the token-list projection otherwise run inside
    # the scan's task count — 1 task on a single-file input (profiled:
    # a 1.54 s single-task job of a 3.6 s wall). Both consumers derive
    # from the SAME fanned frame, so ReuseExchange ships the rows once;
    # every downstream step is keyed on h or doc_id, layout-independent.
    df = fan_out(df)
    # the reconstruction token list MUST index the same tokens the
    # span positions count: ngram_array_expr positions are \S+ token
    # indexes, while tokens_expr's split keeps a leading '' token for
    # text starting with non-space whitespace (F.trim strips only
    # spaces), which shifted every removal interval by one on such
    # docs (r15 review, confirmed repro). Filter the empties so the
    # list is exactly the \S+ sequence.
    toks_df = df.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            tokens_expr(F.col(text_col)), lambda t: t != F.lit("")
        ).alias("l"),
    )
    # span build is a pure projection (r15 — ngram_array_expr, see
    # duplicated_spans): posexplode of the positionally-ordered gram
    # array gives pos == starting token index, identical to the old
    # window-lead spelling, without its per-evaluation doc_id shuffle
    spans = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(ngram_array_expr(text_col, span_tokens)).alias(
            "pos", "span"
        ),
    ).select("doc_id", "pos", F.md5(F.col("span")).alias("h"))
    # n_occ + canonical (min doc_id, pos) per fingerprint, in the shape
    # ``shape`` picks — same trade-off as duplicated_spans (ADVICE r6):
    # "window" builds spans once (one shuffle on h, spill-safe window
    # buffering, loses map-side combine on a pathologically hot span);
    # "combine" groupBy-aggregates per fingerprint (map-side combine
    # absorbs crawl-scale boilerplate skew) and joins back, evaluating
    # the span build twice.
    if shape == "combine":
        stats = spans.groupBy("h").agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct(F.col("doc_id"), F.col("pos"))).alias("canon"),
        )
        occ = spans.join(stats, "h")
    elif shape == "window":
        wh = Window.partitionBy("h")
        occ = spans.withColumn(
            "n_occ", F.count(F.lit(1)).over(wh)
        ).withColumn(
            "canon", F.min(F.struct(F.col("doc_id"), F.col("pos"))).over(wh)
        )
    else:
        raise ValueError(f"shape must be 'window' or 'combine', got {shape!r}")
    removal = (
        occ.filter(F.col("n_occ") >= min_count)
        .filter(
            ~(
                (F.col("doc_id") == F.col("canon.doc_id"))
                & (F.col("pos") == F.col("canon.pos"))
            )
        )
        .select(
            "doc_id",
            F.col("pos").alias("s"),
            (F.col("pos") + span_tokens - 1).alias("e"),
        )
    )
    iv = removal.groupBy("doc_id").agg(
        F.collect_list(F.struct("s", "e")).alias("ivs")
    )
    kept = F.when(F.col("ivs").isNull(), F.col("l")).otherwise(
        F.filter(
            F.col("l"),
            lambda x, i: ~F.exists(
                F.col("ivs"), lambda v: (i >= v["s"]) & (i <= v["e"])
            ),
        )
    )
    return (
        toks_df.join(iv, "doc_id", "left")
        .select("doc_id", kept.alias("kept"), F.size("l").alias("n_tokens"))
        .select(
            "doc_id",
            F.array_join(F.col("kept"), " ").alias("clean_text"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            (F.col("n_tokens") - F.size("kept")).cast("bigint").alias("n_removed"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    max_df_frac: float = 0.2,
    min_df_cap: int = 128,
    tf_cap: int = 255,
    idf_cap: int = 10_000,
    dense_vocab_max: int = 1024,
) -> DataFrame:
    """Weighted near-duplicate pairs: cosine similarity of tf-idf
    vectors via the term-postings inverted index (the sparse-vector
    sibling of ``dedup.ngram_jaccard_pairs`` — weighted overlap instead
    of set overlap, so boilerplate-heavy docs that share only common
    words score LOW while docs sharing rare vocabulary score high).

    Vocabulary = terms with document frequency <= max(min_df_cap,
    max_df_frac * n_docs) — the standard stop-term cut, and the skew
    guard: it bounds every postings join group, so one ultra-common
    term cannot create a quadratic stage. The cut is part of the
    operator's semantics (weights, norms, and cosines are all defined
    over the capped vocabulary) and the DuckDB oracle applies the same
    cut, keeping the comparison exact rather than fixture-dependent.

    Exactness across engines: weights are INTEGERS —
    w = min(tf, tf_cap) * min(n_docs // df, idf_cap) — so the norm²
    and pair-dot aggregations sum BIGINTs (order-free, bit-exact in
    any engine at any parallelism), and only the final
    dot / (sqrt(n²_a) * sqrt(n²_b)) touches floating point, computed
    from identical integers on both sides. The two caps are the int64
    overflow guard: w <= 2.55e6, so a 100k-distinct-term document's
    norm² stays below 6.6e17 < 2^63. Sublinear tf capping and idf
    ceilings are standard IR practice (Salton & Buckley 1988), not a
    concession.

    Scale shape (100 TB): one explode + (doc,term) hash agg, one term
    hash agg for df (broadcast), the capped-vocab postings self-join
    keyed on term, one (id_a,id_b) hash agg. No cross join; join-group
    sizes bounded by the df cap.

    ADAPTIVE PHYSICAL PLAN (stats-driven, like Catalyst's own
    broadcast-vs-shuffle choice): when the capped vocabulary is tiny
    (<= ``dense_vocab_max`` terms) every document overlaps every
    other and the inverted index degenerates to Ω(n²) join rows built
    one term at a time — measured 130 s at 5k docs on a 31-term
    corpus. In that regime the operator pivots each doc to a DENSE
    integer-weight vector and delegates to
    ``similarity.cosine_pairs_blocked`` (the distributed block-matrix
    engine): same O(n²) pair space but vectorized numpy instead of a
    248M-row shuffle — measured 130 s -> ~4 s. Results are
    BIT-IDENTICAL to the sparse path and the oracle: the weights are
    integers, and 1024 * (255 * 10^4)² < 2^53 keeps every float64
    dot/norm sum exact, so both paths compute the same integers
    before the one float division. The dense pivot requires
    threshold > 0 (a zero threshold would surface no-overlap pairs
    the postings join never sees).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    n_docs_df = df.select(F.col(id_col)).agg(
        F.count(F.lit(1)).alias("__n_docs")
    )
    cap = F.greatest(
        F.lit(float(min_df_cap)), F.col("__n_docs") * F.lit(max_df_frac)
    )
    vocab_full = (
        dfreq.crossJoin(F.broadcast(n_docs_df))
        .filter(F.col("dfc").cast("double") <= cap)
        .select(
            "term",
            F.least(
                F.floor(F.col("__n_docs") / F.col("dfc")), F.lit(idf_cap)
            )
            .cast("bigint")
            .alias("idf"),
            "__n_docs",
        )
    )
    vocab = vocab_full.select("term", "idf")
    w = (
        F.least(F.col("tf"), F.lit(tf_cap)).cast("bigint") * F.col("idf")
    ).alias("w")
    posts = tf.join(vocab, "term").select("doc_id", "term", w)

    # dense path only while every float64 sum stays exact (see docstring)
    dense_exact = (
        dense_vocab_max > 0
        and dense_vocab_max * (tf_cap * idf_cap) ** 2 < 2**53
    )
    if threshold > 0 and dense_exact:
        # ONE bounded driver action decides the plan, in ONE job (r16):
        # limit(max+1) caps memory everywhere (LocalLimit truncates
        # each partition before the exchange), and folding the capped
        # rows through collect_list makes the collect a single
        # aggregation job instead of CollectLimit's escalating
        # partial scans (which re-ran the reduce stage up to 4x to
        # fill the quota on this normally-small result). The term SET
        # is deterministic exactly when it is used: <= max rows means
        # the limit returned the whole vocabulary.
        #
        # The decision collect returns (term, idf) AND n_docs (r16,
        # guide §1.2/§5.4): when the dense path fires, the bounded
        # vocabulary it just fetched IS the weight table — rebuilding
        # it distributed put the dfreq groupBy + corpus-count subtrees
        # into the final plan a second time, and sizing blocks cost a
        # third scan (df.count()). idf is a deterministic integer per
        # term, so the broadcast-local rebuild is value-identical.
        head_row = (
            vocab_full.limit(dense_vocab_max + 1)
            .agg(
                F.collect_list(F.struct("term", "idf")).alias("t"),
                F.first("__n_docs").alias("n"),
            )
            .first()
        )
        head = head_row["t"]
        terms = head if len(head) <= dense_vocab_max else None
        if terms is not None:
            from openeo_processes_dask_ml_spark.scale.similarity import (
                cosine_pairs_blocked,
            )

            vocab_rows = sorted((r["term"], int(r["idf"])) for r in terms)
            V = len(vocab_rows)
            if V == 0:
                return posts.select(
                    F.col("doc_id").alias("id_a"),
                    F.col("doc_id").alias("id_b"),
                    F.lit(0.0).alias("cosine"),
                ).limit(0)
            # weight table as a broadcast LOCAL relation: the final
            # plan's posts join reads the rows the decision collect
            # already fetched instead of re-running dfreq + the corpus
            # count (same integers by construction)
            local_vocab = local_rows_df(
                df.sparkSession, vocab_rows, "term string, idf bigint"
            )
            posts = tf.join(F.broadcast(local_vocab), "term").select(
                "doc_id", "term", w
            )
            idx = F.create_map(
                *[x for i, (t, _) in enumerate(vocab_rows)
                  for x in (F.lit(t), F.lit(i))]
            )
            dense = (
                posts.groupBy("doc_id")
                .agg(
                    F.map_from_entries(
                        F.collect_list(
                            F.struct(
                                idx[F.col("term")].alias("k"),
                                F.col("w").cast("double").alias("v"),
                            )
                        )
                    ).alias("m")
                )
                .select(
                    "doc_id",
                    F.transform(
                        F.sequence(F.lit(0), F.lit(V - 1)),
                        lambda i: F.coalesce(F.col("m")[i], F.lit(0.0)),
                    ).alias("v"),
                )
            )
            # size blocks from the corpus count the decision collect
            # already carries (r16 — df.count() was a third full scan;
            # counting `dense` would re-execute the whole pivot)
            n_blocks = max(2, min(16, int(head_row["n"]) // 512 + 1))
            return cosine_pairs_blocked(
                dense,
                vec_col="v",
                id_col="doc_id",
                threshold=threshold,
                n_blocks=n_blocks,
                # integer weights: any-association float64 sums exact
                # (guarded by dense_exact above) -> BLAS path
                assoc_exact=True,
            )

    norms = posts.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).alias("nrm2")
    )
    a, b = posts.alias("a"), posts.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.term") == F.col("b.term"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("na.nrm2").cast("double"))
        * F.sqrt(F.col("nb.nrm2").cast("double"))
    )
    return (
        dots.join(norms.alias("na"), F.col("id_a") == F.col("na.doc_id"))
        .join(norms.alias("nb"), F.col("id_b") == F.col("nb.doc_id"))
        .select("id_a", "id_b", cos.alias("raw"))
        .filter(F.col("raw") >= threshold)
        .select("id_a", "id_b", dround(F.col("raw"), 6).alias("cosine"))
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 65536,
    smoothing: float = 0.5,
    lam: float = 0.75,
) -> DataFrame:
    """Bigram language-model quality score: mean negative log2 of the
    interpolated bigram probability — the context-aware upgrade of
    ``unigram_logprob`` (Jelinek-Mercer interpolation, the classic
    smoothing from Jelinek & Mercer 1980 / Chen & Goodman 1999):

        p(w2|w1) = lam * (c(w1,w2) + k) / (c(w1) + k*(V+1))
                 + (1-lam) * p_unigram(w2)

    Word-salad text that passes a unigram filter (common words, random
    order) scores high here because its bigrams are unseen. Returns
    (doc_id, n_bigrams, lm2_score); docs with < 2 tokens are dropped
    (no bigram evidence).

    Scale shape: the bigram build is the shingle plan (posexplode +
    lead over the doc_id window — codegen); counts are two hash aggs;
    the bigram table is NOT broadcast (it is corpus-sized) — the score
    join is an equi-join on the bigram key, co-partitioned with the
    count agg that produced it, so the only wide exchange is keyed on
    (w1,w2). The unigram table is vocab_size-bounded and broadcasts.
    """
    from pyspark.sql import Window

    ex = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_expr(F.col(text_col))).alias("pos", "w1"),
    )
    wnd = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        ex.select(
            "doc_id",
            "w1",
            F.lead("w1", 1).over(wnd).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    uni = ex.groupBy(F.col("w1").alias("t")).agg(
        F.count(F.lit(1)).alias("c")
    )
    vocab = uni.orderBy(F.col("c").desc(), F.col("t")).limit(vocab_size)
    totals = uni.agg(
        F.sum("c").alias("__total")
    ).crossJoin(vocab.agg(F.count(F.lit(1)).alias("__v")))
    k = float(smoothing)
    bic = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    w1c = bi.groupBy(F.col("w1").alias("t")).agg(
        F.count(F.lit(1)).alias("c1")
    )
    p_uni = (F.coalesce(F.col("vc"), F.lit(0)).cast("double") + k) / (
        F.col("__total") + k * (F.col("__v") + 1)
    )
    p_bi = (F.coalesce(F.col("c12"), F.lit(0)).cast("double") + k) / (
        F.coalesce(F.col("c1"), F.lit(0)) + k * (F.col("__v") + 1)
    )
    p = F.lit(lam) * p_bi + F.lit(1.0 - lam) * p_uni
    scored = (
        bi.join(bic, ["w1", "w2"], "left")
        .join(w1c.withColumnRenamed("t", "w1"), "w1", "left")
        .join(
            F.broadcast(vocab.select(F.col("t").alias("w2"), F.col("c").alias("vc"))),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .select("doc_id", F.log2(p).alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.avg("lp")).alias("raw"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            dround(F.col("raw"), 6).alias("lm2_score"),
        )
    )


def cdc_duplicate_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    boundary_bits: int = 3,
    min_docs: int = 2,
) -> DataFrame:
    """Content-defined chunking (CDC) duplicate detection: chunk
    boundaries fall AFTER any word whose hash lands in a
    ``1/2^boundary_bits`` bucket (the word-level analog of gear/Rabin
    rolling-hash CDC), so chunk edges are determined by CONTENT alone
    — an insertion or deletion only perturbs the one chunk it touches,
    where fixed-width chunking (``chunk_dedup``) shifts every
    subsequent boundary and misses all downstream repeats. Returns one
    row per chunk seen in at least ``min_docs`` distinct documents:
    (chunk_hash, n_docs, n_occurrences, n_words).

    Plan shape (the ``chunk_dedup`` scale posture): one posexplode,
    one window shuffle on doc_id (the boundary cumulative sum), one
    (doc, chunk)-keyed reassembly aggregation, one final aggregation
    keyed by chunk hash — every shuffle hash-partitioned on a
    high-cardinality key. No driver materialization. The standard
    caveat applies and is deliberate: pure content-defined cuts carry
    no min/max chunk-size clamps (clamps re-introduce the positional
    dependence CDC exists to remove, and make the operator
    sequentially stateful); degenerate runs are bounded by document
    length."""
    from pyspark.sql import Window

    toks = tokens_expr(F.col(text_col))
    exploded = df.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("pos", "word")
    )
    boundary = (
        F.pmod(hash60(F.col("word"), "cdc"), F.lit(1 << boundary_bits))
        == 0
    ).cast("long")
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunk_idx = F.coalesce(F.sum(boundary).over(w), F.lit(0))
    chunks = (
        exploded.withColumn("chunk_idx", chunk_idx)
        .groupBy("doc_id", "chunk_idx")
        .agg(
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "word"))),
                        lambda s: s["word"],
                    ),
                )
            ).alias("chunk_hash"),
            F.count(F.lit(1)).alias("nw"),
        )
    )
    return (
        chunks.groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("nw").alias("n_words"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k retrieval (Robertson/Sparck Jones; the Lucene-style
    non-negative ``ln(1 + (N - df + .5)/(df + .5))`` idf) over a
    document corpus for a bounded batch of query strings — the text
    sibling of the ANN top-k surface (NEW r13).

    Engine-exact value discipline: idf is the ONE transcendental and
    is quantized per term (``dround(.., 6)``) before any arithmetic;
    tf normalization is rational (exact given integer tf/dl and the
    exact ``sum(dl)/n`` avgdl); per-(query, doc) scores accumulate as
    the FOLD-ORDERED ``sort_array + F.aggregate`` sum by term (the
    domain_pagerank idiom, bit-identical to DuckDB's ordered
    ``list_reduce``); ranking is on the quantized
    ``floor(score * 1e6 + .5)`` with doc_id tie-breaks
    (quantize-before-order, r12 doctrine). Query term frequency is
    ignored (distinct query terms — the standard short-query
    simplification).

    100 TB shape: ONE corpus explode; doc lengths are a doc-keyed
    aggregation; postings are filtered to the query-term set by a
    BROADCAST semi join BEFORE the (doc, term) tf aggregation, so
    only matching-term occurrences shuffle; idf/avgdl are tiny
    broadcast sides; the final top-k is a per-query window over one
    row per MATCHED (query, doc) pair. For adversarially common query
    terms (stopword queries over a crawl) pre-trim the candidate set
    with a per-term postings cap — the WAND-family pruning — before
    the window; this implementation scores all matches."""
    spark = df.sparkSession
    qt = _bm25_query_terms(spark, queries)
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("term"),
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    post = (
        tok.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return _bm25_rank(post, dl, stats, qt, k, k1, b)


def _bm25_query_terms(spark, queries: list[tuple[int, str]]) -> DataFrame:
    qt_rows = sorted(
        {
            (int(qid), t)
            for qid, qs in queries
            for t in set(qs.strip().lower().split())
        }
    )
    if not qt_rows:
        raise ValueError("bm25: no query terms")
    return local_rows_df(spark, qt_rows, "query_id bigint, term string")


def _bm25_rank(
    post: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    qt: DataFrame,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared scoring core of the direct and from-index paths: posts
    MUST already be pruned to the query-term set. df-per-term comes
    from counting the pruned postings — identical to the corpus df
    for those terms, so roundtrip == direct by construction."""
    from pyspark.sql import Window

    idf = (
        post.groupBy("term")
        .agg(F.count(F.lit(1)).alias("dfc"))
        .crossJoin(F.broadcast(stats.select("n_docs")))
        .select(
            "term",
            dround(
                F.log(
                    (F.col("n_docs") - F.col("dfc") + F.lit(0.5))
                    / (F.col("dfc") + F.lit(0.5))
                    + F.lit(1.0)
                ),
                6,
            ).alias("idf"),
        )
    )
    w_term = (
        F.col("idf") * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
    ) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + (F.lit(b) * F.col("dl").cast("double")) / F.col("avgdl")
        )
    )
    scored = (
        post.join(F.broadcast(qt), "term")
        .join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select("query_id", "doc_id", "term", w_term.alias("w"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "w"))),
                F.lit(0.0),
                lambda a, x: a + x["w"],
            ).alias("score")
        )
        .select(
            "query_id",
            "doc_id",
            F.floor(F.col("score") * F.lit(1000000.0) + F.lit(0.5))
            .cast("bigint")
            .alias("qscore"),
        )
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.col("qscore").desc(), "doc_id"
    )
    return (
        scored.withColumn(
            "rank", F.row_number().over(w_rank).cast("bigint")
        )
        .filter(F.col("rank") <= k)
    )


def build_bm25_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build-once / query-many lifecycle for BM25 (VERDICT r13 #6 —
    the ANN ``build_*_index`` discipline of similarity.py applied to
    text retrieval): returns the three persist-ready index artifacts

    - ``postings`` (term, doc_id, tf) — the full inverted index,
    - ``doclen``   (doc_id, dl) — per-doc token counts,
    - ``stats``    (n_docs, avgdl) — one row.

    Write each with ``.write.parquet``; for 100 TB corpora write the
    postings ``repartition(n, "term").sortWithinPartitions("term")``
    so a query session's term IN-filter prunes row groups at the
    scan (min/max stats pushdown) instead of rescanning the corpus.
    A query session then serves any number of top-k requests through
    ``bm25_topk_from_index`` without touching the raw documents."""
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("term"),
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    post = tok.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    return post, dl, stats


def bm25_topk_from_index(
    postings: DataFrame,
    doclen: DataFrame,
    stats: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Serve BM25 top-k from persisted index artifacts — identical
    scoring core as ``bm25_topk`` (quantized idf, fold-ordered sums,
    quantize-before-order ranking), so roundtrip == direct. The
    query-term prune happens TWICE on purpose: a literal IN filter
    (parquet row-group pushdown when the postings were written
    term-sorted) and the broadcast semi-join (exact prune for
    whatever the scan still surfaced) — only matching postings ever
    shuffle."""
    spark = postings.sparkSession
    qt = _bm25_query_terms(spark, queries)
    terms = sorted(
        {t for _, qs in queries for t in qs.strip().lower().split()}
    )
    post = (
        postings.filter(F.col("term").isin(terms))
        .join(F.broadcast(qt.select("term").distinct()), "term")
        .select("doc_id", "term", "tf")
    )
    return _bm25_rank(post, doclen, stats, qt, k, k1, b)


_BP_COUNTER_RE = r"(?i)^\d+\s+(likes?|comments?|shares?|views?|votes?)$"
_BP_KEYWORD_RE = (
    r"(?i)(cookie|subscribe|sign (in|up)|all rights reserved"
    r"|terms of (use|service)|privacy policy|click here|read more"
    r"|share this|advertisement)"
)


def boilerplate_removal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 2,
    max_upper_ratio: float = 0.6,
    max_digit_ratio: float = 0.5,
    sep: str = "\n",
) -> DataFrame:
    """Per-document line-wise boilerplate removal (NEW r14) — the
    RefinedWeb/MassiveText "line-wise corrections" stage that runs
    BEFORE corpus-level ``line_dedup``: drop a line when it (a) has
    fewer than ``min_words`` words, (b) is mostly uppercase
    (uppercase/letters > ``max_upper_ratio``), (c) is mostly digits
    (digits/non-space > ``max_digit_ratio``), (d) is a social counter
    ("3 likes"), or (e) carries a navigation/legal keyword (cookie /
    subscribe / all rights reserved / ...). Survivors reassemble in
    original order. Emits (id, clean_text, n_lines, n_removed) — the
    ``line_dedup`` output contract, so the two stages chain.

    Per-doc only — NO shuffle at all besides the reassembly groupBy
    (and Catalyst keeps explode -> filter -> groupBy in one exchange
    on the id); every rule is a codegen column expression whose
    integer-ratio comparisons are IEEE-identical across engines, so
    the SQL oracle replays them exactly."""
    import re as _re

    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep))
        ).alias("pos", "line"),
    )
    t = F.trim(F.col("line"))
    n_words = F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )
    letters = F.length(F.regexp_replace(t, "[^A-Za-z]", ""))
    uppers = F.length(F.regexp_replace(t, "[^A-Z]", ""))
    nonspace = F.length(F.regexp_replace(t, r"\s", ""))
    digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    drop = (
        (n_words < F.lit(min_words))
        | ((letters > 0) & (uppers / letters > F.lit(max_upper_ratio)))
        | (
            (nonspace > 0)
            & (digits / nonspace > F.lit(max_digit_ratio))
        )
        | t.rlike(_BP_COUNTER_RE)
        | t.rlike(_BP_KEYWORD_RE)
    )
    tagged = lines.withColumn("bp", drop)
    return (
        tagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("bp"), F.struct("pos", "line")
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(F.col("bp").cast("int"))
            .cast("bigint")
            .alias("n_removed"),
        )
    )


def line_dedup(
    df: DataFrame,
    max_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-level line deduplication — CCNet's first cleaning stage
    (Wenzek et al. 2020 hash every paragraph and drop the ones that
    repeat across the crawl: navigation bars, cookie banners,
    subscribe footers). Lines whose corpus-wide occurrence count
    exceeds ``max_count`` are removed from every document; surviving
    lines reassemble in original order.

    Scale shape: lines explode once; the frequency table keys on
    md5(line) so the count shuffle and the verdict join both carry a
    32-char key instead of arbitrary-length line text; reassembly is
    one groupBy(id) with an order-restoring sort_array over (pos,
    line) structs — two narrow shuffles and one equi-join total, no
    window. Emits (id, clean_text, n_lines, n_removed)."""
    # F.split takes a REGEX but reassembly joins the LITERAL sep —
    # escape so a metachar separator ('|', '.') can't explode the text
    # into characters (caught in review)
    import re as _re

    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), _re.escape(sep))
        ).alias("pos", "line"),
    ).withColumn("lh", F.md5("line"))
    hot = (
        lines.groupBy("lh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > max_count)
        .select("lh", F.lit(True).alias("hot"))
    )
    tagged = lines.join(hot, "lh", "left")
    return (
        tagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("hot").isNull(),
                                F.struct("pos", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("clean_text"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum(
                F.when(F.col("hot").isNotNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_removed"),
        )
    )
