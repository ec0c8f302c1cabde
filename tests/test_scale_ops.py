"""Scale-operator semantics: approx-aggregate accuracy, duplicate-
cluster convergence (pointer doubling), banker's rounding, and the
regex-arithmetic subword count."""

import warnings

import pytest
from pyspark.sql import functions as F


def test_approx_aggregates_accuracy(spark):
    """Sketches have no cross-engine oracle; assert accuracy against
    exact results instead (HLL++ rsd=0.02 -> well within 5%)."""
    df = spark.range(10000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 3000).alias("u"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    got = (
        df.groupBy("g")
        .agg(
            F.approx_count_distinct("u", rsd=0.02).alias("approx_u"),
            F.percentile_approx("v", 0.5, 10000).alias("p50"),
        )
        .collect()
    )
    exact = {
        r["g"]: (r["nu"], r["m"])
        for r in df.groupBy("g")
        .agg(
            F.countDistinct("u").alias("nu"),
            F.expr("percentile(v, 0.5)").alias("m"),
        )
        .collect()
    }
    for r in got:
        nu, med = exact[r["g"]]
        assert abs(r["approx_u"] - nu) / nu < 0.05
        assert abs(r["p50"] - med) <= 1.0


def test_duplicate_clusters_long_chain_pointer_doubling(spark):
    """A 40-node chain has diameter 39; pointer doubling must converge
    well inside 10 iterations (plain propagation would need 39)."""
    from openeo_processes_dask_ml_spark.scale.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(39)], ["id_a", "id_b"]
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # non-convergence would raise
        out = duplicate_clusters(
            pairs, max_iterations=10, driver_edge_threshold=0
        )
        got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {i: 0 for i in range(40)}


def test_duplicate_clusters_warns_without_convergence(spark):
    from openeo_processes_dask_ml_spark.scale.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], ["id_a", "id_b"]
    )
    with pytest.warns(RuntimeWarning, match="did not converge"):
        duplicate_clusters(
            pairs, max_iterations=1, driver_edge_threshold=0
        ).collect()


def test_duplicate_clusters_paths_agree_across_threshold(spark):
    """The driver union-find fast path and the distributed min-label
    loop are the SAME operator: identical (doc_id, cluster_id) labels
    on a graph with chains, a star, singleton-free isolates and
    reversed/duplicated edges."""
    from openeo_processes_dask_ml_spark.scale.dedup import duplicate_clusters

    raw = (
        [(i, i + 1) for i in range(10)]          # chain 0..10
        + [(100, j) for j in range(101, 106)]    # star at 100
        + [(3, 2), (2, 3), (7, 7)]               # reversed dup + self-loop
        + [(200, 201)]                           # separate pair
    )
    pairs = spark.createDataFrame(raw, ["id_a", "id_b"])
    fast = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(pairs).collect()
    }
    dist = {
        (r["doc_id"], r["cluster_id"])
        for r in duplicate_clusters(pairs, driver_edge_threshold=0).collect()
    }
    assert fast == dist
    assert (105, 100) in fast and (201, 200) in fast and (10, 0) in fast


def test_round_process_is_bankers(spark):
    """openEO 'round' is round-half-to-even: 2.5 -> 2, 3.5 -> 4."""
    from openeo_processes_dask_ml_spark.graph.registry import default_registry

    reg = default_registry()
    df = spark.createDataFrame(
        [(0.5,), (1.5,), (2.5,), (3.5,), (-2.5,)], ["x"]
    )
    out = df.select(
        reg.get("round")({"x": F.col("x")}, None).alias("r")
    ).collect()
    assert [r["r"] for r in out] == [0.0, 2.0, 2.0, 4.0, -2.0]


def test_token_counts_subword_arithmetic(spark):
    """(chunk-replace length) - (strip length) == sum(ceil(len/4))."""
    from openeo_processes_dask_ml_spark.scale.text import token_counts

    rows = [
        (1, "abcd efghi x"),        # 1 + 2 + 1 = 4
        (2, "  spaced   out  "),    # 2 + 1 = 3
        (3, ""),                    # 0
        (4, "abcdefghijkl"),        # 3
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_tokens"], r["n_subwords"]) for r in token_counts(df).collect()}
    assert got[1] == (3, 4)
    assert got[2] == (2, 3)
    assert got[3][1] == 0
    assert got[4] == (1, 3)


def test_salted_groupby_matches_plain(spark):
    """Salted two-phase aggregation == plain aggregation on a skewed
    key distribution (90% of rows on one key)."""
    from openeo_processes_dask_ml_spark.utils.skew import salted_groupby

    rows = [("hot", float(i)) for i in range(900)] + [
        (f"k{i % 10}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "v"])
    got = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in salted_groupby(
            df,
            ["k"],
            partial_aggs=[
                F.count("*").alias("pn"),
                F.sum("v").alias("ps"),
                F.max("v").alias("pm"),
            ],
            merge_aggs=[
                F.sum("pn").alias("n"),
                F.sum("ps").alias("s"),
                F.max("pm").alias("mx"),
            ],
            n_salts=8,
        ).collect()
    }
    want = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    assert got == want


def test_replicate_broadcast_join_matches_plain(spark):
    from openeo_processes_dask_ml_spark.utils.skew import replicate_broadcast_join

    big = spark.createDataFrame(
        [("hot", float(i)) for i in range(500)]
        + [("cold", 1.0), ("missing", 2.0)],
        ["k", "v"],
    )
    small = spark.createDataFrame([("hot", 10.0), ("cold", 20.0)], ["k", "w"])
    out = replicate_broadcast_join(big, small, ["k"], n_salts=4)
    assert out.count() == 501  # 'missing' dropped by inner join
    assert out.filter(F.col("k") == "hot").count() == 500
    assert set(out.columns) == {"k", "v", "w"}
    s = out.agg(F.sum(F.col("v") * F.col("w"))).collect()[0][0]
    want = (
        big.join(small, "k").agg(F.sum(F.col("v") * F.col("w"))).collect()[0][0]
    )
    assert s == want


def test_chunk_documents_udtf(spark):
    """UDTF chunking: overlapping word windows, short docs -> 1 chunk,
    stride walk covers every word."""
    from openeo_processes_dask_ml_spark.scale.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))), (2, "a b c"), (3, "  ")],
        ["doc_id", "text"],
    )
    out = chunk_documents(spark, docs, chunk_size=16, stride=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 100 words, ceil(100/8)=13 chunks; first full, walk by 8
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert len(c1) == 13
    assert c1[0]["chunk_text"].split(" ")[:3] == ["w0", "w1", "w2"]
    assert c1[1]["chunk_text"].split(" ")[0] == "w8"
    assert c1[0]["n_words"] == 16
    assert c1[12]["n_words"] == 4  # words 96..99
    # doc 2: 3 words -> one chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_text"] == "a b c"
    # doc 3: empty after trim -> one empty-token chunk (string_split parity)
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_text"] == ""


def test_quantize_embeddings_roundtrip(spark):
    from openeo_processes_dask_ml_spark.scale.quantize import (
        quantize_embeddings,
        quantized_codes,
    )

    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25, 0.0]), (2, [2.0, 2.0, -2.0, 1.0]),
         (3, [0.0, 0.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert set(out) == {1, 2}  # zero vector dropped
    assert out[1]["scale"] == 1.0
    assert out[1]["code_min"] == -127 and out[1]["code_max"] == 64
    assert out[2]["code_min"] == -127 and out[2]["code_max"] == 127
    # reconstruction error bounded by quantization step
    assert all(r["err"] <= 2.0 / 254 * 2 for r in out.values())
    codes = {r["vec_id"]: r["codes"] for r in quantized_codes(df).collect()}
    assert codes[1] == [64, -127, 32, 0]


def test_quality_filter_rules(spark):
    from openeo_processes_dask_ml_spark.scale.text import quality_filter

    good = "the quick brown fox and the lazy dog of winter " * 5  # 50 words
    short = "the and of tiny"
    symbolic = ("the and of " + "# " * 37).strip()  # 40 words, 37 hashes
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, symbolic)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in quality_filter(df, min_words=20).collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["ok_words"] is False
    assert out[3]["keep"] is False and out[3]["ok_symbols"] is False
    assert out[1]["stop_hits"] >= 3


def test_ngram_jaccard_hot_shingle_cap(spark):
    """One shingle shared by every doc must be dropped from candidate
    generation (skew guard), while true near-dup pairs found through
    non-hot shingles keep their EXACT full-index Jaccard."""
    from openeo_processes_dask_ml_spark.scale.dedup import (
        _drop_hot_shingles,
        ngram_jaccard_pairs,
        shingle_rows,
    )

    hot = "alpha beta gamma "  # one trigram present in all docs
    docs = [(i, hot + f"unique{i} token{i} word{i} extra{i}") for i in range(20)]
    # docs 100/101 are near-identical through NON-hot shingles
    docs += [
        (100, hot + "red green blue yellow purple orange"),
        (101, hot + "red green blue yellow purple cyan"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    inv = shingle_rows(df, "text", "doc_id", 3)
    capped = _drop_hot_shingles(df, inv, "doc_id", max_df_frac=0.5, min_df_cap=5)
    # the all-docs shingle is gone from the candidate index
    kept = {r["shingle"] for r in capped.select("shingle").distinct().collect()}
    assert "alpha beta gamma" not in kept and len(kept) > 0

    pairs = ngram_jaccard_pairs(
        df, threshold=0.4, max_df_frac=0.5, min_df_cap=5
    ).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert (100, 101) in found
    # exact Jaccard from the FULL index: docs share "alpha beta gamma",
    # "beta gamma red", and 3 of the color trigrams' overlap
    a = {"alpha beta gamma", "beta gamma red", "gamma red green",
         "red green blue", "green blue yellow", "blue yellow purple",
         "yellow purple orange"}
    b = {"alpha beta gamma", "beta gamma red", "gamma red green",
         "red green blue", "green blue yellow", "blue yellow purple",
         "yellow purple cyan"}
    expect = round(len(a & b) / len(a | b), 6)
    assert abs(found[(100, 101)] - expect) < 1e-9
    # none of the hot-only pairs (unique tails) qualify
    assert all(k == (100, 101) for k in found)


def test_duplicated_spans_exact_substr(spark):
    """A span repeated across docs (and a self-repeat) is flagged;
    unique text is not; short docs yield no spans."""
    from openeo_processes_dask_ml_spark.scale.text import duplicated_spans

    shared = "one two three four five"
    rows = [
        (1, shared + " apple banana"),
        (2, shared + " cherry mango"),
        (3, "alpha beta gamma delta epsilon zeta"),
        (4, "w x y"),  # < span_tokens -> zero spans, absent from output
        (5, shared + " " + shared),  # self-repeat
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in duplicated_spans(df, span_tokens=5).collect()}
    assert 4 not in out
    # doc 1: spans starting at 0..2 -> 3 spans; the first (shared) is
    # also doc 2's first span -> 1 dup
    assert out[1]["n_spans"] == 3 and out[1]["n_dup_spans"] == 1
    assert out[2]["n_dup_spans"] == 1
    assert out[3]["n_dup_spans"] == 0 and out[3]["dup_frac"] == 0.0
    # doc 5: "one two three four five one two three four five" -> the
    # shared 5-gram occurs at positions 0 and 5 (self-repeat), both dup
    assert out[5]["n_dup_spans"] >= 2
    assert 0 < out[1]["dup_frac"] < 1
    # the combine (crawl-scale, map-side-combine-friendly) shape is
    # result-identical to the default window shape (ADVICE r6)
    comb = sorted(
        map(tuple, duplicated_spans(df, span_tokens=5, shape="combine").collect())
    )
    assert comb == sorted(map(tuple, duplicated_spans(df, span_tokens=5).collect()))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="window.*combine"):
        duplicated_spans(df, span_tokens=5, shape="bogus")


def test_remove_duplicated_spans_shapes_agree(spark):
    from openeo_processes_dask_ml_spark.scale.text import (
        remove_duplicated_spans,
    )

    shared = "one two three four five"
    rows = [
        (1, shared + " apple banana"),
        (2, shared + " cherry mango"),
        (3, "alpha beta gamma delta epsilon zeta"),
        (5, shared + " " + shared),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    win = sorted(map(tuple, remove_duplicated_spans(df, span_tokens=5).collect()))
    comb = sorted(
        map(
            tuple,
            remove_duplicated_spans(df, span_tokens=5, shape="combine").collect(),
        )
    )
    assert win == comb and len(win) == 4


def test_unigram_logprob_ranks_fluency(spark):
    """Docs made of corpus-common tokens score lower (better) than docs
    of rare tokens; OOV tokens hit the smoothing bucket; deterministic
    vocab cutoff."""
    import math

    from openeo_processes_dask_ml_spark.scale.text import unigram_logprob

    common = "the cat sat on the mat " * 10
    rows = [(1, common), (2, common), (3, common),
            (4, "zyx qwv kjh zyx qwv kjh"),  # rare tokens
            (5, common)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_logprob(df, vocab_size=5).collect()}
    assert out[1]["lm_score"] == out[2]["lm_score"]  # identical docs
    assert out[4]["lm_score"] > out[1]["lm_score"]   # rare >> common
    assert out[1]["n_tokens"] == 60
    # vocab_size=5 keeps exactly the 5 common tokens (the/cat/sat/on/
    # mat); every token of doc 4 is OOV -> the same smoothing bucket
    k, total, v = 0.5, 60 * 4 + 6, 5
    oov_lp = -math.log2(k / (total + k * (v + 1)))
    assert abs(out[4]["lm_score"] - round(oov_lp, 6)) < 1e-6


def test_ccnet_buckets_thirds(spark):
    from openeo_processes_dask_ml_spark.scale.text import ccnet_buckets

    common = "the cat sat on the mat " * 8
    rows = [(i, common) for i in range(1, 7)]
    rows += [(7, common + "unusual marsupial"), (8, common + "qqq www")]
    rows += [(9, "zyx qwv kjh lmn opr stu " * 5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(df, vocab_size=8).collect()}
    assert len(out) == 9
    # fully-common docs are head; the gibberish doc is tail
    assert all(out[i] == "head" for i in range(1, 7))
    assert out[9] == "tail"
    # the slightly-noised docs never rank better than fully-common ones
    assert out[7] != "head" and out[8] != "head"


def test_incremental_dedup_cross_snapshot(spark):
    from openeo_processes_dask_ml_spark.scale.dedup import incremental_dedup

    seen = spark.createDataFrame(
        [(2, "hello world"), (4, "hello  WORLD "), (6, "other text")],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [(1, "Hello world"), (3, "brand new content"), (5, "other text")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in incremental_dedup(new, seen).collect()}
    # doc 1 normalizes to 'hello world' — matches seen 2 AND 4; min wins
    assert out[1]["is_novel"] is False and out[1]["dup_of"] == 2
    assert out[3]["is_novel"] is True and out[3]["dup_of"] is None
    assert out[5]["is_novel"] is False and out[5]["dup_of"] == 6


def test_incremental_minhash_dedup_semantics(spark):
    """Cross-snapshot near-dup: a new doc that is a light edit of an
    ingested doc maps to it with high Jaccard; an unrelated new doc is
    novel; the historical side is never flagged."""
    from openeo_processes_dask_ml_spark.scale.dedup import (
        incremental_minhash_dedup,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the quiet river "
        "bank every sunny morning in june while birds sing softly overhead"
    )
    seen = spark.createDataFrame(
        [(0, base), (2, "completely different text about spark engines "
                        "processing petabytes of shuffle data efficiently "
                        "with adaptive query execution enabled")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, base + " today"),  # near-dup of doc 0
         (3, "unrelated fresh content discussing product quantization "
             "codebooks and asymmetric distance computation for vector "
             "search at corpus scale")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in incremental_minhash_dedup(
        new, seen, threshold=0.5
    ).collect()}
    assert set(out) == {1, 3}
    assert out[1]["is_novel"] is False and out[1]["dup_of"] == 0
    assert out[1]["jaccard"] > 0.8
    assert out[3]["is_novel"] is True and out[3]["dup_of"] is None


def test_incremental_minhash_artifact_path_identical(spark):
    """The persisted-snapshot path (seen_bands/seen_inv from
    snapshot_minhash_artifacts) must produce byte-identical results to
    the recompute path — it is a caching strategy, not a semantics
    change."""
    from openeo_processes_dask_ml_spark.scale.dedup import (
        incremental_minhash_dedup,
        snapshot_minhash_artifacts,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    bands, inv = snapshot_minhash_artifacts(seen)
    direct = incremental_minhash_dedup(new, seen).orderBy("doc_id").collect()
    cached = (
        incremental_minhash_dedup(new, seen, seen_bands=bands, seen_inv=inv)
        .orderBy("doc_id")
        .collect()
    )
    assert direct == cached


def test_remove_duplicated_spans_semantics(spark):
    """Span removal: the canonical (smallest doc_id, pos) occurrence of
    a duplicated 20-token window survives, the other occurrence is cut,
    unique docs pass through verbatim, and a doc that is entirely one
    duplicated span empties out."""
    from openeo_processes_dask_ml_spark.scale.text import (
        remove_duplicated_spans,
    )

    span = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (0, span + " unique tail zero"),
            (1, "leading words here " + span),
            (2, "totally unrelated short text"),
            (3, span),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in remove_duplicated_spans(docs).collect()}
    # doc 0 holds the canonical occurrence at pos 0 -> untouched
    assert out[0]["n_removed"] == 0
    assert out[0]["clean_text"].startswith("w0 w1")
    # doc 1's copy is non-canonical -> its 20 span tokens are cut
    assert out[1]["n_removed"] == 20
    assert out[1]["clean_text"] == "leading words here"
    # unique doc untouched
    assert out[2]["n_removed"] == 0
    # doc 3 is the span and nothing else -> empties
    assert out[3]["n_removed"] == 20 and out[3]["clean_text"] == ""


def test_text_ops_null_and_empty_safety(spark):
    """SQL null semantics across the text family: a NULL text yields a
    row of NULL metrics (never a crash, never a fabricated -1 from
    size(null)); empty text yields defined zeros. Guards the behavior a
    user hits on real crawls, where the fixture has no nulls."""
    from openeo_processes_dask_ml_spark.scale.text import (
        quality_scores,
        remove_duplicated_spans,
        token_counts,
    )

    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "normal text here")],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r for r in quality_scores(df).collect()}
    assert q[0]["n_tokens"] is None and q[0]["quality_score"] is None
    assert q[1]["n_chars"] == 0 and q[1]["alpha_ratio"] == 0.0
    t = {r["doc_id"]: r for r in token_counts(df).collect()}
    assert t[0]["n_tokens"] is None
    assert t[2]["n_tokens"] == 3
    s = {r["doc_id"]: r for r in remove_duplicated_spans(df).collect()}
    assert set(s) == {0, 1, 2}  # null doc still emits a row
    assert s[0]["clean_text"] is None and s[0]["n_removed"] is None
    assert s[2]["clean_text"] == "normal text here"


def test_decontaminate_fuzzy_catches_paraphrase(spark):
    """Fuzzy decontamination flags a training doc that is a light
    paraphrase of an eval doc (high Jaccard, but no long verbatim
    n-gram run needed), while unrelated training docs pass."""
    from openeo_processes_dask_ml_spark.scale.pipeline import (
        decontaminate_fuzzy,
    )

    ev = spark.createDataFrame(
        [(100, "the model must answer which river flows through the "
               "ancient capital during the spring festival season")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(1, "the model must answer which river flows through the "
             "ancient capital during the autumn festival season"),
         (2, "completely unrelated training text about gradient "
             "descent optimizers and learning rate schedules")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate_fuzzy(
        train, ev, threshold=0.5
    ).collect()}
    assert set(out) == {1}
    assert out[1]["eval_id"] == 100 and out[1]["jaccard"] > 0.5


def test_bm25_topk_semantics(spark):
    """BM25 (r13): a term unique to one doc tops that query; ranks are
    dense 1..n with non-increasing quantized scores; reruns are
    bit-identical (the fold-ordered/quantized contract)."""
    from openeo_processes_dask_ml_spark.scale.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry apple"),
            (2, "banana cherry banana durian"),
            (3, "zebra quokka xylophone"),
            (4, "apple apple apple apple apple apple"),
        ],
        "doc_id bigint, text string",
    )
    out = bm25_topk(docs, [(0, "zebra"), (1, "apple banana")], k=3)
    rows = sorted(tuple(r) for r in out.collect())
    by_q = {}
    for qid, doc, qscore, rank in rows:
        by_q.setdefault(qid, []).append((rank, doc, qscore))
    # 'zebra' appears only in doc 3
    assert [e[1] for e in sorted(by_q[0])] == [3]
    # apple/banana match docs 1, 2, 4 — three ranked rows
    assert [e[0] for e in sorted(by_q[1])] == [1, 2, 3]
    scores = [e[2] for e in sorted(by_q[1])]
    assert scores == sorted(scores, reverse=True)
    # doc 3 shares no term with query 1
    assert 3 not in [e[1] for e in by_q[1]]
    rerun = sorted(tuple(r) for r in
                   bm25_topk(docs, [(0, "zebra"), (1, "apple banana")],
                             k=3).collect())
    assert rerun == rows


def test_bm25_index_roundtrip_equals_direct(spark, tmp_path):
    """Index lifecycle (r14): build -> parquet persist -> serve must
    be bit-identical to the direct query (shared scoring core), and
    the build artifacts must carry the full vocabulary."""
    from openeo_processes_dask_ml_spark.scale.text import (
        bm25_topk,
        bm25_topk_from_index,
        build_bm25_index,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry apple"),
            (2, "banana cherry banana durian"),
            (3, "zebra quokka xylophone"),
            (4, "apple apple apple apple apple apple"),
        ],
        "doc_id bigint, text string",
    )
    qs = [(0, "zebra"), (1, "apple banana")]
    post, dl, stats = build_bm25_index(docs)
    assert post.select("term").distinct().count() == 7  # full vocab
    d = str(tmp_path)
    (
        post.repartition(2, "term")
        .sortWithinPartitions("term")
        .write.parquet(f"{d}/postings")
    )
    dl.write.parquet(f"{d}/doclen")
    stats.write.parquet(f"{d}/stats")
    served = bm25_topk_from_index(
        spark.read.parquet(f"{d}/postings"),
        spark.read.parquet(f"{d}/doclen"),
        spark.read.parquet(f"{d}/stats"),
        qs,
        k=3,
    )
    assert sorted(tuple(r) for r in served.collect()) == sorted(
        tuple(r) for r in bm25_topk(docs, qs, k=3).collect()
    )


def test_line_dedup_removes_hot_lines_in_order(spark):
    from openeo_processes_dask_ml_spark.scale.text import line_dedup

    rows = [
        (1, "unique one\nSUBSCRIBE\nbody a"),
        (2, "SUBSCRIBE\nbody b\ncookie notice"),
        (3, "cookie notice\nSUBSCRIBE\nbody c"),
        (4, "body d\ncookie notice"),
        (5, "SUBSCRIBE\ncookie notice\nSUBSCRIBE"),  # all-hot doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in line_dedup(df, max_count=2).collect()
    }
    # SUBSCRIBE x4 and cookie notice x4 exceed max_count=2; bodies stay
    assert got[1]["clean_text"] == "unique one\nbody a"
    assert got[2]["clean_text"] == "body b"
    assert got[4]["clean_text"] == "body d"
    assert got[5]["clean_text"] == ""  # every line hot -> empty doc
    assert got[5]["n_removed"] == 3 and got[5]["n_lines"] == 3
    assert got[1]["n_removed"] == 1


def test_line_dedup_metachar_separator(spark):
    """A '|' separator must split literally, not as regex alternation
    (review finding)."""
    from openeo_processes_dask_ml_spark.scale.text import line_dedup

    rows = [(1, "keep a|HOT|keep b"), (2, "HOT|x"), (3, "HOT|y")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["clean_text"]
        for r in line_dedup(df, max_count=2, sep="|").collect()
    }
    assert got[1] == "keep a|keep b"
    assert got[2] == "x" and got[3] == "y"


def test_zorder_key_envelopes_and_cluster(spark):
    """The Morton key's bucket envelopes must be tight on EVERY
    interleaved dim (the data-skipping property), and zorder_cluster
    must range-sort by the key."""
    from openeo_processes_dask_ml_spark.scale.layout import (
        zorder_cluster,
        zorder_key,
    )

    df = spark.range(20000).select(
        (F.col("id") * 48271 % 4096).alias("ax"),
        (F.col("id") * 16807 % 4096).alias("by"),
    )
    keyed = df.withColumn("zkey", zorder_key(["ax", "by"], bits=12))
    env = (
        keyed.withColumn("bucket", F.shiftright("zkey", 14))
        .groupBy("bucket")
        .agg(
            (F.max("ax") - F.min("ax")).alias("dax"),
            (F.max("by") - F.min("by")).alias("dby"),
        )
        .agg(F.max("dax").alias("max_dax"), F.max("dby").alias("max_dby"))
        .collect()[0]
    )
    # bucket = top 10 interleaved bits = 5 bits/dim -> 128-wide tiles
    assert env["max_dax"] < 128 and env["max_dby"] < 128

    clustered = zorder_cluster(df, ["ax", "by"], bits=12, n_partitions=8)
    import pandas as pd  # noqa: F401

    def keys_sorted(it):
        for pdf in it:
            z = pdf["zkey"]
            yield pd.DataFrame(
                {"ok": [bool((z.sort_values().values == z.values).all())]}
            )

    oks = clustered.mapInPandas(keys_sorted, "ok boolean").collect()
    assert all(r["ok"] for r in oks)


def test_zorder_key_matches_reference_interleave():
    """Pin against a pure-Python bit interleave."""
    from openeo_processes_dask_ml_spark.scale.layout import zorder_key_sql

    import duckdb

    def ref(a, b, bits=12):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return z

    expr = zorder_key_sql(["a", "b"], bits=12)
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT a, b, {expr} AS z FROM (SELECT x % 4096 AS a, "
        "(x * 7919) % 4096 AS b FROM range(500) t(x))"
    ).fetchall()
    for a, b, z in rows:
        assert z == ref(a, b)


def test_boilerplate_removal_rules(spark):
    """Each drop rule fires independently; survivors keep order; the
    output contract chains into line_dedup."""
    from openeo_processes_dask_ml_spark.scale.text import (
        boilerplate_removal,
    )

    page = "\n".join(
        [
            "A perfectly normal sentence here.",
            "SUBSCRIBE NOW",          # keyword + uppercase
            "42 likes",               # counter
            "word",                   # < 2 words
            "123 456 789",            # mostly digits
            "SHOUTING AT EVERYONE",   # uppercase ratio
            "Please accept our cookie policy",  # keyword, mixed case
            "Another good line survives.",
        ]
    )
    df = spark.createDataFrame([(1, page)], "doc_id bigint, text string")
    row = boilerplate_removal(df).collect()[0]
    assert row["clean_text"] == (
        "A perfectly normal sentence here.\nAnother good line survives."
    )
    assert row["n_lines"] == 8 and row["n_removed"] == 6


def test_ngram_array_expr_matches_python_reference(spark):
    """The lookahead-regexp n-gram extractor (r15) vs a pure-Python
    tokenize-and-slide reference, over hypothesis-generated texts with
    adversarial whitespace (tabs, newlines, runs, leading/trailing),
    mixed case, and regex metacharacters in tokens."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from openeo_processes_dask_ml_spark.scale.dedup import ngram_array_expr

    token = st.text(
        alphabet=st.sampled_from(list("abZ9.*()[\\^$|?+{}-")), min_size=1,
        max_size=4,
    )
    ws = st.sampled_from([" ", "  ", "\t", "\n", " \t "])
    texts = st.lists(
        st.tuples(ws, token), min_size=0, max_size=8
    ).map(lambda parts: "".join(w + t for w, t in parts))

    def ref(text, n):
        toks = text.strip().lower().split()
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    @settings(
        max_examples=30,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(text=texts, n=st.integers(min_value=1, max_value=4))
    def check(text, n):
        row = (
            spark.range(1)
            .select(F.lit(text).alias("text"))
            .select(ngram_array_expr("text", n).alias("g"))
            .first()
        )
        assert list(row["g"]) == ref(text, n)

    check()


def test_hot_shingle_bound_exceeded_fallback_matches_list_path(
    spark, monkeypatch
):
    """VERDICT r15 #7: when the hot-shingle set outgrows the driver
    collect cap, _hot_shingle_list returns None and consumers fall
    back to the broadcast-join shape. Force the cap to 0 so the
    fallback branch runs, and require bit-identical results to the
    bounded-list path on the same corpus."""
    from openeo_processes_dask_ml_spark.scale import dedup as dedup_mod
    from openeo_processes_dask_ml_spark.scale.dedup import (
        _drop_hot_shingles,
        containment_pairs,
        ngram_jaccard_pairs,
        shingle_rows,
    )

    hot = "alpha beta gamma "
    docs = [(i, hot + f"unique{i} token{i} word{i} extra{i}") for i in range(20)]
    docs += [
        (100, hot + "red green blue yellow purple orange"),
        (101, hot + "red green blue yellow purple cyan"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    kw = dict(max_df_frac=0.5, min_df_cap=5)

    inv = shingle_rows(df, "text", "doc_id", 3)
    base_drop = sorted(map(tuple, _drop_hot_shingles(df, inv, "doc_id", **kw).collect()))
    base_jac = sorted(
        map(tuple, ngram_jaccard_pairs(df, threshold=0.4, **kw).collect())
    )
    base_cont = sorted(
        map(tuple, containment_pairs(df, threshold=0.4, **kw).collect())
    )

    orig = dedup_mod._hot_shingle_list
    monkeypatch.setattr(
        dedup_mod,
        "_hot_shingle_list",
        lambda df, inv, id_col, frac, cap, collect_cap=2_000: orig(
            df, inv, id_col, frac, cap, collect_cap=0
        ),
    )
    # r16: the count path derives its hot list from the postings
    # aggregation — force that collect cap to 0 too so BOTH fallback
    # branches run
    orig_post = dedup_mod._hot_list_from_postings
    monkeypatch.setattr(
        dedup_mod,
        "_hot_list_from_postings",
        lambda df, posting_all, id_col, frac, cap, collect_cap=2_000: (
            orig_post(df, posting_all, id_col, frac, cap, collect_cap=0)
        ),
    )
    # sanity: both patched lists now refuse to materialize (non-empty set)
    assert dedup_mod._hot_shingle_list(df, inv, "doc_id", 0.5, 5) is None
    from pyspark.sql import functions as _F

    posting_all = inv.groupBy("shingle").agg(
        _F.array_sort(_F.collect_list("doc_id")).alias("ids")
    )
    assert (
        dedup_mod._hot_list_from_postings(df, posting_all, "doc_id", 0.5, 5)
        is None
    )

    assert sorted(map(tuple, _drop_hot_shingles(df, inv, "doc_id", **kw).collect())) == base_drop
    assert sorted(map(tuple, ngram_jaccard_pairs(df, threshold=0.4, **kw).collect())) == base_jac
    assert sorted(map(tuple, containment_pairs(df, threshold=0.4, **kw).collect())) == base_cont
    assert base_jac  # the near-dup pair survived both shapes


def _zipfian_corpus(n_docs=400):
    """Deterministic Zipf-ish corpus: a tiny head vocabulary shared by
    everyone (hot/high-df shingles) + a long singleton tail per doc,
    plus a few true near-dup pairs found through rare shared tails."""
    rows = []
    for i in range(n_docs):
        head = "the of and to in "  # high-df mass
        tail = " ".join(f"tail{i}w{j}" for j in range(12))  # singletons
        rows.append((i, head + tail))
    # near-dups: share the rare tail, differ in one token
    rows.append((9000, "the of and to in " + " ".join(f"dup{j}" for j in range(12))))
    rows.append((9001, "the of and to in " + " ".join(f"dup{j}" for j in range(11)) + " other"))
    return rows


def test_ngram_jaccard_prefix_mode_matches_count_mode(spark):
    """VERDICT r15 #6: prefix filtering (AllPairs with the hot-set
    prefix correction) must be value-identical to inverted-index
    counting on BOTH corpus shapes, and the probe must pick 'prefix'
    on the Zipfian corpus and 'count' on the overlap-heavy one."""
    from openeo_processes_dask_ml_spark.scale.dedup import (
        _pairgen_probe,
        ngram_jaccard_pairs,
        shingle_rows,
    )

    zipf = spark.createDataFrame(_zipfian_corpus(), ["doc_id", "text"])
    # overlap-heavy: every doc shares most shingles with every other
    overlap = spark.createDataFrame(
        [
            (i, "alpha beta gamma delta epsilon zeta eta theta "
                + f"x{i % 3} y{i % 2}")
            for i in range(60)
        ],
        ["doc_id", "text"],
    )

    for corpus, kw in [
        (zipf, dict(threshold=0.5, max_df_frac=0.2, min_df_cap=8)),
        (overlap, dict(threshold=0.3, max_df_frac=0.9, min_df_cap=1000)),
    ]:
        count = sorted(
            map(tuple, ngram_jaccard_pairs(corpus, mode="count", **kw).collect())
        )
        prefix = sorted(
            map(tuple, ngram_jaccard_pairs(corpus, mode="prefix", **kw).collect())
        )
        auto = sorted(
            map(tuple, ngram_jaccard_pairs(corpus, mode="auto", **kw).collect())
        )
        assert prefix == count
        assert auto == count

    # the Zipfian near-dup pair is found by every mode
    found = ngram_jaccard_pairs(
        zipf, mode="prefix", threshold=0.5, max_df_frac=0.2, min_df_cap=8
    ).collect()
    assert any((r["id_a"], r["id_b"]) == (9000, 9001) for r in found)

    # probe decisions per corpus shape (measured r16, SCALE_NOTES):
    # - singleton-tail Zipf -> 'count' (sorted postings already kill
    #   singletons pre-expansion; prefix's ordering overhead loses)
    # - overlap-heavy -> 'count' (the r15 measurement)
    # - mid-df template clusters at high t -> 'prefix' (C(df,2) blows
    #   up the counting volume while prefixes hold only singletons)
    assert _pairgen_probe(shingle_rows(zipf, "text", "doc_id", 3), 0.5, 80.0) == "count"
    assert _pairgen_probe(shingle_rows(overlap, "text", "doc_id", 3), 0.3, 54.0) == "count"
    clusters = spark.createDataFrame(
        [
            (c * 20 + i,
             " ".join(f"c{c}t{j}" for j in range(12))
             + " " + " ".join(f"u{c * 20 + i}w{j}" for j in range(8)))
            for c in range(10)
            for i in range(20)
        ],
        ["doc_id", "text"],
    )
    assert (
        _pairgen_probe(shingle_rows(clusters, "text", "doc_id", 3), 0.8, 1000.0)
        == "prefix"
    )
    cl_kw = dict(threshold=0.8, max_df_frac=0.9, min_df_cap=1000)
    assert sorted(
        map(tuple, ngram_jaccard_pairs(clusters, mode="prefix", **cl_kw).collect())
    ) == sorted(
        map(tuple, ngram_jaccard_pairs(clusters, mode="count", **cl_kw).collect())
    )


def test_ngram_jaccard_rejects_unknown_mode(spark):
    import pytest as _pytest

    from openeo_processes_dask_ml_spark.scale.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="mode"):
        ngram_jaccard_pairs(df, mode="nope").collect()


def test_ngram_jaccard_prefix_mode_float_threshold_boundary(spark):
    """r16 review: ceil(t*n) in float64 can overshoot an exact product
    (0.07*100 -> 7.000000000000001 -> ceil 8), shortening the prefix
    and dropping pairs the counting path emits. The conservative
    epsilon must keep the modes identical at such boundaries."""
    from openeo_processes_dask_ml_spark.scale.dedup import ngram_jaccard_pairs

    # doc 1 has 100 distinct shingles (102 tokens), doc 2's 7 shingles
    # are a subset -> jaccard = 7/100 = exactly 0.07
    toks_a = [f"w{i}" for i in range(102)]
    toks_b = toks_a[:9]  # 7 shingles, all shared
    df = spark.createDataFrame(
        [(1, " ".join(toks_a)), (2, " ".join(toks_b))], ["doc_id", "text"]
    )
    kw = dict(threshold=0.07, max_df_frac=0.9, min_df_cap=1000)
    count = sorted(map(tuple, ngram_jaccard_pairs(df, mode="count", **kw).collect()))
    prefix = sorted(map(tuple, ngram_jaccard_pairs(df, mode="prefix", **kw).collect()))
    assert count and count[0][:2] == (1, 2)
    assert prefix == count
