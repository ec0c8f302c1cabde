"""Training-data pipeline ops: decontamination, packing, sharding,
grouped top-k (scale/pipeline.py)."""

from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.scale.pipeline import (
    decontaminate,
    pack_sequences,
    top_per_group,
    training_shards,
    write_training_shards,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_decontaminate_flags_shared_ngrams(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps", "en"),  # shares 'quick brown fox'
            (2, "totally unrelated words here", "en"),
            (3, "a quick brown fox too", "en"),
        ],
    )
    eval_docs = _docs(spark, [(100, "quick brown fox", "en")])
    out = decontaminate(train, eval_docs, n=3).collect()
    hit = {r["doc_id"]: r for r in out}
    assert set(hit) == {1, 3}
    assert hit[1]["n_hits"] == 1
    assert hit[1]["sample_gram"] == "quick brown fox"


def test_decontaminate_counts_distinct_grams_once(spark):
    # the same blocklisted gram repeated in a doc counts once
    train = _docs(spark, [(1, "x y z x y z", "en")])
    eval_docs = _docs(spark, [(9, "x y z", "en")])
    out = decontaminate(train, eval_docs, n=3).collect()
    assert len(out) == 1 and out[0]["n_hits"] == 1


def test_pack_sequences_chunk_spans(spark):
    # capacity 4; stream 'en' docs of 3,3,2 tokens -> ends 3,6,8
    df = _docs(
        spark,
        [(1, "a b c", "en"), (2, "d e f", "en"), (3, "g h", "en"),
         (4, "k l m n o", "fr")],
    )
    out = {
        r["doc_id"]: r
        for r in pack_sequences(df, capacity=4, stream_col="lang").collect()
    }
    r1, r2, r3, r4 = out[1], out[2], out[3], out[4]
    assert (r1["stream_start"], r1["first_chunk"], r1["last_chunk"]) == (0, 0, 0)
    # doc 2 spans tokens [3,6) -> chunks 0..1, crosses the boundary
    assert (r2["first_chunk"], r2["last_chunk"], r2["n_chunks"]) == (0, 1, 2)
    assert r2["crosses_boundary"]
    # doc 3 spans [6,8) -> chunk 1 only
    assert (r3["first_chunk"], r3["last_chunk"]) == (1, 1)
    assert not r3["crosses_boundary"]
    # fr stream starts fresh: 5 tokens spans chunks 0..1
    assert (r4["stream_start"], r4["n_chunks"]) == (0, 2)


def test_pack_sequences_default_shard_streams(spark):
    """Default stream key is the md5 shard (scale-safe parallel prefix
    sums), deterministic across runs and bounded by n_streams."""
    df = _docs(spark, [(i, "w " * 5, "en") for i in range(30)])
    out = pack_sequences(df, capacity=8, n_streams=4).collect()
    streams = {r["stream"] for r in out}
    assert streams <= {0, 1, 2, 3} and len(streams) > 1
    again = {r["doc_id"]: r["stream"] for r in pack_sequences(df, capacity=8, n_streams=4).collect()}
    assert again == {r["doc_id"]: r["stream"] for r in out}
    # within a stream, starts are consecutive prefix sums in id order
    for s in streams:
        rows = sorted((r for r in out if r["stream"] == s), key=lambda r: r["doc_id"])
        acc = 0
        for r in rows:
            assert r["stream_start"] == acc
            acc += r["n_tokens"]


def test_training_shards_partition_and_stats(spark):
    df = _docs(spark, [(i, "w " * (i + 1), "en") for i in range(40)])
    stats = training_shards(df, n_shards=4).collect()
    assert sum(r["n_docs"] for r in stats) == 40
    assert set(r["shard"] for r in stats) <= {0, 1, 2, 3}
    # deterministic: same assignment on re-run
    again = {r["shard"]: r["n_docs"] for r in training_shards(df, 4).collect()}
    assert again == {r["shard"]: r["n_docs"] for r in stats}


def test_write_training_shards_roundtrip(spark, tmp_path):
    df = _docs(spark, [(i, f"doc {i}", "en") for i in range(20)])
    path = str(tmp_path / "shards")
    write_training_shards(df, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 20
    assert "shard" in back.columns
    # membership matches the stats op exactly
    stats = {r["shard"]: r["n_docs"]
             for r in training_shards(df, 4).collect()}
    written = {r["shard"]: r["n"]
               for r in back.groupBy("shard").agg(
                   F.count(F.lit(1)).alias("n")).collect()}
    assert written == stats


def test_top_per_group_ranks_with_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 10), (3, "a", 5), (4, "b", 1)],
        ["doc_id", "g", "v"],
    )
    out = top_per_group(df, ["g"], "v", k=2, tiebreak_col="doc_id").collect()
    got = {(r["g"], r["rk"]): r["doc_id"] for r in out}
    # equal v=10 resolved by ascending doc_id
    assert got[("a", 1)] == 1 and got[("a", 2)] == 2
    assert got[("b", 1)] == 4
    assert ("a", 3) not in got


def test_leakage_safe_split_no_cross_split_pairs(spark):
    """Every duplicate pair lands entirely inside one split; singletons
    get their own cluster; fractions are respected in expectation."""
    from openeo_processes_dask_ml_spark.scale.pipeline import leakage_safe_split

    # clusters: {1,2,3} chained, {10,11}, singletons 20..29
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11] + list(range(20, 30))], ["doc_id"]
    )
    out = {r["doc_id"]: r for r in leakage_safe_split(docs, pairs).collect()}
    assert len(out) == 15
    # chained cluster shares one split and one cluster id (min member)
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == out[3]["cluster_id"] == 1
    assert out[1]["split"] == out[2]["split"] == out[3]["split"]
    assert out[10]["cluster_id"] == out[11]["cluster_id"] == 10
    assert out[10]["split"] == out[11]["split"]
    # singletons cluster to themselves
    for i in range(20, 30):
        assert out[i]["cluster_id"] == i
    assert {r["split"] for r in out.values()} <= {"train", "val", "test"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 100"):
        leakage_safe_split(docs, pairs, fractions=(80, 10, 5))


def test_mixture_sample_rates_and_mass(spark):
    """Rates are maximal (one source keeps rate 1.0), zero-target
    sources are excluded, and surviving token mass approximates the
    target mixture."""
    from openeo_processes_dask_ml_spark.scale.pipeline import mixture_sample

    rows = []
    did = 0
    for src, n_docs, words in [("a", 200, 10), ("b", 200, 10), ("c", 100, 10)]:
        for _ in range(n_docs):
            rows.append((did, "w " * words, "en", src))
            did += 1
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    out = mixture_sample(df, targets={"a": 50, "b": 25, "c": 25}).collect()
    rates = {r["source"]: r["rate"] for r in out}
    # mass a=b=2000, c=1000 tokens. scale = min(2000/.5, 2000/.25,
    # 1000/.25) = 4000 -> rate a=1.0, b=0.5, c=1.0
    assert rates == {"a": 1.0, "b": 0.5, "c": 1.0}
    kept = {}
    for r in out:
        kept[r["source"]] = kept.get(r["source"], 0) + (r["n_tokens"] if r["keep"] else 0)
    assert kept["a"] == 2000 and kept["c"] == 1000  # rate-1.0 sources intact
    assert 700 <= kept["b"] <= 1300  # ~50% of 2000, hash-bucket variance
    # determinism
    again = {(r["doc_id"], r["keep"]) for r in mixture_sample(df, targets={"a": 50, "b": 25, "c": 25}).collect()}
    assert again == {(r["doc_id"], r["keep"]) for r in out}
    # excluded source
    out2 = mixture_sample(df, targets={"a": 1})
    assert all(r["keep"] is False for r in out2.collect() if r["source"] != "a")


def test_corpus_diff_statuses(spark):
    from openeo_processes_dask_ml_spark.scale.pipeline import corpus_diff

    old = spark.createDataFrame(
        [(1, "a b c"), (2, "x y"), (3, "same text")],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [(2, "x y z"), (3, "Same   TEXT "), (4, "brand new")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    # doc 3: differs only by case/whitespace -> normalized-unchanged
    assert got == {1: "removed", 2: "changed", 3: "unchanged", 4: "added"}


def test_dsir_select_prefers_target_like_docs(spark):
    """DSIR (Xie et al. 2023): raw docs sharing the target domain's
    n-gram distribution must out-rank off-domain docs, the log-weights
    must be higher for on-domain docs, and the selection must be
    deterministic across reruns (md5-uniform Gumbel noise)."""
    from openeo_processes_dask_ml_spark.scale.pipeline import dsir_select

    med = "the patient showed elevated cardiac enzyme levels after surgery"
    web = "click here to win a free prize now buy cheap deals online"
    target = spark.createDataFrame(
        [(1000 + i, med) for i in range(6)], "doc_id long, text string"
    )
    raw = spark.createDataFrame(
        [(i, med if i % 2 == 0 else web) for i in range(40)],
        "doc_id long, text string",
    )
    out = dsir_select(raw, target, k=10, n_buckets=256).collect()
    assert len(out) == 10
    picked = {r["doc_id"] for r in out}
    # the medical (even-id) docs dominate the selection
    assert sum(1 for d in picked if d % 2 == 0) >= 8
    by_id = {r["doc_id"]: r for r in out}
    meds = [r["log_weight"] for r in out if r["doc_id"] % 2 == 0]
    webs = [r["log_weight"] for r in out if r["doc_id"] % 2 == 1]
    if meds and webs:
        assert min(meds) > max(webs)
    # ranks are 1..k and deterministic on a rerun
    assert sorted(r["rank"] for r in out) == list(range(1, 11))
    again = dsir_select(raw, target, k=10, n_buckets=256).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_global_sorted_index_matches_naive_window(spark):
    """Dense 0-based, equal to the single-partition row_number ground
    truth, independent of partition count."""
    from pyspark.sql import Window

    from openeo_processes_dask_ml_spark.scale.pipeline import (
        global_sorted_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    keys = ["lang", ("n_chars", "desc"), "doc_id"]
    gt = {
        r["doc_id"]: r["rk"] - 1
        for r in docs.withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy("lang", F.col("n_chars").desc(), "doc_id")
            ),
        ).collect()
    }
    for n_parts in (3, 16):
        got = global_sorted_index(docs, keys, n_partitions=n_parts).collect()
        assert len(got) == len(gt)
        assert all(gt[r["doc_id"]] == r["rank"] for r in got)


def test_global_sorted_index_at_50k_partial_sample(spark):
    """Regression for the two-job range-boundary resample bug (review
    finding: 188k/200k wrong ranks at 200k rows uncheckpointed): at
    50k rows the reservoir sample is partial, so an unpinned
    partitioning would disagree between the counts job and the rank
    job."""
    from openeo_processes_dask_ml_spark.scale.pipeline import (
        global_sorted_index,
    )

    df = spark.range(0, 50000, 1, 4).select(
        F.col("id"), (F.col("id") * 2654435761 % 999983).alias("k")
    )
    out = global_sorted_index(df, ["k", "id"], n_partitions=16)
    ranks = sorted(r["rank"] for r in out.select("rank").collect())
    assert ranks == list(range(50000))


def test_global_sorted_index_bisect_path_matches_expression(spark):
    """Past the codegen term budget the bucket comes from the
    Arrow-vectorized bisect — identical buckets, identical ranks
    (forced here with max_expr_terms=0), mixed directions included."""
    from openeo_processes_dask_ml_spark.scale.pipeline import (
        global_sorted_index,
    )

    df = spark.range(0, 20000, 1, 4).select(
        F.col("id"),
        (F.col("id") * 2654435761 % 999983).alias("k"),
        (F.col("id") % 7).cast("string").alias("s"),
    )
    keys = [("k", "asc"), ("s", "desc"), "id"]
    a = {
        r["id"]: r["rank"]
        for r in global_sorted_index(df, keys, n_partitions=32).collect()
    }
    b = {
        r["id"]: r["rank"]
        for r in global_sorted_index(
            df, keys, n_partitions=32, max_expr_terms=0
        ).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(20000))


def test_global_sorted_index_validates_preconditions(spark):
    """NULL keys, bad direction tokens, and Column entries all fail
    fast with clear errors (r13 review findings — silent corruption
    otherwise)."""
    import pytest as _pytest

    from openeo_processes_dask_ml_spark.scale.pipeline import (
        global_sorted_index,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 9).alias("k")
    )
    with _pytest.raises(ValueError, match="NULL"):
        bad = df.withColumn(
            "k", F.when(F.col("id") == 5, None).otherwise(F.col("k"))
        )
        global_sorted_index(bad, ["k", "id"], n_partitions=4)
    with _pytest.raises(ValueError, match="direction"):
        global_sorted_index(df, [("k", "DESC")], n_partitions=4)
    with _pytest.raises(TypeError, match="column names"):
        global_sorted_index(df, [F.col("k").desc()], n_partitions=4)
