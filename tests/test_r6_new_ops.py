"""Semantics of the round-6 late-batch operators: tf-idf cosine pairs,
containment pairs, bigram LM scoring, Bloom-prefiltered
decontamination, and deterministic random projection."""

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.scale.dedup import containment_pairs
from openeo_processes_dask_ml_spark.scale.pipeline import (
    bloom_decontaminate,
    decontaminate,
)
from openeo_processes_dask_ml_spark.scale.quantize import random_projection
from openeo_processes_dask_ml_spark.scale.text import (
    bigram_logprob,
    tfidf_cosine_pairs,
)


def docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------- tfidf


def test_tfidf_cosine_identical_docs_score_one(spark):
    df = docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "zeta eta theta iota kappa"),
        ],
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, threshold=0.5, max_df_frac=1.0).collect()
    }
    assert got == {(1, 2): 1.0}


def test_tfidf_cosine_weights_rare_terms_higher(spark):
    # docs 1/2 share only the ubiquitous term; docs 3/4 share the rare
    # one — identical tf patterns, but idf must rank (3,4) higher.
    df = docs(
        spark,
        [
            (1, "common filler1"),
            (2, "common filler2"),
            (3, "rareterm filler3"),
            (4, "rareterm filler4"),
            (5, "common padding1"),
            (6, "common padding2"),
            (7, "common padding3"),
            (8, "common padding4"),
        ],
    )
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, threshold=0.01, max_df_frac=1.0).collect()
    }
    assert got[(3, 4)] > got[(1, 2)]


def test_tfidf_cosine_hot_cut_drops_stop_terms(spark):
    # 'the' appears in every doc; with the cap at 0.5N it leaves the
    # vocabulary, so the all-stop-term pair disappears.
    df = docs(
        spark,
        [
            (1, "the the the"),
            (2, "the the the"),
            (3, "unique1 the x1"),
            (4, "unique2 the x2"),
            (5, "unique3 the x3"),
            (6, "unique4 the x4"),
        ],
    )
    pairs = tfidf_cosine_pairs(
        df, threshold=0.5, max_df_frac=0.5, min_df_cap=1
    ).collect()
    assert pairs == []


# ----------------------------------------------------------- containment


def test_containment_subset_doc_scores_one(spark):
    quoted = "alpha beta gamma delta epsilon zeta"
    page = quoted + " " + " ".join(f"extra{i}" for i in range(30))
    df = docs(spark, [(1, quoted), (2, page), (3, "unrelated words only here")])
    rows = containment_pairs(df, threshold=0.7).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment_a"] == 1.0  # every shingle of 1 is in 2
    assert r["containment_b"] < 0.2
    assert r["contained"] == "a"
    # jaccard would have rejected this pair at any usual threshold
    inter, union = 4, 4 + 31  # 4 shared trigrams of doc1; doc2 has 35
    assert inter / union < 0.15


def test_containment_symmetric_for_identical_docs(spark):
    df = docs(spark, [(1, "a b c d e"), (2, "a b c d e")])
    r = containment_pairs(df, threshold=0.7).collect()[0]
    assert r["containment_a"] == r["containment_b"] == 1.0
    assert r["contained"] == "a"  # tie goes to a


# ---------------------------------------------------------------- bigram


def test_bigram_logprob_flags_word_salad(spark):
    # same unigram distribution, different bigram structure: the
    # repeated fluent phrase must score LOWER (more probable) than the
    # scrambled order.
    fluent = " ".join(["the cat sat on the mat"] * 6)
    salad = "mat cat the sat mat on the sat cat on mat the"
    df = docs(spark, [(1, fluent), (2, fluent), (3, fluent), (4, salad)])
    got = {r["doc_id"]: r["lm2_score"] for r in bigram_logprob(df).collect()}
    assert got[1] == got[2] == got[3]
    assert got[4] > got[1]


def test_bigram_logprob_drops_single_token_docs(spark):
    df = docs(spark, [(1, "solo"), (2, "two tokens")])
    got = {r["doc_id"]: r["n_bigrams"] for r in bigram_logprob(df).collect()}
    assert got == {2: 1}


# ----------------------------------------------------------------- bloom


def test_bloom_decontaminate_matches_exact(spark):
    rows = [
        (i, f"w{i} w{i + 1} w{i + 2} w{i + 3} common tail phrase")
        for i in range(40)
    ]
    df = docs(spark, rows)
    ev = df.filter(F.col("doc_id") % 7 == 0)
    tr = df.filter(F.col("doc_id") % 7 != 0)
    exact = {
        (r["doc_id"], r["n_hits"], r["sample_gram"])
        for r in decontaminate(tr, ev, n=3).collect()
    }
    bloom = {
        (r["doc_id"], r["n_hits"], r["sample_gram"])
        for r in bloom_decontaminate(tr, ev, n=3, m_bits=1 << 14).collect()
    }
    assert bloom == exact
    assert exact  # non-degenerate fixture


def test_bloom_decontaminate_tiny_filter_still_exact(spark):
    """With m_bits absurdly small every gram is a Bloom hit — the
    verify join must still reduce the result to the exact answer."""
    df = docs(spark, [(1, "a b c d"), (2, "x y z w"), (3, "a b c q")])
    ev = df.filter(F.col("doc_id") == 1)
    tr = df.filter(F.col("doc_id") != 1)
    got = bloom_decontaminate(tr, ev, n=3, m_bits=1 << 6, k_hashes=2).collect()
    assert [(r["doc_id"], r["n_hits"]) for r in got] == [(3, 1)]


def test_bloom_rejects_non_power_of_two():
    with pytest.raises(ValueError):
        bloom_decontaminate(None, None, m_bits=1000)


# ------------------------------------------------------------ projection


def test_random_projection_deterministic_and_linear(spark):
    df = spark.createDataFrame(
        [(1, [float(i) for i in range(64)]), (2, [2.0 * i for i in range(64)])],
        ["vec_id", "embedding"],
    )
    a = {r["vec_id"]: (r["p0"], r["p1"], r["p2"], r["p3"])
         for r in random_projection(df, out_dim=4).collect()}
    b = {r["vec_id"]: (r["p0"], r["p1"], r["p2"], r["p3"])
         for r in random_projection(df, out_dim=4).collect()}
    assert a == b  # deterministic across runs
    for i in range(4):
        assert a[2][i] == pytest.approx(2.0 * a[1][i], abs=1e-5)


def test_random_projection_preserves_distance_scale(spark):
    """JL sanity on the fixture embeddings: projected distances of
    identical vectors are zero and distinct vectors are non-zero."""
    df = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [1.0] * 64), (3, [-1.0] * 64)],
        ["vec_id", "embedding"],
    )
    p = {r["vec_id"]: (r["p0"], r["p1"], r["p2"], r["p3"])
         for r in random_projection(df, out_dim=4).collect()}
    assert p[1] == p[2]
    assert p[3] == tuple(-x for x in p[1])


# ------------------------------------------------------------- bin pack


def test_bin_pack_next_fit_semantics(spark):
    from openeo_processes_dask_ml_spark.scale.pipeline import (
        bin_pack_sequences,
    )

    # one stream so the packing order is just doc_id order
    df = docs(
        spark,
        [
            (1, "a b c"),          # 3 tokens -> bin 0 (fill 3)
            (2, "d e f g"),        # 4 -> bin 0 full at 7? cap 8: fill 7
            (3, "h i"),            # 2 -> 7+2>8 -> bin 1 (fill 2)
            (4, " ".join(["x"] * 20)),  # oversized: own bin 2 (fill 20)
            (5, "y"),              # after oversized: 20+1>8 -> bin 3
        ],
    )
    rows = {
        r["doc_id"]: (r["bin_idx"], r["bin_fill"])
        for r in bin_pack_sequences(
            df, capacity=8, n_streams=1
        ).collect()
    }
    assert rows == {1: (0, 3), 2: (0, 7), 3: (1, 2), 4: (2, 20), 5: (3, 1)}


def test_bin_pack_fill_bounded_by_capacity(spark):
    from openeo_processes_dask_ml_spark.scale.pipeline import (
        bin_pack_sequences,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = bin_pack_sequences(df, capacity=128, n_streams=16)
    bad = out.filter(
        (F.col("bin_fill") > 128) & (F.col("n_tokens") <= 128)
    ).count()
    assert bad == 0  # only oversized docs may overflow their bin


# ------------------------------------------------------------ edge cases


def test_new_ops_empty_corpus(spark):
    """Every late-batch operator must return an empty, well-typed frame
    on an empty corpus (no driver exceptions from count()/collect()
    plan decisions)."""
    from pyspark.sql import types as T

    from openeo_processes_dask_ml_spark.scale.pipeline import (
        bin_pack_sequences,
        bloom_decontaminate,
    )

    empty = spark.createDataFrame(
        [], T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ])
    )
    assert tfidf_cosine_pairs(empty, threshold=0.5).count() == 0
    assert containment_pairs(empty).count() == 0
    assert bigram_logprob(empty).count() == 0
    assert bin_pack_sequences(empty).count() == 0
    assert bloom_decontaminate(empty, empty, n=3, m_bits=1 << 10).count() == 0


def test_random_projection_empty(spark):
    from pyspark.sql import types as T

    empty = spark.createDataFrame(
        [], T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ])
    )
    out = random_projection(empty, out_dim=2)
    assert out.count() == 0
    assert out.columns == ["vec_id", "p0", "p1"]


# ------------------------------------------------------------- sampling


def test_weighted_sample_deterministic_and_biased(spark):
    from openeo_processes_dask_ml_spark.scale.pipeline import weighted_sample

    rows = [(i, "w " * (200 if i < 10 else 2), "s") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    a = sorted(r["doc_id"] for r in weighted_sample(df, k=10).collect())
    b = sorted(r["doc_id"] for r in weighted_sample(df, k=10).collect())
    assert a == b  # same sample every run
    # token-mass bias: the 10 heavy docs hold ~91% of the mass; at
    # least half the sample must come from them (md5 priorities are
    # fixed, so this is a deterministic assertion, not flaky)
    heavy = sum(1 for i in a if i < 10)
    assert heavy >= 5


def test_weighted_sample_k_per_group(spark):
    from openeo_processes_dask_ml_spark.scale.pipeline import weighted_sample

    rows = [(i, "a b c", f"s{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = weighted_sample(df, k=4).groupBy("source").count().collect()
    assert {r["count"] for r in out} == {4}


# -------------------------------------------------------------- profiling


def test_profile_table_one_pass_and_values(spark):
    from openeo_processes_dask_ml_spark.io.profile import profile_table

    df = spark.createDataFrame(
        [(1, None, "a"), (2, 5.0, "b"), (3, 5.0, None), (4, 7.5, "a")],
        ["id", "v", "s"],
    )
    got = {r["column"]: r for r in profile_table(df, exact_ndv=True).collect()}
    assert got["id"]["n_rows"] == 4 and got["id"]["n_distinct"] == 4
    assert got["v"]["n_nulls"] == 1 and got["v"]["n_distinct"] == 2
    assert got["s"]["min_value"] == "a" and got["s"]["max_value"] == "b"
    # the DEFAULT is the HLL++ sketch (VERDICT r6 #3: exact NDV compiles
    # to Catalyst Expand — k-fold row replication — measured 13.5x
    # slower; the scale-safe shape must be what callers get unasked)
    default_df = profile_table(df)
    assert "Expand" not in default_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in profile_table(df, exact_ndv=True)._jdf.queryExecution().executedPlan().toString()
    approx = {r["column"]: r["n_distinct"] for r in default_df.collect()}
    assert approx["id"] >= 3


def test_profile_table_typed_slots(spark):
    """VERDICT r8 #1: the typed gate contract routes each dtype's
    min/max into exactly ONE typed slot pair (long/double/string),
    raw values — no decimal cast, no string rendering — and
    timestamps surface as unix_micros BIGINT."""
    import datetime

    from openeo_processes_dask_ml_spark.io.profile import (
        profile_table_typed,
    )

    ts = datetime.datetime(2020, 3, 1, 12, 30, 0)
    df = spark.createDataFrame(
        [(1, 2.5, "a", ts), (4, None, "b", ts)],
        ["id", "v", "s", "t"],
    )
    got = {r["column"]: r for r in profile_table_typed(df).collect()}
    assert got["id"]["min_long"] == 1 and got["id"]["max_long"] == 4
    assert got["id"]["min_double"] is None and got["id"]["min_string"] is None
    assert got["v"]["min_double"] == 2.5 and got["v"]["max_double"] == 2.5
    assert got["v"]["n_nulls"] == 1 and got["v"]["min_long"] is None
    assert got["s"]["min_string"] == "a" and got["s"]["max_string"] == "b"
    # unix_micros is an instant — session-TZ independent; the session
    # pins UTC so the expected value is the UTC epoch micros
    expect_us = int(ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)
    assert got["t"]["min_long"] == expect_us == got["t"]["max_long"]

    # per-stat bisect form: 4 cols x 5 stats, one typed value per row
    cells = profile_table_typed(df, per_stat=True).collect()
    assert len(cells) == 20
    cell = {(r["column"], r["stat"]): r for r in cells}
    assert cell[("id", "n_rows")]["val_long"] == 2
    assert cell[("v", "min")]["val_double"] == 2.5
    assert cell[("v", "min")]["val_long"] is None
    assert cell[("s", "max")]["val_string"] == "b"
    # single-scan shape: one aggregation feeds both forms (no Expand
    # beyond the exact-NDV one, no extra scan per column)
    plan = profile_table_typed(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_profile_wide_equals_pivot_of_per_stat(spark):
    """VERDICT r9 #1: the wide library shape (per_stat=False) must
    equal the pivot of the driver-green per-stat shape — they are the
    SAME one-scan aggregates routed through two stack() layouts. This
    pin is what lets the gate ship only the per-stat form while the
    wide form stays the library API."""
    import datetime

    from openeo_processes_dask_ml_spark.io.profile import (
        pivot_per_stat,
        profile_table_typed,
    )

    ts = datetime.datetime(2021, 6, 2, 3, 4, 5)
    df = spark.createDataFrame(
        [(1, 2.5, "a", ts), (4, None, "b", ts), (9, -1.0, None, ts)],
        ["id", "v", "s", "t"],
    )
    wide = profile_table_typed(df, exact_ndv=True)
    rebuilt = pivot_per_stat(profile_table_typed(df, exact_ndv=True, per_stat=True))
    assert wide.columns == rebuilt.columns
    key = lambda r: r["column"]  # noqa: E731
    w = sorted(wide.collect(), key=key)
    p = sorted(rebuilt.collect(), key=key)
    assert [tuple(r) for r in w] == [tuple(r) for r in p]
    # and the dtypes agree slot-for-slot (a silent long->int or
    # double->decimal drift here would desync the gate probe)
    assert wide.dtypes == rebuilt.dtypes
