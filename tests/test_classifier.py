"""Hashed-feature quality classifier (scale/classifier.py): feature
shape/normalization, the deterministic LMS trainer, the bounded-sample
guard, and the production logistic/MLlib trainers on separable data."""

import pytest
from pyspark.sql import functions as F

from openeo_processes_dask_ml_spark.scale.classifier import (
    _lms_train_py,
    hashed_ngram_features,
    predict_quality,
    train_quality_classifier,
)


def _docs(spark, n=60):
    # separable synthetic corpus: "good" docs speak one vocabulary,
    # "bad" docs another
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rows.append((i, "clean prose with careful structure " * 3, 1.0))
        else:
            rows.append((i, "spam junk buy now click here " * 3, 0.0))
    return spark.createDataFrame(rows, "doc_id bigint, text string, y double")


def test_feature_shape_and_normalization(spark):
    df = _docs(spark, 10)
    feats = hashed_ngram_features(df, k_buckets=16)
    row = feats.orderBy("doc_id").first()
    assert len(row["xs"]) == 17
    assert row["xs"][-1] == 1.0
    assert abs(sum(row["xs"][:-1]) - 1.0) < 1e-12  # counts / n_grams


def test_lms_trainer_is_deterministic_and_learns(spark):
    df = _docs(spark)
    feats = hashed_ngram_features(df, k_buckets=16)
    labels = df.select("doc_id", "y")
    w1 = train_quality_classifier(feats, labels, trainer="gd",
                                  sample_pct=100)
    w2 = train_quality_classifier(feats, labels, trainer="gd",
                                  sample_pct=100)
    assert w1 == w2  # bit-identical reruns
    pred = predict_quality(feats, w1).join(labels, "doc_id")
    acc = pred.agg(
        F.avg((F.col("pred") == F.col("y").cast("bigint")).cast("double"))
    ).first()[0]
    assert acc > 0.9  # separable vocabularies -> near-perfect


def test_lms_fold_matches_pure_python_reference():
    """The driver trainer IS the pinned-order fold: cross-check one
    tiny case against an independently-written numpy batch update."""
    import numpy as np

    rows = [([0.5, 0.25, 1.0], 1.0), ([0.1, 0.9, 1.0], 0.0),
            ([0.7, 0.2, 1.0], 1.0)]
    w = _lms_train_py(rows, iters=3, lr=0.5)
    X = np.array([r[0] for r in rows])
    y = np.array([r[1] for r in rows])
    wref = np.zeros(3)
    for _ in range(3):
        wref = wref - 0.5 * (X.T @ (X @ wref - y)) / len(y)
    assert np.allclose(w, wref, rtol=0, atol=1e-12)


def test_max_train_rows_guard(spark):
    df = _docs(spark, 30)
    feats = hashed_ngram_features(df, k_buckets=8)
    labels = df.select("doc_id", "y")
    with pytest.raises(ValueError, match="max_train_rows"):
        train_quality_classifier(
            feats, labels, trainer="gd", sample_pct=100, max_train_rows=10
        )


def test_logistic_and_mllib_trainers(spark):
    df = _docs(spark)
    feats = hashed_ngram_features(df, k_buckets=16)
    labels = df.select("doc_id", "y")

    wl = train_quality_classifier(feats, labels, trainer="logistic",
                                  sample_pct=100)
    pred = predict_quality(feats, wl).join(labels, "doc_id")
    # logistic weights feed the same linear fold; threshold at 0.5
    # sits mid-sigmoid, so the separable case still splits cleanly
    acc = pred.agg(
        F.avg((F.col("pred") == F.col("y").cast("bigint")).cast("double"))
    ).first()[0]
    assert acc > 0.9

    model = train_quality_classifier(feats, labels, trainer="mllib")
    out = predict_quality(feats, model).join(labels, "doc_id")
    acc_m = out.agg(
        F.avg((F.col("prediction") == F.col("y")).cast("double"))
    ).first()[0]
    assert acc_m > 0.9

    with pytest.raises(ValueError, match="unknown trainer"):
        train_quality_classifier(feats, labels, trainer="nope")


def test_char_mode_matches_pure_python_reference(spark):
    """Subword mode (r14): Spark's boundary-marked char n-gram
    features must equal a pure-Python replica (same tokenization, md5
    bucket hashing, normalization), and the gd trainer over them must
    produce identical weights — the trainer is shared, so feature
    parity is the whole proof."""
    import hashlib
    import re

    from openeo_processes_dask_ml_spark.scale.classifier import (
        DEFAULT_BUCKETS,
        _lms_train_py,
        hashed_ngram_features,
        train_quality_classifier,
    )

    texts = [
        (1, "Where is the library", 1.0),
        (2, "zzz qqq unseen tokens", 0.0),
        (3, "the where there here", 1.0),
        (4, "xx", 0.0),  # shorter than every padded width but n=3
        (5, "a", 0.0),  # padded len 3: exactly one 3-gram, no 4/5
    ]

    def ref_xs(text, k=DEFAULT_BUCKETS, n_lo=3, n_hi=5):
        toks = re.split(r"\s+", text.strip().lower())
        grams = []
        for t in toks:
            p = f"<{t}>"
            for n in range(n_lo, n_hi + 1):
                grams += [p[i : i + n] for i in range(len(p) - n + 1)]
        counts = [0] * k
        for g in grams:
            counts[int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % k] += 1
        return [c / len(grams) for c in counts] + [1.0]

    df = spark.createDataFrame(
        [(i, t) for i, t, _ in texts], "doc_id bigint, text string"
    )
    feats = hashed_ngram_features(df, mode="char")
    got = {r["doc_id"]: list(r["xs"]) for r in feats.collect()}
    want = {i: ref_xs(t) for i, t, _ in texts}
    assert got == want

    labels = spark.createDataFrame(
        [(i, y) for i, _, y in texts], "doc_id bigint, y double"
    )
    w_spark = train_quality_classifier(feats, labels, sample_pct=100)
    pairs = [(want[i], y) for i, _, y in texts]  # id-ordered
    w_ref = _lms_train_py(pairs, iters=8, lr=0.5)
    assert w_spark == w_ref


def test_word_char_mode_concatenates_spaces(spark):
    from openeo_processes_dask_ml_spark.scale.classifier import (
        hashed_ngram_features,
    )
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, "hello world")], "doc_id bigint, text string"
    )
    xs = hashed_ngram_features(df, mode="word+char").collect()[0]["xs"]
    assert abs(sum(xs[:-1]) - 1.0) < 1e-12  # still a distribution
    with _pytest.raises(ValueError, match="mode"):
        hashed_ngram_features(df, mode="chars")


def test_lms_numpy_matches_reference_bit_identical():
    """The r16 vectorized trainer must equal the scalar reference
    BIT-FOR-BIT (not allclose): the oracle unrolls the scalar fold, so
    any reassociation in the numpy path would flip strict gate hashes.
    Random corpora, widths and iteration counts."""
    import random

    from openeo_processes_dask_ml_spark.scale.classifier import (
        _lms_train_ref,
    )

    rng = random.Random(20260817)
    for trial in range(25):
        n = rng.randint(1, 40)
        width = rng.randint(1, 12)
        iters = rng.randint(1, 9)
        lr = rng.choice([0.5, 0.25, 0.1, 1.0])
        rows = [
            (
                [rng.uniform(-2, 2) for _ in range(width)],
                float(rng.randint(0, 1)),
            )
            for _ in range(n)
        ]
        got = _lms_train_py(rows, iters=iters, lr=lr)
        want = _lms_train_ref(rows, iters=iters, lr=lr)
        assert got == want, (trial, n, width, iters, lr)
