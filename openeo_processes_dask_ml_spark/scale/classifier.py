"""Hashed-feature text quality classifier (fastText-style).

The supervised sibling of the ccnet/DSIR quality surface (VERDICT
r12 #7): hashed n-gram bag-of-words features -> a linear classifier,
trained on labels and applied distributed. Reference analog: the
ml_fit / ml_predict surface (SURVEY §2.1) applied to text instead of
raster bands.

Three trainers, the ``ann_ivf_trained`` discipline:

- ``"gd"`` (gate path): deterministic least-squares (LMS / delta
  rule) full-batch gradient descent, driver-side on an md5-percentile
  sample under a ``max_train_rows`` guard. Every float op — the
  per-doc score fold, the per-weight gradient fold, the single
  division by n — runs in a pinned sequential order that a DuckDB
  oracle replays BIT-IDENTICALLY as unrolled materialized CTE stages
  (ordered ``list_reduce`` folds). No transcendentals anywhere, so
  there is no cross-engine libm risk at all (the ml_predict_preproc
  tanh note does not apply here).
- ``"logistic"``: numpy full-batch logistic regression on the same
  bounded sample — the statistically-right loss; engine-exact replay
  is NOT claimed (sigmoid/exp), so it is unit-tested, not oracle-
  gated.
- ``"mllib"``: ``pyspark.ml.classification.LogisticRegression`` —
  the DISTRIBUTED, uncapped production path for 100 TB corpora
  (driver never sees training rows; LBFGS reduction order is
  engine-internal, not value-replayable).

Feature hashing uses the repo-wide md5 convention
(``('0x' || substr(md5(g), 1, 8))::BIGINT`` in DuckDB ==
``F.conv(F.substring(F.md5(g), 1, 8), 16, 10)`` in Spark), so the
whole feature matrix is engine-exact; bucket counts are integers
(order-free sums) and the single count/n_grams division is IEEE-exact.

100 TB design: the feature build is one explode + two hash-keyed
aggregations (all high-cardinality shuffles, map-side combined);
predict is a pure column fold with the weight vector embedded as
literals (no shuffle, no Python); only the opt-in "gd"/"logistic"
trainers collect, and only a guarded sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from openeo_processes_dask_ml_spark.scale.dedup import hash32, tokens_expr

DEFAULT_BUCKETS = 32


def _grams(toks: Column) -> Column:
    """Word unigrams + bigrams over an ALREADY-BOUND token-array
    column, duplicates kept (counts matter). DuckDB twin:
    list_concat(toks, list_transform(range(1, len(toks)),
    i -> toks[i] || ' ' || toks[i+1])).

    The tokens MUST be a materialized column, not the split(...)
    expression itself: element_at(<split expr>, i) inside the bigram
    lambda re-evaluates the split PER ELEMENT — O(tokens^2) per doc
    (measured 9.2 s vs 1.4 s for the sf0.1 feature build, r13)."""
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat(
            F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
        ),
    )
    # sequence(1, 0) yields [1, 0] (descending), not [] — guard the
    # single-token case explicitly
    bigrams = F.when(F.size(toks) >= 2, bigrams).otherwise(
        F.array().cast("array<string>")
    )
    return F.concat(toks, bigrams)


def _char_grams(toks: Column, n_lo: int, n_hi: int) -> Column:
    """fastText's actual feature space: character n-grams of each
    token with ``<``/``>`` boundary markers (``where`` ->
    ``<wh, whe, her, ere, re>`` at n=3), lengths ``n_lo..n_hi``,
    duplicates kept. Pure codegen; per-token work is O(len * widths)
    over short word tokens, so the r13 O(tokens^2) lambda trap (an
    unbound split re-evaluated per element) does not apply — the
    token array is already materialized."""
    def per_tok(t: Column) -> Column:
        padded = F.concat(F.lit("<"), t, F.lit(">"))

        def slicer(n: int):
            # a closure, NOT `lambda i, n=n`: F.transform inspects
            # lambda arity and a 2-parameter lambda receives the
            # ARRAY INDEX as its second argument, silently replacing
            # the default (caught in review — every gram length
            # became the element position)
            return lambda i: padded.substr(i, F.lit(n))

        parts = []
        for n in range(n_lo, n_hi + 1):
            arr = F.when(
                F.length(padded) >= n,
                F.transform(
                    # sequence(1, 0) yields a DESCENDING ramp, not []
                    # — the length guard above keeps the stop >= 1
                    F.sequence(F.lit(1), F.length(padded) - (n - 1)),
                    slicer(n),
                ),
            ).otherwise(F.array().cast("array<string>"))
            parts.append(arr)
        return F.concat(*parts) if len(parts) > 1 else parts[0]

    return F.flatten(F.transform(toks, per_tok))


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_buckets: int = DEFAULT_BUCKETS,
    mode: str = "word",
    char_n: tuple[int, int] = (3, 5),
) -> DataFrame:
    """(id, xs array<double>) — xs has ``k_buckets`` + 1 entries: the
    normalized bucket counts (count_j / n_grams) plus a trailing 1.0
    bias term, so trainers and predict fold over one array.

    ``mode`` picks the gram space (NEW r14, VERDICT r13 #9):
    ``"word"`` (unigrams + bigrams — the r13 gate space), ``"char"``
    (boundary-marked character n-grams of ``char_n`` widths —
    fastText's subword features, robust to OOV/typo-heavy crawl
    text), or ``"word+char"`` (both). Same hashing, normalization,
    and trainer/oracle discipline in every mode."""
    toks_df = df.select(
        F.col(id_col), tokens_expr(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    if mode == "word":
        gexpr = _grams(toks)
    elif mode == "char":
        gexpr = _char_grams(toks, *char_n)
    elif mode == "word+char":
        gexpr = F.concat(_grams(toks), _char_grams(toks, *char_n))
    else:
        raise ValueError(
            f"mode must be 'word', 'char' or 'word+char', got {mode!r}"
        )
    grams = (
        toks_df.select(
            F.col(id_col),
            F.explode(gexpr).alias("g"),
        )
        .withColumn("bkt", F.pmod(hash32(F.col("g")), F.lit(k_buckets)))
    )
    counts = grams.groupBy(id_col, "bkt").agg(
        F.count("*").cast("bigint").alias("c")
    )
    per_doc = counts.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("bkt", "c"))).alias("m"),
        F.sum("c").alias("n_grams"),
    )
    # ONE parser round-trip (r16): the per-bucket comprehension built
    # ~5 py4j Column calls per bucket (~0.5 s of pure driver chatter
    # per query construction at k=32, profiled); the SQL string parses
    # JVM-side into the IDENTICAL tree (same coalesce/element_at/
    # int-0/double-division nodes), so plans and values are unchanged
    xs = F.expr(
        "array("
        + ",".join(
            f"coalesce(element_at(m, {j}), 0)"
            f" / cast(n_grams as double)"
            for j in range(k_buckets)
        )
        + ", cast(1.0 as double))"
    )
    return per_doc.select(F.col(id_col), xs.alias("xs"))


def _lms_train_ref(
    rows: list[tuple[list[float], float]], iters: int, lr: float
) -> list[float]:
    """The scalar REFERENCE trainer — the shape the DuckDB oracle's
    unrolled ``list_reduce`` CTEs replay term-for-term. Retained as
    the parity-test spec for :func:`_lms_train_py`; not on the hot
    path."""
    n = len(rows)
    width = len(rows[0][0])
    w = [0.0] * width
    for _ in range(iters):
        errs = []
        for xs, y in rows:
            s = w[0] * xs[0]
            for j in range(1, width):
                s += w[j] * xs[j]
            errs.append(s - y)
        nxt = []
        for j in range(width):
            g = errs[0] * rows[0][0][j]
            for d in range(1, n):
                g += errs[d] * rows[d][0][j]
            nxt.append(w[j] - lr * g / n)
        w = nxt
    return w


def _lms_train_py(
    rows: list[tuple[list[float], float]], iters: int, lr: float
) -> list[float]:
    """Deterministic full-batch LMS: ``rows`` MUST already be in the
    pinned (id) order. Fold orders mirror DuckDB ``list_reduce``
    exactly: first term initializes, subsequent terms accumulate
    left-to-right; one division by n per weight per iteration.

    r16: numpy-vectorized WITHOUT changing one float op (the
    :func:`_lloyd_py` technique): the response fold vectorizes across
    DOCS and accumulates sequentially across the width (``s += w[j] *
    X[:, j]`` in j order — elementwise IEEE doubles, each element's
    accumulation order identical to the scalar loop); the gradient
    fold vectorizes across WIDTH and accumulates sequentially across
    docs (``g += errs[d] * X[d]`` in d order — the spec's
    first-term-initialized doc fold). Pure Python paid ~1.3 s per
    3.5k x 33 x 8-iter fit on the driver (profiled r16); this is the
    same arithmetic vectorized. Equivalence is pinned by
    tests/test_classifier.py::test_lms_numpy_matches_reference plus
    the strict quality_classifier oracle gate."""
    import numpy as np

    n = len(rows)
    width = len(rows[0][0])
    X = np.array([r[0] for r in rows], dtype=np.float64)  # id order
    y = np.array([r[1] for r in rows], dtype=np.float64)
    w = np.zeros(width, dtype=np.float64)
    for _ in range(iters):
        s = w[0] * X[:, 0]
        for j in range(1, width):  # the spec's width-order fold
            s = s + w[j] * X[:, j]
        errs = s - y
        g = errs[0] * X[0]
        for d in range(1, n):  # the spec's doc-order fold
            g = g + errs[d] * X[d]
        w = w - lr * g / n
    return [float(v) for v in w]


def train_quality_classifier(
    feats: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "y",
    trainer: str = "gd",
    iters: int = 8,
    lr: float = 0.5,
    sample_pct: int = 70,
    max_train_rows: int = 100_000,
):
    """Fit on ``feats`` (id, xs) joined to ``labels`` (id, y in
    {0.0, 1.0}); returns the weight list for "gd"/"logistic" or the
    fitted MLlib model for "mllib".

    "gd"/"logistic" train driver-side on the md5-percentile sample
    (deterministic, the Lloyd-sample convention) and refuse more than
    ``max_train_rows`` rows — at corpus scale lower ``sample_pct`` or
    use trainer="mllib", which never collects."""
    data = feats.join(labels, id_col)
    if trainer == "mllib":
        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.functions import array_to_vector

        model = LogisticRegression(
            featuresCol="__fv", labelCol=label_col, maxIter=50,
        ).fit(data.withColumn("__fv", array_to_vector("xs")))
        return model
    sample = data.filter(
        F.pmod(hash32(F.col(id_col).cast("string")), F.lit(100))
        < F.lit(sample_pct)
    )
    rows = (
        sample.select(id_col, "xs", label_col)
        .orderBy(id_col)
        .limit(max_train_rows + 1)
        .collect()
    )
    if len(rows) > max_train_rows:
        raise ValueError(
            f"training sample exceeds max_train_rows={max_train_rows}; "
            "lower sample_pct or use trainer='mllib' (distributed, "
            "uncapped)"
        )
    if not rows:
        raise ValueError("training sample is empty")
    pairs = [(list(r["xs"]), float(r[label_col])) for r in rows]
    if trainer == "gd":
        return _lms_train_py(pairs, iters=iters, lr=lr)
    if trainer == "logistic":
        import numpy as np

        X = np.array([p[0] for p in pairs])
        y = np.array([p[1] for p in pairs])
        w = np.zeros(X.shape[1])
        for _ in range(max(iters, 50)):
            p = 1.0 / (1.0 + np.exp(-(X @ w)))
            w = w - lr * (X.T @ (p - y)) / len(y)
        return [float(v) for v in w]
    raise ValueError(f"unknown trainer {trainer!r}")


def predict_quality(
    feats: DataFrame, weights, threshold: float = 0.5
) -> DataFrame:
    """Adds ``score`` (the raw linear response), ``qscore``
    (floor(score*1e6 + 0.5) AS BIGINT — the quantize-before-order
    contract, r12 doctrine) and ``pred`` (qscore-thresholded 0/1).
    The fold is first-term-initialized to mirror the oracle's
    ``list_reduce``; weights embed as literals — one codegen
    projection, no shuffle."""
    if hasattr(weights, "transform") and not isinstance(weights, list):
        # MLlib model: delegate (production path)
        from pyspark.ml.functions import array_to_vector

        return weights.transform(
            feats.withColumn("__fv", array_to_vector("xs"))
        ).drop("__fv")
    # ONE parser round-trip (r16, same rationale as the xs build):
    # CAST('<repr>' AS DOUBLE) is Java parseDouble — repr round-trips
    # every finite double exactly, so the literal tree is unchanged
    terms = " + ".join(
        f"CAST('{float(w)!r}' AS DOUBLE) * xs[{j}]"
        for j, w in enumerate(weights)
    )
    score = F.expr(terms)
    qthr = int(threshold * 1_000_000)
    out = feats.withColumn("score", score).withColumn(
        "qscore",
        F.floor(F.col("score") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    return out.withColumn(
        "pred", (F.col("qscore") >= F.lit(qthr)).cast("bigint")
    )
