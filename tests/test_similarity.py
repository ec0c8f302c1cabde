"""Similarity-search semantics: the distributed block-matrix exact
pairs must equal the pure-Catalyst reference implementation (including
cross-block pairs where the block-a id is the larger one)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(6, 8)
    rows = []
    for i in range(40):
        v = base[i % 6] + rng.randn(8) * 0.1
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_blocked_pairs_match_expr(spark, emb_df):
    from openeo_processes_dask_ml_spark.scale.similarity import (
        cosine_pairs_blocked,
        cosine_pairs_expr,
    )

    expected = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_expr(emb_df, threshold=0.9, dim=8).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_blocked(emb_df, threshold=0.9, n_blocks=4).collect()
    }
    assert set(got) == set(expected)
    # same clusters -> plenty of pairs, including cross-block ones where
    # the block-a id is larger (e.g. ids 6 and 1 share cluster, blocks 2/1)
    assert len(got) > 20
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-6)


def test_blocked_pairs_no_duplicates(spark, emb_df):
    from openeo_processes_dask_ml_spark.scale.similarity import cosine_pairs_blocked

    out = cosine_pairs_blocked(emb_df, threshold=-1.0, n_blocks=3).collect()
    keys = [(r["id_a"], r["id_b"]) for r in out]
    assert len(keys) == len(set(keys)) == 40 * 39 // 2
    assert all(a < b for a, b in keys)
