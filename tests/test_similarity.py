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


def test_lsh_pairs_candidate_recall(spark, emb_df):
    """The banded-LSH near-dup path must (a) never emit a pair the exact
    path wouldn't (verification is exact), and (b) recall ~all true
    pairs at a real near-dup threshold (0.9: clustered fixture vectors
    agree on most hyperplanes; recall is deterministic — md5 planes)."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        cosine_pairs_blocked,
        cosine_pairs_lsh,
    )

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_blocked(emb_df, threshold=0.9, n_blocks=4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_lsh(emb_df, threshold=0.9, dim=8).collect()
    }
    assert set(lsh) <= set(exact), "LSH emitted a non-exact pair"
    assert len(exact) > 20
    recall = len(lsh) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f} below floor"
    for k, v in lsh.items():
        assert v == exact[k]


def test_ivf_trained_quantizer_recall(spark, emb_df):
    """The k-means-trained IVF variant must hit high recall@k vs the
    exact brute-force baseline on the clustered fixture (centroids
    land on the 6 clusters; probing 3 of 5 lists covers neighbors)."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        ann_topk_bruteforce,
        ivf_topk,
    )

    queries = list(range(8))
    exact = {}
    for r in ann_topk_bruteforce(emb_df, queries, k=3, dim=8).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in ivf_topk(
        emb_df, queries, k=3, n_lists=5, n_probe=3, dim=8,
        train_quantizer=True,
    ).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(len(got.get(q, set()) & exact[q]) for q in queries)
    total = sum(len(exact[q]) for q in queries)
    assert hits / total >= 0.9, f"recall@3 {hits / total:.3f}"


def test_ivf_lloyd_trainer_recall_and_determinism(spark, emb_df):
    """trainer='lloyd' (the SQL-replicable deterministic Lloyd path,
    VERDICT r8 #4) must match the clustered-fixture recall bar AND be
    run-to-run deterministic (identical ranked rows on a rerun — the
    property the value oracle depends on)."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        ann_topk_bruteforce,
        ivf_topk,
    )

    queries = list(range(8))
    exact = {}
    for r in ann_topk_bruteforce(emb_df, queries, k=3, dim=8).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def run():
        return sorted(
            tuple(r) for r in ivf_topk(
                emb_df, queries, k=3, n_lists=5, n_probe=3, dim=8,
                train_quantizer=True, trainer="lloyd",
            ).collect()
        )

    first = run()
    got = {}
    for query_id, neighbor_id, *_ in first:
        got.setdefault(query_id, set()).add(neighbor_id)
    hits = sum(len(got.get(q, set()) & exact[q]) for q in queries)
    total = sum(len(exact[q]) for q in queries)
    assert hits / total >= 0.9, f"recall@3 {hits / total:.3f}"
    assert run() == first


def test_lloyd_py_trainer_contract():
    """_lloyd_py: evenly spaced init, empty clusters keep their
    centroid, and arithmetic is pure-python sequential (bit-stable
    across runs)."""
    from openeo_processes_dask_ml_spark.scale.similarity import _lloyd_py

    rows = [(i, [float(i), float(i % 3)]) for i in range(12)]
    c1 = _lloyd_py(rows, k=3, iters=5)
    c2 = _lloyd_py(rows, k=3, iters=5)
    assert c1 == c2
    assert len(c1) == 3 and all(len(c) == 2 for c in c1)
    # k=1 collapses to the global mean of dim 0
    c = _lloyd_py(rows, k=1, iters=3)
    assert abs(c[0][0] - sum(float(i) for i in range(12)) / 12) < 1e-12
    try:
        _lloyd_py([], k=2, iters=1)
        raise AssertionError("empty sample must raise")
    except ValueError:
        pass


def test_coarse_assign_lloyd_max_train_rows_guard(spark, emb_df):
    """The bounded-collect guard: an oversized training sample raises
    a clear error instead of silently ballooning the driver."""
    import pytest

    from openeo_processes_dask_ml_spark.scale.similarity import ivf_topk

    with pytest.raises(ValueError, match="max_train_rows"):
        from openeo_processes_dask_ml_spark.scale.similarity import (
            _coarse_assign,
        )

        _coarse_assign(
            emb_df, 5, "embedding", "vec_id",
            train_quantizer=True, sample_fraction=1.0,
            trainer="lloyd", max_train_rows=3,
        )

    # VERDICT r9 #3: the DEFAULT cap matches the documented ~1e5
    # intent — _lloyd_py is pure Python, so the old 1e6 default was
    # ~1e10 driver float ops presented as an allowed configuration
    import inspect

    from openeo_processes_dask_ml_spark.scale.similarity import _coarse_assign

    sig = inspect.signature(_coarse_assign)
    assert sig.parameters["max_train_rows"].default == 100_000


def test_semantic_dedup_within_cluster_semantics(spark):
    """Duplicates are detected within a coarse cluster; the best keeper
    wins; and cross-cluster near-pairs are (by design) not surfaced —
    the documented SemDeDup approximation."""
    from openeo_processes_dask_ml_spark.scale.similarity import semantic_dedup

    # 2 seeds (ids 0, 1) on orthogonal axes; 10/11 ride with seed 0,
    # 20 rides with seed 1
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0, 0.0]),
        (10, [0.9, 0.1, 0.0, 0.0]),   # near-dup of 0, same cluster
        (11, [0.95, 0.05, 0.0, 0.0]),  # nearer dup of 0 and of 10
        (20, [0.0, 0.9, 0.0, 0.1]),   # near-dup of 1, other cluster
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in semantic_dedup(df, threshold=0.9, n_lists=2).collect()}
    # 10 and 11 are dups inside cluster 0; keeper is the best match
    assert 10 in out and out[10]["dup_of"] == 0 and out[10]["list_id"] == 0
    assert 11 in out and out[11]["dup_of"] in (0, 10)
    # 20 is a dup of 1 inside cluster 1
    assert 20 in out and out[20]["dup_of"] == 1 and out[20]["list_id"] == 1
    # seeds themselves (smallest ids) are never marked duplicates
    assert 0 not in out and 1 not in out
    # determinism
    again = {r["vec_id"]: r for r in semantic_dedup(df, threshold=0.9, n_lists=2).collect()}
    assert {k: (v["dup_of"], v["cosine"]) for k, v in out.items()} == {
        k: (v["dup_of"], v["cosine"]) for k, v in again.items()
    }


def test_hard_negatives_excludes_dup_band(spark):
    from openeo_processes_dask_ml_spark.scale.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),    # anchor
        (1, [0.99, 0.01, 0.0, 0.0]),  # near-dup (cos ~ 1) -> excluded
        (2, [0.8, 0.6, 0.0, 0.0]),    # hard negative (cos = 0.8)
        (3, [0.6, 0.8, 0.0, 0.0]),    # negative (cos = 0.6)
        (4, [0.0, 0.0, 1.0, 0.0]),    # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = hard_negatives(df, [0], k=2, dup_threshold=0.9, dim=4).collect()
    got = [(r["rank"], r["negative_id"], r["cosine"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert [g[1] for g in got] == [2, 3]  # near-dup 1 skipped, ranked by cosine
    assert abs(got[0][2] - 0.8) < 1e-6 and abs(got[1][2] - 0.6) < 1e-6


def test_pq_topk_contract_and_recall(spark, emb_df):
    """Product quantization on a clustered corpus: per-query ranks are
    1..k with non-decreasing ADC distance, and the compressed index
    still finds most true neighbors (the clusters are wide apart, so
    codeword distortion shouldn't break the ordering)."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        ann_topk_bruteforce,
        pq_topk,
    )

    qids = list(range(6))
    got = pq_topk(emb_df, qids, k=3, m=4, ks=8, dim=8).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["approx_dist"]))
    assert set(per_q) == set(qids)
    for q, entries in per_q.items():
        entries.sort()
        assert [e[0] for e in entries] == [1, 2, 3]
        dists = [e[1] for e in entries]
        assert dists == sorted(dists)

    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_bruteforce(emb_df, qids, k=3, dim=8).collect()
    }
    found = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(found & truth) / len(truth)
    assert recall >= 0.5, recall


def test_pq_trained_codebooks_and_rerank_exact(spark, emb_df):
    """Trained per-subspace k-means codebooks + exact re-rank: the
    refined distances must equal numpy's squared L2 on the winning
    pairs, and recall must not degrade vs the un-reranked index."""
    from openeo_processes_dask_ml_spark.scale.similarity import pq_topk

    rows = {r["vec_id"]: np.array(r["embedding"]) for r in emb_df.collect()}
    got = pq_topk(
        emb_df, [0, 1], k=3, m=4, ks=8, dim=8,
        train_codebooks=True, rerank=10,
    ).collect()
    assert len(got) == 6
    for r in got:
        expect = float(((rows[r["query_id"]] - rows[r["neighbor_id"]]) ** 2).sum())
        assert r["exact_dist"] == pytest.approx(expect, abs=1e-5)


def test_pq_index_lifecycle_roundtrip(spark, emb_df, tmp_path):
    """Build-once / query-many: PQ index artifacts written to parquet
    and reloaded must serve exactly the same top-k as the direct
    pq_topk call — the persisted index is a cache, not a semantics
    change, and queries never read the raw vectors."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        build_pq_index,
        pq_topk,
        pq_topk_from_index,
    )

    cb_df, codes_df = build_pq_index(emb_df, m=4, ks=8, dim=8)
    cb_path, codes_path = str(tmp_path / "cb"), str(tmp_path / "codes")
    cb_df.write.parquet(cb_path)
    codes_df.write.parquet(codes_path)

    qids = [0, 1, 2]
    queries = emb_df.filter(emb_df.vec_id.isin(qids)).select(
        emb_df.vec_id.alias("query_id"), emb_df.embedding.alias("qv")
    )
    served = pq_topk_from_index(
        spark.read.parquet(cb_path), spark.read.parquet(codes_path),
        queries, k=3,
    ).collect()
    direct = pq_topk(emb_df, qids, k=3, m=4, ks=8, dim=8).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(
        [(r["query_id"], r["rank"], r["neighbor_id"], r["approx_dist"]) for r in served]
    ) == sorted(
        [(r["query_id"], r["rank"], r["neighbor_id"], r["approx_dist"]) for r in direct]
    )


def test_ivfpq_topk_clustered_recall_and_contract(spark, emb_df):
    """IVF-PQ composition: ranks are 1..k with non-decreasing ADC
    distance; on the clustered fixture the pruned+compressed index
    still recovers most true neighbors, and exact re-rank recovers
    more than the ADC ordering alone."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        ann_topk_bruteforce,
        ivfpq_topk,
    )

    qids = list(range(6))
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_bruteforce(emb_df, qids, k=3, dim=8).collect()
    }
    got = ivfpq_topk(
        emb_df, qids, k=3, n_lists=4, n_probe=2, m=4, ks=8, dim=8
    ).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["approx_dist"]))
    assert set(per_q) == set(qids)
    for entries in per_q.values():
        entries.sort()
        assert [e[0] for e in entries] == [1, 2, 3]
        assert [e[1] for e in entries] == sorted(e[1] for e in entries)
    base_recall = len({(r["query_id"], r["neighbor_id"]) for r in got} & truth) / len(truth)
    assert base_recall >= 0.3, base_recall

    rr = ivfpq_topk(
        emb_df, qids, k=3, n_lists=4, n_probe=2, m=4, ks=8, dim=8, rerank=10
    ).collect()
    rr_recall = len({(r["query_id"], r["neighbor_id"]) for r in rr} & truth) / len(truth)
    assert rr_recall >= base_recall


def test_ivf_index_lifecycle_roundtrip(spark, emb_df, tmp_path):
    """Persisted IVF artifacts (seeds + inverted lists, lists
    partitioned by list_id on write) must serve the same top-k as the
    direct ivf_topk call."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_from_index,
    )

    seeds_df, lists_df = build_ivf_index(emb_df, n_lists=4)
    sp, lp = str(tmp_path / "seeds"), str(tmp_path / "lists")
    seeds_df.write.parquet(sp)
    lists_df.write.partitionBy("list_id").parquet(lp)

    qids = [0, 1, 2]
    queries = emb_df.filter(emb_df.vec_id.isin(qids)).select(
        emb_df.vec_id.alias("query_id"), emb_df.embedding.alias("qv")
    )
    served = ivf_topk_from_index(
        spark.read.parquet(sp), spark.read.parquet(lp), queries,
        k=3, n_probe=2,
    ).collect()
    direct = ivf_topk(
        emb_df, qids, k=3, n_lists=4, n_probe=2, dim=8
    ).collect()
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in rows
    )
    assert norm(served) == norm(direct)


def test_lsh_multiprobe_improves_recall(spark):
    """Multi-probe LSH probes all Hamming-1 buckets: recall vs brute
    force must be at least the single-bucket recall (strictly better on
    this corpus), with no duplicate (query, neighbor) rows."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        ann_topk_bruteforce,
        lsh_bucketed_ann,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids = list(range(10))
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in ann_topk_bruteforce(emb, qids, k=5).collect()
    }
    plain_rows = lsh_bucketed_ann(emb, qids, k=5).collect()
    multi_rows = lsh_bucketed_ann(emb, qids, k=5, multiprobe=3).collect()
    plain = {(r["query_id"], r["neighbor_id"]) for r in plain_rows}
    multi = {(r["query_id"], r["neighbor_id"]) for r in multi_rows}
    assert len(multi_rows) == len(multi)  # no dup pairs from probing
    r_plain = len(plain & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_multi >= r_plain
    assert r_multi >= 0.1, (r_plain, r_multi)


def test_cluster_balanced_sample_properties(spark):
    from openeo_processes_dask_ml_spark.scale.similarity import (
        cluster_balanced_sample,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    total = emb.count()
    out = cluster_balanced_sample(emb, per_cluster=10, n_lists=4).collect()
    # per-cluster cap respected, ranks dense from 1
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["list_id"], []).append(r["rank"])
    assert len(by_cluster) <= 4
    for ranks in by_cluster.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 10
    # cluster sizes sum to the corpus (every vector assigned exactly once)
    sizes = {r["list_id"]: r["cluster_size"] for r in out}
    assert sum(sizes.values()) == total
    # deterministic
    again = cluster_balanced_sample(emb, per_cluster=10, n_lists=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_ivfpq_index_lifecycle_roundtrip(spark, emb_df, tmp_path):
    """Persisted IVF-PQ artifacts (seeds + codebooks + list-partitioned
    codes) must serve the same ADC-ranked top-k as the direct
    ivfpq_topk call — build-once/query-many for the combined index."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        build_ivfpq_index,
        ivfpq_topk,
        ivfpq_topk_from_index,
    )

    seeds_df, cb_df, codes_df = build_ivfpq_index(
        emb_df, n_lists=4, m=4, ks=8, dim=8
    )
    sp = str(tmp_path / "seeds")
    cp = str(tmp_path / "codebooks")
    kp = str(tmp_path / "codes")
    seeds_df.write.parquet(sp)
    cb_df.write.parquet(cp)
    codes_df.write.partitionBy("list_id").parquet(kp)

    qids = [0, 1, 2]
    queries = emb_df.filter(emb_df.vec_id.isin(qids)).select(
        emb_df.vec_id.alias("query_id"), emb_df.embedding.alias("qv")
    )
    served = ivfpq_topk_from_index(
        spark.read.parquet(sp),
        spark.read.parquet(cp),
        spark.read.parquet(kp),
        queries,
        k=3,
        n_probe=2,
    ).collect()
    direct = ivfpq_topk(
        emb_df, qids, k=3, n_lists=4, n_probe=2, m=4, ks=8, dim=8
    ).collect()
    norm = lambda rows: sorted(  # noqa: E731
        (r["query_id"], r["rank"], r["neighbor_id"], r["approx_dist"])
        for r in rows
    )
    assert norm(served) == norm(direct)


def test_pq_mllib_trainer_and_cap_guard(spark, emb_df):
    """VERDICT r12 #6: trainer='mllib' trains PQ codebooks with
    distributed MLlib KMeans (uncapped — the driver sees only the
    m*ks*d_sub centroid floats) and serves queries with recall on par
    with the Lloyd path; the Lloyd path's driver collect is now under
    the same max_train_rows guard as the IVF trainer."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        _pq_codebooks,
        ann_topk_bruteforce,
        pq_topk,
    )
    from pyspark.sql import functions as F

    # both trainers produce structurally valid codebooks
    base = emb_df.select(
        F.col("vec_id").alias("vid"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    for tr in ("lloyd", "mllib"):
        cb = _pq_codebooks(base, 4, 8, 2, True, 1.0, trainer=tr)
        assert len(cb) == 4
        assert all(len(sub) == 8 for sub in cb)
        assert all(len(c) == 2 for sub in cb for c in sub)

    qids = [0, 1, 2]
    got = pq_topk(
        emb_df, qids, k=3, m=4, ks=8, dim=8,
        train_codebooks=True, codebook_trainer="mllib", rerank=20,
    ).collect()
    assert len(got) == 9
    # rerank ranks by EXACT squared L2, so the truth metric is L2
    # (ann_topk_bruteforce is cosine — a different ordering on this
    # unnormalized fixture); with a 20-wide ADC shortlist the exact
    # refine recovers the true L2 top-3 nearly everywhere
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in emb_df.collect()}
    truth = set()
    for q in qids:
        d = sorted(
            (float(((vecs[q] - v) ** 2).sum()), i)
            for i, v in vecs.items() if i != q
        )
        truth |= {(q, i) for _, i in d[:3]}
    found = {(r["query_id"], r["neighbor_id"]) for r in got}
    assert len(found & truth) / len(truth) >= 0.8

    with pytest.raises(ValueError, match="max_train_rows"):
        _pq_codebooks(base, 4, 8, 2, True, 1.0, max_train_rows=10)
    with pytest.raises(ValueError, match="unknown PQ trainer"):
        _pq_codebooks(base, 4, 8, 2, True, 1.0, trainer="nope")


def test_cosine_pairs_lsh_no_self_pairs_on_duplicate_ids(spark):
    """r15 review: with duplicate vec_ids the group verify must order
    by ID VALUE — position order emitted (x, x, 1.0) self-pairs."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        cosine_pairs_lsh,
    )

    v = [1.0] + [0.0] * 63
    w = [0.0, 1.0] + [0.0] * 62
    df = spark.createDataFrame(
        [(7, v), (7, v), (9, w)], "vec_id long, embedding array<double>"
    )
    rows = cosine_pairs_lsh(df, threshold=0.9).collect()
    assert all(r["id_a"] < r["id_b"] for r in rows)
    assert not any(r["id_a"] == 7 and r["id_b"] == 7 for r in rows)


def test_cosine_pairs_lsh_hot_bucket_block_decomposition(spark):
    """VERDICT r15 #4 (self-healing hot buckets): a degenerate bucket
    of near-identical vectors block-decomposes into cap-sized chunk
    pairs — per-task verify work is bounded by cap^2 — and the output
    pair set is bit-identical to the unsplit run (same pairs, same
    rounded cosines), because every chunk pair of the upper triangle
    is still compared exactly once."""
    import numpy as np

    from openeo_processes_dask_ml_spark.scale.similarity import (
        cosine_pairs_lsh,
    )

    # 300 near-identical vectors (tiny deterministic jitter on one
    # coordinate keeps them a single LSH bucket per band and all above
    # threshold) + a far-away decoy that must not pair with anything
    n = 300
    rows = [
        (i, [1.0, 1e-6 * (i % 7)] + [0.0] * 62) for i in range(n)
    ] + [(10_000, [0.0] * 62 + [1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    unsplit = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_lsh(
            df, threshold=0.9, max_bucket_verify=100_000
        ).collect()
    }
    split = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in cosine_pairs_lsh(
            df, threshold=0.9, max_bucket_verify=64
        ).collect()
    }
    assert split == unsplit
    assert len(split) == n * (n - 1) // 2  # the full quadratic truth
    assert not any(10_000 in p for p in split)



def test_pq_encode_matches_sql_spec(spark, emb_df):
    """The r16 Arrow/numpy PQ encode must be BIT-identical to the
    retained SQL-replicable expression spec (_pq_encode_expr) — same
    per-element products, same dim-order accumulation, same first-min
    ties — on the clustered fixture (near-tie heavy: every vector sits
    close to one of 6 cluster centers, so codeword distances collide
    constantly)."""
    from pyspark.sql import functions as F

    from openeo_processes_dask_ml_spark.scale.similarity import (
        _pq_codebooks,
        _pq_encode,
        _pq_encode_expr,
    )

    m, ks, d_sub = 4, 4, 2
    base = emb_df.select(
        F.col("vec_id").alias("vid"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "v"
        ),
    )
    for train in (False, True):
        cb = _pq_codebooks(base, m, ks, d_sub, train, 1.0)
        want = {
            r["vid"]: list(r["codes"])
            for r in _pq_encode_expr(base, cb, m, ks, d_sub).collect()
        }
        got = {
            r["vid"]: list(r["codes"])
            for r in _pq_encode(base, cb, m, ks, d_sub).collect()
        }
        assert got == want


def test_cosine_pairs_exact_bit_identical_to_cumsum_fold():
    """The r16 BLAS-prefilter pair kernel must return EXACTLY the pairs
    the cumsum strict-left-fold reference selects, with BIT-identical
    cosine values — including thresholds landing exactly on a computed
    cosine (the boundary the 1e-9 band exists to protect)."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        _cosine_pairs_exact,
        _fold_dots_exact,
    )

    rng = np.random.default_rng(7)
    for trial in range(5):
        a_n, b_n, d = 37, 53, 16
        VA = rng.standard_normal((a_n, d))
        VB = rng.standard_normal((b_n, d))
        na = np.sqrt(np.cumsum(VA * VA, axis=1)[:, -1])
        nb = np.sqrt(np.cumsum(VB * VB, axis=1)[:, -1])
        ref_dots = np.cumsum(VA[:, None, :] * VB[None, :, :], axis=2)[:, :, -1]
        ref_cos = ref_dots / (na[:, None] * nb[None, :])
        # a mid-range threshold plus thresholds EQUAL to actual cosines
        thresholds = [0.3, float(np.sort(ref_cos.ravel())[-5])]
        for thr in thresholds:
            ii, jj, cos = _cosine_pairs_exact(VA, na, VB, nb, thr)
            want = np.nonzero(ref_cos >= thr)
            assert np.array_equal(ii, want[0])
            assert np.array_equal(jj, want[1])
            assert np.array_equal(cos, ref_cos[want])
    # the fold helper itself is the cumsum fold, element for element
    A = rng.standard_normal((11, 9))
    B = rng.standard_normal((11, 9))
    assert np.array_equal(
        _fold_dots_exact(A, B), np.cumsum(A * B, axis=1)[:, -1]
    )
