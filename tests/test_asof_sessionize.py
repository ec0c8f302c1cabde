"""As-of join + sessionization semantics."""

from datetime import datetime

from openeo_processes_dask_ml_spark.operators.asof import asof_join, sessionize


def _ts(minute):
    return datetime(2024, 1, 1, 0, minute)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(30)), (3, "u", _ts(5)), (4, "v", _ts(10))],
        ["event_id", "key", "ts"],
    )
    right = spark.createDataFrame(
        [("u", _ts(8), 80.0), ("u", _ts(20), 200.0), ("w", _ts(1), 1.0)],
        ["key", "rts", "rv"],
    )
    out = asof_join(left, right, on="key", left_ts="ts", right_ts="rts", right_cols=["rv"])
    got = {r["event_id"]: (r["rts_right"], r["rv_right"]) for r in out.collect()}
    assert got[1] == (_ts(8), 80.0)  # latest right <= 00:10
    assert got[2] == (_ts(20), 200.0)
    assert got[3] == (None, None)  # nothing earlier
    assert got[4] == (None, None)  # key with no right rows


def test_asof_equal_timestamp_matches(spark):
    left = spark.createDataFrame([(1, "u", _ts(10))], ["event_id", "key", "ts"])
    right = spark.createDataFrame([("u", _ts(10), 5.0)], ["key", "rts", "rv"])
    out = asof_join(left, right, on="key", left_ts="ts", right_ts="rts", right_cols=["rv"])
    assert out.collect()[0]["rv_right"] == 5.0  # >= semantics (ASOF tie)


def test_asof_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [(i, "u", _ts(i)) for i in range(30)], ["event_id", "key", "ts"]
    )
    right = spark.createDataFrame([("u", _ts(7), 1.0)], ["key", "rts", "rv"])
    out = asof_join(left, right, on="key", left_ts="ts", right_ts="rts", right_cols=["rv"])
    assert out.count() == 30


def test_resample_cube_temporal(spark):
    """Source cube values re-labeled onto the target cube's time grid
    (nearest-earlier match per series)."""
    from openeo_processes_dask_ml_spark.cube import CubeFrame
    from openeo_processes_dask_ml_spark.operators.asof import resample_cube_temporal

    src = spark.createDataFrame(
        [("u", _ts(0), 10.0), ("u", _ts(20), 20.0)], ["g", "t", "value"]
    )
    target = spark.createDataFrame(
        [("u", _ts(5), 0.0), ("u", _ts(25), 0.0)], ["g", "t", "value"]
    )
    src_cube = CubeFrame(src, {"geometry": "g", "time": "t"}, "value")
    tgt_cube = CubeFrame(target, {"geometry": "g", "time": "t"}, "value")
    out = resample_cube_temporal(src_cube, tgt_cube)
    got = {str(r["t"]): r["value"] for r in out.df.collect()}
    assert got[str(_ts(5))] == 10.0   # nearest earlier source = t0
    assert got[str(_ts(25))] == 20.0  # nearest earlier source = t20


def test_asof_composite_keys(spark):
    """With a composite key list, the series is keyed by ALL columns —
    values must not leak between rows that share only the first key."""
    left = spark.createDataFrame(
        [(1, "u", "A", _ts(10)), (2, "u", "B", _ts(10))],
        ["event_id", "key", "band", "ts"],
    )
    right = spark.createDataFrame(
        [("u", "A", _ts(5), 10.0), ("u", "B", _ts(5), 99.0)],
        ["key", "band", "rts", "rv"],
    )
    out = asof_join(
        left, right, on=["key", "band"], left_ts="ts", right_ts="rts",
        right_cols=["rv"],
    )
    got = {r["event_id"]: r["rv_right"] for r in out.collect()}
    assert got == {1: 10.0, 2: 99.0}


def test_resample_cube_temporal_multi_dim(spark):
    """bands + geometry cubes: each (geometry, band) series resamples
    independently — band A must not receive band B's value."""
    from openeo_processes_dask_ml_spark.cube import CubeFrame
    from openeo_processes_dask_ml_spark.operators.asof import resample_cube_temporal

    src = spark.createDataFrame(
        [
            ("u", "A", _ts(0), 10.0),
            ("u", "B", _ts(1), 99.0),  # later ts than band A's source
            ("v", "A", _ts(0), 70.0),
        ],
        ["g", "b", "t", "value"],
    )
    target = spark.createDataFrame(
        [
            ("u", "A", _ts(5), 0.0),
            ("u", "B", _ts(5), 0.0),
            ("v", "A", _ts(5), 0.0),
        ],
        ["g", "b", "t", "value"],
    )
    dims = {"geometry": "g", "bands": "b", "time": "t"}
    out = resample_cube_temporal(
        CubeFrame(src, dims, "value"), CubeFrame(target, dims, "value")
    )
    got = {(r["g"], r["b"]): r["value"] for r in out.df.collect()}
    assert got == {("u", "A"): 10.0, ("u", "B"): 99.0, ("v", "A"): 70.0}


def test_sessionize_gap_splits(spark):
    rows = [
        ("u", _ts(0), 1.0),
        ("u", _ts(10), 1.0),   # same session (10 min gap)
        ("u", _ts(50), 1.0),   # 40 min gap -> new session
        ("u", _ts(55), 1.0),
        ("v", _ts(0), 1.0),    # separate key -> own session numbering
    ]
    df = spark.createDataFrame(rows, ["user", "ts", "value"])
    out = sessionize(df, key="user", ts_col="ts", gap_seconds=1800.0)
    got = {(r["user"], str(r["ts"])): r["session_id"] for r in out.collect()}
    assert got[("u", str(_ts(0)))] == 1
    assert got[("u", str(_ts(10)))] == 1
    assert got[("u", str(_ts(50)))] == 2
    assert got[("u", str(_ts(55)))] == 2
    assert got[("v", str(_ts(0)))] == 1


def test_duplicate_clusters(spark):
    from openeo_processes_dask_ml_spark.scale.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (3, 7), (9, 9)], ["id_a", "id_b"]
    )
    out = duplicate_clusters(pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    # chain 1-2-3-7 collapses to min id 1; 5-6 to 5; self-loop dropped
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 6: 5}


def test_duplicate_clusters_string_ids_both_paths(spark):
    """Output schema derives from the edge id type on BOTH paths
    (ADVICE r7: the driver fast path used to hardcode long ids)."""
    from openeo_processes_dask_ml_spark.scale.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], ["id_a", "id_b"]
    )
    for threshold in (100_000, 0):  # driver fast path / distributed loop
        out = duplicate_clusters(pairs, driver_edge_threshold=threshold)
        assert dict(out.dtypes) == {"doc_id": "string", "cluster_id": "string"}
        got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_mask_rejects_extra_dims(spark):
    from openeo_processes_dask_ml_spark.cube import CubeFrame

    data = spark.createDataFrame([(1, 1.0)], ["t", "value"])
    mask = spark.createDataFrame([(1, "x", True)], ["t", "band", "m"])
    cube = CubeFrame(data, {"time": "t"}, "value")
    mcube = CubeFrame(mask, {"time": "t", "bands": "band"}, "m")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not present in the data cube"):
        cube.mask(mcube)
