"""Physical-plan regression guards: the scale properties the engine
relies on (filter pushdown to parquet, column pruning, no corpus-sized
broadcast hints) asserted against the actual Catalyst plans, so a
refactor that silently loses them fails CI — not a 100 TB run."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


SF_DIR = "/root/testdata/sf0.001"


def test_property_filter_pushes_to_parquet(spark):
    from openeo_processes_dask_ml_spark.io.load import load_collection

    cube = load_collection(
        spark, "events", SF_DIR, properties={"user_id": {"lt": 10}}
    )
    plan = _plan(cube.df.select("event_id", "value"))
    assert "PushedFilters: [" in plan and "user_id" in plan.split("PushedFilters:")[1][:200]


def test_column_pruning_reaches_scan(spark):
    from openeo_processes_dask_ml_spark.io.load import load_table

    df = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema  # untouched columns pruned


def test_jaccard_sizes_join_not_hint_broadcast(spark):
    """The per-document stats table must not carry a broadcast HINT
    (VERDICT r4 #1): at corpus scale it is billions of rows. Size-based
    planning may still elect a broadcast on toy data — the guard is on
    the logical plan's hints, not the physical choice."""
    from openeo_processes_dask_ml_spark.scale.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    optimized = _optimized(ngram_jaccard_pairs(docs))
    # the only broadcast hints allowed are the tiny hot-shingle list
    # and the 1-row doc count — both appear before optimization folds
    # them; a hint on the doc-keyed stats table would surface here
    assert "ResolvedHint" not in optimized


def test_decontaminate_broadcasts_blocklist_only(spark):
    from openeo_processes_dask_ml_spark.scale.pipeline import decontaminate

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 5 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 5 == 0).limit(20)
    plan = _plan(decontaminate(train, eval_docs))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_ann_topk_never_shuffles_corpus_for_join(spark):
    """Brute-force ANN joins the broadcast query side against the
    corpus — the corpus side must not have an Exchange introduced by
    the join itself (only the final top-k agg shuffles)."""
    from openeo_processes_dask_ml_spark.scale.similarity import ann_topk_bruteforce

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(ann_topk_bruteforce(emb, list(range(5)), k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_fit_curve_single_aggregate_no_python(spark):
    """fit_curve is one hash aggregation + Catalyst Cramer solve: no
    Python evaluation nodes anywhere in the plan."""
    from openeo_processes_dask_ml_spark.cube import CubeFrame
    from openeo_processes_dask_ml_spark.operators.curve import (
        fit_curve,
        harmonic_basis,
    )

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    cube = CubeFrame(ev, {"time": "ts", "bands": "event_type"}, "value")
    fitted = fit_curve(
        cube, "time", lambda c: F.unix_micros(c) / 3.6e9, harmonic_basis(24.0)
    )
    plan = _plan(fitted.df)
    assert "HashAggregate" in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapGroupsInPandas"):
        assert marker not in plan


def test_semantic_dedup_pair_join_keyed_on_block(spark):
    """The within-cluster pair join must be keyed (list_id, block) —
    not list_id alone — so parallelism doesn't cap at n_lists."""
    from openeo_processes_dask_ml_spark.scale.similarity import semantic_dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _optimized(semantic_dedup(emb, threshold=0.4, n_lists=4))
    # the partner-block explode introduces the pb key; its name must
    # appear in a join condition alongside list_id
    assert "pb" in plan and "list_id" in plan


def test_duplicated_spans_no_pairwise_join(spark):
    """Span dedup is agg + join-back on the fingerprint: the plan must
    not contain any doc-to-doc self-join (no inequality join on ids)."""
    from openeo_processes_dask_ml_spark.scale.text import duplicated_spans

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(duplicated_spans(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_coarse_assign_shuffle_excludes_vectors(spark):
    """IVF/SemDeDup list assignment (VERDICT r5 #3): the groupBy that
    picks each vector's nearest seed must shuffle only (vid, seed_id,
    sim) — never the vector column. Carrying v through that exchange
    moves n_lists copies of every embedding (10^3-10^5 at SemDeDup
    scale) through one shuffle. The vectors rejoin via an equi-join on
    vid afterwards — one narrow copy each."""
    from openeo_processes_dask_ml_spark.scale.similarity import _coarse_assign

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    _, _, assigned, _ = _coarse_assign(emb, 4, "embedding", "vec_id", False, 1.0)
    plan = _plan(assigned)
    # every HashAggregate (partial + final of the max_by) must be
    # vector-free; the array column may appear only in scans/joins
    for frag in plan.split("HashAggregate")[1:]:
        header = frag.splitlines()[0]
        assert " v#" not in header and "first(v" not in header, header
    # and the rejoin is a plain equi-join on vid
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_pq_scan_side_never_shuffles_vectors(spark):
    """PQ ANN: the ADC scan joins broadcast per-query lookup tables
    against codes computed in a projection — the only exchange is the
    final top-k window over (query_id, neighbor_id, dist); no corpus
    vector column may appear in any Exchange."""
    from openeo_processes_dask_ml_spark.scale.similarity import pq_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(pq_topk(emb, list(range(5)), k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    for frag in plan.split("Exchange")[1:]:
        header = frag.splitlines()[0]
        assert " v#" not in header, header


def test_incremental_minhash_no_corpus_broadcast_hint(spark):
    """Cross-snapshot near-dup: neither side of the band-collision join
    may carry a broadcast HINT — at crawl scale both the delta and the
    historical band table can be billions of rows; size-based planning
    decides at runtime."""
    from openeo_processes_dask_ml_spark.scale.dedup import (
        incremental_minhash_dedup,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 2 == 1)
    seen = docs.filter(F.col("doc_id") % 2 == 0)
    optimized = _optimized(incremental_minhash_dedup(new, seen))
    assert "ResolvedHint" not in optimized


def test_tfidf_sparse_path_no_vector_broadcast(spark):
    """Sparse (inverted-index) tf-idf path: the postings self-join must
    carry no broadcast hint on the doc-keyed postings (corpus-sized at
    100 TB); only the vocab/df side may be hinted."""
    from openeo_processes_dask_ml_spark.scale.text import tfidf_cosine_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # dense_vocab_max=0 forces the sparse path regardless of fixture
    sparse = tfidf_cosine_pairs(
        docs, threshold=0.9, max_df_frac=0.9, dense_vocab_max=0
    )
    optimized = _optimized(sparse)
    assert "ResolvedHint" not in optimized
    plan = _plan(sparse)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_tfidf_dense_path_engages_on_tiny_vocab(spark):
    """On a tiny capped vocabulary the adaptive plan must pivot to the
    blocked dense-matrix engine (mapInPandas), not the postings
    self-join — and both paths must agree exactly."""
    from openeo_processes_dask_ml_spark.scale.text import tfidf_cosine_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dense = tfidf_cosine_pairs(docs, threshold=0.9, max_df_frac=0.9)
    assert "mapInPandas" in _plan(dense) or "MapInPandas" in _plan(dense)
    sparse = tfidf_cosine_pairs(
        docs, threshold=0.9, max_df_frac=0.9, dense_vocab_max=0
    )
    d = {(r["id_a"], r["id_b"]): r["cosine"] for r in dense.collect()}
    s = {(r["id_a"], r["id_b"]): r["cosine"] for r in sparse.collect()}
    assert d == s and d  # bit-identical and non-degenerate


def test_bloom_probe_prunes_before_verify_join(spark):
    """The Bloom probe (Python UDF filter) must sit BELOW the exact
    verify join in the plan — the join's probe side only carries
    Bloom survivors."""
    from openeo_processes_dask_ml_spark.scale.pipeline import (
        bloom_decontaminate,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ev = docs.filter(F.col("doc_id") % 89 == 0)
    tr = docs.filter(F.col("doc_id") % 89 != 0)
    plan = _plan(bloom_decontaminate(tr, ev, n=3, m_bits=1 << 16))
    # the eval/arrow python filter appears in the plan
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan
    join_pos = plan.find("Join")
    udf_pos = max(plan.find("ArrowEvalPython"), plan.find("BatchEvalPython"))
    # plans print top-down: the probe operator must appear AFTER the
    # join node in the text (deeper in the tree = later lines)
    assert udf_pos > join_pos > -1


def test_tpch_q5_broadcasts_dimension_chain(spark):
    """Q5's nation-region chain must reach the join as a broadcast —
    the fact-side shuffle must never carry the dims."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_tpch_q5(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_tpch_q18_aggregates_before_join(spark):
    """Q18 must pre-aggregate lineitem (HAVING before the joins): the
    physical plan's first HashAggregate must consume the lineitem scan
    directly, not a join output."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_tpch_q18(spark, SF_DIR))
    # the filter on the aggregated quantity appears below the joins
    agg_pos = plan.find("HashAggregate")
    join_pos = plan.find("Join")
    assert -1 < join_pos < agg_pos  # join nodes print above the agg subtree


def test_url_dedup_prunes_scan_and_stays_codegen(spark):
    """url_dedup must read only the columns it uses (text — the widest
    column — pruned from the scan) and contain no Python evaluation:
    the whole canonicalization is built-in string/array functions."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_url_dedup(spark, SF_DIR))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema  # widest column pruned
    assert "source" in read_schema and "n_chars" in read_schema
    assert "EvalPython" not in plan  # no UDFs anywhere


def test_bpe_pair_counts_combine_map_side(spark):
    """BPE pair counting must partial-aggregate before its shuffle
    (map-side combine): at 10^8 unique words the exploded pair stream
    is the iteration's dominant flow."""
    from openeo_processes_dask_ml_spark.scale.bpe import (
        _char_symbols,
        _pair_counts,
        word_frequencies,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = word_frequencies(docs).withColumn(
        "syms", _char_symbols(F.col("word"))
    )
    plan = _plan(_pair_counts(words))
    # two HashAggregates around one Exchange = partial + final
    assert plan.count("HashAggregate") >= 2
    first_agg = plan.rfind("HashAggregate")
    exchange = plan.rfind("Exchange")
    assert first_agg > exchange  # partial agg sits below the shuffle
    assert "EvalPython" not in plan


def test_web_ingest_pipeline_has_zero_joins(spark):
    """pipeline_web_ingest must stay the carried-column shape: window
    -> projection -> min_by agg -> shard agg, NO joins (the join-back
    version re-shuffled the corpus and re-evaluated the shared URL
    subtree per stage — 23x slower at 50x, SCALE_NOTES r6)."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_pipeline_web_ingest(spark, SF_DIR))
    assert "Join" not in plan
    assert "EvalPython" not in plan
    # exactly one parquet scan: the corpus is read once
    assert plan.count("Scan parquet") == 1


def test_shard_read_back_prunes_partitions(spark, tmp_path):
    """The sharded training layout must actually prune on read: a
    filter on the shard column appears as a PartitionFilter on the
    scan (directory pruning — non-matching shards are never opened),
    not a post-scan Filter."""
    from openeo_processes_dask_ml_spark.scale.pipeline import (
        write_training_shards,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, n_shards=4)
    back = spark.read.parquet(path).filter(F.col("shard") == 2)
    plan = _plan(back)
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "shard" in pf
    assert back.select("doc_id").count() > 0


def test_ivf_index_query_prunes_probed_lists(spark, tmp_path):
    """The persisted IVF index must serve a query by opening ONLY the
    probed inverted lists: the list_id filter is applied driver-side
    from the collected seed table, so it lands as a static
    PartitionFilter on the parquet scan (directory pruning of the
    partitionBy("list_id") layout) — not dynamic pruning that may or
    may not engage, and not a post-scan Filter."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        build_ivf_index,
        ivf_topk_from_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    seeds_df, lists_df = build_ivf_index(emb, n_lists=4)
    root = str(tmp_path / "ivf")
    seeds_df.write.parquet(f"{root}/seeds")
    lists_df.write.partitionBy("list_id").parquet(f"{root}/lists")

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = ivf_topk_from_index(
        spark.read.parquet(f"{root}/seeds"),
        spark.read.parquet(f"{root}/lists"),
        queries,
        k=3,
        n_probe=2,
    )
    plan = _plan(out)
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "list_id" in pf  # static IN-filter prunes unprobed lists
    assert out.count() > 0


def test_pq_index_query_reads_codes_not_vectors(spark, tmp_path):
    """ADC serving from the persisted PQ index must never read the raw
    embedding vectors: the scan's ReadSchema holds only the 8-int code
    column (+id), and the codebooks enter the plan as literals in one
    projection, not as a joined table."""
    from openeo_processes_dask_ml_spark.scale.similarity import (
        build_pq_index,
        pq_topk_from_index,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cb_df, codes_df = build_pq_index(emb, m=4, ks=8)
    root = str(tmp_path / "pq")
    cb_df.write.parquet(f"{root}/codebooks")
    codes_df.write.parquet(f"{root}/codes")

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = pq_topk_from_index(
        spark.read.parquet(f"{root}/codebooks"),
        spark.read.parquet(f"{root}/codes"),
        queries,
        k=3,
    )
    plan = _plan(out)
    # exactly one parquet scan (the codes table); its schema must not
    # contain an embedding/vector column
    scans = [
        ln for ln in plan.splitlines() if "ReadSchema:" in ln
    ]
    assert len(scans) == 1, f"expected only the codes scan, got: {scans}"
    assert "embedding" not in scans[0]
    assert "code" in scans[0]
    assert out.count() > 0


def test_raster_decode_spreads_then_maps(spark):
    """The decode fan-out: driver-created asset frames must pass an
    Exchange (hash spread) BEFORE the MapInPandas decode, so a
    thousand-asset catalog doesn't decode in one task; pixels are born
    distributed and never pass through the driver."""
    from openeo_processes_dask_ml_spark.io.raster import (
        decode_assets_to_cube,
    )
    from openeo_processes_dask_ml_spark.io.stac_client import ASSET_SCHEMA

    assets = spark.createDataFrame(
        [
            (
                "i0",
                "c",
                "2024-01-01T00:00:00Z",
                "red",
                "mem://i0/red",
                "image/x-portable-graymap",
                [0.0, 0.0, 2.0, 2.0],
            )
        ],
        ASSET_SCHEMA,
    )
    cube = decode_assets_to_cube(assets, lambda h: b"P5\n2 2\n255\n\x01\x02\x03\x04")
    plan = _plan(cube.df)
    assert "MapInPandas" in plan
    exchange_pos = plan.find("Exchange hashpartitioning")
    map_pos = plan.find("MapInPandas")
    assert exchange_pos != -1
    # executedPlan prints top-down: the map consumes the exchange below it
    assert map_pos < exchange_pos
    rows = cube.df.collect()
    assert len(rows) == 4


def test_zarr_sink_ordinal_joins_broadcast(spark, tmp_path):
    """The zarr sink's coordinate-to-ordinal resolution must stay
    BROADCAST joins (axis tables are tiny); a SortMergeJoin here would
    shuffle the full cube once per dimension at 100 TB. The one
    allowed exchange is the groupBy(chunk id) — the output layout."""
    import datetime as dt

    from openeo_processes_dask_ml_spark.io.zarr import write_zarr_cube

    rows = [
        (dt.datetime(2024, 1, 1 + t), float(y), float(x), float(t + y + x))
        for t in range(2)
        for y in range(4)
        for x in range(4)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, y double, x double, value double"
    )
    manifest = write_zarr_cube(df, str(tmp_path / "p.zarr"), chunks=[1, 4, 4])
    # AQE appends an "== Initial Plan ==" copy — count the final plan only
    plan = _plan(manifest._zarr_plan).split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # exactly one real exchange: the chunk grouping (broadcast
    # exchanges don't count — they move only the axis tables)
    shuffles = [
        ln
        for ln in plan.splitlines()
        if "Exchange" in ln and "Broadcast" not in ln and "Reused" not in ln
    ]
    assert len(shuffles) == 1, shuffles


def test_tpch_q7_filters_nations_before_facts(spark):
    """Q7 must prune supplier/customer to the two target nations via
    broadcast BEFORE the fact joins: every nation join is a
    BroadcastHashJoin and the pair disjunction never forces a
    cartesian."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_tpch_q7(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # shipdate band pushed into the lineitem scan
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters"
    )[1].splitlines()[0]


def test_tpch_q8_broadcasts_part_filter(spark):
    """Q8's PROMO part filter (the most selective reduction) must
    reach lineitem as a broadcast join, not a shuffle."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_tpch_q8(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_tpch_q10_aggregates_before_customer_join(spark):
    """Q10 must pre-aggregate revenue per customer BEFORE attaching
    customer attributes: the per-custkey HashAggregate sits below the
    customer join."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_tpch_q10(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan  # top-20 without global sort


def test_tpch_q22_anti_join_and_one_row_broadcast(spark):
    """Q22's no-recent-orders predicate must be a LeftAnti hash join
    and the threshold a broadcast (1-row) nested loop, never a
    shuffled cartesian."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_tpch_q22(spark, SF_DIR))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q21_single_window_pass(spark):
    """Q21's blame computation is ONE window pass over the per-(order,
    supplier) pre-aggregation — the three window columns share a
    partitioning, so exactly one Window node (no re-shuffle per
    column)."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_tpch_q21(spark, SF_DIR))
    assert plan.count("Window") == 1
    assert "TakeOrderedAndProject" in plan


def test_global_sort_index_never_single_partition(spark):
    """The global ordinal must come from a pid-partitioned window over
    the CHECKPOINTED range layout — NEVER the naive single-partition
    window (Exchange SinglePartition feeding a Window would funnel
    100 TB through one task). The range shuffle itself sits behind the
    localCheckpoint that pins the partitioning (the r13 review fix:
    un-pinned boundaries re-sample per job and mis-rank at scale), so
    the visible plan starts at the checkpoint scan."""
    import __spark_entry__ as entry

    plan = _plan(entry.q_global_sort_index(spark, SF_DIR))
    # pure-function partitioning (r13 final): the bucket id is a
    # codegen expression, so the fact side is a live parquet scan
    # (NOT a checkpointed RDD materialization) shuffled by hash on
    # the bucket — rangepartitioning (whose boundaries re-sample per
    # job and mis-rank, the original review bug) must never appear
    assert "Scan parquet" in plan  # no full-data materialization
    assert "rangepartitioning" not in plan
    assert "hashpartitioning" in plan
    assert plan.find("Window") > -1
    # no single-partition funnel ANYWHERE (plans print children after
    # parents, so a prefix scan would miss the Window's child Exchange)
    assert "SinglePartition" not in plan
    assert plan.count("Window") == 1
