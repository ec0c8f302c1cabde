"""Benchmark harness: runs the headline queries at SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through full materialization with the noop sink
(df.write.format("noop")) — no driver-side collect skewing the numbers.
One warm-up query runs first so JVM/codegen startup isn't billed to the
first headline entry.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

HEADLINE = [
    "tpch_q1",
    "aggregate_spatial",
    "rollup_revenue",
    "reduce_dimension",
    "aggregate_temporal_period",
    "ndvi_bandmath",
    "array_interpolate_linear",
    "window_running_sum",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "dedup_embedding_exact",
    "ann_topk",
    "ann_ivf",
    "ann_ivf_trained",
    "ann_pq",
    "ann_ivfpq",
    "text_quality",
    "token_count",
    "quality_filter",
    "embedding_quantize",
    "text_chunks",
    "dedup_fuzzy",
    "decontaminate",
    "pack_sequences",
    "training_shards",
    "ml_predict_linear",
    "ml_predict_tiled",
    "process_graph",
    "apply_kernel",
    "fit_curve",
    "streaming_sessionize",
    # round 5 additions
    "semantic_dedup",
    "duplicated_spans",
    "graph_fit_curve",
    "graph_zonal",
    "pipeline_end_to_end",
    "leakage_safe_split",
    "dup_clusters",
    "streaming_enrich",
    "unigram_logprob",
    "ccnet_buckets",
    "mixture_sample",
    "incremental_dedup",
    # round 6 additions
    "incremental_minhash",
    "span_removal",
    "streaming_incremental_dedup",
    "decontaminate_fuzzy",
    "tfidf_cosine",
    "containment",
    "bigram_logprob",
    "bloom_decontaminate",
    "random_projection",
    "bin_pack",
    "tpch_q5",
    "tpch_q18",
    "streaming_topk",
    "weighted_sample",
    "profile_table",
    "url_dedup",
    "bpe_merges",
    "cluster_balanced_sample",
    "pipeline_web_ingest",
    "skew_salted_agg",
    "corpus_diff",
    # round 7 additions (index lifecycle, VERDICT r6 #6)
    "ann_ivf_from_index",
    "ann_pq_from_index",
    # round 8 additions (VERDICT r7 #5-7 + raster decode)
    "ann_ivfpq_from_index",
    "quarantine_ingest",
    "duplicated_spans_combine",
    "raster_decode_cube",
    "raster_ndvi_pipeline",
    "raster_roundtrip_gtiff",
    "decontaminate_semantic",
    # round 9 additions (VERDICT r8 #1 bisect twin)
    "profile_table_cols",
    # round 10 additions (VERDICT r9 #4 overview read, JPEG-decoder
    # value gate, DSIR data selection; the r10 wide-shape probe was
    # retired in r11 after proving the wide layout driver-unhashable)
    "raster_decode_overview",
    "raster_decode_jpeg",
    "raster_decode_png",
    "dsir_select",
    # round 11 additions (VERDICT r10 #1 selection-only bisect twin,
    # #6 pure-numpy lossless-WebP decoder value gate, #7 distributed
    # zarr sink/source round-trip, MJPEG-AVI frame-sampled decode)
    "dsir_select_picks",
    "raster_decode_webp",
    "zarr_roundtrip",
    "video_decode_mjpeg",
    "streaming_zarr_ingest",
    "tpch_q4",
    "tpch_q6",
    "tpch_q14",
    "tpch_q19",
    # round 12 additions (VERDICT r11 #1 all-integer dsir bisect gates,
    # #6 §2.4 preprocessing-expression value gate)
    "dsir_bucket_hist",
    "dsir_doc_grams",
    "ml_predict_preproc",
    "domain_pagerank",
    "cdc_chunk_dedup",
    # round 13 additions (VERDICT r12 #4 netCDF3-classic sink/source,
    # #7 hashed-feature quality classifier, BM25 retrieval)
    "netcdf_roundtrip",
    "quality_classifier",
    "bm25_topk",
    # round 13 second batch: the nine remaining TPC-H(-shape) queries
    # expressible on the slim schema (q2/q9/q11/q16/q20 need partsupp,
    # which the testdata doesn't carry)
    "tpch_q7",
    "tpch_q8",
    "tpch_q10",
    "tpch_q12",
    "tpch_q13",
    "tpch_q15",
    "tpch_q17",
    "tpch_q21",
    "tpch_q22",
    # round 13 second batch: distributed WARC (Common Crawl layout)
    # sink + source roundtrip, and the end-to-end crawl HTML pipeline
    "warc_ingest",
    "warc_html_pipeline",
    # round 13 second batch: scale-safe global ordinal + streaming
    # WARC twin
    "global_sort_index",
    "streaming_warc_ingest",
    # round 13 second batch: CCNet stage-1 corpus line dedup +
    # robots.txt politeness filter
    "line_dedup",
    "robots_filter",
    # round 13 second batch: Z-order clustering layout + WET/WAT export
    "zorder_layout",
    "wet_export",
    "wat_export",
    # round 14 additions (VERDICT r13 #4 CDX product, #6 BM25 index
    # lifecycle, cross-crawl revisit resolution)
    "bm25_from_index",
    "cdx_export",
    "cdx_revisit",
    "robots_directives",
    "sitemap_urls",
    "streaming_warc_sink",
    "boilerplate_removal",
    "pipeline_crawl_frontier",
    # round 16 addition: the datetime-resizing tiled-inference gate.
    # dedup_ngram_prefix stays a CORRECTNESS gate only: the sf fixture
    # is the overlap-heavy regime where prefix filtering deliberately
    # loses to counting (5.6 vs 3.1 s — that trade is the point of
    # _pairgen_probe), so benching it would time a plan the auto mode
    # would never pick here.
    "ml_predict_time_resize",
]


# Queries whose timings live ONLY in BENCH_SELF.json: the printed
# record cannot hold all 125 names (the names alone are 1807 B against
# the driver's ~2 kB tail capture), and the r16 policy of dropping the
# SMALLEST-time entries made the printed set vary with timings — PERF
# r16 misread one newly-fast query as dropped_from_bench (VERDICT r16
# #3). The omission set is now FIXED BY NAME (exactly the 50 queries
# the r16 record omitted, so every query printed in r16 stays printed),
# making every query's presence deterministic round-over-round. Full
# timings for these 50 still land in BENCH_SELF.json every run.
PRINT_OMIT = frozenset([
    "tpch_q1", "reduce_dimension", "aggregate_temporal_period",
    "ndvi_bandmath", "array_interpolate_linear", "window_running_sum",
    "dedup_exact", "dedup_embedding_exact", "ann_topk", "text_quality",
    "token_count", "quality_filter", "embedding_quantize", "text_chunks",
    "decontaminate", "pack_sequences", "training_shards",
    "ml_predict_linear", "process_graph", "fit_curve", "graph_fit_curve",
    "unigram_logprob", "mixture_sample", "incremental_dedup",
    "streaming_incremental_dedup", "random_projection", "bin_pack",
    "tpch_q18", "weighted_sample", "url_dedup", "cluster_balanced_sample",
    "skew_salted_agg", "corpus_diff", "video_decode_mjpeg", "tpch_q4",
    "tpch_q6", "tpch_q14", "tpch_q19", "dsir_doc_grams",
    "domain_pagerank", "tpch_q10", "tpch_q12", "tpch_q13", "tpch_q15",
    "tpch_q17", "tpch_q22", "warc_ingest", "line_dedup", "zorder_layout",
    "sitemap_urls",
])


def compact_record(
    timings: dict[str, float], total: float, sf_val, reps: int
) -> str:
    """The PRINTED record, sized for the driver's bounded (~2 kB) tail
    capture — r5 and r6 both shipped unparseable records because the
    full form outgrew it (VERDICT r6 item 1). The printed query set is
    the FIXED name set HEADLINE - PRINT_OMIT (deterministic presence,
    VERDICT r16 #3); precision degrades 2 dp -> 1 dp before the legacy
    smallest-first dropping, which remains only as a safety valve (the
    fixed 75-name set renders ~1784 B at 1 dp, inside the cap)."""

    def render(q: dict[str, float], digits: int, omitted: int) -> str:
        doc = {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "sf": sf_val,
            "reps": reps,
            "queries": {k: round(v, digits) for k, v in q.items()},
        }
        if omitted:
            doc["omitted"] = omitted
        return json.dumps(doc, separators=(",", ":"))

    printed = {k: v for k, v in timings.items() if k not in PRINT_OMIT}
    n_omit = len(timings) - len(printed)
    for digits in (2, 1):
        record = render(printed, digits, n_omit)
        if len(record) < 1800:
            return record
    by_size = sorted(printed, key=lambda k: (printed[k], k))
    kept = dict(printed)
    for name in by_size:
        del kept[name]
        record = render(kept, 1, len(timings) - len(kept))
        if len(record) < 1800:
            return record
    return record


def make_session(cpus: str) -> SparkSession:
    """The bench session config — shared with tools/oracle_bench.py so
    paired Spark-vs-DuckDB timing runs the identical engine setup."""
    spark = (
        SparkSession.builder.appName("bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # UTC so LTZ rendering/parsing matches DuckDB's naive
        # timestamps regardless of the machine's timezone (ADVICE r4)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        # console-progress [Stage N:...] spam filled the driver's bounded
        # tail capture in r5 and truncated the JSON record (VERDICT r5 #1)
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = make_session(cpus)
    qs = entry.queries()

    # warm-up: JVM + codegen + parquet footer reads
    qs["tpch_q1"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # 3 reps: sf0.1 run-to-run noise (r2 saw 1.5-7 s swings on simhash)
    # makes 2-rep minima unreliable for regression detection
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # reps are interleaved ROUND-ROBIN across queries (VERDICT r13 #7):
    # a co-tenant CPU burst lasting a couple of minutes now lands on
    # ONE rep of many queries instead of all reps of the few queries
    # that happened to be running, so the per-query min — still the
    # reported stat — survives the burst for every query that got at
    # least one quiet rep. Back-to-back reps gave bursts a ~3x larger
    # blast radius per query (the r13 record spent five same-code runs
    # spanning 130-169 s adjudicating exactly that noise).
    times: dict[str, list] = {name: [] for name in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name].append(time.time() - t0)
            # drop localCheckpoint blocks the finished query leaked —
            # ContextCleaner reclaims them only on Python GC, and ~100
            # queries x 3 reps of accumulation pressures storage memory
            for rdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                rdd.unpersist(False)
    timings = {n: round(min(ts), 3) for n, ts in times.items()}
    # spread = max - min across reps: when it rivals the min, the
    # number is noise, not signal — judges should read min AND this
    spreads = {n: round(max(ts) - min(ts), 3) for n, ts in times.items()}

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # FULL record (incl. the per-query spread noise gauge) lives in
    # BENCH_SELF.json; the PRINTED line is a compact subset sized for
    # the driver's bounded (~2 kB) tail capture — r5 and r6 both
    # shipped unparseable records because the full form outgrew it
    # (VERDICT r6 item 1).
    full = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "spread": {k: round(v, 1) for k, v in spreads.items()},
            "reps": reps,
            "sf": sf_val,
        },
        separators=(",", ":"),
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_SELF.json"), "w") as f:
        f.write(full + "\n")
    record = compact_record(timings, total, sf_val, reps)
    # hard guard: the whole point of the compact form is fitting the
    # capture — fail loudly here rather than ship another null parse
    assert len(record) < 1800, (
        f"bench record {len(record)} B outgrew the driver's tail capture; "
        "trim the printed form (full record stays in BENCH_SELF.json)"
    )
    spark.stop()  # stop BEFORE printing so no JVM shutdown chatter follows
    sys.stdout.flush()
    print(record)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
