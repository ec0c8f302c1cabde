"""Generate PLANS.md: the formatted physical plans of representative
queries, annotated with the scale property each one demonstrates.

Usage: python tools/plan_audit.py  (writes PLANS.md at the repo root)
"""

import os
import sys

sys.path.insert(0, "/root/repo")

AUDIT = [
    (
        "tpch_q5",
        "6-table join: region->nation dim chain arrives as "
        "BroadcastHashJoin; date filter pushed to the orders scan "
        "(PushedFilters); lineitem fact join stays shuffled on the key.",
    ),
    (
        "tpch_q18",
        "Aggregate-before-join: lineitem HashAggregate + HAVING filter "
        "sit below every join, so only qualifying orderkeys probe.",
    ),
    (
        "property_filter",
        "load_collection property predicates reach the parquet scan as "
        "PushedFilters.",
    ),
    (
        "dedup_minhash_lsh",
        "Band-bucket equi-join candidate generation — no cross join "
        "anywhere in the plan; exact verification joins candidates only.",
    ),
    (
        "tfidf_cosine",
        "Adaptive dense path on the tiny-vocab fixture: the plan ends in "
        "MapInPandas (blocked BLAS pairs) instead of a postings "
        "self-join.",
    ),
    (
        "bloom_decontaminate",
        "ArrowEvalPython (the Bloom bit probe) sits BELOW the verify "
        "join: only Bloom survivors are shuffled.",
    ),
    (
        "bin_pack",
        "FlatMapGroupsInPandas keyed on the md5 stream — the one shuffle; "
        "prefix-dependent placement runs inside the group.",
    ),
    (
        "window_running_sum",
        "Single Window over a shuffled-by-key exchange; everything else "
        "whole-stage codegen.",
    ),
    (
        "profile_table",
        "CAUTIONARY shape, kept visible on purpose: k exact "
        "count(DISTINCT)s in one agg compile to Expand — every row "
        "replicated k times into the shuffle (measured 13.5x slower "
        "than the HLL++ default at 30M rows; see SCALE_NOTES). The "
        "gate needs exact NDV; production uses exact_ndv=False, whose "
        "plan has no Expand.",
    ),
    (
        "weighted_sample",
        "Per-group window over (group, priority) pairs only — the text "
        "never enters the shuffle.",
    ),
    (
        "url_dedup",
        "Whole canonicalization is codegen string/array functions (no "
        "EvalPython), the text column is pruned from the scan, and the "
        "keeper selection is one window on the canonical-URL hash "
        "partition.",
    ),
    (
        "skew_salted_agg",
        "Two-phase salted aggregation over a replicated broadcast join: "
        "the first HashAggregate keys on (event_type, salt) so no task "
        "owns a whole hot key; the merge agg is 5 x 16 rows. The dim "
        "arrives as BroadcastExchange (x 8 salt copies).",
    ),
    (
        "corpus_diff",
        "One full-outer SortMergeJoin on the id over (id, md5) narrow "
        "rows — text bytes never shuffle; status is a codegen CASE.",
    ),
    (
        "pipeline_web_ingest",
        "Zero joins end-to-end: URL window -> quality projection -> "
        "min_by dedup HashAggregate -> shard HashAggregate, one parquet "
        "scan total (plan-guarded; the join-back version was 23x slower "
        "at 50x — SCALE_NOTES).",
    ),
    (
        "dup_clusters",
        "Shown: the small-graph FAST PATH (r7) — at gate SF the "
        "candidate-verified pair graph is a few hundred edges, so "
        "limit(threshold+1).collect() (one evaluation of the pairs "
        "pipeline) feeds a driver union-find and the plan is a "
        "parallelized local scan of the labeled rows. Above 100k edges "
        "the operator switches to the distributed pointer-doubling "
        "loop (probed to 500k edges / diameter 1022, SCALE_NOTES); "
        "both paths emit identical min-label clusters "
        "(equivalence + randomized tests).",
    ),
    (
        "ann_ivf_from_index",
        "Index SERVING plan (build/write happen before this plan): the "
        "lists scan carries a static PartitionFilter on list_id — only "
        "the probed inverted lists' directories are opened (probe "
        "assignment is DISTRIBUTED: queries join the broadcast "
        "n_lists-row seed table and a per-query top-n_probe window "
        "picks the lists; only the probed list-id SET — bounded by "
        "n_lists — is collected to build the static partition "
        "filter), the probes arrive as BroadcastExchange, and the "
        "corpus vectors never shuffle (the only Exchange below the "
        "top-k window moves (query_id, neighbor_id, cosine) rows).",
    ),
    (
        "ann_pq_from_index",
        "ADC serving from persisted codes: ONE parquet scan total, its "
        "ReadSchema holding only (vid, code) — raw vectors are never "
        "read at query time; the per-query distance tables are "
        "codebook literals folded into a single codegen projection.",
    ),
    (
        "bpe_merges",
        "Shown: the FINAL merge table build (driver-side createDataFrame "
        "of 20 learned rows). The per-iteration work — pair-count "
        "HashAggregate pairs (partial below the Exchange, map-side "
        "combined) + fold rewrite — is asserted in "
        "tests/test_plan_shapes.py::test_bpe_pair_counts_combine_map_side; "
        "iteration cost measured FLAT under 50x corpus growth "
        "(SCALE_NOTES).",
    ),
    (
        "ann_ivfpq_from_index",
        "IVF-PQ serving from persisted artifacts (build/write precede "
        "this plan): the codes scan carries the static list_id "
        "PartitionFilter (only probed lists' directories open) AND a "
        "ReadSchema of (vid, codes) — raw vectors exist in no artifact; "
        "per-query ADC tables arrive as one BroadcastExchange and fold "
        "into a single codegen projection; top-k via the per-query "
        "window.",
    ),
    (
        "quarantine_ingest",
        "Corrupt-line ingest: ONE text scan split by the from_json "
        "expression into clean + quarantine branches (no second read "
        "of the drop), quality features in a single narrow projection, "
        "union of the two audit sides. The only exchange is the tiny "
        "feature-row spread.",
    ),
    (
        "raster_decode_cube",
        "Distributed raster materialization: asset rows hash-spread by "
        "(item_id, band), then MapInPandas decode — pixels are BORN "
        "distributed (one partition's pixels never visit the driver or "
        "another executor). Downstream cube ops see an ordinary "
        "long-form frame.",
    ),
    (
        "decontaminate_semantic",
        "Embedding decontamination: the eval suite arrives as ONE "
        "BroadcastExchange into a nested-loop score join fused with "
        "the threshold filter — the training corpus is scored "
        "map-side and never shuffles; the only exchange below the "
        "top-1 window moves (train_id, eval_id, cosine) survivor "
        "rows.",
    ),
    (
        "raster_roundtrip_gtiff",
        "Distributed GeoTIFF sink + reload: tiles encode and write on "
        "the EXECUTORS inside FlatMapGroupsInPandas (driver sees only "
        "the group-count-sized manifest), reload is the standard "
        "decode fan-out. Shown: the reload plan — the write side's "
        "only exchange is the (item, band) grouping.",
    ),
    (
        "tpch_q7",
        "Selective-dim-first: supplier AND customer prune to the two "
        "target nations via broadcast BEFORE any fact join; no "
        "cartesian from the pair disjunction; shipdate band pushed.",
    ),
    (
        "tpch_q21",
        "Blame pass as ONE Window node over one shuffle (row_number + "
        "lead + framed count share a (partition, order) spec); "
        "TakeOrderedAndProject top-20.",
    ),
    (
        "tpch_q22",
        "Integer-cents threshold as a 1-row BroadcastNestedLoopJoin; "
        "no-recent-orders as LeftAnti hash join; no cartesian.",
    ),
    (
        "global_sort_index",
        "Distributed row_number() OVER (ORDER BY): the bucket id is "
        "a PURE codegen expression over md5-sampled boundaries (live "
        "parquet scan, no checkpoint materialization), one hash "
        "shuffle on the bucket feeding the window + broadcast "
        "offsets join — no Exchange SinglePartition anywhere.",
    ),
    (
        "zorder_layout",
        "Morton key = one unrolled shift/mask/or codegen projection "
        "(zero Python); bucket envelopes aggregate map-side.",
    ),
    (
        "bm25_from_index",
        "Persisted-postings serve path (r14): the literal query-term "
        "IN filter reaches the postings parquet scan (PushedFilters: "
        "In(term, ...)) BEFORE the broadcast semi-join prune, so a "
        "term-sorted postings layout skips non-matching row groups at "
        "the scan; scoring core shared with the direct bm25_topk.",
    ),
    (
        "raster_ndvi_pipeline",
        "The full reference chain as ONE plan: decode fan-out -> ndvi "
        "conditional aggregation -> monthly mean, with exactly two "
        "exchanges after the decode (pixel groupBy for ndvi, period "
        "groupBy for the monthly mean), both map-side partial. Band "
        "resolution reads the catalog-derived band_labels hint — the "
        "pixel frame is NOT evaluated to list bands (without the hint "
        "a distinct() would re-run the whole decode fan-out).",
    ),
]


def main() -> None:
    from openeo_processes_dask_ml_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark()
    qs = entry.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out = [
        "# Physical plan audit",
        "",
        "Auto-generated by `tools/plan_audit.py` (sf0.001 stats; the "
        "plan SHAPES — pushdown, broadcast, join strategy, Python "
        "placement — are what the annotations assert; AQE may re-plan "
        "sizes at runtime).",
        "",
    ]
    import contextlib
    import io

    for name, note in AUDIT:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        out.append(f"## {name}")
        out.append("")
        out.append(note)
        out.append("")
        out.append("```")
        # keep the operator tree; drop the verbose per-node detail dump
        tree = plan.split("\n\n")[0]
        out.append(tree)
        out.append("```")
        out.append("")
    # preserve the hand-written narrative tail across regenerations
    marker = (
        "<!-- MANUAL SECTIONS \u2014 plan_audit.py preserves everything "
        "below this line -->"
    )
    tail = ""
    try:
        prev = open("/root/repo/PLANS.md").read()
        if marker in prev:
            tail = prev[prev.index(marker):]
    except FileNotFoundError:
        pass
    body = "\n".join(out)
    if tail:
        body = body + "\n" + tail
    else:
        body = body + "\n" + marker + "\n"
    with open("/root/repo/PLANS.md", "w") as f:
        f.write(body)
    print(f"PLANS.md written ({len(AUDIT)} plans, manual tail {'kept' if tail else 'initialized'})")


if __name__ == "__main__":
    main()
