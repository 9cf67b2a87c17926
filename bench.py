"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a full-result count (no collect of wide payloads;
the work measured is the distributed plan, not driver materialization).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Headline set: one per operator family — scan, projection, broadcast join,
# anti-join, semi-join, 6-table star join, top-k, shuffle agg, grouping
# sets, set ops, windows (latest-per-key, running frame), streaming-shaped
# agg, archive pack/unpack, dedup (exact + MinHash-LSH), embedding
# similarity (exact + ANN), text analysis.
HEADLINE = [
    "s01_prefix_scan",
    "p01_enum_normalization",
    "j01_left_lookup_join",
    "j04_anti_join_reconciliation",
    "a01_sha256",
    "a07_pricing_summary",
    "a08_revenue_filter",
    "a09_top_customers",
    "a10_nation_region_rollup",
    "a12_order_priority_count",
    "a13_local_supplier_volume",
    "a14_shipping_priority",
    "o01_set_operations",
    "w02_latest_per_key",
    "w04_running_total",
    "w05_top_orders_per_customer",
    "t01_tumbling_window",
    "t08_sessionization",
    "t09_retry_state_recovery",
    "t10_exactly_once_guard",
    "l01_v1_legacy_adapter",
    "o02_asof_join",
    "o03_range_count_join",
    "d01_exact_dedup_stats",
    "d03_minhash_lsh",
    "d06_incremental_dedup",
    "d07_exact_dedup_survivors",
    "e05_embedding_near_dup_lsh",
    "e02_cosine_topk",
    "e03_ann_lsh_topk",
    "e07_ann_ivf",
    "e08_ann_ivf_exact",
    "e09_ann_srp_exact",
    "m02_archive_roundtrip",
    "m04_pack_prefix_substitution",
    "m05_frame_sample_plan",
    "x01_text_stats",
    "x03_bpe_token_count",
    "x12_quality_filter",
    "x13_pii_redaction",
    "x14_line_dedup",
    "x15_bpe_pair_counts",
    "x16_sequence_packing",
    "x17_unigram_lm_score",
    "m06_audio_window_plan",
    "e10_cluster_balanced_sample",
    "a19_retention_cohorts",
    "o04_event_funnel",
    "d08_duplicate_weights",
    "x18_bigram_lm_score",
    "x19_zipf_histogram",
    "m07_image_tile_plan",
    "a20_brand_supplier_counts",
    "a21_large_volume_customers",
    "a22_idle_high_balance",
    "o05_interval_overlap_join",
    "a23_spend_percentiles",
    "m08_modality_interleave",
    "e11_mmr_rerank",
    "d09_containment_pairs",
    "o06_resample_gapfill",
    "t11_attribution_join",
    "x20_normalize_text",
    "w07_ewma",
    "o07_time_weighted_avg",
    "j05_salted_revenue_join",
    "o08_scd2_intervals",
    "a24_cube_summary",
    "w08_range_frame_window",
    "f03_json_props",
    "o09_week_over_week",
    "s20_zorder_index",
    "a25_hll_distinct",
    # round 6
    "b01_batch_validation",
    "b02_batch_dri_metadata",
    "m09_image_decode_features",
    "m10_audio_decode_features",
    "m11_video_decode_features",
    "x21_bpe_train",
    "x22_token_budget_sample",
    "x23_epoch_order",
    "e05b_embedding_lsh_pruned",
    # round 7
    "m12_png_decode_features",
    "m13_docx_parse",
    "d10_substring_dedup",
    "e13_semantic_dedup",
    "x24_contrastive_score",
    # round 8
    "m14_jpeg_decode_features",
    "d11_incremental_substring_dedup",
    "x25_data_selection",
    "x26_perplexity_buckets",
    "x27_line_repetition",
    "e14_incremental_semantic_dedup",
    # round 9
    "m15_pdf_parse",
    "m16_warc_extract",
    "m17_gif_decode_features",
    "m18_g711_decode_features",
    "x28_ngram_repetition",
    "x29_crawl_pipeline",
    "f04_url_canonicalize",
    "x30_split_assign",
    "s21_robots_filter",
    "x31_corpus_report",
    "m19_tiff_decode_features",
    "x32_shard_plan",
    "m20_zip_extract",
    "s22_crawl_frontier",
    # round 10
    "x33_ngram_dup_union",
    "s24_crawl_stream_intake",
    "s23_fetch_schedule",
    "x34_fix_mojibake",
    "s25_sitemap_discovery",
    "g01_pagerank",
    "g02_hits",
    "f05_html_links",
    "m21_webp_decode_features",
    # round 11
    "s26_crawl_schedule_stream",
    "g03_personalized_pagerank",
    "g04_weighted_pagerank",
    "s27_crawl_link_graph",
    "m22_zstd_roundtrip",
    "m23_multicodec_roundtrip",
    "m24_warc_zst_extract",
    "m25_wet_pipeline",
    "m26_wat_pipeline",
    "g05_bfs_depths",
    "a26_small_quantity_revenue",
    "a27_waiting_suppliers",
    "a28_above_brand_average",
    "x35_c4_filters",
    "m27_flac_decode_features",
    "x36_bm25_scores",
    "s28_warc_cdx_index",
    # round 12
    "s29_crawl_priority_stream",
    "m28_wet_zst_pipeline",
    "a29_min_cost_supplier",
    "a30_important_suppliers",
    "a31_top_supplier",
    "a32_disjunctive_revenue",
    "a33_dominant_suppliers",
    "f06_surt_keys",
    "x37_boilerplate_removal",
    "e15_int8_quantize",
    "s30_redirect_chains",
    "a34_promo_revenue_share",
    "a35_returned_item_report",
    # round 13
    "m29_warc_revisit_resolution",
    "a36_hll_exact_twin",
    "e16_pq_exact",
    "x39_charset_decode",
    "x40_page_directives",
    "x41_mixture_epochs",
    # round 14
    "s31_recrawl_queue",
]


# The exact set BENCH_r03 timed — frozen so `r3_subtotal` compares
# like-for-like across rounds even as HEADLINE grows.
R3_HEADLINE = [
    "s01_prefix_scan", "p01_enum_normalization", "j01_left_lookup_join",
    "j04_anti_join_reconciliation", "a01_sha256", "a07_pricing_summary",
    "a08_revenue_filter", "a09_top_customers", "a10_nation_region_rollup",
    "a12_order_priority_count", "a13_local_supplier_volume",
    "a14_shipping_priority", "o01_set_operations", "w02_latest_per_key",
    "w04_running_total", "t01_tumbling_window", "t08_sessionization",
    "o02_asof_join", "d01_exact_dedup_stats", "d03_minhash_lsh",
    "d06_incremental_dedup", "e05_embedding_near_dup_lsh", "e02_cosine_topk",
    "e03_ann_lsh_topk", "e07_ann_ivf", "m02_archive_roundtrip",
    "x01_text_stats", "x03_bpe_token_count", "x12_quality_filter",
    "x14_line_dedup",
]


def output_lines(out: dict) -> list[str]:
    """The bench emit contract, factored out so tests can pin it. Three
    JSON lines in strictly increasing importance: (1) the full object,
    (2) the per-query timings map (detail — a tail capture may chop it
    harmlessly), (3) a <=300-byte scalars-ONLY summary LAST, so any tail
    capture of >=300 chars ends with one small complete JSON line that
    carries headline_total. r5-r7 all lost the headline to the driver's
    ~2000-char tail capture; this ordering is the fix."""
    final = {
        "metric": "headline_total",
        "value": out["headline_total"],
        "unit": "sec",
        "sf": out["headline_sf"],
        "r3_subtotal": out["r3_subtotal"],
        "stream_harness": out.get("stream_harness", 0),
        "n_queries": len(out["queries"]),
        "n_smoke": len(out.get("smoke", {})),
        "n_errors": len(out.get("errors", {})),
    }
    last = json.dumps(final)
    assert len(last) <= 300, f"final bench line must stay tiny: {len(last)}"
    return [
        json.dumps(out),
        json.dumps({"metric": "per_query_sec", "queries": out["queries"]}),
        last,
    ]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("spark-graft-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # r14-opt (guide §1/§5, driver overhead): the web UI's event-bus
        # listeners add ~0.1 s to EVERY job on this host (measured:
        # range(1).count 0.20 s → 0.10 s) — headless batch sessions
        # don't serve a UI, and statusTracker/AQE are unaffected. Not a
        # local[32]-only tune: the same listener cost rides every job
        # at any scale.
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # Untimed warmup at the smallest SF: JIT-compiles the codegen paths and
    # spins up the Python/Arrow workers once, so the timed region measures
    # the engine on the target data, not JVM cold-start. Standard benchmark
    # hygiene — the warmup never touches the measured sf_dir's plans' data
    # scale, and every timed query still plans + scans + executes fully.
    # `--cold` (or SPARK_GRAFT_COLD=1) skips it, so these numbers can be
    # validated against a cold-plan-per-query measurement methodology.
    cold = "--cold" in sys.argv or os.environ.get("SPARK_GRAFT_COLD") == "1"
    warm_dir = "/root/testdata/sf0.001"
    if not cold and os.path.isdir(warm_dir):
        for name in HEADLINE:
            fn = qs.get(name)
            if fn is None:
                continue
            try:
                fn(spark, warm_dir).count()
            except Exception:
                pass

    from da_transform_judgments_pipeline_spark.operators import dedup

    # Per-query time = MIN over SPARK_GRAFT_RUNS (default 3) full
    # plan+execute repetitions — standard steady-state practice (timeit/
    # hyperfine) that suppresses host-VM scheduling noise (measured up to
    # 5× spikes on identical code — e.g. the same MinHash plan timed 3.0s /
    # 11.2s in back-to-back interleaved trials). Every repetition re-plans
    # and re-executes the full query; operator-persisted intermediates are
    # released between repetitions so nothing is amortized across them.
    # default 5 (was 3): measured host-VM spikes reach 5-12× on identical
    # plans, and min-of-3 still records a spike-free sample only ~P(no
    # spike)³ of the time — min-of-5 keeps the recorded number close to
    # the true plan cost without materially lengthening the suite
    runs = max(1, int(os.environ.get("SPARK_GRAFT_RUNS", "5")))
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        best = None
        for _ in range(runs):
            # One failing query records one error row and never kills the
            # artifact — the rest of the suite still produces timings.
            try:
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.count()
                elapsed = time.perf_counter() - t0
            except Exception as ex:
                errors[name] = f"{type(ex).__name__}: {ex}"[:300]
                best = None
                break
            finally:
                # reclaim operator-persisted intermediates (untimed) so
                # storage memory doesn't accumulate across the suite and the
                # next repetition starts from a cold cache rather than
                # reusing this run's persisted subplans
                try:
                    dedup.release_cached()
                except Exception:
                    pass
            best = elapsed if best is None else min(best, elapsed)
        if best is not None:
            timings[name] = round(best, 3)

    # Cold ANN index-build rows: e03/e07 time the probe against a prebuilt
    # on-disk index (the intended serving shape), which leaves the
    # amortized build cost invisible. These two rows surface it — each
    # build runs ONCE (cold, no min-of-runs: a build is a one-time cost by
    # definition) into a throwaway dir, never touching the shared cache the
    # probe queries use.
    import shutil
    import tempfile

    from da_transform_judgments_pipeline_spark.operators import (
        clustering,
        similarity,
    )

    builds: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="bench-ann-build-")
    try:
        emb = entrymod._T(spark, sf_dir, "embeddings")
        qvec = entrymod._query_vec(spark, sf_dir)
        t0 = time.perf_counter()
        similarity.build_ann_index(
            emb, os.path.join(tmp, "srp"), n_planes=8, seed=42, dim=len(qvec)
        )
        builds["build_ann_index"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        cent = clustering.kmeans_fit(emb, k=16, updates=1)
        similarity.build_ivf_index(emb, os.path.join(tmp, "ivf"), cent)
        builds["build_ivf_index"] = round(time.perf_counter() - t0, 3)
    except Exception as ex:
        errors["build_index"] = f"{type(ex).__name__}: {ex}"[:300]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # Once-per-round smoke timing for every registered query NOT in the
    # headline set: a single sf0.01 run each (no min-of-runs — this is a
    # pathological-regression tripwire for the cheap queries, not a
    # steady-state measurement; a plan that silently went quadratic shows
    # up as seconds here regardless of noise).
    smoke: dict[str, float] = {}
    smoke_dir = os.environ.get(
        "SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.01"
    )
    if os.path.isdir(smoke_dir) and "--no-smoke" not in sys.argv:
        for name, fn in qs.items():
            if name in HEADLINE:
                continue
            try:
                t0 = time.perf_counter()
                fn(spark, smoke_dir).count()
                smoke[name] = round(time.perf_counter() - t0, 3)
            except Exception as ex:
                errors[f"smoke:{name}"] = f"{type(ex).__name__}: {ex}"[:300]
            finally:
                try:
                    dedup.release_cached()
                except Exception:
                    pass

    # Untimed pruning-economics probe for the e05b row: the MEASURED
    # candidate fraction the pruned SRP config verifies (vs all pairs) —
    # the point of the pruned regime is this number, not the wall-clock.
    lsh_stats = None
    try:
        emb = entrymod._T(spark, sf_dir, "embeddings")
        lsh_stats = dedup.embedding_lsh_candidate_stats(
            emb, threshold=0.9, n_planes=16, sigmas=1.0, dim=64
        )
        dedup.release_cached()
    except Exception as ex:
        errors["e05b_stats"] = f"{type(ex).__name__}: {ex}"[:300]

    total = round(sum(timings.values()), 3)
    # Subtotal over the round-3 headline set (the 30 queries timed since
    # r3), so round-over-round comparison stays meaningful even as new
    # queries join HEADLINE and shift the grand total.
    # Field order is deliberate: every SCALAR summary first, the large
    # per-query maps last — the driver's tail capture has truncated the
    # r5 line mid-way, and a truncation must cost detail rows, never the
    # headline metric.
    r3_set = [q for q in R3_HEADLINE if q in timings]
    # Streaming queries (s24/s26) build real files + a frontier table
    # around the timed stream; the entry module records the last
    # repetition's fixture/stream/collect/teardown split so the
    # artifact separates ENGINE time from HARNESS time —
    # stream_harness is the non-stream share inside headline_total.
    splits = dict(getattr(entrymod, "STREAM_SPLITS", {}) or {})
    harness = round(
        sum(
            v.get("fixture_sec", 0) + v.get("collect_sec", 0)
            + v.get("teardown_sec", 0)
            for k, v in splits.items()
            if k in timings
        ),
        3,
    )
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "r3_subtotal": round(sum(timings[q] for q in r3_set), 3),
        "stream_splits": splits,
        "stream_harness": harness,
        # one-time cold index builds, kept OUT of the headline total (a
        # build is a one-time cost; e03/e07 time the per-query probe — the
        # serving shape); these rows surface the amortized build cost
        # (build_ivf_index includes the k-means centroid fit)
        "index_builds": builds,
        "e05b_candidates": lsh_stats,
        "queries": timings,
        "smoke": smoke,
    }
    if errors:
        out["errors"] = errors
    # The driver's capture keeps the TAIL (last ~2000 chars) of the
    # output: r5 and r6 recorded a front-truncated big line, and r7's
    # ~2.8 KB compact second line STILL overflowed the capture because
    # its scalars came first and the 87-entry queries map last. Three
    # lines, strictly increasing importance: (1) the big object, (2) the
    # per-query timings map (detail, may be truncated harmlessly),
    # (3) a <=300-byte scalars-ONLY line LAST — any tail capture of
    # >=300 chars ends with one small complete JSON line containing
    # headline_total. test_bench_tail_line in tests/test_plans.py pins
    # this contract with a simulated 2000-char capture.
    out["headline_total"] = total
    out["headline_unit"] = "sec"
    out["headline_sf"] = sf
    for line in output_lines(out):
        print(line)
    write_artifact(out)
    spark.stop()


def write_artifact(out: dict, path: str | None = None) -> str | None:
    """r15-opt (driver visibility): the driver's ~2000-char tail capture
    preserves only the last ~60 per-query stdout entries, so PERF_r14's
    per_query/geomean/scaling came back EMPTY. Persist the COMPLETE
    output object to a JSON file too, so round-over-round comparison has
    the full per-query map. The stdout contract is untouched (additions
    only); the file is best-effort — a read-only checkout must not fail
    the bench. Returns the path written, or None on failure."""
    path = path or os.environ.get(
        "SPARK_GRAFT_BENCH_OUT", os.path.join(REPO, "BENCH_latest.json")
    )
    try:
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
            fh.write("\n")
    except OSError:
        return None
    return path


if __name__ == "__main__":
    main()
