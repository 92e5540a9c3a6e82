#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed end-to-end (plan + full execution). Execution is forced
with a noop-format write, NOT count(): under count(1) Catalyst prunes every
deterministic unused projection column, so map-only queries (text stats,
quality scores, simhash) would never evaluate their expressions/pandas UDFs
and the timing would measure a bare scan-count. The noop sink computes every
output column and discards the rows.

Caching policy: q82_minhash_bands is timed COLD (band cache cleared first) and
therefore pays for the full tokenize->shingle->minhash->band signature pass;
the downstream dedup queries (q67/q68/q79/q87-analogs) intentionally reuse the
cached band table, exactly as a production near-dup pipeline persists its
signature table once. The shared-pass queries are listed in the JSON output
under "shares_band_cache".

A warmup query runs first so JVM/codegen startup isn't attributed to the
first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hive_backend_spark.registry import all_queries
from hive_backend_spark.session import get_spark

HEADLINE = [
    "q01_priority_dequeue",
    "q11_group_count",
    "q12_health_snapshot",
    "q13_fk_enrich_join",
    "q14_latest_wins",
    "q15_avg_latency_per_key",
    "q19_nation_trade_volume",
    "q38_asof_join",
    "q40_pricing_summary",
    "q41_shipping_priority",
    "q42_local_supplier_volume",
    "q44_order_priority_check",
    "q48_returned_item_revenue",
    "q49_large_volume_customers",
    "q91_market_share",
    "q93_shipping_delay_priority",
    "q94_customer_order_distribution",
    "q99_last_to_ship_suppliers",
    "q52_two_phase_mark",
    "q57_sessionize",
    "q59_cohort_retention",
    "q60_text_stats",
    "q62_quality_score",
    "q119_repetition_signals",
    "q120_chunk_windows",
    "q121_group_checksum",
    "q122_winsorized_stats",
    "q64_exact_dup_groups",
    "q103_corpus_clean",
    "q105_incremental_dedup",
    "q106_decontamination",
    "q108_bm25_topk",
    "q124_training_pipeline",
    "q82_minhash_bands",  # timed cold — pays the full signature pass
    "q67_lsh_candidates",
    "q68_jaccard_verify",
    "q78_vocabulary",
    "q84_tfidf",
    "q85_rollup_hierarchy",
    "q79_dup_clusters",
    "q112_quality_canonical",
    "q69_simhash_signatures",
    "q70_cosine_topk",
    "q71_near_dup_pairs",
    "q123_pagerank_centrality",
    "q73_centroid_stats",
    "q74_ivf_routed_search",
    "q100_simhash_near_dup",
    "q101_hyperplane_lsh",
    "q83_decode_features",
    "q125_element_payload_extract",
    "q126_incremental_rollup_merge",
    "q127_pq_ann",
    "q128_boilerplate_removal",
    "q129_scd2_intervals",
    "q130_triangle_census",
    "q131_winnowing_fingerprints",
    "q132_cluster_quality",
    "q133_fuzzy_decontamination",
    "q134_approx_percentile_bound",
    "q135_length_bucketed_batches",
    "q136_minhash_jaccard_error",
    "q137_ngram_novelty",
    "q138_token_fertility",
    "q139_fingerprint_decontamination",
    "q140_kmeans_refine",
    "q141_zipf_slope",
    "q142_duplicate_ngram_spans",
    "q143_temperature_mixture",
    "q144_curriculum_stages",
    "q145_sampled_frequency_audit",
    "q146_token_entropy",
    "q147_source_drift",
    "q148_pmi_bigrams",
    "q149_vocab_overlap",
    "q150_term_burstiness",
    "q151_bigram_logprob",
    "q152_dedup_aware_shards",
    "q153_embedding_norm_audit",
    "q154_ann_recall_audit",
    "q155_kmeans_train",
    "q156_source_quality_cap",
    "q157_cross_source_duplication",
    "q158_stopword_coverage_gate",
    "q159_bpe_merge_candidates",
    "q160_pii_scrub",
    "q161_leakage_safe_split",
    "q162_feature_correlation",
    "q163_heavy_hitters",
    "q164_rate_limit_admission",
    "q165_mad_outliers",
    "q166_embedding_anisotropy",
    "q167_budget_waterfill",
    "q168_lsh_recall_audit",
    "q169_quality_calibration",
    "q170_template_prefix_census",
    "q171_decontamination_ladder",
    "q172_dedup_survivorship",
    "q173_incremental_lsh_update",
    "q174_source_welch_drift",
    "q175_langid_confusion",
    "q176_pq_distortion",
    "q177_shard_balance_audit",
    "q178_cluster_purity",
    "q179_containment_pairs",
    "q180_psi_drift",
    "q181_hapax_census",
    "q182_vocab_coverage",
    "q183_analyze_column_stats",
    "q184_bloom_decontamination",
    "q185_event_bursts",
    "q186_locf_imputation",
    "q187_cusum_changepoint",
    "q188_event_transitions",
    "q189_value_trend",
    "q190_bloom_fpr_audit",
    "q191_supplier_hhi",
    "q192_sketch_union_audit",
    "q193_quality_skyline",
    "q194_frequent_pairs",
    "q195_band_population_audit",
    "q196_chi2_type_drift",
    "q197_js_source_divergence",
    "q198_interarrival_stats",
    "q199_cross_source_xent",
    "q200_rrf_fusion",
    "q201_token_gini",
    "q202_near_dup_split_leakage",
    "q203_dedup_weighted_mass",
    "q204_ranker_agreement",
    "q205_source_dataset_card",
    "q206_cosine_threshold_sweep",
    "q207_fk_integrity_audit",
    "q208_watermark_lag_audit",
    "q209_countmin_audit",
    "q210_filter_cascade_attrition",
    "q211_lsh_band_planner",
    "q212_chunk_dedup_census",
    "q213_hard_negative_mining",
    "q214_cluster_transitivity_audit",
    "q215_epoch_repeat_schedule",
    "q216_sampled_dedup_estimate",
    "q217_incremental_index_merge",
    "q218_small_group_census",
    "q219_dsir_importance",
    "q220_multiprobe_lsh",
    "q221_point_in_time_join",
    "q222_prefix_filter_join",
    "q223_neyman_allocation",
    "q224_feature_mi_ranking",
    "q225_dedup_growth_curve",
    "q226_rendezvous_resharding",
    "q227_kcore_decomposition",
    "q228_filter_interaction_census",
    "q229_join_cardinality_estimate",
    "q230_deletion_propagation_audit",
    "q231_phrase_search",
    "q232_frequent_sequences",
    "q233_jackknife_dup_rate",
    "q234_ndcg_eval",
    "q235_km_gap_survival",
    "q236_quality_auc",
    "q237_distinctive_terms",
    "q238_fdr_drift_control",
    "q239_poisson_bootstrap_ci",
    "q240_interval_overlap_join",
    "q241_hll_intersection",
    "q242_good_turing",
    "q243_conformal_threshold",
    "q244_label_propagation",
    "q245_wasserstein_drift",
    "q246_binary_segmentation",
    "q247_touch_attribution",
    "q248_delta_method_ci",
    "q249_importance_ess",
    "q250_sprt_monitor",
    "q251_capture_recapture",
    "q252_source_profile_cosine",
    "q253_hill_tail_index",
    "q254_benford_audit",
    "q255_systematic_pps_sample",
    "q256_blocked_entity_resolution",
    "q257_seasonal_anomaly",
    "q258_acf_daily_counts",
    "q259_zorder_locality",
    "q260_k_anonymity_audit",
    "q261_eval_embedding_contamination",
    "q262_fd_discovery",
    "q263_markov_adequacy",
    "q264_png_decode_stats",
    "q265_es_weighted_stratified_wor",
    "q266_ewma_control_chart",
    "q267_fellegi_sunter_scores",
    "q268_mann_whitney_drift",
    "q269_theil_sen_trend",
    "q270_wav_decode_stats",
    "q271_funnel_conversion_lag",
    "q272_resize_pipeline_stats",
    "q273_min_cost_supplier",
    "q274_nation_trade_flows",
    "q275_important_part_value",
    "q276_dominant_promo_suppliers",
    "q277_kneser_ney_bigram",
    "q278_range_partition_planner",
    "q279_mutual_nn_pairs",
    "q280_audio_activity_stats",
    "q281_seasonal_strength",
    "q282_automation_signature",
    "q283_holt_linear_smoothing",
    "q284_gtest_collocations",
    "q285_brier_decomposition",
    "q286_zonemap_pruning_audit",
    "q287_clustering_coefficients",
    "q288_nelson_aalen_hazard",
    "q289_eb_rate_shrinkage",
    "q290_cuped_adjustment",
    "q291_groupkfold_assignment",
    "q292_mahalanobis_outliers",
    "q293_golden_record_merge",
    "q294_rbo_ranker_churn",
    "q295_audio_decimate_stats",
    "q296_dedup_selection_bias",
    "q297_simpsons_reversal",
    "q298_attribution_models",
    "q299_hamilton_apportionment",
    "q300_length_debiased_quality",
    "q301_rfm_segments",
    "q302_fano_burstiness",
    "q303_markov_entropy_rate",
    "q304_peak_concurrency",
    "q305_session_basket_lift",
    "q306_kendall_tau",
    "q307_hll_mergeable_cube",
    "q308_bfs_hop_census",
    "q309_degree_assortativity",
    "q310_sentence_stats",
    "q311_ship_sla_attainment",
    "q312_embedding_separability",
    "q313_bpe_train_merges",
    "q314_rounding_margin_audit",
    "q315_bpe_segmentation",
    "q316_heaps_law_fit",
    "q317_t_closeness_audit",
    "q318_kcenter_coreset",
    "q319_code_switch_audit",
    "q320_pair_alignment_forensics",
    "q321_successive_halving",
    "q322_sinkhorn_transport",
    "q323_posting_compression_audit",
    "q324_obrien_fleming_monitor",
    "q325_gif_decode_stats",
    "q326_readability_scores",
    "q327_bag_dup_groups",
    "q328_jpeg_decode_stats",
    "q329_mp4_structure_stats",
    "q330_mp3_frame_stats",
    "q331_progressive_jpeg_stats",
    "q332_warc_ingest_stats",
    "q333_tagged_mp3_ingest",
    "q334_zip_member_census",
    "q335_targz_census",
    "q336_parquet_footer_stats",
    "q337_flac_decode_stats",
    "q338_rowgroup_pruning_audit",
    "q339_avro_container_census",
    "q340_deltalog_snapshot_census",
    "q341_parquet_real_decode",
    "q342_parquet_nested_read",
    "q343_parquet_v2_delta_decode",
    "q345_delta_checkpoint_compose",
]

# Queries that deliberately reuse the shared dedup-pipeline state (the
# production pattern: one signature pass, one candidate-generation pass,
# one clustering pass — many consumers): the band/signature tables q82
# materializes, the candidate-pair tables q67 materializes (fingerprint-
# level band self-join + doc-level expansion, _FPP_CACHE/_PAIRS_CACHE), and
# the cluster-label table q79 builds from them. Each of those three stages
# is timed COLD via a per-attempt cache reset (see COLD_RESET below), so
# every cost in the pipeline has exactly one query that pays it cold;
# everything listed here reads the warm tables. Everything NOT listed is
# computed from scratch on every run.
# r14 (r13 verdict task #1): list extended with ALL pair/label consumers —
# it had been stale since the _lsh_pairs/_cluster_labels caches grew.
SHARES_BAND_CACHE = [
    "q67_lsh_candidates",
    "q68_jaccard_verify",
    "q79_dup_clusters",
    "q112_quality_canonical",
    "q130_triangle_census",
    "q133_fuzzy_decontamination",
    "q136_minhash_jaccard_error",
    "q152_dedup_aware_shards",
    "q168_lsh_recall_audit",
    "q171_decontamination_ladder",
    "q172_dedup_survivorship",
    "q173_incremental_lsh_update",
    "q174_source_welch_drift",
    "q175_langid_confusion",
    "q176_pq_distortion",
    "q177_shard_balance_audit",
    "q178_cluster_purity",
    "q179_containment_pairs",
    "q195_band_population_audit",
    "q202_near_dup_split_leakage",
    "q203_dedup_weighted_mass",
    "q211_lsh_band_planner",
    "q214_cluster_transitivity_audit",
    "q222_prefix_filter_join",
    "q227_kcore_decomposition",
    "q287_clustering_coefficients",
    "q291_groupkfold_assignment",
    "q293_golden_record_merge",
    "q296_dedup_selection_bias",
    "q308_bfs_hop_census",
    "q309_degree_assortativity",
    "q320_pair_alignment_forensics",
]


# Calibration canary (round 11): cross-round totals from this shared box
# have drifted up to 1.35x on byte-identical code (r9->r10 forensics, see
# VERDICT r10), so every bench run times three PINNED queries whose source
# is frozen (enforced by tests/test_plans.py::test_calibration_canaries_frozen)
# and reports their median ratio to a fixed idle-box reference record. A
# calibration factor ~1.0 means the box runs like the reference box did;
# per-query times divided by the factor are comparable across rounds
# without forensics. The reference is the r9 full-bench record — the most
# recent idle-box run (load_1m 0.61) before the drift was first observed;
# it must NEVER be re-based, or the factor loses its meaning.
# Round-12 re-base (r11 verdict task #3): five canaries instead of three,
# two of them multi-second (q79 cold, q171) so the drift factor is no
# longer estimated from sub-second queries alone, plus a dispersion
# statistic beside the median. All five sources are md5-frozen by
# tests/test_plans.py::test_calibration_canaries_frozen; reference times
# re-based to the r11 idle-box record (previous base: BENCH_full_r09).
# Round-13 restructure (r12 verdict task #5 + nit #2): the three
# sub-second canaries (q01/q44/q64) persistently disagree 2-3x with the
# multi-second ones — their reference times are dominated by fixed
# overheads (job scheduling, first-attempt JIT) that don't scale with
# box speed, so they are kept as SMOKE canaries (reported, trend-checked)
# but EXCLUDED from the factor computation. The factor now comes from
# the multi-second set (q79 cold, q171, q331 — decode-bound, the most
# machine-proportional row in the suite), whose r13 spread is ~1.35x.
# q292 joins the smoke set after its r12 drift forensics: its first
# execution pays ~1.8 s of one-time codegen/JIT (measured 2.76 s attempt
# 1 vs 0.9-1.0 s steady state over 10 consecutive runs), so cross-round
# comparisons of its single number were measuring WHERE in the run the
# JIT cost happened to fall, not the query.
# r13 re-base (forced): the optimization round changed q79's and q331's
# measured cost (4.6 -> 2.3 s and 4.7 -> 2.6 s), so the r11-based
# references no longer describe the code being timed — an idle box would
# have read a ~0.55 "machine factor" that actually measured the
# optimizations. References below are each canary's BEST of four full-bench
# runs taken in idle windows on 2026-08-18 (the box suffers ~30-min-period
# co-tenant spikes; per-canary min across runs is the closest observable to
# the uninflated truth — a single run always catches a spike somewhere).
# Documented in COVERAGE.md + OPTIMIZATION_r13.md; r12<->r13 comparisons
# must use the cross-round table in OPTIMIZATION_r13.md, not this factor.
CALIBRATION_REF = {
    "q01_priority_dequeue": 0.3405,
    "q44_order_priority_check": 0.4778,
    "q64_exact_dup_groups": 0.2283,
    "q79_dup_clusters": 2.3035,
    "q171_decontamination_ladder": 2.7294,
    "q292_mahalanobis_outliers": 0.6893,
    "q331_progressive_jpeg_stats": 2.5991,
}
FACTOR_CANARIES = (
    "q79_dup_clusters",
    "q171_decontamination_ladder",
    "q331_progressive_jpeg_stats",
)
CALIBRATION_REF_SOURCE = (
    "r13 re-base: per-canary best of 4 idle-window full-bench runs, "
    "2026-08-18, sf0.1 (record run: BENCH_full_r13.json)"
)


# Harness versioning so cross-round per-query deltas are interpretable:
#   v1 (round 1): execution forced with count() — under-measured map-only
#      queries (Catalyst pruned unused projections); warm caches could hide
#      shared-pass cost.
#   v2 (round 2+): noop-format write forces every output column; q82/q79
#      timed cold via cache clears; min-of-2 (escalating to 3 on outliers).
# BENCH jsons from different harness versions are NOT comparable; compare
# only within a version (r2 is the v2 baseline).
#   v2, r14 amendment (r13 verdict task #1): q67 joins the cold-reset set —
#      its pre-attempt hook drains the candidate-pair caches
#      (_FPP_CACHE/_PAIRS_CACHE) so candidate generation has a declared
#      cold-timed surface. Through r13 the band self-join escaped every
#      reported minimum (q67 reported a warm ~0.08 s read; the r13
#      _FPP_CACHE change had silently moved the cost out of cold q79 too).
#      q67's r13 warm-read numbers (0.08 s) are NOT comparable to its r14+
#      cold numbers (~0.9-1.1 s) — see OPTIMIZATION_r14.md.
HARNESS_VERSION = 2
HARNESS_METHOD = (
    "noop-write; cold q82/q67/q79 min-of-3 (q82=signatures, q67=candidate "
    "pairs, q79=clustering); warm min-of-2(+1 if >3s or >1.5x disagree)"
)


def _ncpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def main() -> None:
    # Capture BEFORE the session spins up: the 1m load at start reflects
    # EXTERNAL machine load (our own local[32] run dominates any reading
    # taken at the end), which is the number that explains uniform
    # cross-round drift.
    try:
        _load_start_1m, _load_start_5m, _ = os.getloadavg()
    except OSError:
        _load_start_1m = _load_start_5m = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("hive-backend-spark-bench")
    specs = all_queries()

    # Warmup: parquet footers + JVM codegen via the flagship query, and the
    # Python worker pool (pandas/pyarrow imports, Arrow runner setup) via a
    # trivial mapInPandas across every core — so per-query timings measure
    # the queries, not one-time runtime bring-up.
    specs["q01_priority_dequeue"].fn(spark, sf_dir).count()
    par = spark.sparkContext.defaultParallelism
    spark.range(0, par * 10, 1, par).mapInPandas(lambda it: it, "id long").count()

    from hive_backend_spark.queries.dedup import (
        clear_bands_cache,
        clear_candidates_cache,
        clear_labels_cache,
    )

    # The three pipeline stages with declared cross-query sharing are timed
    # COLD by clearing their cache before EVERY attempt (min-of-N would
    # otherwise report a warm cache read for all but the first attempt —
    # the under-measurement class the round-1 advisory flagged):
    #   q82 pays the full tokenize->shingle->minhash->band signature pass;
    #   q67 pays the full candidate-generation pass (band self-join +
    #       escalation probe + doc-level expansion; bands stay) — added
    #       r14 per the r13 verdict: the r13 _FPP_CACHE persist had left
    #       candidate generation outside every reported minimum;
    #   q79 pays the full connected-components clustering pass (bands and
    #       candidate pairs stay, as declared in SHARES_BAND_CACHE).
    COLD_RESET = {
        "q82_minhash_bands": clear_bands_cache,
        "q67_lsh_candidates": clear_candidates_cache,
        "q79_dup_clusters": clear_labels_cache,
    }

    # Two timed runs per query, report the min: absorbs one-time JIT/codegen
    # compilation and VM scheduling noise while still measuring full
    # plan+execute work (nothing is cached between runs except the shared
    # band + cluster-label tables, declared in SHARES_BAND_CACHE). If the
    # best of two still looks like it caught an external CPU-contention
    # spike (observed: the same query is sub-second in isolation and 10 s+
    # when a co-tenant process wakes up), take one more sample — min-of-3
    # bounds the damage to the reported metric without inflating normal
    # runs.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        reset = COLD_RESET.get(name)
        samples: list[float] = []
        for attempt in range(3):
            # Cold-reset queries always get all 3 attempts: their first
            # attempt pays one-time JIT compilation of the iterative plan's
            # generated code (measured 5-6 s first attempt vs 1.5-1.9 s
            # steady-state cold-cache at sf0.1 for q79), which is JVM
            # bring-up, not query cost. Warm-path queries keep min-of-2
            # unless (a) the best looks like external contention (> 3 s) or
            # (b) the two samples DISAGREE > 1.5x — the r12 q292 forensics:
            # a first attempt can pay 1.5-2 s of one-time codegen/JIT
            # (measured 2.76 s attempt 1 vs 0.9-1.0 s steady state), and
            # min-of-2 then reports half-JIT, half-query. A third sample
            # lands in steady state and the min discards the compile cost.
            if (
                attempt == 2
                and reset is None
                and min(samples) <= 3.0
                and max(samples) / max(min(samples), 1e-9) <= 1.5
            ):
                break
            if reset is not None:
                reset()
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            # Force FULL execution of every output column: count() would let
            # Catalyst prune unused deterministic projections, skipping the
            # very expressions map-only queries exist to measure.
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 4)
        n = specs[name].fn(spark, sf_dir).count()  # untimed, stderr diagnostics
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    # End-of-run canary (r13 verdict task #5 + r13 advice): the box's
    # co-tenant spikes have a ~30-minute period, so front-loaded canaries
    # can miss a spike that lands on the back half of a ~16-minute run.
    # Re-time ONE frozen factor canary (q331: decode-bound, cache-free,
    # machine-proportional) AFTER the main loop, untimed-region only — the
    # per-query timings above are untouched.
    end_canary = None
    if sf == "0.1":
        _ec = "q331_progressive_jpeg_stats"
        _ec_samples = []
        for _ in range(2):
            t0 = time.perf_counter()
            specs[_ec].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            _ec_samples.append(time.perf_counter() - t0)
        end_canary = {
            "query": _ec,
            "now": round(min(_ec_samples), 4),
            "ref": CALIBRATION_REF[_ec],
            "ratio": round(min(_ec_samples) / CALIBRATION_REF[_ec], 4),
        }
    # Calibration factor: median now/reference ratio of the three frozen
    # canaries. Only meaningful at the reference's scale factor — at any
    # other SF the field is null and normalized times are omitted.
    calibration = None
    queries_normalized = None
    if sf == "0.1" and all(q in timings for q in CALIBRATION_REF):
        # factor from the MULTI-SECOND canaries only (sub-second smoke
        # canaries are overhead-dominated and persistently disagree 2-3x);
        # the spread statistic covers the factor-contributing set, which
        # is what bounds trust in a normalized single-query comparison.
        ratios = sorted(timings[q] / CALIBRATION_REF[q] for q in FACTOR_CANARIES)
        factor = round(ratios[len(ratios) // 2], 4)
        # trusted = every factor canary within the documented 1.5x band of
        # each other AND the end-of-run canary within 1.5x of its ref (r13
        # advice: normalized numbers must not be quoted from a run that a
        # mid- or late-run spike visibly skewed; BENCH_full_r13.json's own
        # q331 ratio of 2.94 is the motivating example).
        trusted = ratios[-1] / ratios[0] <= 1.5 and (
            end_canary is None or end_canary["ratio"] <= 1.5
        )
        calibration = {
            "factor": factor,
            "factor_canaries": list(FACTOR_CANARIES),
            "ratio_min": round(ratios[0], 4),
            "ratio_max": round(ratios[-1], 4),
            "ratio_spread": round(ratios[-1] / ratios[0], 4),
            "trusted": trusted,
            "end_canary": end_canary,
            "per_query": {
                q: {
                    "now": timings[q],
                    "ref": ref,
                    "ratio": round(timings[q] / ref, 4),
                    "in_factor": q in FACTOR_CANARIES,
                }
                for q, ref in CALIBRATION_REF.items()
            },
            "reference": CALIBRATION_REF_SOURCE,
        }
        queries_normalized = {
            k: round(v / factor, 4) for k, v in timings.items()
        }
    # Environmental context: wall times on a shared box scale with external
    # load (observed: a steady ~5-core external load inflates every query
    # ~1.3x uniformly). Recording the at-start load averages beside the
    # timings lets cross-round comparisons separate code regressions
    # (per-query, structural) from machine noise (uniform).
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "harness_version": HARNESS_VERSION,
                "harness_method": HARNESS_METHOD,
                "calibration": calibration,
                "queries_normalized": queries_normalized,
                "value_normalized": (
                    round(total / calibration["factor"], 4) if calibration else None
                ),
                "shares_band_cache": SHARES_BAND_CACHE,
                "load_avg_1m_at_start": _load_start_1m,
                "load_avg_5m_at_start": _load_start_5m,
                # r4's numbers were contaminated by a 10+ external load; flag
                # runs that start on a busy box so cross-round comparisons
                # can discount them (threshold: 2x cores/8, i.e. 8 on the
                # 32-core harness).
                "degraded": (
                    _load_start_1m is not None
                    and _load_start_1m > 2 * _ncpus() / 8.0
                ),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
