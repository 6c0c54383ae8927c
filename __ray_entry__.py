"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

Query naming: one entry per implemented operator/pipeline from
SURVEY.md §2 (+ the web-scale training-data operators). 334 of 337
entries carry STRONG SQL oracles — including the closed-form rasters/
polygons (functions inlined as numpy-computed literals), the FNV/
splitmix hash pipeline, hex/S2/Hilbert cell encodings, every sketch
(HLL/KMV/CMS/AMS/HyperANF — functions/sqlgen.py), the iterative graph/
cluster/training algorithms (unrolled or level-CTE twins with dual-path
parity pytests), the segmentation/morphology families, and the round-4
additions (composed ms_toposeg + corpus gate, WMS/GDB connector seams,
phase congruency, HSV threshold, Good-Turing, CART, speculative
coloring, binary-quant/matryoshka ANN, zone maps, fingerprints). The 3
rows-only entries are each justified byte-assembly cases —
polygonize_rings/_merged (WKB) and multiband_gif_tiles (GIF/LZW) —
whose geometric/pixel CONTENT is strict-checked by companion queries
(polygonize_edges value-hashes the boundary-edge multiset); all three
carry bit-exact round-trip pytests instead.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np

from geospatial_learn_ray.sources.events import delayed_events_sql as _delayed_events_sql
from geospatial_learn_ray.sources.pages import pages_sql
from geospatial_learn_ray.sources.polygons import pip_sql, polygons_sql
from geospatial_learn_ray.sources.tiles import GRID_X, GRID_Y, tiles_sql
from geospatial_learn_ray.sources.wms import wms_fetch_sql as _wms_fetch_sql
from geospatial_learn_ray.sources.gdb import gdb_convert_sql as _gdb_sql
from geospatial_learn_ray.stages import agg, dedup, raster, scorer
from geospatial_learn_ray.pipelines.flagship import flagship_dataset
from geospatial_learn_ray.pipelines.querydefs import *  # noqa: F401,F403
from geospatial_learn_ray.stages.textstages import GAZETTEER_PATTERNS as _GAZ_PATTERNS


def entry() -> Any:
    """Flagship pipeline (spatial join + tile agg) on sf0.001."""
    heads = flagship_dataset("/root/testdata/sf0.001")
    return heads["tile_agg"]



def queries() -> dict[str, Callable[[str], Any]]:
    # ORDER MATTERS: the graft driver checks only the FIRST 50 entries in
    # dict order. Rounds 1-3 driver-checked 100 distinct queries (all green,
    # CORRECTNESS_r01-03); round 4 rotates the 50 OLDEST never-checked
    # entries to the front (VERDICT r3 "Next round" #1) so the whole
    # registry gets a driver CORRECTNESS row over successive rounds. Every
    # entry past the window keeps its strict local oracle stand-in
    # (tools/check_oracles.py) + pytest evidence; NEW queries are appended
    # at the END so they never displace a never-checked entry.
    return {
        # ---- DRIVER WINDOW (first 50): round-5 rotation. These are the 50
        # ---- OLDEST never-driver-checked queries (round-3 session-2+ lists
        # ---- in CLAUDE.md order, then session-4 batch), per VERDICT r4 #1.
        "late_events_watermark": _q_late_events,
        "snapshot_diff_docs": _q_snapshot_diff,
        "triangle_count_hosts": _q_triangle_hosts,
        "trimmed_stats_lineitem": _q_trimmed_stats,
        "robots_blocked_pages": _q_robots_blocklist,
        "daily_users_events": _q_daily_users,
        "funnel_conversion_users": _q_funnel,
        "vocab_stats_docs": _q_vocab_stats,
        "quality_blend_docs": _q_quality_blend,
        "cohort_retention_users": _q_cohort_retention,
        "geohash_cells": _q_geohash_cells,
        "burst_detect_events": _q_burst_detect,
        "dbscan_pages": _q_dbscan_pages,
        "nearest_city_pages": _q_nearest_city,
        "hex_kring_smooth_pages": _q_hex_kring,
        "canny_edges_tiles": _q_canny_edges,
        "edt_proximity_tiles": _q_edt_proximity,
        "kmv_users_by_type": _q_kmv_users_by_type,
        "kmv_overlap_event_types": _q_kmv_overlap,
        "pmi_bigrams_docs": _q_pmi_bigrams,
        "scd2_history_docs": _q_scd2_history,
        "crawl_frontier_pages": _q_crawl_frontier,
        "skyline_orders": _q_skyline_orders,
        "ab_test_events": _q_ab_test,
        "fuzzy_name_pairs_customer": _q_fuzzy_names,
        "idw_grid_pages": _q_idw_grid,
        "skeletonize_tiles": _q_skeletonize,
        "debounce_events": _q_debounce,
        "viewshed_tiles": _q_viewshed,
        "label_prop_hosts": _q_label_prop,
        "exact_median_lineitem": _q_exact_median,
        "mst_hosts": _q_mst_hosts,
        "pca_top1_embeddings": _q_pca_top1,
        "tile_pyramid_tiles": _q_tile_pyramid,
        "pivot_events_users": _q_pivot_events,
        "roc_auc_quality_docs": _q_roc_auc,
        "hits_hosts": _q_hits_hosts,
        "contour_cells_tiles": _q_contour_cells,
        "calibration_bins_lineitem": _q_calibration,
        "media_scene_cuts": _q_scene_cuts,
        "sq8_encode_vectors": _q_sq8_encode,
        "event_transitions_users": _q_event_transitions,
        "leverage_topk_lineitem": _q_leverage,
        "segment_slopes_orders": _q_segment_slopes,
        "cusum_hourly_events": _q_cusum_hourly,
        "d8_directions_tiles": _q_d8_directions,
        "neyman_allocation_orders": _q_neyman,
        "flow_accum_tiles": _q_flow_accum,
        "interval_coverage_users": _q_interval_coverage,
        "kcore_hosts": _q_kcore_hosts,
        # ---- past the window: driver-checked in r1-r4 (150 green rows in
        # ---- CORRECTNESS_r01-04) or awaiting a later rotation; ALL carry
        # ---- strict local oracle checks (tools/check_oracles.py) + pytest.
        "hist_quantiles_lineitem": _q_hist_quantiles,
        "media_resize": _q_media_resize,
        "media_features": _q_media_features,
        "paragraph_dedup_docs": _q_paragraph_dedup,
        "interval_join_events": _q_interval_join_events,
        "weighted_sample_orders": _q_weighted_sample,
        "min_rect_tiles": _q_min_rect_tiles,
        "orientation_tiles": _q_orientation_tiles,
        "rfe_rank_lineitem": _q_rfe_rank,
        "vote_predict_lineitem": _q_vote_predict,
        "topk_orders_per_customer": _q_topk_orders_per_customer,
        "mg_heavy_hitters_events": _q_mg_heavy_hitters,
        "tfidf_top_terms_docs": _q_tfidf_top_terms,
        "lm_perplexity_docs": _q_lm_perplexity,
        "ann_pq_topk": _q_ann_pq,
        "ann_pq_store_topk": _q_ann_pq_store,
        "dedup_apply_docs": _q_dedup_apply,
        "dup_span_docs": _q_dup_spans,
        "bow_logistic_docs": _q_bow_logistic,
        "host_stats_pages": _q_host_stats,
        "boilerplate_docs": _q_boilerplate,
        "semdedup_vectors": _q_semdedup,
        "url_canonicalize_pages": _q_url_canon,
        "pii_redact_docs": _q_pii_redact,
        "badword_filter_docs": _q_badword_filter,
        "ann_lsh_topk": _q_ann_lsh,
        "inverted_index_docs": _q_inverted_index,
        "dsir_weights_docs": _q_dsir_weights,
        "pagerank_hosts": _q_pagerank_hosts,
        "chunk_docs": _q_chunk_docs,
        "host_cap_pages": _q_host_cap,
        "bpe_merges_docs": _q_bpe_merges,
        "bpe_token_counts_docs": _q_bpe_token_counts,
        "quality_pct_by_lang": _q_quality_pct,
        "incremental_dedup_docs": _q_incremental_dedup,
        "hopping_window_events": _q_hopping_window,
        "embedding_drift_labels": _q_embedding_drift,
        "media_dhash_dedup": _q_media_dhash,
        "rollup_stats_docs": _q_rollup_stats,
        "containment_pairs": _q_containment,
        "corpus_prep_docs": _q_corpus_prep,
        "jl_project_vectors": _q_jl_project,
        "corpus_shuffle_order": _q_corpus_shuffle,
        "reproject_points_laea": _q_reproject_points_laea,
        "lang_confusion_docs": _q_lang_confusion,
        "bm25_topk_docs": _q_bm25_topk,
        "event_gaps_users": _q_event_gaps,
        "hll_users_by_type": _q_hll_users_by_type,
        "lang_temp_weights": _q_lang_temp_weights,
        "char_entropy_docs": _q_char_entropy,
        "ndvi_tiles": _q_ndvi_tiles,
        "mask_tiles": _q_mask_tiles,
        "raster_points": _q_raster_points,
        "zonal_tile_stats": _q_zonal_tile_stats,
        "shape_props": _q_shape_props,
        "rgb_indices_tiles": _q_rgb_indices_tiles,
        "combine_scene_tiles": _q_combine_scene_tiles,
        "apply_lut_tiles": _q_apply_lut_tiles,
        "temporal_mean_tiles": _q_temporal_mean_tiles,
        "hist_match_tiles": _q_hist_match_tiles,
        "hex_meshgrid": _q_hex_meshgrid,
        "buffer_polygons": _q_buffer_polygons,
        "geom_pixel_bbox": _q_geom_pixel_bbox,
        "train_test_split": _q_train_test_split,
        "wkb_to_geojson": _q_wkb_to_geojson,
        "rasterize_fraction": _q_rasterize_fraction,
        "point_raster_lookup": _q_point_raster_lookup,
        "clip_tiles": _q_clip_tiles,
        "fill_nodata_tiles": _q_fill_nodata_tiles,
        "polygonize_tiles": _q_polygonize_tiles,
        "ragmerge_regions": _q_ragmerge,
        "ransac_lines_tiles": _q_ransac_lines,
        "hough_lines_tiles": _q_hough_lines,
        "ms_acwe_tiles": _q_ms_acwe,
        "do_ac_tiles": _q_do_ac,
        "ms_gac_tiles": _q_ms_gac,
        "multiband_gif_tiles": _q_multiband_gif,
        "snake_contours": _q_snake,
        "ms_toposnakes_tiles": _q_ms_toposnakes,
        "polygonize_rings": _q_polygonize_rings,
        "polygonize_edges": _q_polygonize_edges,
        "polygonize_merged": _q_polygonize_merged,
        "reproject_points": _q_reproject_points,
        "texture_stats": _q_texture_stats,
        "otsu_zone_thresh": _q_otsu_zone_thresh,
        "niblack_thresh_tiles": _q_niblack_tiles,
        "sauvola_thresh_tiles": _q_sauvola_tiles,
        "slope_tiles": _q_slope_tiles,
        "aspect_tiles": _q_aspect_tiles,
        "hillshade_tiles": _q_hillshade_tiles,
        "quegan_tiles": _q_quegan_tiles,
        "temp_match_peaks": _q_temp_match,
        "media_decode": _q_media_decode,
        "media_frame_sample": _q_media_frame_sample,
        "remove_small_objects": _q_remove_small_objects,
        "reproject_points_utm": _q_reproject_points_utm,
        "cms_counts_events": _q_cms_counts_events,
        "utm_roundtrip": _q_utm_roundtrip,
        "warp_utm_tiles": _q_warp_utm_tiles,
        "bloom_semi_join_orders": _q_bloom_semi_join,
        "extract_text": _q_extract_text,
        "url_dedup_keep_latest": _q_url_dedup,
        "token_counts": _q_token_counts,
        "quality_scores": _q_quality_scores,
        "repetition_scores": _q_repetition_scores,
        "decontaminate_docs": _q_decontaminate,
        "pack_sequences": _q_pack_sequences,
        "stratified_sample": _q_stratified_sample,
        "exact_text_dedup": _q_exact_text_dedup,
        "zonal_stats_lineitem": _q_zonal_stats_lineitem,
        "zonal_frac_orders": _q_zonal_frac_orders,
        "date_filter_events": _q_date_filter_events,
        "topk_users_by_events": _q_topk_users_by_events,
        "distinct_langs": _q_distinct_langs,
        "classify_lineitem": _q_classify_lineitem,
        "rmse_lineitem": _q_rmse_lineitem,
        "join_orders_customer": _q_join_orders_customer,
        "revenue_by_segment": _q_revenue_by_segment,
        "topk_parts": _q_topk_parts,
        "anti_join_customers": _q_anti_join_customers,
        "semi_join_customers": _q_semi_join_customers,
        "window_events": _q_window_events,
        "ann_cosine_topk": _q_ann_cosine_topk,
        "zonal_median_lineitem": _q_zonal_median_lineitem,
        "sessionize_events": _q_sessionize_events,
        "asof_join_events": _q_asof_join_events,
        "revenue_by_nation": _q_revenue_by_nation,
        "parts_above_avg": _q_parts_above_avg,
        "zonal_stats_multi": _q_zonal_stats_multi,
        "train_linear_lineitem": _q_train_linear,
        "regression_metrics_lineitem": _q_regression_metrics,
        "ridge_param_scan": _q_ridge_param_scan,
        "classify_proba_lineitem": _q_classify_proba,
        "logistic_weights_lineitem": _q_logistic_weights,
        "rf_oob_scan": _q_rf_oob_scan,
        "geocode_cells": _q_geocode_cells,
        "pip_join_rows": _q_pip_join,
        "pip_anti_rows": _q_pip_anti,
        "tile_agg_cells": _q_tile_agg,
        "knn_pages": _q_knn_pages,
        "ann_ivf_topk": _q_ann_ivf,
        "ann_ivf_store_topk": _q_ann_ivf_store,
        "minhash_pairs": _q_minhash_pairs,
        "simhash_pairs": _q_simhash_pairs,
        "jaccard_verified_pairs": _q_jaccard_verified,
        "embedding_dedup_pairs": _q_embedding_dedup,
        "dedup_components": _q_dedup_components,
        "hll_distinct_urls": _q_hll_distinct_urls,
        "lang_id": _q_lang_id,
        "doc_fingerprints": _q_fingerprints,
        "haar_tiles": _q_haar_tiles,
        "watershed_basins_tiles": _q_watershed,
        "focal_majority_tiles": _q_focal_majority,
        "link_predict_hosts": _q_link_predict,
        "media_loudness": _q_media_loudness,
        "kfold_cv_lineitem": _q_kfold_cv,
        "bfs_depth_hosts": _q_bfs_depth_hosts,
        "variogram_tiles": _q_variogram,
        "moran_i_tiles": _q_moran_i,
        "getis_gi_tiles": _q_getis_gi,
        "clustering_coeff_hosts": _q_clustering_coeff,
        "mi_lang_quality_docs": _q_mi_lang_quality,
        "cost_distance_tiles": _q_cost_distance,
        "hyperanf_hosts": _q_hyperanf_hosts,
        "quadtree_cells_pages": _q_quadtree_cells,
        "kriging_grid_pages": _q_kriging_grid,
        "kn_perplexity_docs": _q_kn_perplexity,
        "theilsen_slopes_orders": _q_theilsen,
        "mann_kendall_orders": _q_mann_kendall,
        "terrain_indices_tiles": _q_terrain_indices,
        "acf_daily_orders": _q_acf_daily,
        "mad_outliers_events": _q_mad_outliers,
        "ams_f2_events": _q_ams_f2,
        "isotonic_orders": _q_isotonic,
        "naive_bayes_lang_docs": _q_naive_bayes,
        "gini_revenue_nation": _q_gini_nation,
        "seasonal_decomp_orders": _q_seasonal_decomp,
        "dp_simplify_trajectories": _q_dp_simplify,
        "nb_confusion_docs": _q_nb_confusion,
        "sssp_hosts": _q_sssp_hosts,
        "kde_heat_grid_pages": _q_kde_grid,
        "benford_digits_orders": _q_benford,
        "kappa_nb_docs": _q_kappa,
        "label_centroid_cosine": _q_label_centroid,
        "assoc_rules_events": _q_assoc_rules,
        "markov_stationary_events": _q_markov_stationary,
        "twap_events": _q_twap,
        "rolling_zscore_events": _q_rolling_zscore,
        "rfm_tiles_customers": _q_rfm,
        "emerging_hotspots_pages": _q_emerging_hotspots,
        "media_phash_dedup": _q_media_phash,
        "convex_hull_hosts": _q_convex_hull,
        "capped_balance_users": _q_capped_balance,
        "psi_drift_orders": _q_psi_drift,
        "ewma_daily_orders": _q_ewma_daily,
        "readability_docs": _q_readability,
        "curvature_tiles": _q_curvature,
        "lbp_tiles": _q_lbp,
        "survival_gaps_users": _q_survival_gaps,
        "bootstrap_ci_orders": _q_bootstrap_ci,
        "snap_points_pages": _q_snap_points,
        "gbm_stumps_lineitem": _q_gbm_stumps,
        "zipf_fit_docs": _q_zipf_fit,
        "changepoint_daily_orders": _q_changepoint_daily,
        "cdc_chunks_docs": _q_cdc_chunks,
        "cube_stats_orders": _q_cube_stats,
        "single_linkage_hosts": _q_single_linkage,
        "g2_collocations_docs": _q_g2_collocations,
        "focal_median_tiles": _q_focal_median,
        "harris_corners_tiles": _q_harris_corners,
        "twi_tiles": _q_twi,
        "traj_intersections_users": _q_traj_intersections,
        "closeness_hosts": _q_closeness,
        "rake_keywords_docs": _q_rake,
        "hough_circles_tiles": _q_hough_circles,
        "iforest_orders": _q_iforest,
        "media_spectrogram": _q_media_spectrogram,
        "seam_carve_tiles": _q_seam_carve,
        "sorted_neighborhood_docs": _q_sorted_neighborhood,
        "attribution_events": _q_attribution,
        "zorder_layout_pages": _q_zorder_layout,
        "rrf_fusion_docs": _q_rrf_fusion,
        "textrank_keywords_docs": _q_textrank,
        "als_round_events": _q_als_round,
        "jenks_breaks_nation": _q_jenks,
        "code_switch_docs": _q_code_switch,
        "source_overlap_docs": _q_source_overlap,
        "tasseled_cap_tiles": _q_tasseled_cap,
        "bilinear_resample_tiles": _q_bilinear_resample,
        "regex_funnel_events": _q_regex_funnel,
        "betweenness_hosts": _q_betweenness,
        "mmr_rerank_vectors": _q_mmr_rerank,
        "oov_rate_docs": _q_oov_rate,
        "postings_varint_docs": _q_postings_varint,
        "sieve_tiles": _q_sieve,
        "brovey_pansharpen_tiles": _q_brovey,
        "soundex_blocks_parts": _q_soundex,
        "profile_lineitem": _q_profile,
        "dq_checks_orders": _q_dq_checks,
        "tophat_tiles": _q_tophat,
        "hilbert_layout_pages": _q_hilbert_layout,
        "ks_test_orders": _q_ks_test,
        "mannwhitney_orders": _q_mannwhitney,
        "assortativity_hosts": _q_assortativity,
        "json_props_events": _q_json_props,
        "fellegi_sunter_parts": _q_fellegi_sunter,
        "ms_toposeg_tiles": _q_ms_toposeg,
        "wms_fetch_tiles": _q_wms_fetch,
        "phasecong_tiles": _q_phasecong,
        "gdb_convert_features": _q_gdb_convert,
        "colour_thresh_tiles": _q_colour_thresh,
        "good_turing_docs": _q_good_turing,
        "zonemap_prune_lineitem": _q_zonemap,
        "ann_binary_topk": _q_ann_binary,
        "cart_tree_lineitem": _q_cart_depth2,
        "graph_coloring_hosts": _q_coloring,
        "ppr_hosts": _q_ppr,
        "integral_image_tiles": _q_integral_image,
        "clahe_tiles": _q_clahe,
        "spearman_lineitem": _q_spearman,
        "bearing_octants_users": _q_bearing_octants,
        "revenue_by_region": _q_revenue_by_region,
        "cuped_events": _q_cuped,
        "ktruss_hosts": _q_ktruss,
        "consistent_hash_pages": _q_consistent_hash,
        "ucb_replay_events": _q_ucb_replay,
        "ndcg_bm25_docs": _q_ndcg,
        "phrase_search_docs": _q_phrase_search,
        "hopping_distinct_users": _q_hopping_distinct,
        "dataset_fingerprint_docs": _q_dataset_fingerprint,
        "matryoshka_overlap_vectors": _q_matryoshka,
        "incremental_stats_events": _q_incremental_stats,
        "gated_corpus_pages": _q_gated_corpus,
        "registry_pipeline_docs": _q_registry_pipeline,
        "ann_ivfpq_topk": _q_ann_ivfpq,
        "rle_runs_orders": _q_rle_audit,
        "hex_rollup_pages": _q_hex_rollup,
        "learned_index_orders": _q_learned_index,
        "blocking_quality_parts": _q_blocking_quality,
        "rbo_snapshots_docs": _q_rbo_snapshots,
        "percolation_curve_hosts": _q_percolation,
        "jsonl_roundtrip_docs": _q_jsonl_roundtrip,
        "csv_roundtrip_lineitem": _q_csv_roundtrip,
        "tokenizer_fertility_docs": _q_tokenizer_fertility,
        "span_mask_docs": _q_span_mask,
        "cva_change_tiles": _q_cva_change,
        "vocab_growth_docs": _q_vocab_growth,
        # round-5 additions (appended PAST the driver window)
        "tiff_roundtrip_tiles": _q_tiff_roundtrip,
        "semseg_pred_tiles": _q_semseg_cnn,
        "rf_predict_lineitem": _q_rf_predict,
        "rf_oob_error_lineitem": _q_rf_oob,
        "tiff_scene_windows_tiles": _q_tiff_scene_windows,
        "k_anonymity_customers": _q_k_anonymity,
        "dp_counts_events": _q_dp_counts,
        "compact_plan_pages": _q_compact_plan,
        "scene_semseg_zonal": _q_scene_semseg_zonal,
        "png_media_roundtrip": _q_png_roundtrip,
        "warc_roundtrip_pages": _q_warc_roundtrip,
        "warc_corpus_pipeline": _q_warc_corpus,
        "gazetteer_match_docs": _q_gazetteer,
        "emd_drift_orders": _q_emd_drift,
        "dtw_pairs_users": _q_dtw_pairs,
        "golden_record_customers": _q_golden_record,
        "interval_schedule_users": _q_interval_schedule,
        "bloom_zone_prune_orders": _q_bloom_zone,
        "setsim_join_docs": _q_setsim_join,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB, views pre-registered on the same parquet tables)
# --------------------------------------------------------------------------

_QUALITY_WS = "GREATEST(len(regexp_extract_all(text, '\\S+')), 1)"
_QUALITY_PUNCT = "len(regexp_extract_all(text, '[^\\w\\s]'))"
_QUALITY_STOP = (
    "("
    + " + ".join(f"len(regexp_extract_all(text, '\\b{w}\\b'))" for w in ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"))
    + ")"
)

_SCORER_SQL = scorer.sql_for_scorer("lineitem", "l_orderkey, l_linenumber")

# ---- hash/geocode/cell SQL restatements (functions/sqlgen.py) -------------
# --------------------------------------------------------------------------
# oracle-SQL builders live in functions/oraclesql.py (VERDICT r2 next #10:
# keep this contract file a thin registry); imported under their original
# names so oracle_sql() below reads unchanged.
# --------------------------------------------------------------------------
from geospatial_learn_ray.functions import sqlgen as _sg
from geospatial_learn_ray.functions.hashing import splitmix64 as _smx
from geospatial_learn_ray.functions.oraclesql import (  # noqa: F401
    _TILE_FEATURE_SQL,
    _TILE_GRID_SQL,
    _ann_ivf_sql,
    _canny_sql,
    _semseg_cnn_sql,
    _rf_forest_sql,
    _dp_counts_sql,
    _compact_plan_sql,
    _scene_semseg_zonal_sql,
    _png_roundtrip_sql,
    _warc_roundtrip_sql,
    _lang_id_sql,
    _emd_drift_sql,
    _dtw_pairs_sql,
    _interval_schedule_sql,
    _bloom_zone_sql,
    _phasecong_sql,
    _colour_thresh_sql,
    _good_turing_sql,
    _zonemap_sql,
    _ann_binary_sql,
    _cart_depth2_sql,
    _coloring_sql,
    _integral_image_sql,
    _clahe_sql,
    _spearman_sql,
    _bearing_octants_sql,
    _cuped_sql,
    _ktruss_sql,
    _consistent_hash_sql,
    _ucb_replay_sql,
    _ndcg_sql,
    _phrase_search_sql,
    _hopping_distinct_sql,
    _dataset_fingerprint_sql,
    _matryoshka_sql,
    _incremental_stats_sql,
    _gated_corpus_sql,
    _registry_pipeline_sql,
    _ivfpq_sql,
    _rle_audit_sql,
    _hex_rollup_sql,
    _learned_index_sql,
    _blocking_quality_sql,
    _rbo_snapshots_sql,
    _percolation_sql,
    _tokenizer_fertility_sql,
    _span_mask_sql,
    _cva_sql,
    _vocab_growth_sql,
    _ms_toposeg_sql,
    _dbscan_sql,
    _edt_sql,
    _geohash_sql,
    _hex_kring_sql,
    _kmv_grouped_sql,
    _kmv_overlap_sql,
    _pmi_bigrams_sql,
    _scd2_sql,
    _crawl_frontier_sql,
    _skyline_orders_sql,
    _ab_test_sql,
    _fuzzy_names_sql,
    _idw_grid_sql,
    _skeletonize_sql,
    _debounce_sql,
    _viewshed_sql,
    _label_prop_sql,
    _exact_median_sql,
    _mst_sql,
    _pca_power_sql,
    _tile_pyramid_sql,
    _pivot_events_sql,
    _hits_sql,
    _contour_cells_sql,
    _scene_cuts_sql,
    _sq8_sql,
    _leverage_sql,
    _d8_sql,
    _flow_accum_sql,
    _interval_coverage_sql,
    _kcore_sql,
    _haar_sql,
    _watershed_sql,
    _focal_majority_sql,
    _link_predict_sql,
    _loudness_sql,
    _kfold_cv_sql,
    _bfs_depth_sql,
    _variogram_sql,
    _moran_sql,
    _getis_sql,
    _clustering_sql,
    _cost_distance_sql,
    _hyperanf_sql,
    _quadtree_sql,
    _kriging_sql,
    _kn_perplexity_sql,
    _theilsen_sql,
    _mann_kendall_sql,
    _terrain_indices_sql,
    _acf_daily_sql,
    _mad_outliers_sql,
    _ams_f2_sql,
    _isotonic_sql,
    _naive_bayes_sql,
    _gini_sql,
    _seasonal_decomp_sql,
    _dp_simplify_sql,
    _nb_confusion_sql,
    _sssp_sql,
    _kde_grid_sql,
    _benford_sql,
    _kappa_sql,
    _label_centroid_sql,
    _assoc_rules_sql,
    _markov_stationary_sql,
    _twap_sql,
    _rolling_zscore_sql,
    _rfm_sql,
    _emerging_hotspots_sql,
    _media_phash_sql,
    _convex_hull_sql,
    _capped_balance_sql,
    _psi_drift_sql,
    _ewma_daily_sql,
    _readability_sql,
    _curvature_sql,
    _lbp_sql,
    _survival_gaps_sql,
    _bootstrap_ci_sql,
    _snap_points_sql,
    _gbm_stumps_sql,
    _zipf_fit_sql,
    _changepoint_daily_sql,
    _cdc_chunks_sql,
    _cube_stats_sql,
    _single_linkage_sql,
    _g2_collocations_sql,
    _focal_median_sql,
    _harris_sql,
    _twi_sql,
    _traj_intersections_sql,
    _closeness_sql,
    _rake_sql,
    _hough_circles_sql,
    _iforest_sql,
    _spectrogram_sql,
    _seam_carve_sql,
    _sorted_neighborhood_sql,
    _attribution_sql,
    _zorder_layout_sql,
    _rrf_fusion_sql,
    _textrank_sql,
    _als_round_sql,
    _jenks_sql,
    _code_switch_sql,
    _source_overlap_sql,
    _tasseled_cap_sql,
    _bilinear_resample_sql,
    _regex_funnel_sql,
    _betweenness_sql,
    _mmr_rerank_sql,
    _oov_rate_sql,
    _postings_varint_sql,
    _sieve_sql,
    _brovey_sql,
    _soundex_sql,
    _profile_sql,
    _dq_checks_sql,
    _tophat_sql,
    _hilbert_layout_sql,
    _ks_test_sql,
    _mannwhitney_sql,
    _assortativity_sql,
    _json_props_sql,
    _fellegi_sunter_sql,
    _nearest_city_sql,
    _semdedup_sql,
    _buffer_polygons_sql,
    _dedup_components_sql,
    _doc_fingerprints_sql,
    _embedding_pairs_sql,
    _hex_meshgrid_sql,
    _hough_lines_sql,
    _jaccard_verified_sql,
    _knn_pages_sql,
    _lang_id_sql,
    _emd_drift_sql,
    _dtw_pairs_sql,
    _interval_schedule_sql,
    _bloom_zone_sql,
    _located_sql,
    _logistic_weights_sql,
    _media_decode_sql,
    _media_features_sql,
    _paragraph_dedup_sql,
    _boilerplate_sql,
    _url_canon_sql,
    _pii_redact_sql,
    _badword_sql,
    _ann_lsh_sql,
    _inverted_index_sql,
    _dsir_sql,
    _pagerank_sql,
    _chunk_docs_sql,
    _host_cap_sql,
    _bpe_merges_sql,
    _bpe_token_counts_sql,
    _incremental_dedup_sql,
    _embedding_drift_sql,
    _media_dhash_sql,
    _rollup_sql,
    _containment_sql,
    _jl_project_sql,
    _corpus_shuffle_sql,
    _laea_sql,
    _lang_confusion_sql,
    _bm25_sql,
    _hll_grouped_sql,
    _lang_temp_weights_sql,
    _snapshot_diff_sql,
    _triangle_sql,
    _media_frame_sample_sql,
    _media_resize_sql,
    _min_rect_sql,
    PROMO_WINDOWS,  # noqa: F401
    _interval_join_sql,
    _promo_intervals,
    _rfe_sql,
    _vote_predict_sql,
    _weighted_sample_sql,
    _orientation_sql,
    _minhash_pairs_sql,
    _ms_acwe_sql,
    _ms_gac_sql,
    _ms_toposnakes_sql,
    _polygonize_edges_sql,
    _polygonize_tiles_sql,
    _ragmerge_sql,
    _ransac_lines_sql,
    _bloom_semi_sql,
    _cms_counts_sql,
    _hist_quantiles_sql,
    _remove_small_objects_sql,
    _rf_oob_sql,
    _simhash_pairs_sql,
    _snake_sql,
    _utm_sql,
    _warp_utm_sql,
    _pq_topk_sql,
    _dedup_apply_sql,
    _dup_span_sql,
    _bow_logistic_sql,
)

def oracle_sql() -> dict[str, str]:
    return {
        "extract_text": f"WITH {pages_sql()} SELECT url, text FROM pages",
        "url_dedup_keep_latest": (
            f"WITH {pages_sql(with_dups=True)} "
            "SELECT url, warc_ts, lang FROM ("
            "  SELECT url, warc_ts, lang, ROW_NUMBER() OVER (PARTITION BY url ORDER BY warc_ts DESC) rn FROM pages"
            ") WHERE rn = 1"
        ),
        "stratified_sample": (
            # id-hash stratified sampling: splitmix64(doc_id) % 1e6 under a
            # per-stratum integer threshold (the data-mixing weights)
            "SELECT doc_id, lang FROM ("
            + _sg.chain("SELECT doc_id, lang FROM documents",
                        _sg.splitmix64_steps("doc_id", "smv", "mix"))
            + ") WHERE CAST(smv % 1000000 AS BIGINT) < CASE lang "
            + " ".join(f"WHEN '{k}' THEN {int(round(r * 1_000_000))}" for k, r in _MIX_RATES.items())
            + " ELSE 1000000 END"
        ),
        "pack_sequences": (
            # concat-and-chunk packing: exclusive prefix over doc_id order
            "WITH t AS (SELECT doc_id, len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens FROM documents), "
            "p AS (SELECT doc_id, n_tokens, "
            "  CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS prefix "
            "  FROM t) "
            "SELECT doc_id, n_tokens, prefix, prefix // 2048 AS seq_id, prefix % 2048 AS offset_in_seq FROM p"
        ),
        "decontaminate_docs": (
            # GPT-3-style 8-gram eval-overlap check; DuckDB list slice
            # t[a:b] is 1-based inclusive → 8 tokens per gram
            "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents), "
            "pos AS (SELECT doc_id, t, unnest(range(0, GREATEST(len(t) - 7, 0))) AS p FROM toks), "
            "gr AS (SELECT doc_id, array_to_string(t[p+1:p+8], ' ') AS g8 FROM pos), "
            "ev AS (SELECT DISTINCT g8 FROM gr WHERE doc_id % 100 = 0), "
            "tg AS (SELECT DISTINCT doc_id, g8 FROM gr WHERE doc_id % 100 <> 0), "
            "c AS (SELECT tg.doc_id, COUNT(*) AS nc FROM tg JOIN ev USING (g8) GROUP BY 1), "
            "ngr AS (SELECT doc_id, COUNT(*) AS ng FROM tg GROUP BY 1) "
            "SELECT d.doc_id, COALESCE(ngr.ng, 0)::BIGINT AS n_grams, "
            "COALESCE(c.nc, 0)::BIGINT AS n_contaminated, "
            "(CASE WHEN COALESCE(c.nc, 0) > 0 THEN 1 ELSE 0 END)::BIGINT AS contaminated "
            "FROM documents d LEFT JOIN ngr USING (doc_id) LEFT JOIN c USING (doc_id) "
            "WHERE d.doc_id % 100 <> 0"
        ),
        "repetition_scores": (
            # Gopher dup/top n-gram fractions: explode token positions,
            # 1-based list indexing builds the n-gram keys; every fraction
            # is a ratio of exact integers
            "WITH toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents), "
            "p2 AS (SELECT doc_id, t, unnest(range(0, GREATEST(len(t) - 1, 0))) AS p FROM toks), "
            "bi AS (SELECT doc_id, t[p+1] || ' ' || t[p+2] AS g FROM p2), "
            "bc AS (SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY 1, 2), "
            "b2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS tot, COUNT(*) AS dis, MAX(c) AS mx FROM bc GROUP BY 1), "
            "p3 AS (SELECT doc_id, t, unnest(range(0, GREATEST(len(t) - 2, 0))) AS p FROM toks), "
            "tri AS (SELECT doc_id, t[p+1] || ' ' || t[p+2] || ' ' || t[p+3] AS g FROM p3), "
            "tc AS (SELECT doc_id, g, COUNT(*) AS c FROM tri GROUP BY 1, 2), "
            "t3 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS tot, COUNT(*) AS dis, MAX(c) AS mx FROM tc GROUP BY 1) "
            "SELECT d.doc_id, len(tk.t)::BIGINT AS n_tokens, "
            "ROUND(CASE WHEN b2.tot > 0 THEN CAST(b2.tot - b2.dis AS DOUBLE)/CAST(b2.tot AS DOUBLE) ELSE 0.0 END, 6) AS dup_2gram_frac, "
            "ROUND(CASE WHEN b2.tot > 0 THEN CAST(b2.mx AS DOUBLE)/CAST(b2.tot AS DOUBLE) ELSE 0.0 END, 6) AS top_2gram_frac, "
            "ROUND(CASE WHEN t3.tot > 0 THEN CAST(t3.tot - t3.dis AS DOUBLE)/CAST(t3.tot AS DOUBLE) ELSE 0.0 END, 6) AS dup_3gram_frac, "
            "ROUND(CASE WHEN t3.tot > 0 THEN CAST(t3.mx AS DOUBLE)/CAST(t3.tot AS DOUBLE) ELSE 0.0 END, 6) AS top_3gram_frac "
            "FROM documents d JOIN toks tk USING (doc_id) "
            "LEFT JOIN b2 USING (doc_id) LEFT JOIN t3 USING (doc_id)"
        ),
        "token_counts": (
            "SELECT doc_id, len(regexp_extract_all(text, '\\S+'))::BIGINT AS ws_tokens, "
            "len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]'))::BIGINT AS bpe_tokens "
            "FROM documents"
        ),
        "corpus_prep_docs": (
            "WITH qd AS (SELECT doc_id, text, lang FROM ("
            "  SELECT doc_id, text, lang, length(text)::BIGINT AS n_chars, "
            f"  {_QUALITY_PUNCT}::DOUBLE / GREATEST(length(text), 1) AS punct_ratio, "
            f"  {_QUALITY_STOP}::DOUBLE / {_QUALITY_WS} AS stop_ratio "
            "  FROM documents) "
            "  WHERE ROUND(0.4 * LEAST(n_chars / 500.0, 1.0) + 0.3 * LEAST(stop_ratio * 5.0, 1.0) "
            "        + 0.3 * (1.0 - LEAST(punct_ratio * 10.0, 1.0)), 4) >= CAST(0.5 AS DOUBLE)), "
            "dd AS (SELECT doc_id, text, lang FROM qd "
            "  WHERE doc_id IN (SELECT MIN(doc_id) FROM qd GROUP BY text)), "
            "sm AS (SELECT doc_id, text, lang FROM ("
            + _sg.chain("SELECT doc_id, text, lang FROM dd",
                        _sg.splitmix64_steps("doc_id", "smv", "cp"))
            + ") WHERE CAST(smv % 1000000 AS BIGINT) < CASE lang "
            + " ".join(f"WHEN '{k}' THEN {int(round(r * 1_000_000))}" for k, r in _MIX_RATES.items())
            + " ELSE 1000000 END), "
            "t AS (SELECT doc_id, lang, len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens FROM sm), "
            "p AS (SELECT doc_id, lang, n_tokens, "
            "  CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS prefix FROM t) "
            "SELECT doc_id, lang, n_tokens, prefix, prefix // 2048 AS seq_id, "
            "prefix % 2048 AS offset_in_seq FROM p"
        ),
        "quality_pct_by_lang": (
            "WITH t AS (SELECT doc_id, lang, length(text)::BIGINT AS n_chars, "
            f"  {_QUALITY_PUNCT}::DOUBLE / GREATEST(length(text), 1) AS punct_ratio, "
            f"  {_QUALITY_STOP}::DOUBLE / {_QUALITY_WS} AS stop_ratio "
            "  FROM documents), "
            "q AS (SELECT doc_id, lang, "
            "  ROUND(0.4 * LEAST(n_chars / 500.0, 1.0) + 0.3 * LEAST(stop_ratio * 5.0, 1.0) "
            "        + 0.3 * (1.0 - LEAST(punct_ratio * 10.0, 1.0)), 4) AS quality FROM t) "
            "SELECT doc_id, lang, quality, "
            "ROUND(CASE WHEN nl > 1 THEN CAST(rk - 1 AS DOUBLE) / (nl - 1) "
            "      ELSE CAST(0 AS DOUBLE) END, 6) AS pct_rank FROM ("
            "  SELECT doc_id, lang, quality, "
            "  RANK() OVER (PARTITION BY lang ORDER BY quality) AS rk, "
            "  COUNT(*) OVER (PARTITION BY lang) AS nl FROM q)"
        ),
        "quality_scores": (
            "WITH t AS (SELECT doc_id, length(text)::BIGINT AS n_chars, "
            f"  {_QUALITY_PUNCT}::DOUBLE / GREATEST(length(text), 1) AS punct_ratio, "
            f"  {_QUALITY_STOP}::DOUBLE / {_QUALITY_WS} AS stop_ratio, "
            f"  GREATEST(length(text) - ({_QUALITY_WS} - 1), 0)::DOUBLE / {_QUALITY_WS} AS mean_tok_len "
            "  FROM documents) "
            "SELECT doc_id, n_chars, ROUND(punct_ratio, 4) AS punct_ratio, ROUND(stop_ratio, 4) AS stop_ratio, "
            "ROUND(mean_tok_len, 4) AS mean_tok_len, "
            "ROUND(0.4 * LEAST(n_chars / 500.0, 1.0) + 0.3 * LEAST(stop_ratio * 5.0, 1.0) "
            "      + 0.3 * (1.0 - LEAST(punct_ratio * 10.0, 1.0)), 4) AS quality FROM t"
        ),
        "exact_text_dedup": "SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text",
        "zonal_stats_lineitem": (
            "SELECT l_returnflag, l_linestatus, COUNT(*)::BIGINT AS count, "
            "ROUND(SUM(l_quantity), 4) AS sum_l_quantity, ROUND(AVG(l_quantity), 4) AS mean_l_quantity, "
            "ROUND(MIN(l_quantity), 4) AS min_l_quantity, ROUND(MAX(l_quantity), 4) AS max_l_quantity, "
            "ROUND(STDDEV_SAMP(l_quantity), 4) AS std_l_quantity "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "zonal_frac_orders": (
            "SELECT o_orderpriority, o_orderstatus, COUNT(*)::BIGINT AS n, "
            "ROUND(COUNT(*)::DOUBLE / SUM(COUNT(*)) OVER (PARTITION BY o_orderpriority), 6) AS frac "
            "FROM orders GROUP BY o_orderpriority, o_orderstatus"
        ),
        "date_filter_events": (
            "SELECT event_id, ts, event_type, value FROM events "
            f"WHERE ts >= TIMESTAMP '{EVENTS_LO}' AND ts < TIMESTAMP '{EVENTS_HI}'"
        ),
        "topk_users_by_events": (
            "SELECT user_id, COUNT(*)::BIGINT AS n FROM events GROUP BY user_id "
            "ORDER BY n DESC, user_id ASC LIMIT 10"
        ),
        "distinct_langs": "SELECT DISTINCT lang FROM documents",
        "classify_lineitem": _SCORER_SQL,
        "rmse_lineitem": (
            "SELECT ROUND(SQRT(SUM(POW(l_extendedprice * (1 - l_discount) "
            "- l_extendedprice * (1 - l_discount) * (1 + l_tax), 2)) / COUNT(*)), 4) AS rmse FROM lineitem"
        ),
        "join_orders_customer": (
            "SELECT o_orderkey, o_totalprice, c_name, c_mktsegment FROM orders "
            "JOIN customer ON o_custkey = c_custkey"
        ),
        "revenue_by_segment": (
            "SELECT c_mktsegment, COUNT(*)::BIGINT AS count, ROUND(SUM(o_totalprice), 2) AS sum_o_totalprice "
            "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
        ),
        "topk_parts": (
            "SELECT p_partkey, p_retailprice FROM part ORDER BY p_retailprice DESC, p_partkey ASC LIMIT 10"
        ),
        "anti_join_customers": (
            "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN "
            f"(SELECT o_custkey FROM orders WHERE o_totalprice > {LARGE_ORDER})"
        ),
        "semi_join_customers": (
            "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN "
            f"(SELECT o_custkey FROM orders WHERE o_totalprice > {LARGE_ORDER})"
        ),
        "hopping_window_events": (
            "SELECT event_type, win_start, COUNT(*)::BIGINT AS count, "
            "ROUND(SUM(value), 4) AS sum_value FROM ("
            "  SELECT event_type, date_trunc('hour', ts) "
            "    - to_microseconds(k.range * 3600000000) AS win_start, value "
            "  FROM events, range(0, 2) k) "
            "GROUP BY event_type, win_start"
        ),
        "window_events": (
            "SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*)::BIGINT AS count, "
            "ROUND(SUM(value), 4) AS sum_value FROM events GROUP BY event_type, date_trunc('hour', ts)"
        ),
        "zonal_median_lineitem": (
            "SELECT l_returnflag, l_linestatus, "
            "ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_l_quantity, "
            "ROUND(quantile_cont(l_quantity, 0.95), 4) AS percentile_l_quantity "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "sessionize_events": (
            "WITH s AS (SELECT user_id, ts, CASE WHEN LAG(ts) OVER w IS NULL "
            "  OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s "
            "  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "t AS (SELECT user_id, ts, CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts "
            "  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM s) "
            "SELECT user_id, session_id, COUNT(*)::BIGINT AS n_events, "
            "MIN(ts) AS session_start, MAX(ts) AS session_end FROM t GROUP BY user_id, session_id"
        ),
        "asof_join_events": (
            "SELECT e.event_id, e.user_id, e.ts, "
            "(SELECT r.value FROM events r WHERE r.user_id = e.user_id AND r.event_type = 'purchase' "
            " AND r.ts <= e.ts ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) AS asof_value "
            "FROM events e WHERE e.event_type = 'view'"
        ),
        "revenue_by_nation": (
            "SELECT n_name, COUNT(*)::BIGINT AS count, ROUND(SUM(o_totalprice), 2) AS sum_o_totalprice "
            "FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY n_name"
        ),
        "parts_above_avg": (
            "SELECT p_partkey, p_retailprice FROM part "
            "WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)"
        ),
        "zonal_stats_multi": (
            # price as exact integer cents (see _q_zonal_stats_multi): the
            # half-away rounding of x*100 is tie-free (stored cents land
            # within 1e-9 of integers) and the int sums are order-exact
            "WITH c AS (SELECT l_returnflag, l_quantity, "
            "  CAST(FLOOR(ABS(l_extendedprice*100.0) + 0.5)*SIGN(l_extendedprice) AS BIGINT) AS l_price_cents "
            "  FROM lineitem) "
            "SELECT l_returnflag, COUNT(l_quantity)::BIGINT AS count_l_quantity, "
            "ROUND(AVG(l_quantity), 4) AS mean_l_quantity, ROUND(STDDEV_SAMP(l_quantity), 4) AS std_l_quantity, "
            "ROUND(CAST(SUM(l_price_cents) AS DOUBLE), 4) AS sum_l_price_cents, "
            "ROUND(CAST(SUM(l_price_cents) AS DOUBLE)/COUNT(l_price_cents), 4) AS mean_l_price_cents, "
            "ROUND(CAST(MAX(l_price_cents) AS DOUBLE), 4) AS max_l_price_cents "
            "FROM c GROUP BY l_returnflag"
        ),
        "train_linear_lineitem": (
            "WITH s AS (SELECT COUNT(*)::DOUBLE n, SUM(l_quantity) sx, SUM(l_extendedprice) sy, "
            "SUM(l_quantity*l_quantity) sxx, SUM(l_quantity*l_extendedprice) sxy FROM lineitem) "
            "SELECT ROUND((n*sxy - sx*sy)/(n*sxx - sx*sx), 6) AS slope, "
            "ROUND((sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n, 6) AS intercept FROM s"
        ),
        "regression_metrics_lineitem": (
            "WITH s AS (SELECT COUNT(*)::DOUBLE n, SUM(l_quantity) sx, SUM(l_extendedprice) sy, "
            "  SUM(l_quantity*l_quantity) sxx, SUM(l_quantity*l_extendedprice) sxy FROM lineitem), "
            "w AS (SELECT ROUND((n*sxy - sx*sy)/(n*sxx - sx*sx), 6) AS slope, "
            "  ROUND((sy - (n*sxy - sx*sy)/(n*sxx - sx*sx)*sx)/n, 6) AS intercept FROM s), "
            "p AS (SELECT l_extendedprice AS y, intercept + slope*l_quantity AS pred FROM lineitem, w), "
            "m AS (SELECT COUNT(*)::DOUBLE n, SUM(y) sy, SUM(y*y) syy, "
            "  SUM(ABS(y - pred)) sae, SUM((y - pred)*(y - pred)) sse FROM p) "
            "SELECT ROUND(1 - sse/(syy - sy*sy/n), 2) AS r2, ROUND(sae/n, 2) AS mae, "
            "ROUND(sse/n, 2) AS mse, ROUND(SQRT(sse/n), 2) AS rmse FROM m"
        ),
        "ridge_param_scan": (
            "WITH tr AS (SELECT COUNT(*)::DOUBLE n, SUM(l_quantity) sx, SUM(l_extendedprice) sy, "
            "  SUM(l_quantity*l_quantity) sxx, SUM(l_quantity*l_extendedprice) sxy "
            "  FROM lineitem WHERE l_orderkey % 5 <> 0), "
            "va AS (SELECT COUNT(*)::DOUBLE n, SUM(l_quantity) sx, SUM(l_extendedprice) sy, "
            "  SUM(l_quantity*l_quantity) sxx, SUM(l_quantity*l_extendedprice) sxy, "
            "  SUM(l_extendedprice*l_extendedprice) syy FROM lineitem WHERE l_orderkey % 5 = 0), "
            f"grid(lam) AS (VALUES {', '.join(f'(CAST({v!r} AS DOUBLE))' for v in RIDGE_LAMBDAS)}), "
            "w AS (SELECT lam, "
            "  (tr.sy*(tr.sxx + lam) - tr.sx*tr.sxy)/(tr.n*(tr.sxx + lam) - tr.sx*tr.sx) AS w0u, "
            "  (tr.n*tr.sxy - tr.sx*tr.sy)/(tr.n*(tr.sxx + lam) - tr.sx*tr.sx) AS w1u "
            "  FROM grid, tr) "
            "SELECT lam, "
            "ROUND((va.syy - 2*(w0u*va.sy + w1u*va.sxy) "
            "  + (w0u*w0u*va.n + 2*w0u*w1u*va.sx + w1u*w1u*va.sxx))/va.n, 2) AS val_mse, "
            "ROUND(w0u, 6) AS w0, ROUND(w1u, 6) AS w1 FROM w, va"
        ),
        "classify_proba_lineitem": (
            "WITH z AS (SELECT l_orderkey, l_linenumber, "
            f"  0.0002*l_quantity + 0.0001*l_extendedprice + -0.05*l_discount + 0.03*l_tax "
            f"  + {PROBA_INTERCEPT!r} AS zz FROM lineitem) "
            "SELECT l_orderkey, l_linenumber, ROUND(1/(1 + EXP(-zz)), 6) AS proba_1, "
            "ROUND(1 - 1/(1 + EXP(-zz)), 6) AS proba_0, "
            "CASE WHEN 1/(1 + EXP(-zz)) > 0.5 THEN 1 ELSE 0 END AS pred FROM z"
        ),
        "shape_props": _shape_props_sql(),
        "wkb_to_geojson": _wkb_to_geojson_sql(),
        # ---- hash / geocode / cell family (functions/sqlgen.py) -----------
        "train_test_split": (
            "SELECT doc_id, CASE WHEN _h % 10000 < 2500 THEN 'test' ELSE 'train' END AS split FROM ("
            + _sg.chain(
                "SELECT doc_id, CAST(doc_id AS VARCHAR) AS _k FROM documents",
                [
                    ("_fh", _sg.fnv1a64_expr("_k")),
                    ("_fx", _sg.u64_xor("_fh", str(int(_smx(np.array([1], np.uint64))[0])))),
                    *_sg.splitmix64_steps("_fx", "_h", "h"),
                ],
            )
            + ")"
        ),
        "geocode_cells": (
            f"WITH {pages_sql()}, {_sg.s2_lookup_sql()} "
            "SELECT url, ROUND(lon, 6) AS lon, ROUND(lat, 6) AS lat, "
            "cell_h3_r5, cell_h3_r7, cell_h3_r9, cell_s2_l12 "
            f"FROM ({_located_sql((5, 7, 9), s2=True)})"
        ),
        "reproject_points": (
            f"WITH {pages_sql()} "
            "SELECT url, "
            f"ROUND(lon * {float(np.radians(1.0))!r} * 6378137.0, 3) AS merc_x, "
            f"ROUND(LN(TAN({float(np.pi / 4.0)!r} + "
            f"  LEAST(GREATEST(lat, -85.05112878), 85.05112878) * {float(np.radians(1.0))!r} / 2.0)) "
            "  * 6378137.0, 3) AS merc_y "
            f"FROM ({_located_sql()})"
        ),
        "point_raster_lookup": (
            f"WITH {pages_sql()}, {tiles_sql(32)}, "
            f"pt AS (SELECT url, lon, lat FROM ({_located_sql()})), "
            "px0 AS (SELECT url, lon, lat, "
            "  LEAST(GREATEST(CAST(TRUNC((lon - -180.0)/5.625) AS BIGINT), 0), 63) AS tx, "
            "  LEAST(GREATEST(CAST(TRUNC((lat - -80.0)/5.0) AS BIGINT), 0), 31) AS ty FROM pt), "
            "px1 AS (SELECT url, tx, ty, "
            "  LEAST(GREATEST(CAST(TRUNC((lon - (-180.0 + tx*5.625)) / 5.625 * 32) AS BIGINT), 0), 31) AS ppx, "
            "  LEAST(GREATEST(CAST(TRUNC((lat - (-80.0 + ty*5.0)) / 5.0 * 32) AS BIGINT), 0), 31) AS ppy FROM px0) "
            "SELECT p.url, ROUND(r.vd, 6) AS value FROM px1 p JOIN rast r "
            "ON r.tile_x = p.tx AND r.tile_y = p.ty AND r.px = p.ppx AND r.py = p.ppy"
        ),
        "hex_meshgrid": f"WITH {pages_sql()} {_hex_meshgrid_sql()}",
        "pip_join_rows": (
            f"WITH {pages_sql()}, {polygons_sql()} "
            f"SELECT url, feature_id FROM ({_located_sql()}) loc JOIN polys p ON {pip_sql('loc.lon', 'loc.lat')}"
        ),
        "pip_anti_rows": (
            f"WITH {pages_sql()}, {polygons_sql()} "
            f"SELECT url FROM ({_located_sql()}) loc WHERE NOT EXISTS "
            f"(SELECT 1 FROM polys WHERE {pip_sql('loc.lon', 'loc.lat')})"
        ),
        "tile_agg_cells": (
            f"WITH {pages_sql(with_dups=True)}, "
            "dd AS (SELECT url, length(text)::BIGINT AS n_chars FROM ("
            "  SELECT url, text, ROW_NUMBER() OVER (PARTITION BY url ORDER BY warc_ts DESC) rn FROM pages"
            ") WHERE rn = 1), "
            f"loc AS (SELECT url, n_chars, cell_h3_r7 FROM "
            f"  ({_located_sql((7,), base='SELECT url, n_chars FROM dd')})) "
            'SELECT cell_h3_r7, COUNT(*) AS "count", '
            "ROUND(AVG(n_chars), 6) AS mean_n_chars, "
            "ROUND(CAST(MIN(n_chars) AS DOUBLE), 6) AS min_n_chars, "
            "ROUND(CAST(MAX(n_chars) AS DOUBLE), 6) AS max_n_chars "
            "FROM loc GROUP BY cell_h3_r7"
        ),
        "knn_pages": _knn_pages_sql(),
        "hll_distinct_urls": (
            # the sketch itself is deterministic: splitmix64(fnv1a64(url))
            # registers, scatter-max, the published bias-corrected estimate
            f"WITH {pages_sql(with_dups=True)}, "
            "hx AS ("
            + _sg.chain("SELECT url FROM pages",
                        [("_fh", _sg.fnv1a64_expr("url")), *_sg.splitmix64_steps("_fh", "_h", "h")])
            + "), "
            "r AS (SELECT CAST(_h // 4503599627370496 AS BIGINT) AS idx, "
            "  LEAST(64 - CAST(FLOOR(LOG2(CAST((_h % 4503599627370496) * 4096 + 4095 AS DOUBLE))) AS BIGINT), 53) AS rank "
            "  FROM hx), "
            "regs AS (SELECT idx, MAX(rank) AS reg FROM r GROUP BY idx), "
            "f AS (SELECT g.range AS idx, COALESCE(regs.reg, 0) AS reg FROM range(0, 4096) g "
            "  LEFT JOIN regs ON g.range = regs.idx), "
            "s AS (SELECT SUM(POWER(CAST(2.0 AS DOUBLE), -reg)) AS ss, "
            "  COUNT(*) FILTER (WHERE reg = 0) AS zeros FROM f), "
            "e AS (SELECT CAST(0.7213 AS DOUBLE)/(CAST(1.0 AS DOUBLE) + CAST(1.079 AS DOUBLE)/4096) "
            "  * 4096 * 4096 / ss AS est, zeros FROM s) "
            "SELECT ROUND(CASE WHEN est <= 2.5*4096 AND zeros > 0 "
            "  THEN 4096 * LN(CAST(4096 AS DOUBLE)/zeros) ELSE est END, 1) AS approx_distinct_urls FROM e"
        ),
        "lang_id": _lang_id_sql(),
        "simhash_pairs": _simhash_pairs_sql(),
        "doc_fingerprints": _doc_fingerprints_sql(),
        "logistic_weights_lineitem": _logistic_weights_sql(),
        "minhash_pairs": _minhash_pairs_sql(),
        "jaccard_verified_pairs": _jaccard_verified_sql(),
        "dedup_components": _dedup_components_sql(),
        "embedding_dedup_pairs": _embedding_pairs_sql(),
        "rf_oob_scan": _rf_oob_sql(),
        "buffer_polygons": _buffer_polygons_sql(),
        "ann_ivf_topk": _ann_ivf_sql(),
        "polygonize_tiles": _polygonize_tiles_sql(),
        "remove_small_objects": _remove_small_objects_sql(),
        "reproject_points_utm": _utm_sql(),
        "cms_counts_events": _cms_counts_sql(),
        "warp_utm_tiles": _warp_utm_sql(),
        "bloom_semi_join_orders": _bloom_semi_sql(),
        "hist_quantiles_lineitem": _hist_quantiles_sql(),
        "utm_roundtrip": (
            f"WITH {pages_sql()} "
            "SELECT url, "
            "ROUND(CAST(CAST(lon AS REAL) AS DOUBLE), 4) AS lon_rt, "
            "ROUND(CAST(CAST(lat AS REAL) AS DOUBLE), 4) AS lat_rt "
            f"FROM ({_located_sql()})"
        ),
        "ragmerge_regions": _ragmerge_sql(),
        "polygonize_edges": _polygonize_edges_sql(),
        "ransac_lines_tiles": _ransac_lines_sql(),
        "hough_lines_tiles": _hough_lines_sql(),
        "canny_edges_tiles": _canny_sql(),
        "edt_proximity_tiles": _edt_sql(),
        "ms_acwe_tiles": _ms_acwe_sql(),
        "do_ac_tiles": _ms_acwe_sql(lambda1=1.0, lambda2=2.0, init="threshold", init_thresh=0.5),
        "ms_gac_tiles": _ms_gac_sql(),
        "snake_contours": _snake_sql(),
        "ms_toposnakes_tiles": _ms_toposnakes_sql(),
        "ann_ivf_store_topk": _ann_ivf_sql(),
        "ann_pq_topk": _pq_topk_sql(),
        "ann_pq_store_topk": _pq_topk_sql(),
        "dedup_apply_docs": _dedup_apply_sql(),
        "dup_span_docs": _dup_span_sql(),
        "bow_logistic_docs": _bow_logistic_sql(),
        "host_stats_pages": (
            f"WITH {pages_sql()} "
            "SELECT regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host, "
            "COUNT(*)::BIGINT AS n_pages, COUNT(DISTINCT lang)::BIGINT AS n_langs "
            "FROM pages GROUP BY host"
        ),
        "media_decode": _media_decode_sql(),
        "media_frame_sample": _media_frame_sample_sql(),
        "media_resize": _media_resize_sql(),
        "media_features": _media_features_sql(),
        "paragraph_dedup_docs": _paragraph_dedup_sql(),
        "boilerplate_docs": _boilerplate_sql(),
        "semdedup_vectors": _semdedup_sql(),
        "url_canonicalize_pages": _url_canon_sql(),
        "pii_redact_docs": _pii_redact_sql(),
        "badword_filter_docs": _badword_sql(),
        "ann_lsh_topk": _ann_lsh_sql(),
        "inverted_index_docs": _inverted_index_sql(),
        "dsir_weights_docs": _dsir_sql(),
        "pagerank_hosts": _pagerank_sql(),
        "chunk_docs": _chunk_docs_sql(),
        "host_cap_pages": _host_cap_sql(),
        "bpe_merges_docs": _bpe_merges_sql(),
        "bpe_token_counts_docs": _bpe_token_counts_sql(),
        "incremental_dedup_docs": _incremental_dedup_sql(),
        "embedding_drift_labels": _embedding_drift_sql(),
        "media_dhash_dedup": _media_dhash_sql(),
        "rollup_stats_docs": _rollup_sql(),
        "containment_pairs": _containment_sql(),
        "jl_project_vectors": _jl_project_sql(),
        "corpus_shuffle_order": _corpus_shuffle_sql(),
        "reproject_points_laea": _laea_sql(),
        "lang_confusion_docs": _lang_confusion_sql(),
        "bm25_topk_docs": _bm25_sql(BM25_QUERIES, k=10),
        "event_gaps_users": (
            "WITH d AS (SELECT user_id, epoch_us(ts) "
            "  - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap "
            "  FROM events) "
            "SELECT user_id, COUNT(*)::BIGINT AS n_events, "
            "COUNT(gap)::BIGINT AS n_gaps, SUM(gap)::BIGINT AS sum_gap_us, "
            "MIN(gap)::BIGINT AS min_gap_us, MAX(gap)::BIGINT AS max_gap_us, "
            "ROUND(CAST(SUM(gap) AS DOUBLE) / COUNT(gap), 6) AS mean_gap_us "
            "FROM d GROUP BY user_id HAVING COUNT(*) >= 2"),
        "hll_users_by_type": _hll_grouped_sql(),
        "kmv_users_by_type": _kmv_grouped_sql(),
        "kmv_overlap_event_types": _kmv_overlap_sql(),
        "pmi_bigrams_docs": _pmi_bigrams_sql(),
        "scd2_history_docs": _scd2_sql(),
        "crawl_frontier_pages": _crawl_frontier_sql(),
        "skyline_orders": _skyline_orders_sql(),
        "ab_test_events": _ab_test_sql(),
        "fuzzy_name_pairs_customer": _fuzzy_names_sql(),
        "idw_grid_pages": _idw_grid_sql(),
        "skeletonize_tiles": _skeletonize_sql(),
        "debounce_events": _debounce_sql(),
        "viewshed_tiles": _viewshed_sql(),
        "label_prop_hosts": _label_prop_sql(),
        "exact_median_lineitem": _exact_median_sql(),
        "mst_hosts": _mst_sql(),
        "pca_top1_embeddings": _pca_power_sql(),
        "tile_pyramid_tiles": _tile_pyramid_sql(),
        "pivot_events_users": _pivot_events_sql(),
        "hits_hosts": _hits_sql(),
        "contour_cells_tiles": _contour_cells_sql(),
        "media_scene_cuts": _scene_cuts_sql(),
        "sq8_encode_vectors": _sq8_sql(),
        "leverage_topk_lineitem": _leverage_sql(),
        "d8_directions_tiles": _d8_sql(),
        "flow_accum_tiles": _flow_accum_sql(),
        "interval_coverage_users": _interval_coverage_sql(),
        "kcore_hosts": _kcore_sql(),
        "haar_tiles": _haar_sql(),
        "watershed_basins_tiles": _watershed_sql(),
        "focal_majority_tiles": _focal_majority_sql(),
        "link_predict_hosts": _link_predict_sql(),
        "media_loudness": _loudness_sql(),
        "kfold_cv_lineitem": _kfold_cv_sql(),
        "bfs_depth_hosts": _bfs_depth_sql(),
        "variogram_tiles": _variogram_sql(),
        "moran_i_tiles": _moran_sql(),
        "getis_gi_tiles": _getis_sql(),
        "clustering_coeff_hosts": _clustering_sql(),
        "cost_distance_tiles": _cost_distance_sql(),
        "hyperanf_hosts": _hyperanf_sql(),
        "quadtree_cells_pages": _quadtree_sql(),
        "kriging_grid_pages": _kriging_sql(),
        "kn_perplexity_docs": _kn_perplexity_sql(),
        "theilsen_slopes_orders": _theilsen_sql(),
        "mann_kendall_orders": _mann_kendall_sql(),
        "terrain_indices_tiles": _terrain_indices_sql(),
        "acf_daily_orders": _acf_daily_sql(),
        "mad_outliers_events": _mad_outliers_sql(),
        "ams_f2_events": _ams_f2_sql(),
        "isotonic_orders": _isotonic_sql(),
        "naive_bayes_lang_docs": _naive_bayes_sql(),
        "gini_revenue_nation": _gini_sql(),
        "seasonal_decomp_orders": _seasonal_decomp_sql(),
        "dp_simplify_trajectories": _dp_simplify_sql(),
        "nb_confusion_docs": _nb_confusion_sql(),
        "sssp_hosts": _sssp_sql(),
        "kde_heat_grid_pages": _kde_grid_sql(),
        "benford_digits_orders": _benford_sql(),
        "kappa_nb_docs": _kappa_sql(),
        "label_centroid_cosine": _label_centroid_sql(),
        "assoc_rules_events": _assoc_rules_sql(),
        "markov_stationary_events": _markov_stationary_sql(),
        "twap_events": _twap_sql(),
        "rolling_zscore_events": _rolling_zscore_sql(),
        "rfm_tiles_customers": _rfm_sql(),
        "emerging_hotspots_pages": _emerging_hotspots_sql(),
        "media_phash_dedup": _media_phash_sql(),
        "convex_hull_hosts": _convex_hull_sql(),
        "capped_balance_users": _capped_balance_sql(),
        "psi_drift_orders": _psi_drift_sql(),
        "ewma_daily_orders": _ewma_daily_sql(),
        "readability_docs": _readability_sql(),
        "curvature_tiles": _curvature_sql(),
        "lbp_tiles": _lbp_sql(),
        "survival_gaps_users": _survival_gaps_sql(),
        "bootstrap_ci_orders": _bootstrap_ci_sql(),
        "snap_points_pages": f"WITH {pages_sql()}, {_snap_points_sql()}",
        "gbm_stumps_lineitem": _gbm_stumps_sql(),
        "zipf_fit_docs": _zipf_fit_sql(),
        "changepoint_daily_orders": _changepoint_daily_sql(),
        "cdc_chunks_docs": _cdc_chunks_sql(),
        "cube_stats_orders": _cube_stats_sql(),
        "single_linkage_hosts": _single_linkage_sql(),
        "g2_collocations_docs": _g2_collocations_sql(),
        "focal_median_tiles": _focal_median_sql(),
        "harris_corners_tiles": _harris_sql(),
        "twi_tiles": _twi_sql(),
        "traj_intersections_users": _traj_intersections_sql(),
        "closeness_hosts": _closeness_sql(),
        "rake_keywords_docs": _rake_sql(),
        "hough_circles_tiles": _hough_circles_sql(),
        "iforest_orders": _iforest_sql(),
        "media_spectrogram": _spectrogram_sql(),
        "seam_carve_tiles": _seam_carve_sql(),
        "sorted_neighborhood_docs": _sorted_neighborhood_sql(),
        "attribution_events": _attribution_sql(),
        "zorder_layout_pages": _zorder_layout_sql(),
        "rrf_fusion_docs": _rrf_fusion_sql(),
        "textrank_keywords_docs": _textrank_sql(),
        "als_round_events": _als_round_sql(),
        "jenks_breaks_nation": _jenks_sql(),
        "code_switch_docs": _code_switch_sql(),
        "source_overlap_docs": _source_overlap_sql(),
        "tasseled_cap_tiles": _tasseled_cap_sql(),
        "bilinear_resample_tiles": _bilinear_resample_sql(),
        "regex_funnel_events": _regex_funnel_sql(),
        "betweenness_hosts": _betweenness_sql(k_pivots=8),
        "mmr_rerank_vectors": _mmr_rerank_sql(),
        "oov_rate_docs": _oov_rate_sql(vocab_size=16),
        "postings_varint_docs": _postings_varint_sql(),
        "sieve_tiles": _sieve_sql(),
        "brovey_pansharpen_tiles": _brovey_sql(),
        "soundex_blocks_parts": _soundex_sql(),
        "profile_lineitem": _profile_sql(),
        "dq_checks_orders": _dq_checks_sql(),
        "tophat_tiles": _tophat_sql(),
        "hilbert_layout_pages": _hilbert_layout_sql(),
        "ks_test_orders": _ks_test_sql(),
        "mannwhitney_orders": _mannwhitney_sql(),
        "assortativity_hosts": _assortativity_sql(),
        "json_props_events": _json_props_sql(),
        "fellegi_sunter_parts": _fellegi_sunter_sql(),
        "ms_toposeg_tiles": _ms_toposeg_sql(),
        "wms_fetch_tiles": _wms_fetch_sql(WMS_ENDPOINT, WMS_LAYER),
        "phasecong_tiles": _phasecong_sql(),
        "gdb_convert_features": _gdb_sql(),
        "colour_thresh_tiles": _colour_thresh_sql(),
        "good_turing_docs": _good_turing_sql(),
        "zonemap_prune_lineitem": _zonemap_sql(),
        "ann_binary_topk": _ann_binary_sql(),
        "cart_tree_lineitem": _cart_depth2_sql(),
        "graph_coloring_hosts": _coloring_sql(),
        "ppr_hosts": _pagerank_sql(seed_mod=25),
        "integral_image_tiles": _integral_image_sql(),
        "clahe_tiles": _clahe_sql(),
        "spearman_lineitem": _spearman_sql(),
        "bearing_octants_users": _bearing_octants_sql(),
        "cuped_events": _cuped_sql(),
        "ktruss_hosts": _ktruss_sql(),
        "consistent_hash_pages": _consistent_hash_sql(),
        "ucb_replay_events": _ucb_replay_sql(),
        "ndcg_bm25_docs": _ndcg_sql(BM25_QUERIES, k=10),
        "phrase_search_docs": _phrase_search_sql(),
        "revenue_by_region": ("SELECT r_name, COUNT(*)::BIGINT AS count, ROUND(SUM(o_totalprice), 2) AS sum_o_totalprice FROM orders JOIN customer ON c_custkey = o_custkey JOIN nation ON n_nationkey = c_nationkey JOIN region ON r_regionkey = n_regionkey GROUP BY r_name"),
        "hopping_distinct_users": _hopping_distinct_sql(),
        "dataset_fingerprint_docs": _dataset_fingerprint_sql(),
        "matryoshka_overlap_vectors": _matryoshka_sql(),
        "incremental_stats_events": _incremental_stats_sql(),
        "gated_corpus_pages": f"WITH {pages_sql()}, " + _gated_corpus_sql(),
        "registry_pipeline_docs": _registry_pipeline_sql(),
        "ann_ivfpq_topk": _ivfpq_sql(),
        "rle_runs_orders": _rle_audit_sql(),
        "hex_rollup_pages": _hex_rollup_sql(),
        "learned_index_orders": _learned_index_sql(),
        "blocking_quality_parts": _blocking_quality_sql(),
        "rbo_snapshots_docs": _rbo_snapshots_sql(),
        "percolation_curve_hosts": _percolation_sql(),
        "jsonl_roundtrip_docs": ("SELECT doc_id, lang, source, text FROM documents"),
        "csv_roundtrip_lineitem": ("SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_returnflag, CAST(l_quantity AS BIGINT) AS qty, CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_cents FROM lineitem"),
        "tokenizer_fertility_docs": _tokenizer_fertility_sql(),
        "span_mask_docs": _span_mask_sql(),
        "cva_change_tiles": _cva_sql(),
        "vocab_growth_docs": _vocab_growth_sql(),
        "mi_lang_quality_docs": (
            "WITH t AS (SELECT lang, length(text)::BIGINT AS n_chars, "
            f"  {_QUALITY_PUNCT}::DOUBLE / GREATEST(length(text), 1) AS punct_ratio, "
            f"  {_QUALITY_STOP}::DOUBLE / {_QUALITY_WS} AS stop_ratio "
            "  FROM documents), "
            "q AS (SELECT lang, "
            "  ROUND(0.4 * LEAST(n_chars / 500.0, 1.0) + 0.3 * LEAST(stop_ratio * 5.0, 1.0) "
            "        + 0.3 * (1.0 - LEAST(punct_ratio * 10.0, 1.0)), 4) AS quality FROM t), "
            "bk AS (SELECT lang, LEAST(CAST(ROUND(quality * 10000, 0) AS BIGINT) // 2000, 4) AS bucket FROM q), "
            "c AS (SELECT lang, bucket, COUNT(*)::BIGINT AS n FROM bk GROUP BY lang, bucket), "
            "x AS (SELECT lang, bucket, n, "
            "  SUM(n) OVER (PARTITION BY lang) AS n_lang, "
            "  SUM(n) OVER (PARTITION BY bucket) AS n_bucket, "
            "  SUM(n) OVER () AS n_total FROM c) "
            "SELECT lang, CAST(bucket AS BIGINT) AS bucket, n, "
            "CAST(n_lang AS BIGINT) AS n_lang, CAST(n_bucket AS BIGINT) AS n_bucket, "
            "CAST(n_total AS BIGINT) AS n_total, "
            "CAST((CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)) * "
            "ln((CAST(n AS DOUBLE) / CAST(n_lang AS DOUBLE)) / "
            "(CAST(n_bucket AS DOUBLE) / CAST(n_total AS DOUBLE))) AS FLOAT) AS mi_term "
            "FROM x"
        ),
        "neyman_allocation_orders": (
            "WITH c AS (SELECT o_orderpriority AS st, COUNT(*) AS n, "
            "  SUM(CAST(CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)"
            "*SIGN(o_totalprice) AS BIGINT) AS HUGEINT)) AS s1, "
            "  SUM(CAST(CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)"
            "*SIGN(o_totalprice) AS BIGINT) AS HUGEINT) "
            "  * CAST(FLOOR(ABS(o_totalprice*100.0) + 0.5)"
            "*SIGN(o_totalprice) AS BIGINT)) AS s2 "
            "  FROM orders GROUP BY o_orderpriority), "
            # two-limb HUGEINT->DOUBLE: DuckDB's native cast composes the
            # 64-bit limbs with two roundings (1 ulp low vs numpy above 2^53);
            # hi*2^26 is an exact power-of-two scale, + lo rounds once.
            "e AS (SELECT st, n, SQRT(((CAST(s2 >> 26 AS DOUBLE) "
            "  * CAST(67108864 AS DOUBLE) + CAST(s2 & 67108863 AS DOUBLE)) "
            "  - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) "
            "  / (CAST(n AS DOUBLE) - 1.0)) AS sig FROM c), "
            "w AS (SELECT st, n, sig, CAST(n AS DOUBLE) * sig AS wt, "
            "  SUM(CAST(n AS DOUBLE) * sig) OVER (ORDER BY st "
            "  ROWS UNBOUNDED PRECEDING) AS cum FROM e), "
            "t AS (SELECT MAX(cum) AS total FROM w) "
            "SELECT st AS o_orderpriority, CAST(n AS BIGINT) AS n, "
            "sig AS sigma_cents, "
            "CAST(FLOOR(ABS(wt / t.total * CAST(1000 AS DOUBLE)) + 0.5)"
            "*SIGN(wt) AS BIGINT) AS alloc FROM w, t"
        ),
        "cusum_hourly_events": (
            "WITH h AS (SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour, "
            "  CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1), "
            "b AS (SELECT MIN(hour) AS h0, MAX(hour) AS h1, "
            "  CAST(SUM(c) AS BIGINT) AS n, "
            "  CAST(MAX(hour) - MIN(hour) + 1 AS BIGINT) AS t FROM h), "
            "hs AS MATERIALIZED (SELECT unnest(generate_series(h0, h1)) AS hour "
            "  FROM b), "
            "f AS (SELECT hs.hour, COALESCE(h.c, 0) AS c FROM hs "
            "  LEFT JOIN h ON h.hour = hs.hour), "
            "p AS (SELECT f.hour, f.c, b.n, SUM(b.t * f.c - b.n) OVER "
            "  (ORDER BY f.hour ROWS UNBOUNDED PRECEDING) AS pf FROM f, b), "
            "s AS (SELECT hour, c, n, pf - MIN(pf) OVER (ORDER BY hour "
            "  ROWS UNBOUNDED PRECEDING) AS cus FROM p) "
            "SELECT hour, c, CAST(cus AS BIGINT) AS cusum, "
            "CAST(CASE WHEN cus > n // 4 THEN 1 ELSE 0 END AS BIGINT) AS alarm "
            "FROM s"
        ),
        "segment_slopes_orders": (
            "WITH j AS (SELECT c.c_mktsegment AS seg, "
            "  CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS day, "
            "  CAST(FLOOR(ABS(o.o_totalprice*100.0) + 0.5)*SIGN(o.o_totalprice) "
            "  AS BIGINT) AS cents "
            "  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey), "
            "s AS (SELECT seg, COUNT(*) AS n, SUM(CAST(day AS HUGEINT)) AS sx, "
            "  SUM(CAST(cents AS HUGEINT)) AS sy, "
            "  SUM(CAST(day AS HUGEINT) * day) AS sxx, "
            "  SUM(CAST(day AS HUGEINT) * cents) AS sxy FROM j GROUP BY seg), "
            "e AS (SELECT seg, n, "
            "  CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
            "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num, "
            "  CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
            "  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den, "
            "  CAST(sx AS DOUBLE) AS sxf, CAST(sy AS DOUBLE) AS syf FROM s) "
            "SELECT seg AS c_mktsegment, CAST(n AS BIGINT) AS n, "
            "num / den AS slope_cents_per_day, "
            "(syf - (num / den) * sxf) / CAST(n AS DOUBLE) AS intercept_cents "
            "FROM e"
        ),
        "event_transitions_users": (
            "WITH o AS (SELECT user_id, event_type, "
            "  CAST(epoch_us(ts) AS BIGINT) AS u, event_id FROM events), "
            "t AS (SELECT event_type AS b, LAG(event_type) OVER ("
            "  PARTITION BY user_id ORDER BY u, event_id) AS a FROM o) "
            "SELECT a AS from_type, b AS to_type, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(COUNT(*) AS DOUBLE) / CAST(SUM(COUNT(*)) OVER "
            "  (PARTITION BY a) AS DOUBLE) AS frac "
            "FROM t WHERE a IS NOT NULL GROUP BY a, b"
        ),
        "calibration_bins_lineitem": (
            "WITH z AS (SELECT l_returnflag, "
            f"  0.0002*l_quantity + 0.0001*l_extendedprice + -0.05*l_discount + 0.03*l_tax "
            f"  + {PROBA_INTERCEPT!r} AS zz FROM lineitem), "
            "p AS (SELECT ROUND(1/(1 + EXP(-zz)), 6) AS pr, "
            "  CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM z), "
            "b AS (SELECT LEAST(CAST(FLOOR(pr * 10.0) AS BIGINT), 9) AS bin, "
            "  CAST(FLOOR(ABS(pr * 1000000.0) + 0.5) AS BIGINT) AS pq, y FROM p) "
            "SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(y) AS BIGINT) AS n_pos, "
            "CAST(SUM(CAST(pq AS HUGEINT)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) "
            "/ CAST(1000000 AS DOUBLE) AS mean_pred, "
            "CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS frac_pos "
            "FROM b GROUP BY bin"
        ),
        "roc_auc_quality_docs": (
            "WITH t AS (SELECT lang, length(text)::BIGINT AS n_chars, "
            f"  {_QUALITY_PUNCT}::DOUBLE / GREATEST(length(text), 1) AS punct_ratio, "
            f"  {_QUALITY_STOP}::DOUBLE / {_QUALITY_WS} AS stop_ratio "
            "  FROM documents), "
            "q AS (SELECT lang, CAST(FLOOR(ROUND("
            "  0.4 * LEAST(n_chars / 500.0, 1.0) + 0.3 * LEAST(stop_ratio * 5.0, 1.0) "
            "  + 0.3 * (1.0 - LEAST(punct_ratio * 10.0, 1.0)), 4) * 10000.0 + 0.5) "
            "  AS BIGINT) AS sq FROM t), "
            "s AS (SELECT sq, COUNT(*) AS n, "
            "  SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS np FROM q GROUP BY sq), "
            "c AS (SELECT sq, n, np, COALESCE(SUM(n) OVER (ORDER BY sq "
            "  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM s), "
            "e AS (SELECT SUM(np * (2 * cb + n + 1)) AS sr, SUM(np) AS p, "
            "  SUM(n) AS tot FROM c) "
            "SELECT CAST(p AS BIGINT) AS n_pos, CAST(tot - p AS BIGINT) AS n_neg, "
            "CAST(sr - p * (p + 1) AS BIGINT) AS u2, "
            "CAST(sr - p * (p + 1) AS DOUBLE) / CAST(2 * p * (tot - p) AS DOUBLE) AS auc "
            "FROM e"
        ),
        "lang_temp_weights": _lang_temp_weights_sql(),
        "char_entropy_docs": (
            "WITH ch AS MATERIALIZED (SELECT doc_id, "
            "  unnest(string_split(text, '')) AS ch FROM documents), "
            "c AS (SELECT doc_id, ch, COUNT(*)::BIGINT AS c FROM ch "
            "  WHERE ch <> '' GROUP BY doc_id, ch), "
            "n AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM ch "
            "  WHERE ch <> '' GROUP BY doc_id), "
            "t AS (SELECT c.doc_id, n.n, CAST(CAST("
            "  -((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) "
            "  AS REAL) AS DOUBLE) AS t FROM c JOIN n USING (doc_id)) "
            "SELECT doc_id, n AS n_chars, ROUND(SUM(t), 6) AS entropy "
            "FROM t GROUP BY doc_id, n"),
        "late_events_watermark": (
            "WITH " + _delayed_events_sql() + ", "
            "w AS (SELECT event_id, etime_us, COALESCE(MAX(etime_us) OVER ("
            "  ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), "
            "  etime_us) AS pmax FROM delayed) "
            "SELECT event_id, pmax - 300000000 AS watermark_us, "
            "CAST(CASE WHEN etime_us < pmax - 300000000 THEN 1 ELSE 0 END AS BIGINT) "
            "AS is_late FROM w"),
        "snapshot_diff_docs": _snapshot_diff_sql(),
        "triangle_count_hosts": _triangle_sql(),
        "trimmed_stats_lineitem": (
            "WITH v AS (SELECT l_returnflag, l_linestatus, "
            "  CAST(FLOOR(ABS(l_extendedprice*100.0) + 0.5)*SIGN(l_extendedprice) AS BIGINT) AS c "
            "  FROM lineitem), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY l_returnflag, l_linestatus "
            "    ORDER BY c) AS rn, "
            "  COUNT(*) OVER (PARTITION BY l_returnflag, l_linestatus) AS n FROM v), "
            "b AS (SELECT l_returnflag, l_linestatus, ANY_VALUE(n) AS n, "
            "  n - 2*(n//10) AS m, "
            "  MAX(CASE WHEN rn = n//10 + 1 THEN c END) AS lo, "
            "  MAX(CASE WHEN rn = n - n//10 THEN c END) AS hi, "
            "  SUM(CASE WHEN rn > n//10 AND rn <= n - n//10 THEN c ELSE 0 END) AS tsum "
            "  FROM r GROUP BY l_returnflag, l_linestatus, n - 2*(n//10) "
            "  HAVING n - 2*(n//10) > 0), "
            "w AS (SELECT r.l_returnflag, r.l_linestatus, "
            "  SUM(LEAST(GREATEST(r.c, b.lo), b.hi)) AS wsum "
            "  FROM r JOIN b ON r.l_returnflag = b.l_returnflag "
            "  AND r.l_linestatus = b.l_linestatus "
            "  GROUP BY r.l_returnflag, r.l_linestatus) "
            "SELECT b.l_returnflag, b.l_linestatus, b.n::BIGINT AS n, "
            "b.m::BIGINT AS n_kept, "
            "ROUND(CAST(b.tsum AS DOUBLE) / (b.m * 100), 6) AS trimmed_mean, "
            "ROUND(CAST(w.wsum AS DOUBLE) / (b.n * 100), 6) AS winsor_mean "
            "FROM b JOIN w ON b.l_returnflag = w.l_returnflag "
            "AND b.l_linestatus = w.l_linestatus"),
        "robots_blocked_pages": (
            f"WITH {pages_sql(cols='url')}, "
            "hp AS (SELECT url, regexp_extract(url, '^https?://([^/]+)(/.*)?$', 1) AS host, "
            "  COALESCE(NULLIF(regexp_extract(url, '^https?://([^/]+)(/.*)?$', 2), ''), '/') AS path "
            "  FROM pages) "
            "SELECT url, CAST(CASE "
            "  WHEN host = 'site-7.example' AND starts_with(path, '/') THEN 0 "
            "  WHEN starts_with(path, '/src3/') THEN 1 "
            "  WHEN host = 'site-13.example' AND starts_with(path, '/src1') THEN 2 "
            "  END AS BIGINT) AS rule_id "
            "FROM hp WHERE host = 'site-7.example' "
            "OR starts_with(path, '/src3/') "
            "OR (host = 'site-13.example' AND starts_with(path, '/src1'))"),
        "daily_users_events": (
            "WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events), "
            "fd AS (SELECT user_id, MIN(day) AS first_day FROM e GROUP BY user_id), "
            "ad AS (SELECT day, COUNT(DISTINCT user_id)::BIGINT AS active_users "
            "  FROM e GROUP BY day), "
            "nd AS (SELECT first_day AS day, COUNT(*)::BIGINT AS new_users "
            "  FROM fd GROUP BY first_day), "
            "ev AS (SELECT CAST(ts AS DATE) AS day, COUNT(*)::BIGINT AS n_events "
            "  FROM events GROUP BY day) "
            "SELECT STRFTIME(ev.day, '%Y-%m-%d') AS day, n_events, active_users, "
            "COALESCE(new_users, 0) AS new_users, "
            "active_users - COALESCE(new_users, 0) AS returning_users, "
            "CAST(SUM(COALESCE(new_users, 0)) OVER (ORDER BY ev.day) AS BIGINT) "
            "AS cum_users "
            "FROM ev JOIN ad USING (day) LEFT JOIN nd ON nd.day = ev.day"),
        "funnel_conversion_users": (
            "WITH a AS (SELECT user_id, MIN(epoch_us(ts)) AS signup_us "
            "  FROM events WHERE event_type = 'signup' GROUP BY user_id), "
            "b AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS purchase_us "
            "  FROM events e JOIN a ON a.user_id = e.user_id "
            "  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= a.signup_us "
            "  GROUP BY e.user_id) "
            "SELECT a.user_id, a.signup_us, "
            "COALESCE(b.purchase_us, -1) AS purchase_us, "
            "CAST(CASE WHEN b.purchase_us IS NULL THEN 0 ELSE 1 END AS BIGINT) "
            "AS converted, "
            "COALESCE(b.purchase_us - a.signup_us, -1) AS ttc_us "
            "FROM a LEFT JOIN b ON a.user_id = b.user_id"),
        "vocab_stats_docs": (
            "WITH tl AS MATERIALIZED (SELECT string_split(text, ' ') AS l FROM documents), "
            "toks AS MATERIALIZED (SELECT unnest(l) AS tok FROM tl), "
            "bis AS (SELECT unnest(list_transform(generate_series(1, len(l)-1), "
            "  i -> l[i] || ' ' || l[i+1])) AS bg FROM tl "
            "  WHERE len(l) >= 2), "
            "t AS (SELECT COUNT(*)::BIGINT AS n_tokens, "
            "  COUNT(DISTINCT tok)::BIGINT AS n_types FROM toks WHERE tok <> ''), "
            "b AS (SELECT COUNT(DISTINCT bg)::BIGINT AS n_bigram_types FROM bis "
            "  WHERE split_part(bg, ' ', 1) <> '' AND split_part(bg, ' ', 2) <> '') "
            "SELECT n_tokens, n_types, n_bigram_types, "
            "ROUND(CAST(n_types AS DOUBLE) / n_tokens, 6) AS ttr FROM t, b"),
        "geohash_cells": f"WITH {pages_sql()} {_geohash_sql(8)}",
        "dbscan_pages": f"WITH {pages_sql()}, {_dbscan_sql()}",
        "nearest_city_pages": f"WITH {pages_sql()} {_nearest_city_sql()}",
        "hex_kring_smooth_pages": f"WITH {pages_sql()}, {_hex_kring_sql(7)}",
        "burst_detect_events": (
            "WITH h AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hour "
            "  FROM events), "
            "b AS (SELECT (MAX(hour) - MIN(hour) + 1) AS H FROM h), "
            "t AS (SELECT user_id, hour, COUNT(*)::BIGINT AS c "
            "  FROM h GROUP BY 1, 2), "
            "s AS (SELECT user_id, SUM(c)::BIGINT AS S FROM t GROUP BY user_id) "
            "SELECT t.user_id, t.hour, t.c AS n_events, s.S AS total_events, "
            "b.H AS hour_span "
            "FROM t JOIN s USING (user_id), b "
            "WHERE t.c * b.H >= 2 * s.S AND t.c >= 2"),
        "cohort_retention_users": (
            "WITH e AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events), "
            "fd AS (SELECT user_id, MIN(day) AS cohort FROM e GROUP BY user_id), "
            "r AS (SELECT fd.cohort, DATE_DIFF('day', fd.cohort, e.day) AS offset_days, "
            "  COUNT(*)::BIGINT AS n_users "
            "  FROM e JOIN fd USING (user_id) GROUP BY 1, 2), "
            "s AS (SELECT cohort, n_users AS cohort_size FROM r WHERE offset_days = 0) "
            "SELECT STRFTIME(r.cohort, '%Y-%m-%d') AS cohort, offset_days, n_users, "
            "ROUND(CAST(n_users AS DOUBLE) / cohort_size, 6) AS retention "
            "FROM r JOIN s USING (cohort)"),
        "quality_blend_docs": (
            "WITH q0 AS (SELECT doc_id, length(text)::BIGINT AS n_chars, "
            f"  {_QUALITY_PUNCT}::DOUBLE / GREATEST(length(text), 1) AS punct_ratio, "
            f"  {_QUALITY_STOP}::DOUBLE / {_QUALITY_WS} AS stop_ratio FROM documents), "
            "q AS (SELECT doc_id, n_chars, "
            "  ROUND(0.4 * LEAST(n_chars / 500.0, 1.0) + 0.3 * LEAST(stop_ratio * 5.0, 1.0) "
            "  + 0.3 * (1.0 - LEAST(punct_ratio * 10.0, 1.0)), 4) AS quality FROM q0), "
            "toks AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS t FROM documents), "
            "p2 AS (SELECT doc_id, t, unnest(range(0, GREATEST(len(t) - 1, 0))) AS p FROM toks), "
            "bc AS (SELECT doc_id, t[p+1] || ' ' || t[p+2] AS g, COUNT(*) AS c "
            "  FROM p2 GROUP BY 1, 2), "
            "b2 AS (SELECT doc_id, ROUND(CAST(SUM(c) - COUNT(*) AS DOUBLE) "
            "  / CAST(SUM(c) AS DOUBLE), 6) AS dup2 FROM bc GROUP BY doc_id), "
            "ch AS MATERIALIZED (SELECT doc_id, unnest(string_split(text, '')) AS ch "
            "  FROM documents), "
            "cc AS (SELECT doc_id, ch, COUNT(*)::BIGINT AS c FROM ch "
            "  WHERE ch <> '' GROUP BY doc_id, ch), "
            "cn AS (SELECT doc_id, COUNT(*)::BIGINT AS n FROM ch "
            "  WHERE ch <> '' GROUP BY doc_id), "
            "ent AS (SELECT cc.doc_id, ROUND(SUM(CAST(CAST("
            "  -((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) "
            "  AS REAL) AS DOUBLE)), 6) AS entropy "
            "  FROM cc JOIN cn USING (doc_id) GROUP BY cc.doc_id), "
            "m AS (SELECT q.doc_id, q.n_chars, q.quality, "
            "  COALESCE(b2.dup2, CAST(0 AS DOUBLE)) AS dup_2gram_frac, "
            "  COALESCE(ent.entropy, CAST(0 AS DOUBLE)) AS entropy, "
            "  (CASE WHEN q.n_chars < 150 THEN 1 ELSE 0 END) "
            "  + (CASE WHEN q.quality < CAST(0.55 AS DOUBLE) THEN 2 ELSE 0 END) "
            "  + (CASE WHEN COALESCE(b2.dup2, CAST(0 AS DOUBLE)) > CAST(0.05 AS DOUBLE) "
            "     THEN 4 ELSE 0 END) "
            "  + (CASE WHEN COALESCE(ent.entropy, CAST(0 AS DOUBLE)) < CAST(2.75 AS DOUBLE) "
            "     THEN 8 ELSE 0 END) AS fail_mask "
            "  FROM q LEFT JOIN b2 USING (doc_id) LEFT JOIN ent ON ent.doc_id = q.doc_id) "
            "SELECT doc_id, n_chars, quality, dup_2gram_frac, entropy, "
            "CAST(fail_mask AS BIGINT) AS fail_mask, "
            "CAST(CASE WHEN fail_mask = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep "
            "FROM m"),
        "interval_join_events": _interval_join_sql(_promo_intervals()),
        "weighted_sample_orders": _weighted_sample_sql(),
        "min_rect_tiles": _min_rect_sql(),
        "orientation_tiles": _orientation_sql(),
        "rfe_rank_lineitem": _rfe_sql(),
        "vote_predict_lineitem": _vote_predict_sql(VOTE_MODELS),
        "lm_perplexity_docs": (
            "WITH bgw AS MATERIALIZED ("
            "  SELECT doc_id, split_part(bg, ' ', 1) AS w1, bg FROM ("
            "    SELECT doc_id, unnest(list_transform(generate_series(1, len(l)-1), "
            "      i -> l[i] || ' ' || l[i+1])) AS bg "
            "    FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents))), "
            "c1 AS (SELECT w1, COUNT(*)::BIGINT AS c1 FROM bgw GROUP BY w1), "
            "c12 AS (SELECT bg, COUNT(*)::BIGINT AS c12 FROM bgw GROUP BY bg), "
            "q AS (SELECT doc_id, CAST(FLOOR((ln(c1.c1) - ln(c12.c12)) "
            "  * CAST(1024 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q "
            "  FROM bgw JOIN c1 USING (w1) JOIN c12 USING (bg)) "
            "SELECT doc_id, COUNT(*)::BIGINT AS n_bigrams, SUM(q)::BIGINT AS sum_q, "
            "ROUND(CAST(SUM(q) AS DOUBLE) / CAST(1024 * COUNT(*) AS BIGINT), 6) AS avg_nll "
            "FROM q GROUP BY doc_id"
        ),
        "tfidf_top_terms_docs": (
            "WITH tf AS (SELECT doc_id, tok, COUNT(*)::BIGINT AS tf FROM ("
            "  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) "
            "  WHERE tok <> '' GROUP BY doc_id, tok), "
            "dfreq AS (SELECT tok, COUNT(*)::BIGINT AS df FROM tf GROUP BY tok), "
            "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents), "
            "s AS (SELECT doc_id, tok, tf, df, "
            "  CAST(CAST(tf * ln(n.n / df) AS REAL) AS DOUBLE) AS tfidf "
            "  FROM tf JOIN dfreq USING (tok), n) "
            "SELECT doc_id, tok, tf, df, tfidf, rn FROM ("
            "  SELECT *, row_number() OVER (PARTITION BY doc_id "
            "    ORDER BY tfidf DESC, tok) AS rn FROM s) WHERE rn <= 5"
        ),
        "mg_heavy_hitters_events": (
            "SELECT CAST(user_id AS VARCHAR) AS user_id, "
            "COUNT(*) AS est_count FROM events "
            "GROUP BY user_id HAVING COUNT(*) >= 70"
        ),
        "topk_orders_per_customer": (
            "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, "
            "row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rn "
            "FROM orders) WHERE rn <= 3"
        ),
        # ---- polygon family: closed-form layer + exact PiP in SQL ---------
        "geom_pixel_bbox": (
            f"WITH {polygons_sql()} "
            "SELECT feature_id, "
            "CAST(TRUNC((pminx - -180.0)/0.17578125) AS BIGINT) AS px_min, "
            "CAST(TRUNC((pmaxx - -180.0)/0.17578125) AS BIGINT) AS px_max, "
            "CAST(TRUNC((pminy - -80.0)/0.15625) AS BIGINT) AS py_min, "
            "CAST(TRUNC((pmaxy - -80.0)/0.15625) AS BIGINT) AS py_max "
            "FROM polys"
        ),
        "zonal_tile_stats": (
            f"WITH {tiles_sql(32)}, {polygons_sql()}, {_TILE_GRID_SQL}, {_TILE_FEATURE_SQL}, "
            "ts AS (SELECT tile_x, tile_y, SUM(vd) AS s, MIN(vd) AS mn, MAX(vd) AS mx "
            "  FROM rast GROUP BY tile_x, tile_y), "
            "a AS (SELECT f.feature_id, COUNT(*) AS nt, SUM(ts.s) AS s, MIN(ts.mn) AS mn, MAX(ts.mx) AS mx "
            "  FROM tfeat f JOIN ts USING (tile_x, tile_y) GROUP BY f.feature_id) "
            "SELECT feature_id, CAST(nt*1024 AS BIGINT) AS pixel_count, "
            "ROUND(s / CAST(nt*1024 AS DOUBLE), 6) AS mean_value, "
            "ROUND(mn, 6) AS min_value, ROUND(mx, 6) AS max_value FROM a"
        ),
        "rasterize_fraction": (
            f"WITH {polygons_sql()}, {_TILE_GRID_SQL}, "
            "sp AS (SELECT f.range AS k, f.range/8.0 + 0.0625 AS frac FROM range(0,8) f), "
            "pts AS (SELECT tile_x, tile_y, fx.k AS kx, fy.k AS ky, "
            "  tbx0 + (tbx1 - tbx0)*fx.frac AS sx, tby0 + (tby1 - tby0)*fy.frac AS sy "
            "  FROM tgrid, sp fx, sp fy), "
            "hits AS (SELECT DISTINCT tile_x, tile_y, kx, ky FROM pts "
            f"  JOIN polys p ON {pip_sql('pts.sx', 'pts.sy')}), "
            "cov AS (SELECT tile_x, tile_y, COUNT(*) AS c FROM hits GROUP BY tile_x, tile_y) "
            "SELECT g.tile_x, g.tile_y, ROUND(COALESCE(c.c, 0)/64.0, 6) AS coverage "
            "FROM tgrid g LEFT JOIN cov c USING (tile_x, tile_y)"
        ),
        "texture_stats": (
            f"WITH {tiles_sql(32)}, {polygons_sql()}, {_TILE_GRID_SQL}, {_TILE_FEATURE_SQL}, "
            "qt AS (SELECT tile_x, tile_y, py, px, "
            "  LEAST(GREATEST(CAST(TRUNC((vd - -2.5)/5.0*8) AS BIGINT), 0), 7) AS q FROM rast), "
            "pr AS (SELECT a.tile_x, a.tile_y, a.q AS qa, b.q AS qb FROM qt a JOIN qt b "
            "  ON a.tile_x = b.tile_x AND a.tile_y = b.tile_y AND a.py = b.py AND b.px = a.px + 1), "
            "sym AS (SELECT tile_x, tile_y, qa, qb FROM pr "
            "  UNION ALL SELECT tile_x, tile_y, qb AS qa, qa AS qb FROM pr), "
            "fm AS (SELECT f.feature_id, s.qa, s.qb, COUNT(*) AS m FROM tfeat f "
            "  JOIN sym s USING (tile_x, tile_y) GROUP BY 1, 2, 3), "
            "tot AS (SELECT feature_id, CAST(SUM(m) AS DOUBLE) AS t FROM fm GROUP BY 1), "
            "pp AS (SELECT fm.feature_id, qa, qb, CAST(m AS DOUBLE)/t AS p FROM fm JOIN tot USING (feature_id)), "
            "mus AS (SELECT feature_id, SUM(qa*p) AS mi, SUM(qb*p) AS mj FROM pp GROUP BY 1), "
            "v AS (SELECT pp.feature_id, SUM((qa - mi)*(qa - mi)*p) AS vi, SUM((qb - mj)*(qb - mj)*p) AS vj, "
            "  SUM((qa - mi)*(qb - mj)*p) AS cv FROM pp JOIN mus USING (feature_id) GROUP BY 1) "
            "SELECT pp.feature_id, ROUND(SUM((qa - qb)*(qa - qb)*p), 6) AS contrast, "
            "ROUND(SUM(ABS(qa - qb)*p), 6) AS dissimilarity, "
            "ROUND(SUM(p/(1 + ABS(qa - qb))), 6) AS homogeneity, "
            "ROUND(SUM(p*p), 6) AS energy, "
            "ROUND(ANY_VALUE(CASE WHEN SQRT(vi*vj) > 0 THEN cv/SQRT(vi*vj) ELSE 1.0 END), 6) AS correlation, "
            "ROUND(SUM(-p*LOG2(p)) FILTER (WHERE p > 0), 6) AS entropy "
            "FROM pp JOIN v USING (feature_id) GROUP BY pp.feature_id"
        ),
        "otsu_zone_thresh": (
            # per-zone Otsu: between-class variance (s0*N - w0*S)^2/(w0*(N-w0))
            # — every product exact (< 2^53), so the float64 score and its
            # argmax (ties → smallest bin, NULLS LAST = engine's -inf) match
            # the engine bit-for-bit
            f"WITH {tiles_sql(32)}, {polygons_sql()}, {_TILE_GRID_SQL}, {_TILE_FEATURE_SQL}, "
            "qt AS (SELECT f.feature_id, "
            "  LEAST(GREATEST(CAST(TRUNC((r.vd - CAST(-2.0 AS DOUBLE))/CAST(5.0 AS DOUBLE)*64) AS BIGINT), 0), 63) AS q "
            "  FROM rast r JOIN tfeat f USING (tile_x, tile_y)), "
            "hist AS (SELECT feature_id, q, COUNT(*) AS c FROM qt GROUP BY 1, 2), "
            "feats AS (SELECT DISTINCT feature_id FROM tfeat), "
            "allbins AS (SELECT f.feature_id, CAST(b.range AS BIGINT) AS q FROM feats f, range(0,64) b), "
            "h2 AS (SELECT a.feature_id, a.q, COALESCE(h.c, 0) AS c "
            "  FROM allbins a LEFT JOIN hist h ON a.feature_id = h.feature_id AND a.q = h.q), "
            "cum AS (SELECT feature_id, q, "
            "  CAST(SUM(c) OVER w AS BIGINT) AS w0, CAST(SUM(q*c) OVER w AS BIGINT) AS s0, "
            "  CAST(SUM(c) OVER (PARTITION BY feature_id) AS BIGINT) AS n, "
            "  CAST(SUM(q*c) OVER (PARTITION BY feature_id) AS BIGINT) AS s "
            "  FROM h2 WINDOW w AS (PARTITION BY feature_id ORDER BY q ROWS UNBOUNDED PRECEDING)), "
            "sc AS (SELECT feature_id, q, w0, n, "
            "  CASE WHEN w0 > 0 AND w0 < n THEN "
            "    CAST(s0*n - w0*s AS DOUBLE)*CAST(s0*n - w0*s AS DOUBLE)/CAST(w0*(n - w0) AS DOUBLE) "
            "  END AS score FROM cum), "
            "pick AS (SELECT feature_id, q, w0, n, "
            "  ROW_NUMBER() OVER (PARTITION BY feature_id ORDER BY score DESC NULLS LAST, q ASC) AS rn FROM sc) "
            "SELECT feature_id, q AS thresh_bin, "
            "ROUND(CAST(-2.0 AS DOUBLE) + (q + 1)*CAST(0.078125 AS DOUBLE), 6) AS thresh_value, "
            "n AS n_pix, n - w0 AS fg_count, "
            "ROUND(CAST(n - w0 AS DOUBLE)/CAST(n AS DOUBLE), 6) AS fg_frac "
            "FROM pick WHERE rn = 1"
        ),
        "niblack_thresh_tiles": (
            # local threshold over the quantized mosaic: separable integer
            # box sums (two ROWS BETWEEN passes = the engine's masked box,
            # windows shrink at the raster border), thresholds derived from
            # exact ints → bit-identical; AVG's ulps vanish under ROUND(6)
            f"WITH {tiles_sql(32)}, "
            "gp AS (SELECT tile_x, tile_y, tile_x*32 + px AS gx, tile_y*32 + py AS gy, "
            "  LEAST(GREATEST(CAST(TRUNC((vd - CAST(-2.0 AS DOUBLE))/CAST(5.0 AS DOUBLE)*64) AS BIGINT), 0), 63) AS q "
            "  FROM rast), "
            "h AS (SELECT *, SUM(q) OVER wx AS rv, SUM(q*q) OVER wx AS rq, COUNT(*) OVER wx AS rc "
            "  FROM gp WINDOW wx AS (PARTITION BY gy ORDER BY gx ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)), "
            "v2 AS (SELECT *, CAST(SUM(rv) OVER wy AS BIGINT) AS sv, CAST(SUM(rq) OVER wy AS BIGINT) AS sq2, "
            "  CAST(SUM(rc) OVER wy AS BIGINT) AS cnt "
            "  FROM h WINDOW wy AS (PARTITION BY gx ORDER BY gy ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)), "
            "t AS (SELECT tile_x, tile_y, q, CAST(sv AS DOUBLE)/CAST(cnt AS DOUBLE) AS m, "
            "  SQRT(CAST(sq2*cnt - sv*sv AS DOUBLE))/CAST(cnt AS DOUBLE) AS s FROM v2), "
            "th AS (SELECT tile_x, tile_y, q, m + CAST(-0.2 AS DOUBLE)*s AS t FROM t) "
            "SELECT tile_x, tile_y, CAST(COUNT(*) FILTER (WHERE q > t) AS BIGINT) AS fg_count_niblack, "
            "ROUND(AVG(t), 6) AS mean_thresh FROM th GROUP BY tile_x, tile_y"
        ),
        "sauvola_thresh_tiles": (
            f"WITH {tiles_sql(32)}, "
            "gp AS (SELECT tile_x, tile_y, tile_x*32 + px AS gx, tile_y*32 + py AS gy, "
            "  LEAST(GREATEST(CAST(TRUNC((vd - CAST(-2.0 AS DOUBLE))/CAST(5.0 AS DOUBLE)*64) AS BIGINT), 0), 63) AS q "
            "  FROM rast), "
            "h AS (SELECT *, SUM(q) OVER wx AS rv, SUM(q*q) OVER wx AS rq, COUNT(*) OVER wx AS rc "
            "  FROM gp WINDOW wx AS (PARTITION BY gy ORDER BY gx ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)), "
            "v2 AS (SELECT *, CAST(SUM(rv) OVER wy AS BIGINT) AS sv, CAST(SUM(rq) OVER wy AS BIGINT) AS sq2, "
            "  CAST(SUM(rc) OVER wy AS BIGINT) AS cnt "
            "  FROM h WINDOW wy AS (PARTITION BY gx ORDER BY gy ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)), "
            "t AS (SELECT tile_x, tile_y, q, CAST(sv AS DOUBLE)/CAST(cnt AS DOUBLE) AS m, "
            "  SQRT(CAST(sq2*cnt - sv*sv AS DOUBLE))/CAST(cnt AS DOUBLE) AS s FROM v2), "
            "th AS (SELECT tile_x, tile_y, q, "
            "  m*(1 + CAST(0.2 AS DOUBLE)*(s/CAST(32.0 AS DOUBLE) - 1)) AS t FROM t) "
            "SELECT tile_x, tile_y, CAST(COUNT(*) FILTER (WHERE q > t) AS BIGINT) AS fg_count_sauvola, "
            "ROUND(AVG(t), 6) AS mean_thresh FROM th GROUP BY tile_x, tile_y"
        ),
        "aspect_tiles": (
            f"WITH {tiles_sql(32)}, "
            "g AS (SELECT tile_x, tile_y, tile_x*32 + px AS gx, tile_y*32 + py AS gy, vd FROM rast), "
            "h AS (SELECT *, COALESCE(LEAD(vd) OVER (PARTITION BY gy ORDER BY gx), vd) AS vr, "
            "  COALESCE(LAG(vd) OVER (PARTITION BY gy ORDER BY gx), vd) AS vl FROM g), "
            "v2 AS (SELECT *, COALESCE(LEAD(vd) OVER (PARTITION BY gx ORDER BY gy), vd) AS vu, "
            "  COALESCE(LAG(vd) OVER (PARTITION BY gx ORDER BY gy), vd) AS vb FROM h), "
            "a AS (SELECT tile_x, tile_y, "
            f"  (ATAN2((vu - vb)/2.0, -((vr - vl)/2.0)) * {float(np.degrees(1.0))!r} + 360.0) % 360.0 AS asp "
            "  FROM v2) "
            "SELECT tile_x, tile_y, ROUND(AVG(asp), 6) AS mean_aspect FROM a GROUP BY tile_x, tile_y"
        ),
        "hillshade_tiles": (
            f"WITH {tiles_sql(32)}, "
            "g AS (SELECT tile_x, tile_y, tile_x*32 + px AS gx, tile_y*32 + py AS gy, vd FROM rast), "
            "h AS (SELECT *, COALESCE(LEAD(vd) OVER (PARTITION BY gy ORDER BY gx), vd) AS vr, "
            "  COALESCE(LAG(vd) OVER (PARTITION BY gy ORDER BY gx), vd) AS vl FROM g), "
            "v2 AS (SELECT *, COALESCE(LEAD(vd) OVER (PARTITION BY gx ORDER BY gy), vd) AS vu, "
            "  COALESCE(LAG(vd) OVER (PARTITION BY gx ORDER BY gy), vd) AS vb FROM h), "
            "d AS (SELECT tile_x, tile_y, (vr - vl)/2.0 AS dgx, (vu - vb)/2.0 AS dgy FROM v2), "
            "s AS (SELECT tile_x, tile_y, "
            f"  GREATEST(255.0 * ({float(np.sin(raster._HS_ALT))!r} * COS(ATAN(SQRT(dgx*dgx + dgy*dgy))) "
            f"  + {float(np.cos(raster._HS_ALT))!r} * SIN(ATAN(SQRT(dgx*dgx + dgy*dgy))) "
            f"  * COS({raster._HS_AZ!r} - ATAN2(dgy, -dgx))), 0.0) AS hs FROM d) "
            "SELECT tile_x, tile_y, ROUND(AVG(hs), 6) AS mean_hillshade FROM s GROUP BY tile_x, tile_y"
        ),
        "quegan_tiles": (
            # 3×3 box means via separable LAG/LEAD row+column sums (COALESCE
            # = the border clamp); e0 sums float32-exact values so grouping
            # order is immaterial, e1's ulps vanish under ROUND(6)
            f"WITH {tiles_sql(32)}, "
            "gp AS (SELECT tile_x, tile_y, tile_x*32 + px AS gx, tile_y*32 + py AS gy, vd, "
            "  1.5*vd + 0.25 AS w1 FROM rast), "
            "h AS (SELECT *, "
            "  COALESCE(LAG(vd) OVER wx, vd) + vd + COALESCE(LEAD(vd) OVER wx, vd) AS rs0, "
            "  COALESCE(LAG(w1) OVER wx, w1) + w1 + COALESCE(LEAD(w1) OVER wx, w1) AS rs1 "
            "  FROM gp WINDOW wx AS (PARTITION BY gy ORDER BY gx)), "
            "v2 AS (SELECT *, "
            "  (COALESCE(LAG(rs0) OVER wy, rs0) + rs0 + COALESCE(LEAD(rs0) OVER wy, rs0))/9.0 AS e0, "
            "  (COALESCE(LAG(rs1) OVER wy, rs1) + rs1 + COALESCE(LEAD(rs1) OVER wy, rs1))/9.0 AS e1 "
            "  FROM h WINDOW wy AS (PARTITION BY gx ORDER BY gy)), "
            "r AS (SELECT tile_x, tile_y, e0, "
            "  CASE WHEN e0 = 0 THEN 1.0 ELSE vd/e0 END AS r0, "
            "  CASE WHEN e1 = 0 THEN 1.0 ELSE (1.5*vd + 0.25)/e1 END AS r1 FROM v2) "
            "SELECT tile_x, tile_y, ROUND(AVG(e0 * ((r0 + r1)/2.0)), 6) AS mean_filtered "
            "FROM r GROUP BY tile_x, tile_y"
        ),
        "temp_match_peaks": (
            f"WITH {tiles_sql(32)}, {polygons_sql()}, {_TILE_GRID_SQL}, {_TILE_FEATURE_SQL}, "
            "tmm AS (SELECT tile_x, tile_y, SUM(vd)/1024.0 AS m FROM rast GROUP BY 1, 2), "
            "fb AS (SELECT feature_id, MIN(tile_x) AS tx0, MIN(tile_y) AS ty0, "
            "  MAX(tile_x) AS tx1, MAX(tile_y) AS ty1 FROM tfeat GROUP BY 1), "
            "cells AS (SELECT t.feature_id, t.tile_x - f.tx0 AS dx, t.tile_y - f.ty0 AS dy, m.m AS tv "
            "  FROM tfeat t JOIN fb f USING (feature_id) "
            "  JOIN tmm m ON m.tile_x = t.tile_x AND m.tile_y = t.tile_y), "
            "tstat AS (SELECT feature_id, SUM(tv) AS st, SUM(tv*tv) AS stt, COUNT(*) AS n FROM cells GROUP BY 1), "
            f"pos AS (SELECT f.feature_id, x.range AS px0, y.range AS py0 FROM fb f, "
            f"  range(0,{GRID_X}) x, range(0,{GRID_Y}) y "
            f"  WHERE x.range + (f.tx1 - f.tx0) < {GRID_X} AND y.range + (f.ty1 - f.ty0) < {GRID_Y}), "
            "w AS (SELECT p.feature_id, p.px0, p.py0, SUM(m.m) AS sw, SUM(m.m*m.m) AS sww, "
            "  SUM(m.m*c.tv) AS swt FROM pos p JOIN cells c USING (feature_id) "
            "  JOIN tmm m ON m.tile_x = p.px0 + c.dx AND m.tile_y = p.py0 + c.dy GROUP BY 1, 2, 3), "
            "corr AS (SELECT w.feature_id, px0, py0, "
            "  CASE WHEN (sww - sw*sw/n)*(stt - st*st/n) > 0 "
            "    THEN (swt - sw*st/n)/SQRT((sww - sw*sw/n)*(stt - st*st/n)) ELSE 0.0 END AS corr "
            "  FROM w JOIN tstat USING (feature_id)), "
            "rk AS (SELECT feature_id, px0, py0, corr, "
            "  ROW_NUMBER() OVER (PARTITION BY feature_id ORDER BY corr DESC, py0, px0) AS rn FROM corr) "
            "SELECT feature_id, CAST(px0 AS BIGINT) AS peak_tile_x, CAST(py0 AS BIGINT) AS peak_tile_y, "
            "ROUND(corr, 6) AS peak_corr FROM rk WHERE rn = 1"
        ),
        # ---- tile family: the closed-form raster restated in SQL ----------
        # (tiles_sql regenerates every pixel bit-exactly; per-tile sums of
        # float32 pixels in float64 are exact, so AVG/COUNT match numpy)
        "mask_tiles": (
            f"WITH {tiles_sql(32)} "
            "SELECT tile_x, tile_y, COUNT(*) FILTER (WHERE vd < 0.5) AS masked_count "
            "FROM rast GROUP BY tile_x, tile_y"
        ),
        "fill_nodata_tiles": (
            # filled_count is the pre-fill hole count: pixels masked (<0.3)
            # to the nodata value 0.0 (v==0 implies v<0.3, so one predicate)
            f"WITH {tiles_sql(32)} "
            "SELECT tile_x, tile_y, COUNT(*) FILTER (WHERE vd < 0.3) AS filled_count "
            "FROM rast GROUP BY tile_x, tile_y"
        ),
        "clip_tiles": (
            "WITH g AS (SELECT CAST(x.range AS INTEGER) AS tile_x, CAST(y.range AS INTEGER) AS tile_y, "
            f"  -180.0 + x.range * {360.0 / GRID_X!r} AS bx0, -80.0 + y.range * {160.0 / GRID_Y!r} AS by0 "
            f"  FROM range(0,{GRID_X}) x, range(0,{GRID_Y}) y) "
            "SELECT tile_x, tile_y, CAST(tile_x*32 AS BIGINT) AS col_off, CAST(tile_y*32 AS BIGINT) AS row_off, "
            "CAST(32 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height, 'EPSG:4326' AS crs FROM g "
            f"WHERE bx0 + {360.0 / GRID_X!r} > -20.0 AND bx0 < 40.0 "
            f"AND by0 + {160.0 / GRID_Y!r} > -20.0 AND by0 < 30.0"
        ),
        "raster_points": (
            f"WITH {tiles_sql(32)} "
            "SELECT tile_x, tile_y, CAST(py AS INTEGER) AS row, CAST(px AS INTEGER) AS col, "
            "v AS value FROM rast WHERE py % 8 = 0 AND px % 8 = 0"
        ),
        "ndvi_tiles": (
            f"WITH {tiles_sql(32)}, "
            "nd AS (SELECT tile_x, tile_y, "
            "  ((1.5*vd + 0.25) - vd) / (CASE WHEN (1.5*vd + 0.25) + vd = 0 THEN 1.0 "
            "    ELSE (1.5*vd + 0.25) + vd END) AS x FROM rast) "
            "SELECT tile_x, tile_y, ROUND(AVG(x), 6) AS ndvi_mean, "
            "ROUND(MIN(x), 6) AS ndvi_min, ROUND(MAX(x), 6) AS ndvi_max "
            "FROM nd GROUP BY tile_x, tile_y"
        ),
        "apply_lut_tiles": (
            f"WITH {tiles_sql(32)}, "
            "l AS (SELECT tile_x, tile_y, "
            "  LEAST(GREATEST(CAST(TRUNC(vd * 10.0) AS BIGINT), 0), 39) AS lab FROM rast) "
            "SELECT tile_x, tile_y, COUNT(*) FILTER (WHERE lab < 10) AS n_label0, "
            "COUNT(*) FILTER (WHERE lab >= 10 AND lab < 20) AS n_label1, "
            "COUNT(*) FILTER (WHERE lab >= 20) AS n_other "
            "FROM l GROUP BY tile_x, tile_y"
        ),
        "combine_scene_tiles": (
            # A = mask(v<0.8 → 0); combined = where(A==0, B, A) with B the
            # original raster — algebraically the identity on v (v<0.8 ⇒ A=0
            # ⇒ take B=v; v≥0.8 ⇒ A=v), so the oracle is the plain tile mean
            f"WITH {tiles_sql(32)} "
            "SELECT tile_x, tile_y, ROUND(AVG(vd), 6) AS mean_value "
            "FROM rast GROUP BY tile_x, tile_y"
        ),
        "temporal_mean_tiles": (
            f"WITH {tiles_sql(32)}, "
            "t AS (SELECT tile_x, tile_y, CAST(CAST((vd + CASE WHEN vd > 1.5 THEN 1.5 ELSE vd END)/2 "
            "  AS FLOAT) AS DOUBLE) AS tm FROM rast) "
            "SELECT tile_x, tile_y, CAST(2 AS BIGINT) AS n_epochs, ROUND(AVG(tm), 6) AS mean_value "
            "FROM t GROUP BY tile_x, tile_y"
        ),
        "rgb_indices_tiles": (
            f"WITH {tiles_sql(32)}, "
            "c AS (SELECT tile_x, tile_y, vd AS r, 1.2*vd + 0.1 AS g, 0.8*vd + 0.3 AS b FROM rast), "
            "t AS (SELECT tile_x, tile_y, r/tot AS rr, g/tot AS gg, b/tot AS bb FROM "
            "  (SELECT *, CASE WHEN r + g + b = 0 THEN 1.0 ELSE r + g + b END AS tot FROM c)), "
            "i0 AS (SELECT tile_x, tile_y, rr, gg, bb, 2*gg - rr - bb AS exg, 1.4*rr - gg AS exr FROM t), "
            "i AS (SELECT tile_x, tile_y, LEAST(GREATEST(exg, -1e6), 1e6) AS exg, LEAST(GREATEST(exr, -1e6), 1e6) AS exr, LEAST(GREATEST(exg - exr, -1e6), 1e6) AS exgr, "
            "  LEAST(GREATEST(0.441*rr - 0.811*gg + 0.385*bb + 18.78745, -1e6), 1e6) AS cive, "
            "  LEAST(GREATEST((gg - rr) / (CASE WHEN gg + rr = 0 THEN 1.0 ELSE gg + rr END), -1e6), 1e6) AS ndi, "
            "  LEAST(GREATEST(((gg*gg - bb)*rr) / (CASE WHEN (gg*gg + bb)*rr = 0 THEN 1.0 ELSE (gg*gg + bb)*rr END), -1e6), 1e6) AS rgbvi, "
            "  LEAST(GREATEST((gg - rr) / (CASE WHEN gg + rr = 0 THEN 1.0 ELSE gg + rr END) - bb, -1e6), 1e6) AS vari, "
            "  LEAST(GREATEST(1.0 / (CASE WHEN gg*rr = 0 THEN 1.0 ELSE gg*rr END), -1e6), 1e6) AS ari, "
            "  LEAST(GREATEST(rr / (CASE WHEN gg = 0 THEN 1.0 ELSE gg END), -1e6), 1e6) AS rgbi, "
            "  LEAST(GREATEST((2*gg - rr - bb) / (CASE WHEN 2*gg + rr + bb = 0 THEN 1.0 ELSE 2*gg + rr + bb END), -1e6), 1e6) AS gli, "
            "  LEAST(GREATEST((gg - 0.39)*(rr - 0.61)*bb, -1e6), 1e6) AS tgl "
            "  FROM i0) "
            "SELECT tile_x, tile_y, ROUND(AVG(exg), 6) AS exg_mean, ROUND(AVG(exr), 6) AS exr_mean, "
            "ROUND(AVG(exgr), 6) AS exgr_mean, ROUND(AVG(cive), 6) AS cive_mean, "
            "ROUND(AVG(ndi), 6) AS ndi_mean, ROUND(AVG(rgbvi), 6) AS rgbvi_mean, "
            "ROUND(AVG(vari), 6) AS vari_mean, ROUND(AVG(ari), 6) AS ari_mean, "
            "ROUND(AVG(rgbi), 6) AS rgbi_mean, ROUND(AVG(gli), 6) AS gli_mean, "
            "ROUND(AVG(tgl), 6) AS tgl_mean "
            "FROM i GROUP BY tile_x, tile_y"
        ),
        "slope_tiles": (
            # focal gradient on the GLOBAL pixel grid: LEAD/LAG along rows and
            # columns are exactly the engine's cross-tile halo; COALESCE(.., vd)
            # is the edge-clamp at the raster border
            f"WITH {tiles_sql(32)}, "
            "g AS (SELECT tile_x, tile_y, tile_x*32 + px AS gx, tile_y*32 + py AS gy, vd FROM rast), "
            "h AS (SELECT *, COALESCE(LEAD(vd) OVER (PARTITION BY gy ORDER BY gx), vd) AS vr, "
            "  COALESCE(LAG(vd) OVER (PARTITION BY gy ORDER BY gx), vd) AS vl FROM g), "
            "v2 AS (SELECT *, COALESCE(LEAD(vd) OVER (PARTITION BY gx ORDER BY gy), vd) AS vu, "
            "  COALESCE(LAG(vd) OVER (PARTITION BY gx ORDER BY gy), vd) AS vb FROM h), "
            "s AS (SELECT tile_x, tile_y, SQRT(((vr - vl)/2.0)*((vr - vl)/2.0) "
            "  + ((vu - vb)/2.0)*((vu - vb)/2.0)) AS sl FROM v2) "
            "SELECT tile_x, tile_y, ROUND(AVG(sl), 6) AS mean_slope FROM s GROUP BY tile_x, tile_y"
        ),
        "hist_match_tiles": (
            f"WITH {tiles_sql(32)}, "
            "hist AS (SELECT LEAST(GREATEST(CAST(TRUNC((vd - -2.5)/5.0*128) AS BIGINT), 0), 127) AS bin, "
            "  COUNT(*)::DOUBLE AS n FROM rast GROUP BY 1), "
            "bins AS (SELECT r.range AS bin FROM range(0,128) r), "
            "filled AS (SELECT b.bin, COALESCE(h.n, 0.0) AS n FROM bins b LEFT JOIN hist h ON b.bin = h.bin), "
            "lut AS (SELECT bin, CAST(SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) "
            "  / (SELECT SUM(n) FROM filled) AS FLOAT) AS e FROM filled), "
            "app AS (SELECT r.tile_x, r.tile_y, CAST(l.e AS DOUBLE) AS ed FROM rast r JOIN lut l "
            "  ON l.bin = LEAST(GREATEST(CAST(TRUNC((r.vd - -2.5)/5.0*128) AS BIGINT), 0), 127)) "
            "SELECT tile_x, tile_y, ROUND(AVG(ed), 6) AS mean_ecdf FROM app GROUP BY tile_x, tile_y"
        ),
        "ann_cosine_topk": (
            "WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0), "
            "s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id, "
            "      ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY "
            "        list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, "
            "        e.vec_id ASC) AS rank "
            "      FROM q CROSS JOIN embeddings e) "
            "SELECT query_id, neighbor_id, rank FROM s WHERE rank <= 10"
        ),
        "tiff_roundtrip_tiles": (
            # round-trip bit-exactness reduces the TIFF codec check to the
            # closed-form raster's own exact-integer aggregate
            f"WITH {tiles_sql(32)}, "
            "qq AS (SELECT tile_x, tile_y, "
            "CAST(FLOOR(vd * CAST(64.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT) AS qs FROM rast) "
            "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
            "CAST(tile_y AS BIGINT) AS tile_y, "
            "CAST(COUNT(*) AS BIGINT) AS n_px, "
            "CAST(SUM(qs) AS BIGINT) AS q_sum, "
            "CAST(MIN(qs) AS BIGINT) AS q_min, "
            "CAST(MAX(qs) AS BIGINT) AS q_max "
            "FROM qq GROUP BY tile_x, tile_y"
        ),
        "semseg_pred_tiles": _semseg_cnn_sql(),
        "rf_predict_lineitem": _rf_forest_sql(),
        "rf_oob_error_lineitem": _rf_forest_sql(mode="oob"),
        "tiff_scene_windows_tiles": (
            f"WITH {tiles_sql(32)}, "
            "qq AS (SELECT tile_x, tile_y, "
            "CAST(FLOOR(vd * CAST(64.0 AS DOUBLE) + CAST(0.5 AS DOUBLE)) "
            "AS BIGINT) AS qs FROM rast "
            "WHERE tile_x < 32 AND tile_y < 16) "
            "SELECT CAST(tile_x AS BIGINT) AS tile_x, "
            "CAST(tile_y AS BIGINT) AS tile_y, "
            "CAST(COUNT(*) AS BIGINT) AS n_px, "
            "CAST(SUM(qs) AS BIGINT) AS q_sum, "
            "CAST(MIN(qs) AS BIGINT) AS q_min, "
            "CAST(MAX(qs) AS BIGINT) AS q_max "
            "FROM qq GROUP BY tile_x, tile_y"
        ),
        "k_anonymity_customers": (
            "WITH b AS (SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "c_mktsegment, CAST(FLOOR(c_acctbal / CAST(1000.0 AS DOUBLE)) "
            "AS BIGINT) AS bal_k FROM customer) "
            "SELECT c_nationkey, c_mktsegment, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(COUNT(DISTINCT bal_k) AS BIGINT) AS n_sensitive, "
            "CAST(CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS BIGINT) AS k_risk, "
            "CAST(CASE WHEN COUNT(DISTINCT bal_k) < 2 THEN 1 ELSE 0 END "
            "AS BIGINT) AS l_risk "
            "FROM b GROUP BY 1, 2"
        ),
        "dp_counts_events": _dp_counts_sql(),
        "compact_plan_pages": _compact_plan_sql(),
        "scene_semseg_zonal": _scene_semseg_zonal_sql(),
        "png_media_roundtrip": _png_roundtrip_sql(),
        "warc_roundtrip_pages": _warc_roundtrip_sql(),
        "warc_corpus_pipeline": (
            # composed ingest chain: extraction round-trips text exactly
            # (extract_text oracle), so the chain restates from documents;
            # lang twin shares _LANG_MARKERS, quality twin shares the
            # engine's exact formula + ROUND
            f"WITH li AS ({_lang_id_sql(carry=('text',))}), "
            "q AS (SELECT text, lang_pred, "
            "ROUND(0.4 * LEAST(length(text) / 500.0, 1.0) "
            f"+ 0.3 * LEAST(({_QUALITY_STOP}::DOUBLE / {_QUALITY_WS}) * 5.0, 1.0) "
            f"+ 0.3 * (1.0 - LEAST(({_QUALITY_PUNCT}::DOUBLE / GREATEST(length(text), 1)) * 10.0, 1.0)), 4) "
            "AS quality FROM li), "
            "f AS (SELECT text, lang_pred FROM q WHERE quality > 0.5), "
            "d AS (SELECT text, MIN(lang_pred) AS lang_pred FROM f GROUP BY text) "
            "SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(length(text)) AS BIGINT) AS n_chars FROM d GROUP BY 1"
        ),
        "gazetteer_match_docs": (
            "SELECT doc_id, CAST(" + " + ".join(
                f"(length(text) - length(replace(text, '{p}', ''))) // {len(p)}"
                for p in _GAZ_PATTERNS)
            + " AS BIGINT) AS n_matches FROM documents"
        ),
        "emd_drift_orders": _emd_drift_sql(),
        "dtw_pairs_users": _dtw_pairs_sql(),
        "golden_record_customers": (
            "WITH o AS (SELECT o_custkey, o_orderkey, o_orderstatus, "
            "o_orderpriority, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) "
            "AS cents, o_orderdate FROM orders), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM o), "
            "a AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(MAX(cents) AS BIGINT) AS max_cents, "
            "MIN(o_orderdate) AS first_date FROM o GROUP BY 1) "
            "SELECT a.o_custkey, a.n_orders, "
            "r.o_orderstatus AS latest_status, "
            "r.o_orderpriority AS latest_priority, a.max_cents, "
            "a.first_date FROM a JOIN r ON r.o_custkey = a.o_custkey "
            "AND r.rn = 1"
        ),
        "interval_schedule_users": _interval_schedule_sql(),
        "bloom_zone_prune_orders": _bloom_zone_sql(),
        "setsim_join_docs": (
            # naive exact join as the oracle: prefix filtering is COMPLETE
            # for Jaccard >= t under a common token order, so the filtered
            # engine must emit the identical pair set
            "WITH tok AS MATERIALIZED (SELECT DISTINCT doc_id, "
            "UNNEST(regexp_extract_all(text, '\\S+')) AS w "
            "FROM documents WHERE doc_id % 10 = 0), "
            "n AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY 1), "
            "it AS (SELECT a.doc_id AS da, b.doc_id AS db, "
            "COUNT(*) AS inter FROM tok a JOIN tok b ON a.w = b.w "
            "AND a.doc_id < b.doc_id GROUP BY 1, 2) "
            "SELECT da AS doc_a, db AS doc_b, "
            "CAST(inter AS BIGINT) AS n_inter, "
            "CAST(na.n + nb.n - inter AS BIGINT) AS n_union "
            "FROM it JOIN n na ON na.doc_id = da "
            "JOIN n nb ON nb.doc_id = db "
            "WHERE 1000 * inter >= 700 * (na.n + nb.n - inter)"
        ),
    }
