"""Systematic physical-plan audit over the driver-facing queries that
build lazily (no side effects at construction): none may contain a
CartesianProduct (all-pairs blowup) or BatchEvalPython (row-at-a-time
Python UDF — everything must be Arrow-vectorized). This turns the
per-round judge plan audit into a standing regression gate."""

import pytest

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"

# queries whose q_* function only BUILDS a plan (no writes, streams,
# localCheckpoints, or table commits at construction time)
LAZY = [
    "tile_counts", "range_near", "areadist_square", "knn3",
    "theta_spatial", "reproject", "polyline_knn",
    "validity_filter", "raster_roundtrip",
    "areadist_wet_sum", "areadist_circle", "areadist_circle_join",
    "knn_ring", "multimodal_stats", "frame_sample", "resize_stats",
    "embed_top1", "embed_ann_lsh", "embed_ann_ivf",
    "simhash", "ngram_jaccard", "text_features",
    "pricing_summary", "multi_join", "filtered_min", "weighted_mean",
    "distinct_count", "conditional_recode", "left_coalesce",
    "union_all", "sort_limit", "window_topk", "theta_join",
    "pivot_wide", "dedup_exact", "dedup_bucket", "token_stats",
    "text_quality", "lang_markers", "tumbling_window", "sessions",
    "simhash_pairs", "asof_join", "asof_join_fwd", "interval_join",
    "dist_quantiles",
    # r06 additions (all lazily built)
    "spatial_antijoin", "traj_stats", "idw_interp", "geo_median",
    "layer_overlay", "sobel_stats", "convex_hull", "image_extract",
    "zonal_stats", "blob_stats", "hist_equalize", "chip_extract",
    "profile_table", "viewshed",
    # r06 third wave
    "zonal_weighted", "hillshade", "line_locate", "rollup_agg",
    "skyline", "flow_d8", "morph_stats", "hull_centroid",
    "rep_ngram", "contam_check", "geodesic", "contour_cases",
    "mosaic_median", "ohlc_bars", "table_diff", "sat_probe",
    "group_ols", "iqr_outliers",
    # r06 fifth wave (bpe_vocab drives per-round argmax collects and
    # hll_stream drains a live stream — both excluded like minhash)
    "hll_users", "cohort_retention", "pagerank_walk", "pmi_bigrams",
    "edit_blocks", "median_filter", "hilbert_stats", "orient_hist",
    "glcm_texture", "bloom_probe", "cms_grid", "rolling_stats",
    "triangles", "quality_checks", "textrank", "scd2_build",
    "funnel_steps", "ab_chisq", "ab_chisq_big", "ewma_features",
    "markov_transitions", "attribution", "band_class", "otsu_threshold",
    "geohash_encode", "label_prop", "areal_interp", "hist_quantiles",
    "ship_priority", "caption_stats",
    # r07 late wave
    "harris_corners", "flow_accum", "dist_transform",
    "cost_distance", "nms_peaks", "upsample2", "mode_resample",
    "seg_cross", "tfidf_topk", "winsorize",
    "moran_i", "raster_equalize", "traj_stays", "od_flows",
    "interval_overlap", "substring_dups", "ycbcr_stats",
    "waveform_stats", "trend_mk",
    # r07 wave D (all lazily built; acf_lags' spine crossJoin plans
    # as a broadcast NLJ like trend_mk's, not a CartesianProduct)
    "cusum_change", "gap_fill", "bellman_hops",
    "quadtree_tiles", "box_iou_join", "acf_lags",
    "audio_pitch", "run_length",
    # r07 wave E
    "point_sample", "voronoi_assign", "kcore", "image_moments",
    # r07 wave F
    "dow_seasonal", "dbscan_classify", "hough_lines",
    # r07 wave G
    "pq_encode", "audio_fp_dedup",
    # r07 wave H
    "basket_pairs", "mad_outliers",
    # r07 wave I
    "unpivot_melt", "gini_lorenz", "ripley_k", "knox_test",
    # r07 wave J
    "lbp_hist", "raster_line", "tpi_class", "jaccard_nodes",
    # r07 wave K
    "theil_sen", "getis_hotspot", "burst_detect", "bayer_dither",
    # r07 wave L
    "lm_novelty", "str_pack", "map_algebra", "template_match",
    # r07 wave M
    "audio_resample", "color_mediancut", "simpson_diversity",
    "benford_digits",
    # r07 wave N (rfm_scores moved out in r08: its distributed-rank
    # rewrite checkpoints + collects prefix offsets at build; its
    # plan shape is pinned by tests/test_global_order.py)
    "stock_floor", "max_drawdown", "scene_cuts",
    # r07 wave O
    "local_moran", "yoy_ttest", "clustering_coef", "crossmodal_corr",
    # r07 wave P (hotspot_stream runs a live drain at build — excluded
    # like the other *_stream queries)
    "terrain_profile", "rake_scores",
    # r07 wave Q (snapshot_diff commits IceLite snapshots at build —
    # excluded like compact_files)
    "weighted_sample", "noise_estimate",
    # r07 wave R
    "ring_profile", "st_cube", "interval_union",
    # r07 wave S
    "aspect_class", "fk_orphans", "top3_concat",
    # r07 wave T (sliding_stream runs a live drain at build — excluded)
    "snaive_error", "value_histogram",
    # r07 wave U
    "order_gaps", "ahash_balance", "caption_subjects",
    # r07 wave V
    "fence_visits", "hod_profile", "cume_users",
    # r07 wave W
    "hhi_brand", "price_runs", "letterbox",
    # r07 wave X (abc_class moved out in r08: distributed-cumsum
    # rewrite, see test_global_order.py)
    "user_paths", "symmetry_score",
    # r07 wave Y
    "json_props", "tile_change",
    # r07 wave Z
    "dedup_latest", "share_of_total",
    # incremental_read commits IceLite snapshots at build — excluded
    # like compact_files / stats_prune / delete_rows
    # stats_prune / delete_rows commit IceLite snapshots at build —
    # excluded like compact_files; their COW scoping is pytest-pinned
]
# domain_mix collects its histogram at build (plan parameters) and
# compact_files commits table snapshots at build — both pinned by
# their own tests; excluded here like minhash_pairs.

# embed_dup_pairs routes through a broadcast matmul whose gate runs a
# count() at build; minhash_pairs localCheckpoints; dissolve/wet/wide
# collect corrections — all audited by their own plan-shape tests.


@pytest.fixture(scope="module")
def plans(spark):
    qs = E.queries()
    out = {}
    for name in LAZY:
        df = qs[name](spark, SF)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


@pytest.mark.parametrize("name", LAZY)
def test_no_cartesian_product(plans, name):
    assert "CartesianProduct" not in plans[name], name


@pytest.mark.parametrize("name", LAZY)
def test_no_row_at_a_time_python(plans, name):
    assert "BatchEvalPython" not in plans[name], name
