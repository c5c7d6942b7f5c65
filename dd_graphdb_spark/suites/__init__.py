"""Query suites: each module exposes

    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLES: dict[str, str]   # DuckDB-runnable ANSI SQL per query (optional per key)

The driver (``__spark_entry__.py``) merges all suites. Oracle-less keys get a
rows-only check (reserved for genuinely non-SQL-expressible operators).

Determinism contract for oracle parity (driver hashes values):
- float aggregates go through DECIMAL(18,2) element casts so sums are exact
  and engine-order-independent; averages are computed as
  round(sum_double / count, 6);
- every top-k / limit has a total order (explicit tie-break columns);
- all computed columns are aliased identically in Spark and SQL.
"""

from dd_graphdb_spark.suites import (
    relational,
    graph_queries,
    algorithms,
    llm_ops,
    streaming_batch,
    streaming_live,
    engine_api,
    incremental_views,
    sources_fn,
    timeseries,
)


def _hygiene(spark) -> None:
    """Free session garbage left by *previous* queries.

    Iterative operators pin localCheckpoint blocks and shuffle state;
    once the caller drops its result DataFrames these are garbage, but
    the JVM only releases them after both Python and JVM GCs run —
    which can lag minutes, degrading later queries in the same session
    (measured 12s → 400s). Running the two GCs at query START is safe:
    anything the caller still references survives.
    """
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass  # Spark Connect: no JVM gateway; ContextCleaner self-manages


def _with_hygiene(fn):
    def wrapped(spark, sf_dir):
        _hygiene(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


# The driver's correctness gate records the FIRST 50 queries() entries.
# ROTATION CALENDAR (registry 243 > 50/window, so a full re-record
# takes ~5 rounds; every round: new queries at the TOP, then the
# oldest-recorded block, fill to 50 with the rows most affected by
# the round's engine changes; freshest block moves to the END):
#   r11 = 13 new + 16 deferred r6 + 21 r7 rows (recorded 50/50 green).
#   r12 = 10 new/changed-schema (multi-WITH chain, CALL-body leading
#         UNWIND, nested-CALL+WITH composition, SemDeDup multi-probe,
#         the recall gate whose schema gained p2 columns, the capped-
#         colocation SSSP, WITH *, CALL-body WITH chains) + 3 rows
#         whose engine/oracle surface r12 changed (exact-substring
#         oracle tokenizer, the delta-bounded connectivity refresh,
#         float query-params) + the 29 r7 rows deferred from r11 +
#         8 of the r8-recorded block. The remaining 42 r8 rows lead
#         r13's window; all were green in the r12 full oracle-gate
#         replica.
#   r13 = 6 new (CALL-body star, entity export, entity grouping,
#         entity DISTINCT + string concat, trained persisted IVF,
#         trained-vs-seeded recall) + 36 rows whose engine or oracle
#         surface r13 changed (\s+ tokenization unification ×10,
#         portable floor-rounding ×3, Lloyd-unrolled IVF oracle
#         generator ×3, bucket-level CoW store commits ×16, WITH-stage
#         star machinery ×4) + 8 of the stale r8 block. The r13 change volume displaced
#         most of the planned r8 refresh — the FULL registry was green
#         in the r13 sf0.1 oracle-gate replica (ORACLE_GATE_sf01_r13),
#         so the staleness risk is bounded by that record.
#   r14 = 1 new (mutation_delta_compaction — the file-level CoW delta
#         chain gate: delta layers, tombstones, compaction, post-vacuum
#         relocation read; and gql_with_star_agg — WITH *, <aggregate>
#         implicit star-scope grouping) + ALL 38 remaining r8 rows (the
#         staleness debt the r13 verdict flagged — after r14 no row is
#         older than r9) + the r9-block head (10 rows) = 50.
#   r15 = 2 new (dedup_semantic_recall_sampled /
#         dedup_ngram_jaccard_skew_sampled — the sampled truth sides
#         that make the sf1 gate sustainable) + 3 changed-surface
#         (dedup_semantic_cells now trains its quantizer;
#         skew_common_neighbors_events now emits a 16-row aggregate
#         witness; gql_order_hidden_prop projects the id tie-break so
#         its rows stay distinct at replicated scales) + ALL 33
#         r9-recorded rows + the r10-block head (12) = 50. After r15
#         no row's latest record is older than r10; r16 leads with the
#         r10 remainder (21 rows) — the cycle repeats, so no query's
#         newest driver row ever ages past ~5 rounds.
GATE_PRIORITY = [
    # ---- r15 window (driver records the FIRST 50) ----
    # (1) NEW: the sampled truth-side variants of the two quadratic
    # gate-only baselines (sf1-gate sustainability, VERDICT r14 #2)
    "dedup_semantic_recall_sampled",
    "dedup_ngram_jaccard_skew_sampled",
    # (2) CHANGED surface this round: the primary SemDeDup gate now
    # runs the Lloyd-trained quantizer; the skew common-neighbors
    # gate emits a 16-row aggregate witness (value-checkable at
    # every scale — the r14 sf1 exclusion is closed)
    "dedup_semantic_cells",
    "skew_common_neighbors_events",
    # (3) the FULL r9-recorded block (33 rows — after r15 no row's
    # latest driver record is older than r10)
    "gql_map_projection",
    "sim_pq_topk",
    "sim_pq_recall",
    "sim_ann_ivf_pq",
    "algo_bfs_region",
    "algo_lpa_colocation",
    "algo_lpa_fixture",
    "algo_pagerank_weighted",
    "algo_scc_colocation",
    "gql_agg_per_nation",
    "gql_count_per_nation",
    "gql_distinct_segments",
    "gql_multi_match",
    "gql_optional_match",
    "gql_order_skip_limit",
    "gql_prop_compare",
    "gql_string_predicates",
    "gql_var_length",
    "gql_with_having",
    "group_by_agg_having",
    "join_revenue_per_region",
    "range_join_value_bands",
    "sim_lsh_recall",
    "stream_live_left_outer_join",
    "stream_live_static_enrich",
    "text_bpe_token_count",
    "view_gql_materialized",
    "view_incremental_centroids",
    "view_incremental_lpa",
    "view_incremental_minhash",
    "algo_sssp_colocation",
    "algo_betweenness_landmarks",
    "algo_closeness_landmarks",
    # (4) head of the r10-recorded block (remainder leads r16)
    "gql_call_correlated",
    "gql_call_correlated_rows",
    "gql_count_with_where",
    "gql_collect_post_with",
    "set_intersect_nations",
    "set_union_distinct_nations",
    "semi_join_customers_with_orders",
    "window_ntile_lead",
    "cube_status_priority",
    "algo_eigenvector_fixture",
    "algo_kcore_colocation",
    "algo_pagerank_top3",
    "gql_order_hidden_prop",
    # ---- deferred (r16+ windows): the r10 remainder, then the
    # r11/r12/r13-recorded blocks in prior order; the freshest
    # (r14-recorded) block sits at the END ----
    "algo_ppr_customers",
    "algo_reachability_order",
    "common_neighbors_suppliers",
    "edges_between_lookup",
    "embedding_pca_project",
    "gql_agg_sum_avg",
    "gql_anti_join_null",
    "gql_collect_nations",
    "gql_count_distinct_segments",
    "gql_with_passthrough",
    "point_lookup_customer",
    "predicate_scan_customers",
    "view_catalog_roundtrip",
    "view_dependency_topo",
    "view_incremental_degree",
    "view_incremental_delta",
    "view_incremental_pagerank",
    "view_incremental_sssp",
    "view_incremental_stream",
    "gql_call_with_pipeline",
    "gql_call_with_topk_collect",
    "gql_optional_call",
    "gql_label_alternation",
    "gql_inline_where",
    "gql_call_topk",
    "gql_nested_exists",
    "gql_nested_call",
    "gql_map_comprehension",
    "conditional_agg",
    "db_stats",
    "distinct_segments",
    "fn_geo_enrich",
    "rollup_status_priority",
    "set_except_nations",
    "stream_count_window",
    "stream_live_count_window",
    "text_lang_id",
    "text_quality",
    "text_redact_pii",
    "text_tfidf_topk",
    "text_token_count",
    "where_and_or",
    "window_lag_delta",
    "window_topk_per_segment",
    "alert_anomaly_rule",
    "alert_pattern_rule",
    "alert_rate_rule",
    "alert_threshold_cooldown",
    "anti_join_customers_without_orders",
    "dedup_embedding_cosine",
    "dedup_simhash",
    "gql_exists_pattern",
    "gql_expr_arith",
    "gql_expr_functions",
    "gql_incoming_edge",
    "gql_inline_props",
    "gql_match_edge",
    "gql_match_filter",
    "gql_merge_edge",
    "gql_multi_hop",
    "gql_shortest_path",
    "gql_undirected",
    "gql_unwind",
    "gql_with_orderby_limit",
    "gql_multi_with",
    "dedup_semantic_multiprobe",
    "dedup_semantic_trained",
    "dedup_semantic_recall",
    "algo_sssp_colocation_capped",
    "gql_with_where_exists",
    "dedup_exact_substring",
    "view_incremental_connectivity",
    "gql_parameters",
    "router_scoring_table",
    "sim_ann_lsh_topk",
    "sim_cosine_topk",
    "sketch_count_min_estimates",
    "source_csv_extraction",
    "source_json_extraction",
    "source_regex_extraction",
    "text_fingerprint",
    "algo_cc_derived",
    "algo_pagerank_fixture",
    "multimodal_binary_meta",
    "multimodal_decode_dims",
    "multimodal_frame_sample",
    "stream_changeset_summary",
    "stream_custom_agg_p90",
    "stream_dedup_first",
    "stream_filter_rules",
    "stream_late_events",
    "stream_live_dedup_keys",
    "stream_live_global",
    "stream_live_session",
    "stream_live_tumbling",
    "stream_session_window",
    "stream_sliding_window",
    "stream_tumbling_window",
    "gql_call_with_star",
    "gql_call_entity_export",
    "gql_with_entity_group",
    "gql_distinct_entity_concat",
    "sim_ann_ivf_indexed_trained",
    "sim_ann_recall_trained",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh",
    "dedup_cluster_survivors",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_skew",
    "curation_contamination",
    "curation_pack_sequences",
    "curation_repetition",
    "curation_mixture_sample",
    "curation_chunk_docs",
    "text_bigram_lm_score",
    "multimodal_feature_extract",
    "embedding_group_centroids",
    "sim_ann_ivf_topk",
    "sim_ann_ivf_indexed",
    "sim_ann_recall",
    "mutation_apply_batch",
    "mutation_time_travel",
    "mutation_vacuum_retention",
    "mutation_occ_conflict",
    "mutation_cdc_changes",
    "gql_create_delete",
    "gql_foreach",
    "gql_foreach_create",
    "gql_set_expr",
    "gql_set_edge_expr",
    "gql_set_edge",
    "gql_match_set",
    "gql_merge",
    "gql_merge_on_actions",
    "gql_remove_detach_delete",
    "view_incremental_cdc",
    "gql_with_star",
    "gql_call_with_chain",
    "gql_call_nested_with",
    "gql_call_unwind",
    "algo_betweenness_fixture",
    "algo_bfs_full",
    "algo_closeness_fixture",
    "algo_component_count",
    "algo_degree_centrality",
    "algo_scc_fixture",
    "algo_sssp_fixture",
    "algo_triangle_colocation",
    "mutation_delta_compaction",
    "gql_with_star_agg",
    "asof_purchase_attribution",
    "dedup_exact",
    "degree_top_customers",
    "distinct_exact_vs_approx",
    "embedding_covariance",
    "events_sessionize",
    "events_time_rollup",
    "fn_json_props",
    "gql_agg_stats",
    "gql_arith_entity",
    "gql_case_expr",
    "gql_entity_funcs",
    "gql_in_list_expr",
    "gql_keys_props",
    "gql_list_comprehension",
    "gql_list_funcs",
    "gql_orderby_expr",
    "gql_path_variable",
    "gql_quantified_pred",
    "gql_reduce",
    "gql_regex_match",
    "gql_shortest_path_clique",
    "gql_string_funcs",
    "gql_unwind_range",
    "q1_pricing_summary",
    "sample_stratified_docs",
    "sample_topk_per_stratum",
    "sketch_quantile_bounds",
    "stream_live_interval_join",
    "top_n_orders",
    "traverse_2hop",
    "traverse_all_neighbors",
    "traverse_in_neighbors",
    "traverse_out_neighbors",
    "view_incremental_kcore",
    "view_incremental_triangles",
    "view_ttl_refresh",
    "window_running_total",
    "gql_union",
    "gql_union_all",
    "gql_all_shortest_paths",
    "gql_temporal",
    "gql_count_subquery",
    "gql_exists_block",
    "gql_pattern_comprehension",
    "gql_call_subquery",
    "gql_with_distinct_xor",
    "stream_live_full_outer_join",
]



def all_queries(hygiene: bool = True):
    """``hygiene=False``: raw query callables without the per-query GC
    wrapper — for the bench harness, which runs its own GC scrub OUTSIDE
    the timed region (the wrapper's GC at query start would otherwise be
    charged to every timed window)."""
    q = {}
    o = {}
    for mod in (
        relational,
        graph_queries,
        algorithms,
        llm_ops,
        streaming_batch,
        streaming_live,
        engine_api,
        incremental_views,
        sources_fn,
        timeseries,
    ):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    ordered = [n for n in GATE_PRIORITY if n in q] + [
        n for n in q if n not in set(GATE_PRIORITY)
    ]
    wrap = _with_hygiene if hygiene else (lambda fn: fn)
    q = {name: wrap(q[name]) for name in ordered}
    return q, o
