"""Query-contract modules (SURVEY.md §2.B).

Importing this package imports every query module, which registers all
query contracts into :data:`spype_spark.registry.REGISTRY` via the
``@query`` decorator.
"""

from spype_spark.registry import REGISTRY

# Import order mirrors SURVEY.md §2.B section order. Each import
# registers its queries as a side effect.
from spype_spark.queries import scans  # noqa: F401
from spype_spark.queries import project_filter  # noqa: F401
from spype_spark.queries import joins  # noqa: F401
from spype_spark.queries import aggregates  # noqa: F401
from spype_spark.queries import tpch  # noqa: F401
from spype_spark.queries import tpch_deep  # noqa: F401
from spype_spark.queries import graph_analytics  # noqa: F401

from spype_spark.queries import windows  # noqa: F401
from spype_spark.queries import sorts_setops  # noqa: F401
from spype_spark.queries import scalars  # noqa: F401
from spype_spark.queries import llm  # noqa: F401
from spype_spark.queries import llm_curation  # noqa: F401
from spype_spark.queries import llm_extra  # noqa: F401
from spype_spark.queries import clustering  # noqa: F401
from spype_spark.queries import streaming_batch  # noqa: F401
from spype_spark.queries import events_modeling  # noqa: F401
from spype_spark.queries import market_basket  # noqa: F401
from spype_spark.queries import udx  # noqa: F401
from spype_spark.queries import pipe_demos  # noqa: F401
from spype_spark.queries import multimodal  # noqa: F401
from spype_spark.queries import sources_sinks  # noqa: F401
from spype_spark.queries import pivots  # noqa: F401
from spype_spark.queries import subqueries  # noqa: F401
from spype_spark.queries import rollup_materialized  # noqa: F401
from spype_spark.queries import skew_demo  # noqa: F401
from spype_spark.queries import lakehouse_ops  # noqa: F401

# ---------------------------------------------------------------------------
# Driver-facing registration order.
#
# CORRECTNESS_r01 shows the driver verifies a budget-bounded PREFIX of the
# registry (exactly the first 50 keys in round 1). Iteration order of this
# dict is therefore evidence-allocation policy, not cosmetics. Priority:
#   1. round-1 red rows whose fix must be re-verified (q_cast_types,
#      q_str_funcs, q_agg_collect) and the 4 latent array-output queries
#      fixed alongside them,
#   2. every oracle-bearing key the round-1 prefix never reached,
#   3. rows-only keys never reached,
#   4. keys already hash-green in CORRECTNESS_r01 (their round-1 rows stand
#      as evidence), with the round-1 rows-only keys last.
# ---------------------------------------------------------------------------
_DRIVER_PRIORITY = [
    # ---- round-6 window (first 50 keys = the driver's evidence budget).
    # Per VERDICT.md r5 task 1: rotate onto the 74 contracts whose latest
    # driver rows predate the round-4 corpus regeneration (stale = 
    # set(REGISTRY) - keys(CORRECTNESS_r04 + r05)).
    # Group A - rows-only kernels converted to SQL-invariant oracles this
    # round (VERDICT task 5): must re-verify under the new oracle:
    "q_sim_lsh_ann",
    "q_sim_ivf_ann",
    "q_sim_nndescent",
    "q_pq_encode",
    # Group B - q_udf_cogroup reworked this round (VERDICT task 6); its
    # last driver row (r2) is pre-regen AND pre-rework:
    "q_udf_cogroup",
    # Group C - first 45 of the remaining 73 stale keys, registry order
    # (scans/filters/joins/aggs/windows/sorts/setops/scalars families):
    "q_scan_project",
    "q_scan_filter_pushdown",
    "q_project_exprs",
    "q_filter_compound",
    "q_filter_like_regex",
    "q_join_inner_equi",
    "q_join_left",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_cross",
    "q_join_broadcast",
    "q_join_theta_range",
    "q_agg_global",
    "q_agg_distinct",
    "q_agg_having",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_agg_stats",
    "q_agg_minmax_by",
    "q_agg_collect",
    "q_agg_percentile",
    "q_agg_listagg",
    "q_window_rank",
    "q_window_analytic",
    "q_window_frame_rows",
    "q_window_frame_range",
    "q_window_nth",
    "q_window_ntile",
    "q_set_union_all",
    "q_stream_enrich_static",
    "q_stream_stream_join",
    # New-in-round-6 contracts (zero driver history — the same priority
    # rule that put the r5 second-wave keys first): the full-oracle
    # k-means, the curation/sampling/quality additions, the salted-join
    # twin, and TPC-H Q15. They displace six r1-evidenced scalar/setop
    # keys (q_set_union_byname/except, str/date/math/cond funcs) to the
    # round-7 queue.
    "q_cluster_kmeans",
    "q_dedup_semdedup",
    "q_events_anomaly",
    "q_text_paragraph_dedup",
    "q_text_unigram_logprob",
    "q_sample_stratified",
    "q_join_skew_salted",
    "q_tpch_q15",
    # Round-6 conversions of the last rows-only keys (minhash/simhash
    # audits, full resize oracle): their r5 driver rows predate the
    # oracle, so they re-enter the window; q_str_funcs2/q_bitwise_funcs/
    # q_hash_funcs move to the round-7 queue.
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_multimodal_resize",
    # New-in-round-6 key (true-streaming session windows): zero driver
    # history, so it takes the window's last slot.
    "q_stream_session_true",
    # ---- end of the 50-slot window ----
    # Round-7 queue. Zero-driver-history keys lead (the partsupp/
    # commit-date TPC-H family, added late in round 6), then the
    # displaced scalar keys plus the remaining stale keys, so every
    # contract has post-regen driver evidence by round 7:
    "q_tpch_q2",
    "q_tpch_q9",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q16",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_regress_grouped",
    "q_scd2_history",
    "q_path_ngrams",
    "q_basket_pairs",
    "q_stream_stream_left_join",
    "q_join_asof_nearest",
    "q_sort_multi",
    "q_topk_global",
    "q_set_union_distinct",
    "q_set_intersect",
    "q_set_union_byname",
    "q_set_except",
    "q_str_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_cond_funcs",
    "q_cast_types",
    "q_str_funcs2",
    "q_bitwise_funcs",
    "q_hash_funcs",
    "q_array_funcs",
    "q_array_setops",
    "q_explode_posexplode",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_text_tokens",
    "q_text_tfidf",
    "q_text_stats",
    "q_text_langfilter",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokencount",
    "q_fingerprint",
    "q_dedup_embed_cosine",
    "q_dedup_pipeline",
    "q_text_mode",
    "q_regexp_extract_all",
    "q_fuzzy_match",
    "q_dedup_components",
    "q_dataset_split",
    "q_dedup_cluster_keep",
    "q_udf_python",
    "q_udf_pandas",
    "q_udaf_grouped",
    "q_udtf_explode",
    "q_pipe_chain",
    "q_pipe_fan_merge",
    "q_pipe_iff",
]


def _apply_driver_priority() -> None:
    """Reorder REGISTRY in place: priority keys first, then everything
    else (the round-1-green keys) in original registration order."""
    missing = [k for k in _DRIVER_PRIORITY if k not in REGISTRY]
    if missing:
        raise RuntimeError(f"_DRIVER_PRIORITY names unknown keys: {missing}")
    seen = set(_DRIVER_PRIORITY)
    ordered = {k: REGISTRY[k] for k in _DRIVER_PRIORITY}
    ordered.update({k: v for k, v in REGISTRY.items() if k not in seen})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_priority()

__all__ = ["REGISTRY"]
