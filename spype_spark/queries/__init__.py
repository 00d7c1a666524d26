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
    # ---- round-10 window (first 50 keys = the driver's evidence budget).
    # Per VERDICT.md r9 task 1: every key now has driver-green history;
    # the freshness gap is the 22 keys whose last driver green is r5
    # (streaming-batch family, events analytics, graph pair, plus
    # window_topk / cosine_topk / json_variant / map_funcs /
    # pipe_curation / rollup_materialized / collapse_runs). Order:
    # (a) round-10 NEW contracts (zero history — inserted as they land),
    # (b) the 22 r5-stale keys, (c) the oldest r6-evidence keys until
    # the 50 slots fill. Queue: remaining r6 keys, then r7/r8/r9 via
    # registry order (all have fresher evidence).
    # Group A - round-10 additions, zero history by construction
    # (uncommented here as each contract lands in the registry):
    "q_lake_optimize_small",
    "q_lake_branch_multi",
    "q_lake_sql_facade",
    "q_lake_spec_evolve",
    "q_dataset_shard_shuffle",
    "q_lake_restore_txn",
    "q_lake_cdf_branch",
    "q_dataset_length_buckets",
    # Group B - last driver-green r5 (22):
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_true_tumbling",
    "q_stream_dedup_watermark",
    "q_stream_stateful_running",
    "q_stream_lake_upsert",
    "q_events_funnel",
    "q_events_hourly_agg",
    "q_rolling_dau",
    "q_cohort_retention",
    "q_ts_gapfill",
    "q_ts_interpolate",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_json_variant",
    "q_map_funcs",
    "q_pipe_curation",
    "q_rollup_materialized",
    "q_sim_cosine_topk",
    "q_text_collapse_runs",
    "q_window_topk",
    # Group C - last driver-green r6 (fill to 50; the rest queue below):
    "q_scan_project",
    "q_scan_filter_pushdown",
    "q_multimodal_resize",
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
    "q_agg_percentile",
    "q_agg_minmax_by",
    # ---- end of the 50-slot window ----
    # Round-11 queue: the r6-evidence keys not fitted above, then the
    # registry fallback (r7/r8/r9-evidence keys in registration order).
    "q_agg_collect",
    "q_agg_listagg",
    "q_window_rank",
    "q_window_analytic",
    "q_window_frame_rows",
    "q_window_frame_range",
    "q_window_ntile",
    "q_window_nth",
    "q_set_union_all",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_sim_lsh_ann",
    "q_sim_ivf_ann",
    "q_sim_nndescent",
    "q_pq_encode",
    "q_cluster_kmeans",
    "q_dedup_semdedup",
    "q_sample_stratified",
    "q_text_paragraph_dedup",
    "q_text_unigram_logprob",
    "q_udf_cogroup",
    "q_join_skew_salted",
    "q_events_anomaly",
    "q_stream_enrich_static",
    "q_stream_stream_join",
    "q_stream_session_true",
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
