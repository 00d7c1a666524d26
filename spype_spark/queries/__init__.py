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
    # ---- round-15 window (first 50 keys = the driver's evidence
    # budget). Per VERDICT.md r14 task 1: the NEW contract first
    # (q_stream_lake_upsert_native — the mergeKeys sink upsert),
    # then the 10 keys whose BEHAVIOR changed this round (the CDF
    # dataChange-skip + bucketed diff touch every feed/merge/compact
    # surface; the Avro writer now emits real snappy; the replicate
    # contract drives the new REPLICATE LAKE facade form), then ALL
    # 20 r9-stale keys (the oldest evidence anywhere), then 19 from
    # the r10 queue in table order. The window cuts off after
    # q_filter_compound; the keys below it head the r16 queue.
    # Post-r15 staleness floor: nothing older than r10.
    "q_stream_lake_upsert_native",
    "q_stream_lake_cdf",
    "q_lake_sql_cdf",
    "q_stream_lake_replicate",
    "q_lake_cdf",
    "q_lake_compact",
    "q_lake_merge_upsert",
    "q_lake_merge_full",
    "q_lake_optimize_small",
    "q_sink_avro_roundtrip",
    "q_sink_avro_nested",
    "q_lake_zorder",
    "q_layout_zorder",
    "q_multimodal_meta",
    "q_pipe_validate",
    "q_pivot",
    "q_pricing_summary",
    "q_quality_audit",
    "q_sample_seeded",
    "q_sink_csv_roundtrip",
    "q_sink_json_roundtrip",
    "q_sink_orc_roundtrip",
    "q_sketch_cms",
    "q_sketch_hll_intersect",
    "q_sketch_hll_union",
    "q_source_binaryfile",
    "q_source_json_props",
    "q_stream_cdf",
    "q_text_entropy",
    "q_text_slice_windows",
    "q_unpivot",
    "q_agg_cube",
    "q_agg_distinct",
    "q_agg_global",
    "q_agg_grouping_sets",
    "q_agg_having",
    "q_agg_rollup",
    "q_cohort_retention",
    "q_dataset_length_buckets",
    "q_dataset_shard_shuffle",
    "q_events_funnel",
    "q_events_hourly_agg",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_cross",
    "q_join_full",
    "q_join_inner_equi",
    "q_filter_compound",
    # ---- end of the 50-slot window; r16 queue head (r10-stale) ----
    "q_filter_like_regex",
    "q_join_left",
    "q_join_semi",
    "q_join_theta_range",
    "q_json_variant",
    "q_lake_branch_multi",
    "q_lake_cdf_branch",
    "q_lake_restore_txn",
    "q_lake_spec_evolve",
    "q_lake_sql_facade",
    "q_map_funcs",
    "q_pipe_curation",
    "q_project_exprs",
    "q_rolling_dau",
    "q_rollup_materialized",
    "q_scan_filter_pushdown",
    "q_scan_project",
    "q_sim_cosine_topk",
    "q_stream_dedup_watermark",
    "q_stream_enrich_static",
    "q_stream_lake_upsert",
    "q_stream_session",
    "q_stream_sliding",
    "q_stream_stateful_running",
    "q_stream_true_tumbling",
    "q_stream_tumbling",
    "q_stream_txn_sink",
    "q_text_collapse_runs",
    "q_topk_global",
    "q_ts_gapfill",
    "q_ts_interpolate",
    "q_window_topk",
]


# Contracts staged in the window ahead of their code landing: tolerated
# as absent. Empty now — every r13 addition is registered — so every
# key in _DRIVER_PRIORITY is hard-checked again (typo guard).
_PENDING: set[str] = set()


def _apply_driver_priority() -> None:
    """Reorder REGISTRY in place: priority keys first, then everything
    else (the round-1-green keys) in original registration order."""
    missing = [k for k in _DRIVER_PRIORITY if k not in REGISTRY and k not in _PENDING]
    if missing:
        raise RuntimeError(f"_DRIVER_PRIORITY names unknown keys: {missing}")
    seen = set(_DRIVER_PRIORITY)
    ordered = {k: REGISTRY[k] for k in _DRIVER_PRIORITY if k in REGISTRY}
    ordered.update({k: v for k, v in REGISTRY.items() if k not in seen})
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_driver_priority()

__all__ = ["REGISTRY"]
