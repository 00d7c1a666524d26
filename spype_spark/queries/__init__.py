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
    # ---- round-13 window (first 50 keys = the driver's evidence
    # budget). Per VERDICT.md r12 task 1: q_lake_delta_export FIRST
    # (zero driver history — it landed after the r12 window froze),
    # then every round-13 NEW contract in landing order (zero history
    # by construction; the final six are the second-continuation
    # Python-DataSource family — streaming CDC over both foreign
    # formats, both native streaming halves, both replication
    # pipelines), then the 5 keys whose last driver green is r7
    # (q_tpch_q2/q20/q21/q9, q_udaf_grouped), then the r8-stale keys
    # starting q_sim_cosine_tiled (the oldest). With 25 zero-history
    # keys ahead of them, the window cuts off inside the r8 block —
    # the overflow heads the r14 queue.
    "q_lake_delta_export",
    # round-13 additions (zero driver history):
    "q_lake_delta_export_part",
    "q_multimodal_jpeg",
    "q_lake_iceberg_read",
    "q_lake_iceberg_import",
    "q_lake_iceberg_export",
    "q_lake_iceberg_mor",
    "q_lake_delta_colmap",
    "q_lake_delta_dv",
    "q_lake_iceberg_rename",
    "q_lake_sql_foreign",
    "q_lake_delta_v2ckpt",
    "q_lake_delta_idmap",
    "q_lake_iceberg_namemap",
    # round-13 continuation additions (zero driver history):
    "q_lake_delta_export_mor",
    "q_lake_delta_export_colmap",
    "q_sink_avro_roundtrip",
    "q_lake_delta_changes",
    "q_lake_iceberg_changes",
    "q_stream_delta_cdc",
    "q_stream_iceberg_cdc",
    "q_stream_lake_sink",
    "q_stream_lake_source",
    "q_stream_delta_replicate",
    "q_stream_iceberg_replicate",
    # last driver-green r7 (all 5):
    "q_tpch_q2",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q9",
    "q_udaf_grouped",
    # last driver-green r8 (all 34; cosine_tiled first = oldest):
    "q_sim_cosine_tiled",
    "q_agg_approx_distinct",
    "q_agg_approx_percentile",
    "q_agg_grouping_id",
    "q_dataset_cap_per_source",
    "q_dataset_mix_weighted",
    "q_dataset_pack",
    "q_join_bucketed",
    "q_multimodal_audio",
    "q_multimodal_decode",
    "q_multimodal_framesample",
    "q_null_handling",
    "q_pipe_chain",
    "q_pipe_fan_merge",
    "q_pipe_iff",
    "q_profile_stats",
    "q_recursive_cte",
    "q_sink_parquet_roundtrip",
    "q_sink_partitioned_write",
    "q_sketch_hll",
    "q_skew_salted_agg",
    "q_subquery_correlated",
    "q_subquery_in",
    "q_subquery_lateral",
    "q_subquery_scalar",
    "q_text_decontaminate",
    "q_text_pii_redact",
    "q_text_repetition",
    "q_tpch_q13",
    "q_tpch_q17",
    "q_udf_pandas",
    "q_udf_python",
    "q_udtf_explode",
    "q_window_percentiles",
    # r9-stale fill (table order); with the 3 r13 additions above the
    # window cuts off partway through — the rest heads the r14 queue.
    "q_agg_histogram",
    "q_join_3way",
    "q_join_asof",
    "q_join_bloom",
    "q_join_interval_overlap",
    "q_join_null_safe",
    # ---- ~end of the 50-slot window (exact cut depends on how many
    # r13 additions land; keys below are the r14 queue head) ----
    "q_lake_append_scan",
    "q_lake_branch_wap",
    "q_lake_cdf",
    "q_lake_clone",
    "q_lake_delete_dv",
    "q_lake_delete_predicate",
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
