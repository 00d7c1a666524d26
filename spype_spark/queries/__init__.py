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
    # ---- round-14 window (first 50 keys = the driver's evidence
    # budget). Per VERDICT.md r13 task 1: 4 zero/stale-history keys
    # first (2 NEW this round — q_stream_lake_cdf, q_sink_avro_nested
    # — and 2 whose CONTRACTS were extended this round and need
    # re-verification: q_lake_delta_export_colmap now partitioned+
    # mapped, q_lake_delta_idmap now covers id-mode append), then
    # ALL 14 r8-stale keys (the oldest evidence anywhere), then the
    # r9 queue — q_lake_delete_dv / q_lake_branch_wap / the tpch
    # block first per the verdict, then table order. The window
    # cuts off after q_layout_zorder; the 18 keys below it head
    # the r15 queue. Post-r14 staleness floor: nothing older than
    # r9.
    "q_stream_lake_cdf",
    "q_sink_avro_nested",
    "q_stream_lake_replicate",
    "q_lake_sql_cdf",
    "q_lake_delta_export_colmap",
    "q_lake_delta_idmap",
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
    "q_lake_delete_dv",
    "q_lake_branch_wap",
    "q_tpch_q10",
    "q_tpch_q14",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q22",
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_agg_histogram",
    "q_join_3way",
    "q_join_asof",
    "q_join_bloom",
    "q_join_interval_overlap",
    "q_join_null_safe",
    "q_lake_append_scan",
    "q_lake_cdf",
    "q_lake_clone",
    "q_lake_delete_predicate",
    "q_lake_hidden_partition",
    "q_lake_merge_full",
    "q_lake_rename",
    "q_lake_restore",
    "q_lake_scan_nulls",
    "q_lake_scan_predicate",
    "q_lake_widen",
    # ---- end of the 50-slot window; r15 queue head (r9-stale) ----
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
