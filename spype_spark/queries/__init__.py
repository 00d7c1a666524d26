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
    # ---- round-8 window (first 50 keys = the driver's evidence budget).
    # Per VERDICT.md r7 task 1: (a) the 9 stale-evidence keys — the 6
    # UDF/pipe keys displaced from the round-7 window (last driver rows
    # r2, pre-corpus-regen) and the 3 round-7 lakehouse-COW contracts
    # with zero driver history; then (b) the other 7 lakehouse keys
    # (last driver rows r4 — and the whole lakehouse commit layer is
    # reworked this round for the manifest/object-store path, so fresh
    # driver rows matter most); then (b') the six second-session
    # zero-history keys; then (c) 28 of the remaining r4-evidence
    # keys. Spilled to the post-window queue: six r4 keys with
    # pytest-pinned trivial plans, plus q_tpch_q5 (independently
    # exercised by the driver's per-round bench run), q_pivot,
    # q_unpivot.
    # Group A - stale evidence (9):
    "q_udf_python",
    "q_udf_pandas",
    "q_udtf_explode",
    "q_pipe_chain",
    "q_pipe_fan_merge",
    "q_pipe_iff",
    "q_lake_partitioned_cow",
    "q_lake_vacuum",
    "q_lake_delete_range",
    # Group B - lakehouse keys last driver-green r4, commit layer
    # reworked this round (7):
    "q_lake_merge_upsert",
    "q_lake_time_travel",
    "q_lake_delete",
    "q_lake_compact",
    "q_lake_schema_evolution",
    "q_lake_diff",
    "q_lake_history",
    # Group B' - the round-8 second-session additions with ZERO driver
    # history (multi-table txns, exactly-once sink, slab manifests,
    # MOR deletes, UPDATE, the WAV codec) — never-checked keys outrank
    # r4-stale ones; six Group-C keys spill to the round-9 queue:
    "q_lake_txn",
    "q_stream_txn_sink",
    "q_lake_parts_cow",
    "q_lake_delete_mor",
    "q_lake_update",
    "q_multimodal_audio",
    # Group C - remaining r4-evidence keys (28 of 37):
    "q_sink_parquet_roundtrip",
    "q_multimodal_framesample",
    "q_sink_partitioned_write",
    "q_subquery_scalar",
    "q_subquery_in",
    "q_subquery_correlated",
    "q_null_handling",
    "q_subquery_lateral",
    "q_recursive_cte",
    "q_join_bucketed",
    "q_agg_grouping_id",
    "q_profile_stats",
    "q_agg_approx_distinct",
    "q_sketch_hll",
    "q_tpch_q13",
    "q_tpch_q17",
    "q_window_percentiles",
    "q_dataset_cap_per_source",
    "q_dataset_pack",
    "q_text_decontaminate",
    "q_text_repetition",
    "q_text_pii_redact",
    "q_dataset_mix_weighted",
    "q_sim_cosine_tiled",
    "q_multimodal_decode",
    "q_skew_salted_agg",
    "q_agg_approx_percentile",
    # q_lake_scan_pruned: new in round 8 (zero driver history) — takes
    # the window slot q_pipe_validate held; pipe_validate spills to the
    # round-9 queue with the other displaced keys.
    "q_lake_scan_pruned",
    # ---- end of the 50-slot window ----
    # Round-9 queue: first the six r4-evidence keys displaced by the
    # zero-history Group B' block (roundtrip sinks and trivial plans,
    # all pytest-pinned), then the earlier displacements, then the
    # r5-evidence keys in registration order (the registry fallback
    # below handles everything not named here).
    "q_lake_cdf",
    "q_lake_branch_wap",
    "q_lake_scan_nulls",
    "q_join_bloom",
    "q_lake_scan_predicate",
    "q_lake_delete_predicate",
    "q_sketch_cms",
    "q_lake_append_scan",
    "q_sketch_hll_intersect",
    "q_sink_csv_roundtrip",
    "q_sink_orc_roundtrip",
    "q_source_binaryfile",
    "q_sample_seeded",
    "q_agg_histogram",
    "q_multimodal_meta",
    "q_pipe_validate",
    "q_tpch_q5",
    "q_pivot",
    "q_unpivot",
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
