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
    # ---- round-11 window (first 50 keys = the driver's evidence budget).
    # Per VERDICT.md r10 task 1: fill the window with (a) round-11 NEW
    # contracts (zero history — inserted at the top as they land),
    # (b) the 30 keys whose last driver green is r6 (four rounds old:
    # ANN family, minhash/simhash/semdedup, kmeans, the window-function
    # family, q_tpch_q15, events anomaly, paragraph dedup, unigram
    # logprob, stratified sample, skew join, cogroup, agg collect/
    # listagg/minmax_by/percentile/stats, union_all, stream-stream/
    # enrich/session-true), (c) the 16 r8-stale q_lake_* keys whose
    # engine (lakehouse.py +572, catalog.py +596 lines) churned under
    # them in r10. Queue: r7-evidence keys, then registry order.
    # Group A - round-11 additions, zero history by construction
    # (uncommented here as each contract lands in the registry):
    "q_lake_sql_read",
    "q_lake_catalog_cdf",
    "q_lake_scan_slab_pruned",
    "q_text_zipf",
    # Group B - last driver-green r6 (30):
    "q_sim_ivf_ann",
    "q_sim_lsh_ann",
    "q_sim_nndescent",
    "q_pq_encode",
    "q_cluster_kmeans",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_semdedup",
    "q_window_rank",
    "q_window_analytic",
    "q_window_frame_rows",
    "q_window_frame_range",
    "q_window_ntile",
    "q_window_nth",
    "q_tpch_q15",
    "q_events_anomaly",
    "q_text_paragraph_dedup",
    "q_text_unigram_logprob",
    "q_sample_stratified",
    "q_join_skew_salted",
    "q_udf_cogroup",
    "q_agg_collect",
    "q_agg_listagg",
    "q_agg_minmax_by",
    "q_agg_percentile",
    "q_agg_stats",
    "q_set_union_all",
    "q_stream_stream_join",
    "q_stream_enrich_static",
    "q_stream_session_true",
    # Group C - last driver-green r8 lake keys over r10 engine churn (16):
    "q_lake_merge_upsert",
    "q_lake_time_travel",
    "q_lake_delete",
    "q_lake_compact",
    "q_lake_schema_evolution",
    "q_lake_partitioned_cow",
    "q_lake_vacuum",
    "q_lake_delete_range",
    "q_lake_diff",
    "q_lake_history",
    "q_lake_scan_pruned",
    "q_lake_txn",
    "q_lake_parts_cow",
    "q_lake_delete_mor",
    "q_lake_update",
    "q_stream_txn_sink",
    # ---- end of the 50-slot window ----
    # Round-12 queue: the round-11 contract that didn't fit the window
    # (4 new + the 46 mandated stale keys fill it exactly), then the
    # oldest r7-evidence keys, then registry order.
    "q_dataset_interleave",
    "q_stream_stream_left_join",
    "q_join_asof_nearest",
    "q_dedup_ngram_jaccard",
    "q_dedup_components",
    "q_dedup_cluster_keep",
    "q_dedup_embed_cosine",
    "q_dedup_pipeline",
    "q_fingerprint",
    "q_fuzzy_match",
    "q_text_langid",
    "q_text_quality",
    "q_text_tokencount",
    "q_text_mode",
    "q_text_tfidf",
    "q_text_tokens",
    "q_text_stats",
    "q_text_langfilter",
    "q_sim_ivfpq_ann",
    "q_sim_cosine_tiled",
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
