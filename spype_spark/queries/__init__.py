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
    # ---- round-12 window (first 50 keys = the driver's evidence
    # budget). Per VERDICT.md r11 task 1: q_dataset_interleave FIRST
    # (the only key with zero driver history), then the round-12 NEW
    # contracts (zero history by construction), then 46 of the 50 keys
    # whose last driver green is r7 (five rounds old), starting
    # q_stream_stream_left_join per the staged r12 queue. The 5 r7
    # keys that don't fit (q_tpch_q2/q20/q21/q9, q_udaf_grouped) plus
    # the oldest r8 key (q_sim_cosine_tiled) head the r13 queue below.
    "q_dataset_interleave",
    # round-12 additions:
    "q_multimodal_png",
    "q_lake_delta_read",
    "q_lake_sql_ddl",
    "q_lake_delta_import",
    # last driver-green r7 (45 of 50):
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
    "q_array_funcs",
    "q_array_setops",
    "q_basket_pairs",
    "q_bitwise_funcs",
    "q_cast_types",
    "q_cond_funcs",
    "q_dataset_split",
    "q_date_funcs",
    "q_dedup_exact",
    "q_explode_posexplode",
    "q_hash_funcs",
    "q_math_funcs",
    "q_path_ngrams",
    "q_regexp_extract_all",
    "q_regress_grouped",
    "q_scd2_history",
    "q_set_except",
    "q_set_intersect",
    "q_set_union_byname",
    "q_set_union_distinct",
    "q_sort_multi",
    "q_str_funcs",
    "q_str_funcs2",
    "q_topk_global",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q16",
    # ---- end of the 50-slot window ----
    "q_lake_delta_export",
    "q_tpch_q2",
    # Round-13 queue: the r7 keys that didn't fit, the oldest
    # r8-evidence key, then registry order.
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q9",
    "q_udaf_grouped",
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
