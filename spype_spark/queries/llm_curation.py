"""Dataset-curation contracts: the selection/packing/decontamination
steps between "deduped corpus" and "training run" in an LLM data
pipeline. All three are fully SQL-oracle-checkable — unlike the
hash-family ops, their semantics are deterministic relational algebra.

Scale notes: per-source caps and packing are window functions over the
natural (source) partitioning — one shuffle on the partition key, no
global sort. Decontamination is the inverted-index semi-join shape: the
eval set's shingle list is tiny and broadcasts; cost is bounded by
Σ|posting list| of the shared shingles, never n_train × n_eval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spype_spark.functions import word_shingles
from spype_spark.registry import query
from spype_spark.tables import load_table

#: Per-source document cap (q_dataset_cap_per_source).
_CAP_PER_SOURCE = 5
#: Token budget per packed bin (q_dataset_pack). Small enough that the
#: ~60-token corpus docs spread over several bins per source.
_PACK_BIN_TOKENS = 512
#: Eval/benchmark set for decontamination: the lowest doc_ids.
_EVAL_MAX_ID = 20


@query(
    "q_dataset_cap_per_source",
    oracle=f"""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(text), doc_id) AS rn
      FROM documents) t
    WHERE rn <= {_CAP_PER_SOURCE}
    """,
)
def q_dataset_cap_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most N docs per source, chosen
    by content hash order.

    The standard pretraining balance step (cap boilerplate-heavy
    domains). Ordering by md5(text) — not ingestion order — makes the
    kept set content-addressed: re-sharding, re-ordering, or
    re-crawling the same documents keeps the same survivors, the same
    property q_dataset_split relies on. One window over the source
    partitioning; no global sort.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("text").cast("binary")), F.asc("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CAP_PER_SOURCE)
        .select("doc_id", "source")
    )


@query(
    "q_dataset_pack",
    oracle=f"""
    SELECT doc_id, source,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tok,
           CAST(floor((SUM(len(string_split(text, ' ')))
                         OVER (PARTITION BY source ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING)
                       - len(string_split(text, ' ')))
                      / {_PACK_BIN_TOKENS}.0) AS BIGINT) AS bin_id
    FROM documents
    """,
)
def q_dataset_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed token-budget bins.

    The training-batch packing step (concatenate docs to fill a
    context window): a running token total per source partition, bin =
    the budget multiple the document STARTS in. Greedy first-fit is
    inherently sequential, so the scalable formulation is this
    cumulative-sum binning over a deterministic order — one window per
    partition, embarrassingly parallel across sources, and exactly
    expressible in SQL (the oracle is the same window). Bins can
    overflow by at most one document — the standard streaming-pack
    tradeoff, bounded by max doc length.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tok).over(w)
    return d.select(
        "doc_id",
        "source",
        tok.cast("int").alias("n_tok"),
        F.floor((cum - tok) / F.lit(float(_PACK_BIN_TOKENS)))
        .cast("long")
        .alias("bin_id"),
    )


@query(
    "q_text_decontaminate",
    oracle=f"""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             s1.word || ' ' || s2.word || ' ' || s3.word AS shingle
      FROM (
        SELECT doc_id,
               string_split(text, ' ') AS w,
               generate_subscripts(string_split(text, ' '), 1) AS i
        FROM documents
      ) t,
      LATERAL (SELECT w[i] AS word) s1,
      LATERAL (SELECT w[i+1] AS word) s2,
      LATERAL (SELECT w[i+2] AS word) s3
      WHERE i + 2 <= len(w)
    ),
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < {_EVAL_MAX_ID}),
    tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= {_EVAL_MAX_ID})
    SELECT tr.doc_id, COUNT(DISTINCT tr.shingle) AS n_shared
    FROM tr JOIN ev USING (shingle)
    GROUP BY tr.doc_id
    """,
)
def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any 3-gram
    with the eval set (here: the lowest doc_ids as a stand-in
    benchmark), with the count of shared distinct shingles.

    The leakage filter every pretraining pipeline runs before
    training. Shape is the inverted-index semi-join: explode both
    sides to distinct shingles, equi-join on the shingle — the eval
    side is tiny (one benchmark's worth) so it broadcasts, and cost is
    the shared posting lists, never n_train × n_eval. Flagged docs
    (n_shared above a threshold) get dropped or decontaminated
    upstream of q_dataset_split.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("shingle")
    ).distinct()
    ev = (
        sh.filter(F.col("doc_id") < _EVAL_MAX_ID)
        .select("shingle")
        .distinct()
    )
    tr = sh.filter(F.col("doc_id") >= _EVAL_MAX_ID)
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("n_shared"))
    )
