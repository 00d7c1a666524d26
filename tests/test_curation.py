"""Dataset-curation ops: properties beyond the DuckDB oracle."""

from pyspark.sql import functions as F

from spype_spark.queries import REGISTRY
from spype_spark.queries.llm_curation import (
    _CAP_PER_SOURCE,
    _EVAL_MAX_ID,
    _PACK_BIN_TOKENS,
)

SF = "/root/testdata/sf0.01"


def test_cap_per_source_respects_cap_and_is_reshard_stable(spark):
    """Every source keeps ≤ cap docs, and the survivor SET is invariant
    under re-partitioning (content-addressed ordering, not ingestion
    order — the property that makes the cap reproducible across
    crawls)."""
    out = REGISTRY["q_dataset_cap_per_source"].fn(spark, SF)
    per_src = out.groupBy("source").count().collect()
    assert all(r["count"] <= _CAP_PER_SOURCE for r in per_src)
    baseline = {(r.doc_id, r.source) for r in out.collect()}

    d = spark.read.parquet(f"{SF}/documents.parquet").repartition(7, "doc_id")
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
        "source"
    ).orderBy(F.md5(F.col("text").cast("binary")), F.asc("doc_id"))
    resharded = {
        (r.doc_id, r.source)
        for r in d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _CAP_PER_SOURCE)
        .select("doc_id", "source")
        .collect()
    }
    assert resharded == baseline


def test_pack_bins_are_contiguous_and_bounded(spark):
    """Within a source, bin ids start at 0, never skip, and each bin's
    token total overflows the budget by at most one document (the
    streaming-pack bound)."""
    out = REGISTRY["q_dataset_pack"].fn(spark, SF).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rows in by_src.items():
        bins = sorted({r.bin_id for r in rows})
        assert bins[0] == 0 and bins == list(range(len(bins))), src
        max_doc = max(r.n_tok for r in rows)
        for b in bins:
            tot = sum(r.n_tok for r in rows if r.bin_id == b)
            # a bin only opens if the previous one reached the budget;
            # the closing doc may overflow by (its own length - 1)
            assert tot <= _PACK_BIN_TOKENS + max_doc, (src, b, tot)


def test_decontaminate_flags_exact_eval_copies(spark):
    """Soundness floor: any training doc whose TEXT equals an eval
    doc's text shares all its shingles and must be flagged; and no
    eval doc appears in the output."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    ev_texts = {
        r.text for r in d.filter(F.col("doc_id") < _EVAL_MAX_ID).collect()
    }
    dup_ids = {
        r.doc_id
        for r in d.filter(F.col("doc_id") >= _EVAL_MAX_ID).collect()
        if r.text in ev_texts and len(r.text.split(" ")) >= 3
    }
    flagged = {
        r.doc_id for r in REGISTRY["q_text_decontaminate"].fn(spark, SF).collect()
    }
    assert dup_ids <= flagged
    assert all(i >= _EVAL_MAX_ID for i in flagged)
