"""Dataset-curation ops: properties beyond the DuckDB oracle."""

import pytest
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


# ---------------------------------------------------------------------------
# Round-3 late additions: repetition, PII, run-collapse, weighted mix.
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_collapse_runs_is_idempotent_and_shortens(spark, sf_dir):
    from spype_spark.queries import REGISTRY

    out = REGISTRY["q_text_collapse_runs"].fn(spark, sf_dir)
    rows = out.collect()
    assert all(r["n_removed"] >= 0 for r in rows)
    # idempotence: collapsing a collapsed text removes nothing
    clean = out.select(
        out.doc_id, out.clean_text.alias("text")
    )
    import pyspark.sql.functions as F

    ws = F.split(F.col("text"), " ")
    keep = F.expr(
        "filter(sequence(1, size(ws)), i -> CASE WHEN i = 1 THEN true"
        " ELSE element_at(ws, i) != element_at(ws, i - 1) END)"
    )
    again = (
        clean.withColumn("ws", ws)
        .withColumn("keep", keep)
        .filter(F.size("ws") != F.size("keep"))
        .count()
    )
    assert again == 0


def test_pii_redact_leaves_no_matches(spark, sf_dir):
    import pyspark.sql.functions as F

    from spype_spark.queries import REGISTRY
    from spype_spark.queries.llm_curation import _EMAIL_RE, _IP_RE, _PHONE_RE

    out = REGISTRY["q_text_pii_redact"].fn(spark, sf_dir)
    residue = out.filter(
        (F.regexp_count("redacted", F.lit(_EMAIL_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(_PHONE_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(_IP_RE)) > 0)
    ).count()
    assert residue == 0
    assert out.filter(F.col("n_pii") < 3).count() == 0  # trailer plants 3


def test_mix_weighted_respects_target_shares(spark, sf_dir):
    """Kept count per source ≈ thr/R · n_s (content hash is uniform
    enough at corpus size for a loose band), and saturated sources
    (w=7) keep everything."""
    import pyspark.sql.functions as F

    from spype_spark.queries import REGISTRY

    kept = (
        REGISTRY["q_dataset_mix_weighted"].fn(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"))
        .collect()
    )
    orig = {
        r["source"]: r["n"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    kept_map = {r["source"]: r["n_kept"] for r in kept}
    for src, n in orig.items():
        idx = int(src[3:])
        w = 1 + (idx % 4) * 2
        if w == 7:  # saturated: keep-rate capped at 1
            assert kept_map.get(src, 0) == n
        else:
            assert kept_map.get(src, 0) <= n


def test_repetition_flags_degenerate_text(spark):
    """A synthetic stutter doc must be flagged; a all-distinct doc must
    not."""
    import pyspark.sql.functions as F

    from spype_spark.queries.llm_curation import (
        _DUP_2GRAM_MAX,
        _TOP_WORD_MAX,
    )

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam ham"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        ],
        "doc_id long, text string",
    ).withColumn("ws", F.split("text", " "))
    top_cnt = F.expr(
        "array_max(transform(array_distinct(ws), w -> size(filter(ws, x -> x = w))))"
    )
    out = df.select(
        "doc_id",
        ((top_cnt / F.size("ws")) > _TOP_WORD_MAX).alias("flag"),
    ).collect()
    flags = {r["doc_id"]: r["flag"] for r in out}
    assert flags[1] is True
    assert flags[2] is False
    assert 0 < _DUP_2GRAM_MAX < 1
