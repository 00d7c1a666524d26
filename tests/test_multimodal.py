"""Multimodal plumbing tests: payload schema, deterministic fake
decode, and the codec seam."""

import pytest
from pyspark.sql import functions as F

from spype_spark.queries import REGISTRY
from spype_spark.queries.multimodal import _decode_real, with_payload
from spype_spark.tables import load_table


def test_with_payload_schema(spark, sf_dir):
    m = with_payload(load_table(spark, sf_dir, "documents"))
    types = {f.name: f.dataType.simpleString() for f in m.schema.fields}
    assert types["payload"] == "binary"
    assert types["media_meta"].startswith("struct<mime:string,n_bytes:int")


def test_decode_is_deterministic_and_byte_accurate(spark, sf_dir):
    out = {r.doc_id: r for r in REGISTRY["q_multimodal_decode"].fn(spark, sf_dir).collect()}
    docs = {
        r.doc_id: r.text.encode()
        for r in load_table(spark, sf_dir, "documents").limit(50).collect()
    }
    for doc_id, payload in docs.items():
        r = out[doc_id]
        assert r.n_frames == len(payload) // 64 + 1
        assert r.first_frame_sum == sum(payload[:64])
        assert abs(r.brightness - sum(payload) / len(payload)) < 1e-9


def test_real_codec_seam_raises_not_implemented():
    # PNG graduated to a REAL in-repo decoder in round 12, JPEG in
    # round 13; video containers still need a codec library this
    # container lacks — they ARE the seam now
    with pytest.raises(NotImplementedError, match="no codec"):
        _decode_real("video/mp4", b"\x00\x00\x00\x18ftypmp42")


def test_payload_md5_matches_sql_oracle_row(spark, sf_dir):
    """content_md5 from the binary payload equals md5 of the utf-8 text
    computed relationally — the dedup-key invariant."""
    m = REGISTRY["q_multimodal_meta"].fn(spark, sf_dir)
    direct = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.md5(F.col("text").cast("binary")).alias("h"))
    )
    j = m.join(direct, "doc_id")
    assert j.filter(F.col("content_md5") != F.col("h")).count() == 0

def test_resize_matches_local_recompute(spark, sf_dir):
    """The Arrow resize kernel must equal an independent local numpy
    recompute of the same block-average (sampled docs)."""
    import numpy as np

    from spype_spark.queries.multimodal import q_multimodal_resize

    out = {r.doc_id: r.thumb16 for r in q_multimodal_resize(spark, sf_dir).collect()}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(25).collect()
    for r in docs:
        a = np.frombuffer(r.text.encode(), dtype=np.uint8).astype(np.float64)
        bins = np.floor(np.arange(len(a)) * 16 / len(a)).astype(np.int64)
        sums = np.bincount(bins, weights=a, minlength=16)
        counts = np.bincount(bins, minlength=16)
        micro = np.floor(
            np.divide(sums * 10000.0, counts,
                      out=np.zeros(16), where=counts > 0) + 0.5
        ).astype(np.int64)
        want = ",".join(str(x) for x in micro)
        assert out[r.doc_id] == want


def test_framesample_covers_all_bytes_seen(spark, sf_dir):
    """Frame grid sanity: frame 0 exists for every doc; frame count
    matches ceil(len/stride); last frame may be short but never empty."""
    from pyspark.sql import functions as F

    from spype_spark.queries.multimodal import q_multimodal_framesample

    fs = q_multimodal_framesample(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").alias("n")
    )
    agg = fs.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"), F.min("frame_bytes").alias("min_fb")
    )
    j = agg.join(docs, "doc_id")
    bad = j.filter(
        (F.col("n_frames") != F.floor((F.col("n") - 1) / 256) + 1)
        | (F.col("min_fb") <= 0)
    ).count()
    assert bad == 0
