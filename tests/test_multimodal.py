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
    with pytest.raises(NotImplementedError, match="no codec"):
        _decode_real("image/png", b"\x89PNG")


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