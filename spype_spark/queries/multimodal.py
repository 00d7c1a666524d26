"""Multimodal columns (BASELINE.json north star: "multimodal columns").

Pattern: media is an opaque ``binary`` payload column next to a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so the bytes never leave the
executor and Python sees whole batches, not rows. The container ships
no image/audio codecs, so the codec call itself is stubbed
(:data:`REAL_DECODERS` raises NotImplementedError; a deterministic
byte-level fake stands in) — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and oracle-/test-
covered.

Scale notes: payloads ride the same partitions as their metadata (no
separate fetch); a 100 TB media table partitions by content shard and
every stage below is embarrassingly parallel with Arrow transfer as
the only Python tax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spype_spark.registry import query
from spype_spark.tables import load_table

#: Marker for where a real codec would plug in. Keyed by mime type.
REAL_DECODERS: dict[str, object] = {}


def _decode_real(mime: str, payload: bytes):
    """The codec seam: raises until a real decoder library is present."""
    if mime not in REAL_DECODERS:
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment — install one and "
            "register it in spype_spark.queries.multimodal.REAL_DECODERS"
        )
    return REAL_DECODERS[mime](payload)  # pragma: no cover


def with_payload(d: DataFrame) -> DataFrame:
    """Attach the multimodal columns: binary payload + typed metadata.

    The corpus has no true media files, so the document text's UTF-8
    bytes stand in as the payload — byte-identical in both engines,
    which keeps the metadata oracle exact.
    """
    return d.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length("text").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           'text/plain' AS mime,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           md5(text) AS content_md5,
           source AS origin
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads: size, content hash, origin.

    The dedup/lineage primitive for media tables — everything computes
    on the payload bytes JVM-side (octet_length, md5), no decode.
    """
    d = load_table(spark, sf_dir, "documents")
    m = with_payload(d)
    return m.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.col("media_meta.origin").alias("origin"),
    )


@query("q_multimodal_decode", oracle=None)  # decode output is codec-defined
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via mapInPandas (deterministic fake codec).

    Batch shape is the real thing: each Arrow batch carries (doc_id,
    payload, mime); the "decoder" emits per-item features — here mean
    byte value ("brightness"), a frame count derived from length
    ("frame sampling" at one frame per 64 bytes), and the first-frame
    checksum. Swapping in a real codec touches only `fake_decode`'s
    body (or registers into REAL_DECODERS); schema, partitioning and
    the Arrow path are unchanged.
    """
    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").repartition(32)
    m = with_payload(d)

    def decode(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            out = {
                "doc_id": pdf["doc_id"],
                "n_frames": payloads.map(lambda b: len(b) // 64 + 1),
                "brightness": payloads.map(
                    lambda b: float(np.frombuffer(b, dtype=np.uint8).mean())
                ),
                "first_frame_sum": payloads.map(
                    lambda b: int(np.frombuffer(b[:64], dtype=np.uint8).sum())
                ),
            }
            yield pd.DataFrame(out)

    return m.select("doc_id", "payload").mapInPandas(
        decode, "doc_id long, n_frames long, brightness double, first_frame_sum long"
    )
