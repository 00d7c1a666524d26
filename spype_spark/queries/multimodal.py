"""Multimodal columns (BASELINE.json north star: "multimodal columns").

Pattern: media is an opaque ``binary`` payload column next to a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so the bytes never leave the
executor and Python sees whole batches, not rows. Two REAL
dependency-free codecs ship in-repo (uncompressed 24-bpp BMP and PCM
WAV — :mod:`spype_spark.codecs`) and are registered in
:data:`REAL_DECODERS`; the decode contract runs payloads through the
actual BMP parser. Formats that need a codec library this container
lacks (MP4 and other video containers) hit the explicit
NotImplementedError seam, with
a deterministic byte-level fake carrying the remaining feature
columns — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is identical either way.

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

from spype_spark.codecs import decode_bmp, decode_jpeg, decode_png, decode_wav

#: Real decoders, keyed by mime type. BMP (uncompressed 24-bpp), WAV
#: (integer PCM), PNG (8-bit RGB/RGBA, zlib inflate + all five
#: scanline filters), and JPEG (baseline sequential huffman —
#: greyscale/YCbCr, 4:4:4/4:2:2/4:2:0, restart markers) ship in-repo
#: as dependency-free parsers (:mod:`spype_spark.codecs`); anything
#: else (MP4 and other video containers…) needs a codec library this
#: container lacks and hits the seam below.
REAL_DECODERS: dict[str, object] = {
    "image/bmp": decode_bmp,
    "audio/wav": decode_wav,
    "image/png": decode_png,
    "image/jpeg": decode_jpeg,
}


def _decode_real(mime: str, payload: bytes):
    """The codec seam: dispatches to a registered real decoder, raises
    for formats no available library covers."""
    if mime not in REAL_DECODERS:
        raise NotImplementedError(
            f"no codec for {mime!r} in this environment — install one and "
            "register it in spype_spark.queries.multimodal.REAL_DECODERS"
        )
    return REAL_DECODERS[mime](payload)


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


@query(
    "q_multimodal_decode",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, strlen(text) AS len,
             COALESCE(list_sum(list_transform(
                 range(1, strlen(text) + 1),
                 i -> ascii(substring(text, i, 1)))), 0) AS byte_sum,
             GREATEST(1, CAST(ceil(strlen(text) / 48.0) AS BIGINT)) AS h
      FROM documents
    )
    SELECT doc_id,
           CAST(len // 64 + 1 AS BIGINT) AS n_frames,
           CASE WHEN len = 0 THEN 0.0
                ELSE CAST(byte_sum AS DOUBLE) / len
           END AS brightness,
           CAST(COALESCE(list_sum(list_transform(
                    range(1, least(len, 64) + 1),
                    i -> ascii(substring(text, i, 1)))), 0) AS BIGINT)
             AS first_frame_sum,
           h AS bmp_h,
           CAST(floor(byte_sum * 10000.0 / (h * 48) + 0.5) AS BIGINT)
             AS px_micro_mean
    FROM t
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract via mapInPandas — fake AND real codec
    branches in one Arrow pass.

    Each Arrow batch carries (doc_id, payload); two feature families
    come back: (a) the byte-level fake ("brightness" = mean byte, a
    64-byte frame count, the first-frame checksum) and (b) a REAL
    decode — the payload bytes are wrapped into a genuine uncompressed
    24-bpp BMP (16 px wide, zero-filled to the last row) and decoded
    back through :data:`REAL_DECODERS`'s actual BMP parser
    (:func:`spype_spark.codecs.decode_bmp`: header validation, padded
    bottom-up row walk), emitting the decoded height and the scaled-
    integer pixel mean floor(sum·1e4/(h·48) + 0.5). The contract raises
    if the decoder disagrees with the encoder's geometry, so a codec
    regression fails the driver gate. The corpus is ASCII (code point
    == byte) and zero-fill is additive identity, so DuckDB recomputes
    every feature — including the real-decode ones — exactly; both
    divisions happen once, in the same operand order, keeping the
    doubles bit-identical.
    """
    import math

    import numpy as np
    import pandas as pd

    from spype_spark.codecs import encode_bmp

    from spype_spark.functions import spread_small_scan

    # scale-adaptive split (was repartition(32); no-op at real scale)
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    m = with_payload(d)
    # Resolve the registered decoder ON THE DRIVER and capture it as a
    # closure local: spype_spark.codecs is registered for by-value
    # pickling, so the codec code ships with the closure — executors
    # never import spype_spark (the foreign-cwd harness rule,
    # ann.py:198). Referencing the module-global _decode_real from
    # inside the closure would pickle THIS module by reference instead.
    dec_bmp = REAL_DECODERS["image/bmp"]

    def decode(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            bmp_h, px_micro = [], []
            for b in payloads:
                b = bytes(b)
                h = max(1, -(-len(b) // 48))
                px = b + b"\x00" * (h * 48 - len(b))
                img = dec_bmp(encode_bmp(px, 16, h))
                if img["width"] != 16 or img["height"] != h:
                    raise AssertionError(
                        f"BMP round-trip geometry broke: {img['width']}"
                        f"x{img['height']} != 16x{h}"
                    )
                s = sum(img["pixels"])
                bmp_h.append(h)
                px_micro.append(
                    int(math.floor(s * 10000.0 / (h * 48) + 0.5))
                )
            out = {
                "doc_id": pdf["doc_id"],
                "n_frames": payloads.map(lambda b: len(b) // 64 + 1),
                "brightness": payloads.map(
                    lambda b: float(
                        np.frombuffer(b, dtype=np.uint8).mean()
                    )
                    if len(b)
                    else 0.0
                ),
                "first_frame_sum": payloads.map(
                    lambda b: int(np.frombuffer(b[:64], dtype=np.uint8).sum())
                ),
                "bmp_h": bmp_h,
                "px_micro_mean": px_micro,
            }
            yield pd.DataFrame(out)

    return m.select("doc_id", "payload").mapInPandas(
        decode,
        "doc_id long, n_frames long, brightness double, "
        "first_frame_sum long, bmp_h long, px_micro_mean long",
    )


@query(
    "q_multimodal_png",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, strlen(text) AS len,
             GREATEST(1, CAST(ceil(strlen(text) / 48.0) AS BIGINT)) AS h,
             COALESCE(list_sum(list_transform(
                 range(1, strlen(text) + 1),
                 i -> ascii(substring(text, i, 1)))), 0) AS byte_sum
      FROM documents
    )
    SELECT doc_id,
           h AS png_h,
           CAST(floor(byte_sum * 10000.0 / (h * 48) + 0.5) AS BIGINT)
             AS px_micro_mean,
           CAST(COALESCE(list_sum(list_transform(
                    range(1, least(len, 48) + 1),
                    i -> ascii(substring(text, i, 1)))), 0) AS BIGINT)
             AS first_row_sum
    FROM t
    """,
)
def q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG decode through the REAL in-repo parser — zlib IDAT inflate
    plus ALL FIVE scanline filters exercised per image.

    Each payload's bytes are wrapped into a genuine 8-bit RGB PNG
    (16 px wide → 48-byte rows, zero-filled to the last row) with the
    per-row filter CYCLING 0→4 (:func:`spype_spark.codecs.encode_png`
    ``filters="cycle"``), then decoded back through
    :data:`REAL_DECODERS`'s PNG parser (chunk CRC validation, inflate,
    None/Sub/Up/Average/Paeth unfilter) inside one Arrow
    ``mapInPandas`` pass. Features: decoded height, the scaled-integer
    pixel mean floor(sum·1e4/(h·48) + 0.5), and the FIRST-ROW byte sum
    — which proves the unfilter chain reconstructed row content and
    order, not just totals (a filter bug scrambles rows; zero-fill is
    additive identity, so DuckDB recomputes every feature exactly on
    the ASCII corpus). The contract raises in-flight if the decoded
    geometry, channel count, or pixel bytes disagree with the encode
    input — a codec regression fails the driver gate, not just a unit
    test. Closes the ROADMAP codec-seam limitation for the web's
    dominant lossless format with zero new dependencies (stdlib zlib).
    """
    import math

    import pandas as pd

    from spype_spark.codecs import encode_png

    from spype_spark.functions import spread_small_scan

    # scale-adaptive split (was repartition(32); no-op at real scale)
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    m = with_payload(d)
    # driver-resolved, closure-captured: codecs ships by value
    dec_png = REAL_DECODERS["image/png"]

    def decode(batches):
        for pdf in batches:
            png_h, px_micro, row0 = [], [], []
            for b in pdf["payload"]:
                b = bytes(b)
                h = max(1, -(-len(b) // 48))
                px = b + b"\x00" * (h * 48 - len(b))
                img = dec_png(encode_png(px, 16, h, filters="cycle"))
                if (
                    img["width"] != 16
                    or img["height"] != h
                    or img["channels"] != 3
                    or img["pixels"] != px
                ):
                    raise AssertionError(
                        f"PNG round-trip broke: {img['width']}x"
                        f"{img['height']}x{img['channels']} for 16x{h}x3"
                    )
                png_h.append(h)
                px_micro.append(
                    int(math.floor(sum(img["pixels"]) * 10000.0 / (h * 48) + 0.5))
                )
                row0.append(sum(img["pixels"][:48]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "png_h": png_h,
                    "px_micro_mean": px_micro,
                    "first_row_sum": row0,
                }
            )

    return m.select("doc_id", "payload").mapInPandas(
        decode,
        "doc_id long, png_h long, px_micro_mean long, first_row_sum long",
    )


@query(
    "q_multimodal_jpeg",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             list_transform(range(0, 9),
               i -> CASE WHEN strlen(text) > i
                         THEN ascii(substring(text, i + 1, 1))
                         ELSE 0 END) AS bv
      FROM documents
    )
    SELECT doc_id,
           CAST(64 * list_sum(bv) AS BIGINT) AS px_sum,
           CAST(8 * (bv[1] + bv[2] + bv[3]) AS BIGINT) AS first_row_sum
    FROM b
    """,
)
def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG decode through the REAL in-repo baseline codec — huffman
    entropy coding, marker stream, restart intervals, and the DCT
    pipeline exercised per image (VERDICT r12 task 4; closes the
    JPEG seam the way PNG closed lossless in r12).

    Each document derives a deterministic 24×24 greyscale image of
    nine 8×8 CONSTANT blocks whose values are the text's first nine
    bytes (zero-filled) — constant blocks are DC-only, and at quality
    100 the IJG-scaled tables are all ones, so the encode→decode
    round trip is BIT-EXACT (pinned in tests/test_codecs.py): the
    lossy format becomes oracle-hashable without weakening the codec
    path. ``restart_interval=2`` forces DRI/RSTn markers and DC
    -predictor resets mid-scan. The contract asserts the decoded
    pixels equal the constructed image in-flight, then emits the
    total pixel sum (= 64·Σ block values — all blocks decoded, all
    positions) and the first-ROW sum (= 8·(b0+b1+b2) — block order,
    not just totals); DuckDB recomputes both exactly from the ASCII
    corpus. A huffman, zigzag, IDCT, or restart regression breaks the
    hash at the driver gate, not just a unit test.
    """
    import pandas as pd

    from spype_spark.codecs import decode_jpeg, encode_jpeg

    from spype_spark.functions import spread_small_scan

    # scale-adaptive split (was repartition(32); no-op at real scale)
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    m = with_payload(d)
    dec_jpeg = REAL_DECODERS["image/jpeg"]
    assert dec_jpeg is decode_jpeg

    def run(batches):
        for pdf in batches:
            px_sum, row0 = [], []
            for b in pdf["payload"]:
                bv = (bytes(b)[:9] + b"\x00" * 9)[:9]
                px = bytearray(24 * 24)
                for bi in range(3):
                    for bj in range(3):
                        v = bv[bi * 3 + bj]
                        for r in range(8):
                            row = (bi * 8 + r) * 24 + bj * 8
                            px[row : row + 8] = bytes([v]) * 8
                px = bytes(px)
                img = dec_jpeg(
                    encode_jpeg(
                        px, 24, 24, channels=1, quality=100,
                        restart_interval=2,
                    )
                )
                if (
                    img["width"] != 24
                    or img["height"] != 24
                    or img["channels"] != 1
                    or img["pixels"] != px
                ):
                    raise AssertionError(
                        "JPEG constant-block round trip broke: "
                        f"{img['width']}x{img['height']}x{img['channels']}"
                    )
                px_sum.append(sum(img["pixels"]))
                row0.append(sum(img["pixels"][:24]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "px_sum": px_sum,
                    "first_row_sum": row0,
                }
            )

    return m.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, px_sum long, first_row_sum long"
    )


#: Frame geometry for the byte-signal fakes: a "frame" is 64 bytes,
#: sampled every 256 bytes (stride 4 frames) — the shape of 1-in-N
#: video frame sampling.
_FRAME_LEN = 64
_FRAME_STRIDE = 256


@query(
    "q_multimodal_framesample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(floor((length(text) - 1) / {_FRAME_STRIDE})
                                  AS BIGINT) + 1)) AS frame_idx
      FROM documents
    )
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(length(substring(text, CAST(frame_idx * {_FRAME_STRIDE} + 1 AS INT),
                                 {_FRAME_LEN})) AS INT) AS frame_bytes,
           CAST(list_sum(list_transform(
                  range(1, length(substring(text,
                        CAST(frame_idx * {_FRAME_STRIDE} + 1 AS INT),
                        {_FRAME_LEN})) + 1),
                  i -> ascii(substring(text,
                        CAST(frame_idx * {_FRAME_STRIDE} AS INT) + i, 1))))
                AS BIGINT) AS frame_sum
    FROM f
    """,
)
def q_multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-in-N frame sampling: one media item explodes into its sampled
    frames (every 256th byte offset, 64-byte frames), each with its
    byte count and checksum.

    The explode-shaped media op (item → frame rows) — and unlike a real
    codec it is fully expression-based (sequence/explode/substring/
    aggregate, zero Python), so the per-frame checksums are
    oracle-exact on the ASCII corpus where code point == byte. A real
    video codec swaps the substring for a frame decode at the SAME
    (doc, frame_idx) grain; partitioning and row shape are unchanged.
    """
    d = load_table(spark, sf_dir, "documents")
    n_frames = (F.floor((F.length("text") - 1) / _FRAME_STRIDE) + 1).cast("int")
    # Guard the empty-text case: sequence(0, -1) DESCENDS in Spark and
    # would emit two spurious frames where the oracle's range(0, 0) is
    # empty — same descending-sequence pitfall word_shingles guards.
    idx_seq = F.when(
        n_frames >= 1, F.sequence(F.lit(0), n_frames - 1)
    ).otherwise(F.array().cast("array<int>"))
    frames = d.select(
        "doc_id",
        "text",
        F.explode(idx_seq).alias("frame_idx"),
    )
    frame = F.expr(
        f"substring(text, frame_idx * {_FRAME_STRIDE} + 1, {_FRAME_LEN})"
    )
    frame_sum = F.expr(
        f"""
        CAST(aggregate(
          transform(sequence(1, length(substring(text,
                    frame_idx * {_FRAME_STRIDE} + 1, {_FRAME_LEN}))),
            i -> ascii(substring(text, frame_idx * {_FRAME_STRIDE} + i, 1))),
          0L, (a, c) -> a + c) AS BIGINT)
        """
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length(frame).alias("frame_bytes"),
        frame_sum.alias("frame_sum"),
    )


#: Resize oracle: the payload is the document's UTF-8 bytes (ASCII
#: corpus ⇒ code point == byte), so the 16-bin block-average thumbnail
#: is fully reproducible in SQL. Bin index floor((i−1)·16/len) and
#: micro-mean floor(sum·10000.0/count + 0.5) use the IDENTICAL
#: double-arithmetic order as the numpy kernel, so the integer strings
#: match bit-for-bit; empty bins (len < 16) emit 0 on both sides.
_RESIZE_ORACLE = """
    WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
    pos AS (
      SELECT doc_id, len, text, unnest(range(1, len + 1)) AS i FROM t
    ),
    binned AS (
      SELECT doc_id,
             CAST(floor((i - 1) * 16.0 / len) AS BIGINT) AS bin,
             SUM(ascii(substr(text, i, 1))) AS s,
             COUNT(*) AS c
      FROM pos GROUP BY doc_id, bin
    ),
    grid AS (
      SELECT t.doc_id, b.bin
      FROM t CROSS JOIN (SELECT unnest(range(0, 16)) AS bin) b
    ),
    micro AS (
      SELECT grid.doc_id, grid.bin,
             COALESCE(CAST(floor(s * 10000.0 / c + 0.5) AS BIGINT), 0) AS m
      FROM grid LEFT JOIN binned
        ON binned.doc_id = grid.doc_id AND binned.bin = grid.bin
    )
    SELECT doc_id,
           string_agg(CAST(m AS VARCHAR), ',' ORDER BY bin) AS thumb16
    FROM micro GROUP BY doc_id
    """


@query("q_multimodal_resize", oracle=_RESIZE_ORACLE)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Resize" kernel: block-average the byte signal down to a fixed
    16-bin thumbnail vector per item, via the Arrow mapInPandas path a
    real image resize runs on (bytes → numpy → kernel → fixed-width
    feature row). Deterministic fake (position-binned byte means as
    scaled-integer micro-values floor(mean·1e4 + 0.5), emitted as a
    joined string — integer strings are canonicalizer-safe AND
    bit-reproducible by the SQL oracle, unlike printf'd floats whose
    half-even rounding is library-specific); swapping in a real
    resampler touches only the numpy body. Also verified against an
    independent local recompute in tests/test_multimodal.py.
    """
    import numpy as np
    import pandas as pd

    from spype_spark.functions import spread_small_scan

    # scale-adaptive split (was repartition(32); no-op at real scale)
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    m = with_payload(d)
    n_bins = 16

    def resize(batches):
        for pdf in batches:
            thumbs = []
            for b in pdf["payload"]:
                a = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
                bins = np.floor(np.arange(len(a)) * n_bins / len(a)).astype(
                    np.int64
                )
                sums = np.bincount(bins, weights=a, minlength=n_bins)
                counts = np.bincount(bins, minlength=n_bins)
                # micro-means via s*10000.0/c (NOT (s/c)*10000): the
                # oracle divides in this order, and FP division is the
                # contract's bit boundary
                micro = np.floor(
                    np.divide(
                        sums * 10000.0,
                        counts,
                        out=np.zeros(n_bins),
                        where=counts > 0,
                    )
                    + 0.5
                ).astype(np.int64)
                thumbs.append(",".join(str(x) for x in micro))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "thumb16": thumbs}
            )

    return m.select("doc_id", "payload").mapInPandas(
        resize, "doc_id long, thumb16 string"
    )


@query(
    "q_multimodal_audio",
    oracle="""
    WITH t AS (
      SELECT doc_id, text, strlen(text) AS len,
             CAST((strlen(text) + strlen(text) % 2) / 2 AS BIGINT) AS n
      FROM documents
    ),
    s AS (
      SELECT doc_id, n,
             COALESCE(list_sum(list_transform(
                 range(0, CAST(n AS BIGINT)),
                 i -> ascii(substring(text, CAST(2*i + 1 AS INT), 1))
                      + 256 * CASE WHEN 2*i + 2 <= len
                              THEN ascii(substring(text, CAST(2*i + 2 AS INT), 1))
                              ELSE 0 END)), 0) AS ssum
      FROM t
    )
    SELECT doc_id,
           n AS n_frames,
           CAST(8000 AS BIGINT) AS sample_rate,
           CASE WHEN n = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(floor(ssum * 10000.0 / n + 0.5) AS BIGINT)
           END AS sample_micro_mean
    FROM s
    """,
)
def q_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode via the REAL WAV parser: each payload's bytes are
    wrapped into a genuine RIFF/WAVE 16-bit PCM file (zero-padded to an
    even byte count) and decoded back through
    :func:`spype_spark.codecs.decode_wav` — full chunk walk, fmt
    validation, little-endian frame extraction — inside one Arrow
    ``mapInPandas`` pass. Features: frame count, the sample rate READ
    BACK from the decoded header (a regression here means the parser
    mis-read fmt), and the scaled-integer sample mean
    floor(sum·1e4/n + 0.5).

    The corpus is ASCII, so every 16-bit sample is
    byte[2i] + 256·byte[2i+1] with both bytes < 128 — positive,
    exactly integer — and DuckDB replays the decode arithmetically:
    the whole codec path is driver-hash-checked. Raises in-contract if
    the decoded frame count or rate disagrees with the encode
    parameters.
    """
    import math

    import pandas as pd

    from spype_spark.codecs import encode_wav

    from spype_spark.functions import spread_small_scan

    # scale-adaptive split (was repartition(32); no-op at real scale)
    d = spread_small_scan(load_table(spark, sf_dir, "documents"))
    m = with_payload(d)
    # driver-resolved, closure-captured: codecs ships by value
    dec_wav = REAL_DECODERS["audio/wav"]

    def decode(batches):
        for pdf in batches:
            n_frames, rates, micro = [], [], []
            for b in pdf["payload"]:
                b = bytes(b)
                raw = b + (b"\x00" if len(b) % 2 else b"")
                w = dec_wav(encode_wav(raw, sample_rate=8000))
                if w["n_frames"] != len(raw) // 2 or w["bits"] != 16:
                    raise AssertionError(
                        f"WAV round-trip geometry broke: {w['n_frames']} "
                        f"frames of {w['bits']} bits for {len(raw)} bytes"
                    )
                s = sum(w["samples"])
                n = w["n_frames"]
                n_frames.append(n)
                rates.append(w["sample_rate"])
                micro.append(
                    int(math.floor(s * 10000.0 / n + 0.5)) if n else 0
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": n_frames,
                    "sample_rate": rates,
                    "sample_micro_mean": micro,
                }
            )

    return m.select("doc_id", "payload").mapInPandas(
        decode,
        "doc_id long, n_frames long, sample_rate long, sample_micro_mean long",
    )
