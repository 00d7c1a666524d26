"""Embedding clustering contract: distributed spherical k-means.

The document-clustering step of a training-data pipeline (topic
balancing, domain discovery, cluster-based curriculum/mixing — the
step between "embedded corpus" and "data mixture"). IVF (ann.py) uses
a seed-set coarse quantizer and notes "production would k-means them,
identical plumbing"; this contract IS that plumbing, run for a full
Lloyd round: seed-set init → assign → centroid update → re-assign.

Every stage is deterministic closed-form arithmetic, so the ENTIRE
iteration replays in the DuckDB oracle (same discipline as the
IVF/PQ/NN-descent full oracles):

- assignment dots are index-ordered folds (Spark ``aggregate`` fold ≡
  DuckDB ``list_sum`` — the bit-parity the ANN family established);
- the centroid update is the k-means step that normally breaks
  cross-engine determinism (an unordered float mean over arbitrary
  member sets); here each member coordinate is quantized once to a
  1e-7-grid integer and the mean is an exact integer sum ÷ count —
  order-free under any partitioning, bit-identical across engines
  (the same scaled-long discipline as ``_util.dsum``);
- the re-assignment score is cosine against the updated centroid
  (dot ÷ index-ordered norm fold; sqrt and division are single
  correctly-rounded IEEE ops).

Scale (100 TB): assignment is a broadcast join against the k-row
centroid table + one per-vector window argmax (linear, the IVF
assignment stage); the update is posexplode to (cell, dim) grain with
map-side partial sums — the shuffle moves O(k·d·partitions) partial
rows, never the vectors. More Lloyd rounds = repeating two linear
stages; k scales to thousands before the broadcast table matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spype_spark.ann import _dot_hof, _normalize
from spype_spark.registry import query
from spype_spark.tables import load_table

#: Cluster-count floor (seed-set init: the k lowest vec_ids).
_K_MIN = 8
#: Auto-scaler target cell occupancy: k = max(_K_MIN, n // _CELL_TARGET),
#: so mean cell size holds at ~250 vectors as the corpus grows — the
#: k ∝ n growth SemDeDup needs to keep its Σ|cell|² pair stage LINEAR
#: in n (same law as the LSH band autoscaler and IVF_CELL_TARGET).
#: Fixpoints: k = 8 up through sf0.1's 2 000 vectors (contract results
#: unchanged at every committed SF), k = 160 at the 20× replica probe.
#: The oracle computes the SAME k from COUNT(*), so the scaled contract
#: replays deterministically at any SF.
_CELL_TARGET = 250
#: (session id, memo key) → resolved k, so repeated contract calls over
#: one corpus skip the count() job (mirrors ann._NBLOCKS_MEMO).
_K_MEMO: dict[tuple[int, str], int] = {}
#: Coordinate quantization grid for the centroid update (1e-7: unit-norm
#: coordinates carry ~7 significant decimals in float32).
_QSCALE = "1e7"


def auto_k(e: DataFrame, memo_key: str | None = None) -> int:
    """k for a corpus: ``max(_K_MIN, n // _CELL_TARGET)`` (one
    metadata-sized count() job, memoized per session+corpus)."""
    if memo_key is not None:
        mk = (id(e.sparkSession), memo_key)
        k = _K_MEMO.get(mk)
        if k is None:
            k = max(_K_MIN, e.count() // _CELL_TARGET)
            _K_MEMO[mk] = k
        return k
    return max(_K_MIN, e.count() // _CELL_TARGET)

#: Shared CTE block replaying the full Lloyd round in SQL (init →
#: assign → quantized-integer centroid update → re-score); ends at
#: ``s2`` (vec × cell cosine vs the updated centroids) with ``e``
#: still in scope. Used by both the k-means and SemDeDup full oracles.
_KMEANS_CTES = f"""e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ),
    kp AS (
      -- the auto-scaled cluster count, replayed from the data itself:
      -- k = max({_K_MIN}, n // {_CELL_TARGET}), same law as auto_k()
      SELECT GREATEST({_K_MIN}, COUNT(*) // {_CELL_TARGET}) AS k FROM e
    ),
    c0 AS (
      SELECT CAST(rn - 1 AS INT) AS cell_id, emb AS cent
      FROM (SELECT emb, row_number() OVER (ORDER BY vec_id) AS rn FROM e) t
      WHERE rn <= (SELECT k FROM kp)
    ),
    s1 AS (
      SELECT e.vec_id, c.cell_id,
             list_sum(list_transform(range(1, 65),
                                     i -> e.emb[i] * c.cent[i])) AS score
      FROM e, c0 c
    ),
    a1 AS (
      SELECT vec_id, cell_id FROM (
        SELECT vec_id, cell_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, cell_id) AS rnk
        FROM s1) t
      WHERE rnk = 1
    ),
    mem AS (SELECT a1.cell_id, e.emb FROM a1 JOIN e USING (vec_id)),
    dimsum AS (
      SELECT cell_id, CAST(r.dim AS INT) AS dim,
             CAST(SUM(CAST(floor(emb[CAST(r.dim AS INT)] * {_QSCALE} + 0.5)
                           AS BIGINT)) AS DOUBLE)
               / COUNT(*) / {_QSCALE} AS mean
      FROM mem, range(1, 65) r(dim)
      GROUP BY 1, 2
    ),
    c1 AS (
      SELECT cell_id, list(mean ORDER BY dim) AS cent
      FROM dimsum GROUP BY cell_id
    ),
    n1 AS (
      SELECT cell_id, cent,
             sqrt(list_sum(list_transform(range(1, 65),
                                          i -> cent[i] * cent[i]))) AS nrm
      FROM c1
    ),
    s2 AS (
      SELECT e.vec_id, c.cell_id,
             list_sum(list_transform(range(1, 65),
                                     i -> e.emb[i] * c.cent[i])) / c.nrm
               AS score
      FROM e, n1 c
    ),
    a2 AS (
      SELECT vec_id, cell_id, score FROM (
        SELECT vec_id, cell_id, score,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, cell_id) AS rnk
        FROM s2) t
      WHERE rnk = 1
    )"""

_KMEANS_ORACLE = f"""
    WITH {_KMEANS_CTES}
    SELECT vec_id, CAST(cell_id AS INT) AS cluster,
           round(score, 6) AS cohesion
    FROM a2
    """


def kmeans_assign(
    spark: SparkSession, sf_dir: str, k: int | None = None
) -> DataFrame:
    """Run the full Lloyd round and return every vector's final
    assignment: (vec_id, cell_id, score, embedding).

    The Spark mirror of :data:`_KMEANS_CTES` — shared by the k-means
    and SemDeDup contracts. Both assignment rounds run as tiled GEMM
    passes (:func:`spype_spark.ann.centroid_assign`): n·k·d multiplies
    inside numpy instead of n·k interpreted HOF folds, no per-vector
    window shuffle (the argmax happens inside the tile task). Bit-
    parity with the oracle's ``list_sum`` fold is the same empirical
    invariant every exact-cosine/IVF contract is verified on — the
    differential check re-proves it for this kernel at every SF.
    ``k=None`` (the contracts' setting) auto-scales via :func:`auto_k`
    — k grows ∝ n to hold mean cell occupancy at ``_CELL_TARGET``
    vectors, and the oracle recomputes the identical k from COUNT(*).
    An explicit ``k`` overrides (kernel probes, ablations).
    """
    from spype_spark.ann import centroid_assign

    e = _normalize(load_table(spark, sf_dir, "embeddings"), "vec_id", "embedding")

    memo = f"{sf_dir}/embeddings:kmeans"
    if k is None:
        k = auto_k(e, memo_key=memo)

    # init: the k lowest vec_ids (same seed-set convention as ivf_ann).
    w0 = Window.orderBy("vec_id")
    c0 = (
        e.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(w0) - 1).cast("int").alias("cell_id"),
            F.col("embedding").alias("cent"),
        )
    )

    # round 1: argmax dot against the unit-norm seed centroids.
    a1 = (
        centroid_assign(e, c0, memo_key=memo)
        .select("vec_id", "cell_id")
        .join(e, "vec_id")
    )

    # centroid update: exact integer mean per (cell, dim) on the 1e-7
    # grid — order-free, so any shuffle layout gives the same centroid.
    qscale = float(_QSCALE.replace("e", "E"))
    dims = a1.select(
        "cell_id", F.posexplode("embedding").alias("dim0", "val")
    ).select(
        "cell_id",
        (F.col("dim0") + 1).cast("int").alias("dim"),
        F.floor(F.col("val") * F.lit(qscale) + F.lit(0.5))
        .cast("bigint")
        .alias("q"),
    )
    dimsum = dims.groupBy("cell_id", "dim").agg(
        (F.sum("q").cast("double") / F.count("*") / F.lit(qscale)).alias("mean")
    )
    c1 = dimsum.groupBy("cell_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean"))),
            lambda t: t.mean,
        ).alias("cent")
    )
    # the k-row norm column stays on the JVM fold (_dot_hof): it is the
    # oracle's exact expression and costs k rows, not n.
    n1 = c1.select(
        "cell_id",
        "cent",
        F.sqrt(_dot_hof(F.col("cent"), F.col("cent"))).alias("nrm"),
    # k rows. Cut the lineage (r15 opt): round 2 consumes n1 through
    # TWO branches (cents + norms), each of which would otherwise
    # embed the whole round-1 GEMM + centroid-update subtree — the
    # final plan ran the round-1 assignment twice and the plan carried
    # 3 MapInPandas GEMM passes for a 2-round Lloyd. With the cut the
    # executed work is exactly one GEMM per round.
    ).localCheckpoint(eager=False)

    # round 2: cosine against the updated (non-unit) centroids.
    a2 = centroid_assign(
        e,
        n1.select("cell_id", "cent"),
        norms=n1.select("cell_id", "nrm"),
        memo_key=memo,
    )
    return a2.join(e, "vec_id").select("vec_id", "cell_id", "score", "embedding")


@query("q_cluster_kmeans", oracle=_KMEANS_ORACLE)
def q_cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spherical k-means over the embeddings (k auto-scaled —
    ``max(8, n // 250)``, one full Lloyd round), every vector labeled
    with its final cluster and cosine cohesion to the updated centroid.

    Full row-level oracle: seed-set init plus the quantized-integer
    centroid mean make both assignment rounds closed-form, so DuckDB
    replays init → assign → update → re-assign exactly and the final
    (vec_id, cluster, cohesion) rows hash-match at every SF. See the
    module docstring for the determinism and 100 TB scale argument.
    """
    return kmeans_assign(spark, sf_dir).select(
        "vec_id",
        F.col("cell_id").cast("int").alias("cluster"),
        F.round("score", 6).alias("cohesion"),
    )


#: SemDeDup drop threshold: same cosine bar as q_dedup_embed_cosine.
_SEMDEDUP_TAU = 0.35

_SEMDEDUP_ORACLE = f"""
    WITH {_KMEANS_CTES},
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM a2 a JOIN a2 b
        ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
      JOIN e ea ON ea.vec_id = a.vec_id
      JOIN e eb ON eb.vec_id = b.vec_id
      WHERE list_sum(list_transform(range(1, 65),
                                    i -> ea.emb[i] * eb.emb[i]))
            >= {_SEMDEDUP_TAU}
    )
    SELECT a2.vec_id, CAST(a2.cell_id AS INT) AS cluster
    FROM a2 LEFT JOIN dropped d ON a2.vec_id = d.vec_id
    WHERE d.vec_id IS NULL
    """


@query("q_dedup_semdedup", oracle=_SEMDEDUP_ORACLE)
def q_dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup by clustering the
    embedding space, then dropping near-duplicates *within* each
    cluster — a vector is dropped iff a lower-id cluster-mate sits at
    cosine ≥ 0.35. Output: the surviving (vec_id, cluster) rows.

    The production embedding-dedup recipe for web-scale corpora: exact
    all-pairs cosine is n², so the k-means cells act as blocking keys
    and the quadratic stage runs only inside a cell — Σ|cell|² work,
    with k grown ∝ n by :func:`auto_k` to hold cells at ~250 vectors
    (the same bound the LSH band autoscaler and IVF cells enforce; the
    oracle recomputes the scaled k from COUNT(*), so the contract stays
    row-exact at ANY corpus size, not just the k=8 fixpoint).
    The pair stage is a self-equi-join on cell_id (hash join, never a
    cartesian), the keep rule is min-id domination (deterministic, no
    iteration), and survivors come from one anti-join. Shares the full
    Lloyd-round oracle with q_cluster_kmeans, so the whole pipeline —
    clustering included — replays row-exactly in DuckDB.
    """
    from spype_spark.ann import cell_pairs_threshold

    a2 = kmeans_assign(spark, sf_dir).localCheckpoint(eager=False)
    # pair stage: one self-GEMM per cell (Σ|cell|² numpy work, never a
    # per-pair HOF fold); only above-threshold (u < v) pairs come back.
    dropped = (
        cell_pairs_threshold(a2.select("vec_id", "cell_id", "embedding"),
                             _SEMDEDUP_TAU)
        .select(F.col("v").alias("vec_id"))
        .distinct()
    )
    return (
        a2.join(dropped, "vec_id", "left_anti")
        .select("vec_id", F.col("cell_id").cast("int").alias("cluster"))
    )
