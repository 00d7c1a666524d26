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
    from spype_spark.functions import spread_small_scan

    d = load_table(spark, sf_dir, "documents")
    sh = (
        spread_small_scan(d.select("doc_id", "text"))
        .select("doc_id", F.explode(word_shingles("text", 3)).alias("shingle"))
        .distinct()
    )
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


# ---------------------------------------------------------------------------
# Round-3 additions: repetition signals, PII redaction, run collapse,
# weighted source mixing.
# ---------------------------------------------------------------------------

#: Gopher-style repetition thresholds (tuned so the corpus yields a mix
#: of flagged/unflagged docs — see q_text_repetition).
_TOP_WORD_MAX = 0.12
_DUP_2GRAM_MAX = 0.55

#: PII regexes — RE2-compatible (no lookaround/backrefs) so Spark's
#: Java regex and DuckDB's RE2 agree byte-for-byte.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b555-\d{3}-\d{4}\b"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@query(
    "q_text_repetition",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), g AS (
      SELECT doc_id, ws, len(ws) AS n,
             list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
               AS tg
      FROM t
    )
    SELECT doc_id,
           CAST(n AS INT) AS n_words,
           list_max(list_transform(list_distinct(ws),
                    w -> len(list_filter(ws, x -> x = w)))) / n
             AS top_word_frac,
           (len(tg) - len(list_distinct(tg))) / len(tg) AS dup_2gram_frac,
           (list_max(list_transform(list_distinct(ws),
                     w -> len(list_filter(ws, x -> x = w)))) / n
              > {_TOP_WORD_MAX}
            OR (len(tg) - len(list_distinct(tg))) / len(tg)
              > {_DUP_2GRAM_MAX}) AS repetitive
    FROM g
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: most-frequent-word share and
    duplicate-2-gram share per document, plus the reject flag.

    The quality-filter step that catches degenerate/boilerplate text
    ("batch batch batch…"). Everything is per-row JVM higher-order-
    function work over the split array — zero shuffles, zero Python;
    at 100 TB this runs at scan speed inside whole-stage codegen. The
    mode-of-array is O(distinct·n) per row via transform+filter, which
    beats an explode+groupBy (two shuffles) for docs bounded at a few
    kilotokens; both fracs are single int/int divisions so the flag
    thresholds are engine-deterministic.
    """
    d = load_table(spark, sf_dir, "documents").withColumn(
        "ws", F.split(F.col("text"), " ")
    )
    top_cnt = F.expr(
        "array_max(transform(array_distinct(ws), w -> size(filter(ws, x -> x = w))))"
    )
    tg = F.expr(
        "transform(sequence(1, size(ws) - 1),"
        " i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))"
    )
    d = d.withColumn("tg", tg)
    n = F.size("ws")
    n2 = F.size("tg")
    top_frac = top_cnt / n
    dup_frac = (n2 - F.size(F.array_distinct(F.col("tg")))) / n2
    return d.select(
        "doc_id",
        n.alias("n_words"),
        top_frac.alias("top_word_frac"),
        dup_frac.alias("dup_2gram_frac"),
        ((top_frac > _TOP_WORD_MAX) | (dup_frac > _DUP_2GRAM_MAX)).alias(
            "repetitive"
        ),
    )


@query(
    "q_text_pii_redact",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             text || ' reach user' || CAST(doc_id AS VARCHAR)
                  || '@example.com call 555-123-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
               AS payload
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(payload, '{_EMAIL_RE}'))
              + len(regexp_extract_all(payload, '{_PHONE_RE}'))
              + len(regexp_extract_all(payload, '{_IP_RE}')) AS INT) AS n_pii,
           regexp_replace(
             regexp_replace(
               regexp_replace(payload, '{_EMAIL_RE}', '<EMAIL>', 'g'),
               '{_PHONE_RE}', '<PHONE>', 'g'),
             '{_IP_RE}', '<IP>', 'g') AS redacted
    FROM p
    """,
)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: find-and-mask emails, phone numbers, and IPv4
    addresses, with a per-doc match count.

    The corpus is synthetic (no real PII), so each doc gets a
    deterministic contact trailer derived from its id — the redactor
    then has real work whose output both engines must reproduce
    byte-for-byte. Patterns are RE2-safe (no lookaround) so Java and
    RE2 semantics coincide. Pure JVM regexp work at scan speed; the
    count uses ``regexp_count`` (no extract-then-size array
    materialization).
    """
    d = load_table(spark, sf_dir, "documents")
    payload = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call 555-123-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    d = d.withColumn("payload", payload)
    n_pii = (
        F.regexp_count("payload", F.lit(_EMAIL_RE))
        + F.regexp_count("payload", F.lit(_PHONE_RE))
        + F.regexp_count("payload", F.lit(_IP_RE))
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("payload", _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IP_RE,
        "<IP>",
    )
    return d.select(
        "doc_id", n_pii.cast("int").alias("n_pii"), redacted.alias("redacted")
    )


@query(
    "q_text_collapse_runs",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ), k AS (
      SELECT doc_id, ws,
             list_filter(range(1, len(ws) + 1),
               i -> CASE WHEN i = 1 THEN true ELSE ws[i] <> ws[i-1] END)
               AS keep_idx
      FROM t
    )
    SELECT doc_id,
           array_to_string(list_transform(keep_idx, i -> ws[i]), ' ')
             AS clean_text,
           CAST(len(ws) - len(keep_idx) AS INT) AS n_removed
    FROM k
    """,
)
def q_text_collapse_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-duplicate-token collapse ("batch batch batch" →
    "batch"), with the per-doc removal count.

    The cheap repetition *repair* (vs q_text_repetition's reject
    flag): crawled text is full of stutter artifacts. Keep-indices are
    a lazy-CASE filter over positions — CASE (not OR) because neither
    engine guarantees boolean short-circuit and position 0 is
    out-of-bounds on the Spark side. Zero shuffles, all inside
    whole-stage codegen.
    """
    d = load_table(spark, sf_dir, "documents").withColumn(
        "ws", F.split(F.col("text"), " ")
    )
    keep_idx = F.expr(
        "filter(sequence(1, size(ws)), i -> CASE WHEN i = 1 THEN true"
        " ELSE element_at(ws, i) != element_at(ws, i - 1) END)"
    )
    d = d.withColumn("keep_idx", keep_idx)
    clean = F.array_join(
        F.expr("transform(keep_idx, i -> element_at(ws, i))"), " "
    )
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        (F.size("ws") - F.size("keep_idx")).alias("n_removed"),
    )


#: Deterministic per-source mixture weight: 1 + (source index % 4)·2
#: ∈ {1,3,5,7} — an arbitrary-but-fixed non-uniform target so the mix
#: actually reweights (the corpus itself is uniform per source).
_MIX_W_SQL = "1 + (CAST(substr(source, 4) AS INT) % 4) * 2"
_MIX_RESOLUTION = 10000

_FP_SQL = """
    CAST(list_reduce(list_prepend(0, list_transform(string_split(text, ' '),
           w -> list_reduce(
                  list_prepend(0, list_transform(range(1, length(w) + 1),
                                                 i -> ascii(w[i]))),
                  (a, c) -> (a * 31 + c) % 1000003))),
         (a, x) -> (a * 131 + x) % 1000003) AS BIGINT)
"""


@query(
    "q_dataset_mix_weighted",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source, {_FP_SQL} AS fp FROM documents
    ), stats AS (
      SELECT source, COUNT(*) AS n_s, {_MIX_W_SQL} AS w
      FROM documents GROUP BY source
    ), tot AS (
      SELECT SUM(n_s) AS n_total, SUM(w) AS sum_w FROM stats
    ), thr AS (
      SELECT source,
             CAST(floor(least(1.0, (w * n_total) / (sum_w * n_s))
                        * {_MIX_RESOLUTION}) AS BIGINT) AS thr
      FROM stats, tot
    )
    SELECT f.doc_id, f.source
    FROM fp f JOIN thr t ON t.source = f.source
    WHERE f.fp % {_MIX_RESOLUTION} < t.thr
    """,
)
def q_dataset_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing: subsample each source to a target
    mixture share via content-addressed hash thresholding.

    The domain-reweighting step of a pretraining data recipe (e.g.
    DoReMi-style weights): per-source keep-rate = min(1,
    target_share / observed_share), membership decided by
    ``fingerprint % R < rate·R``. Content-addressing makes the kept
    set stable under re-sharding and re-crawls (same property as
    q_dataset_split); upweighted sources saturate at keep-all —
    oversampling is an epoch/repetition concern, not a filter's. The
    per-source stats are a dimension-sized aggregate (broadcast both
    ways); the fact table is touched once, filtered at scan speed.
    """
    from spype_spark.functions import text_fingerprint

    d = load_table(spark, sf_dir, "documents").withColumn(
        "fp", text_fingerprint("text")
    )
    stats = (
        d.groupBy("source")
        .agg(F.count("*").alias("n_s"))
        .withColumn("w", F.expr(_MIX_W_SQL))
    )
    tot = stats.agg(
        F.sum("n_s").alias("n_total"), F.sum("w").alias("sum_w")
    )
    thr = (
        stats.crossJoin(F.broadcast(tot))
        .withColumn(
            "thr",
            F.floor(
                F.least(
                    F.lit(1.0),
                    (F.col("w") * F.col("n_total"))
                    / (F.col("sum_w") * F.col("n_s")),
                )
                * _MIX_RESOLUTION
            ).cast("long"),
        )
        .select("source", "thr")
    )
    return (
        d.join(F.broadcast(thr), "source")
        .filter(F.col("fp") % _MIX_RESOLUTION < F.col("thr"))
        .select("doc_id", "source")
    )


#: Stratified-sample keep fraction: 1/5 of each stratum (q_sample_stratified).
_STRAT_DENOM = 5
#: Passage grain for cross-document passage dedup (q_text_paragraph_dedup).
_CHUNK_WORDS = 8


@query(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(text), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents) t
    WHERE rn <= ceil(n / {_STRAT_DENOM}.0)
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact stratified sampling: precisely ⌈n/5⌉ documents per
    language stratum, chosen by content-hash order.

    `df.sample`/`sampleBy` draw a *rate*, so the per-stratum count
    varies run to run; balanced-subset curation (eval sets, per-lang
    budget caps) needs the exact count. One window pair over the lang
    partitioning computes the stratum size and the content-addressed
    rank in the same shuffle — no per-stratum driver loop, no second
    pass. md5 order makes the sample re-shard-stable, the same
    property as q_dataset_cap_per_source (that contract caps at a
    constant; this one takes an exact fraction of each stratum).
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang")
    wo = w.orderBy(F.md5(F.col("text").cast("binary")), F.asc("doc_id"))
    return (
        d.withColumn("rn", F.row_number().over(wo))
        .withColumn("n", F.count("*").over(w))
        .filter(F.col("rn") <= F.ceil(F.col("n") / float(_STRAT_DENOM)))
        .select("doc_id", "lang")
    )


@query(
    "q_text_paragraph_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents
    ),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(0, CAST(ceil(len(toks) / {_CHUNK_WORDS}.0)
                                  AS BIGINT))) AS chunk_idx
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, chunk_idx,
             md5(array_to_string(
               list_slice(toks, chunk_idx * {_CHUNK_WORDS} + 1,
                          chunk_idx * {_CHUNK_WORDS} + {_CHUNK_WORDS}),
               ' ')) AS chunk_h
      FROM idx
    ),
    ranked AS (
      SELECT doc_id, chunk_idx,
             row_number() OVER (PARTITION BY chunk_h
                                ORDER BY doc_id, chunk_idx) AS occ
      FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS keep_frac
    FROM ranked
    GROUP BY doc_id
    """,
)
def q_text_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document passage dedup: explode documents into 8-word
    passages, mark every repeated passage occurrence (first occurrence
    by (doc_id, position) is canonical), report per-doc dup share.

    The CCNet/RefinedWeb passage-dedup shape — the corpus-wide "remove
    duplicated boilerplate lines" step that exact-doc dedup misses —
    at 100 TB: explode to passage grain (linear, no state), shuffle on
    the passage hash (md5, not the raw string: fixed 32-byte shuffle
    keys instead of arbitrary-length text), pick the canonical
    occurrence with a window, then one doc-grain re-aggregate (two
    shuffles total, both map-side-combined, neither carrying the
    text). Never materializes a pair table — dup detection
    is the window rank, so a passage repeated k times costs k rows,
    not k².
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
    n_chunks = F.ceil(F.size("toks") / float(_CHUNK_WORDS))
    chunks = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_idx"
        ),
        "toks",
    ).select(
        "doc_id",
        "chunk_idx",
        F.md5(
            F.array_join(
                F.slice(
                    F.col("toks"),
                    F.col("chunk_idx") * _CHUNK_WORDS + 1,
                    _CHUNK_WORDS,
                ),
                " ",
            ).cast("binary")
        ).alias("chunk_h"),
    )
    w = Window.partitionBy("chunk_h").orderBy("doc_id", "chunk_idx")
    ranked = chunks.withColumn("occ", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("occ") > 1, 1).otherwise(0)).alias("n_dup"),
        (
            F.sum(F.when(F.col("occ") == 1, 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("keep_frac"),
    )


@query(
    "q_text_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    tf  AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    cnt AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY 1),
    tot AS (SELECT COUNT(*) AS n FROM tok),
    q AS (
      SELECT word,
             CAST(floor(ln(CAST(tot.n AS DOUBLE) / cnt.c) * 1e6 + 0.5)
                  AS BIGINT) AS q_surprisal
      FROM cnt CROSS JOIN tot
    )
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tok,
           CAST(CAST(SUM(tf.tf * q.q_surprisal) AS BIGINT) AS DOUBLE)
             / SUM(tf.tf) / 1e6 AS avg_surprisal
    FROM tf JOIN q USING (word)
    GROUP BY tf.doc_id
    """,
)
def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score: per-document mean token surprisal
    (−ln p(w), p from corpus unigram frequencies) — the cheap
    perplexity proxy used to rank web text before an expensive model
    scores it (the CCNet idea, with the corpus itself as the LM).

    Determinism discipline: a plain double SUM of per-token logs is
    partition-order-dependent, so each *distinct word's* surprisal is
    quantized once to integer micro-nats (`floor(ln(N/c)·1e6 + 0.5)` —
    one libm call per vocab entry, far from rounding boundaries), and
    the per-doc total is an exact integer dot of (tf × micro-nats) —
    order-free under any shuffle, bit-identical across engines. Scale:
    the vocab table is dimension-sized and broadcasts; doc grain needs
    one groupBy — the same two-shuffle budget as tf-idf.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("word")
    )
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    cnt = tok.groupBy("word").agg(F.count("*").alias("c"))
    tot = tok.agg(F.count("*").alias("n"))
    q = cnt.crossJoin(F.broadcast(tot)).select(
        "word",
        F.floor(
            F.log(F.col("n").cast("double") / F.col("c")) * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("q_surprisal"),
    )
    return (
        tf.join(F.broadcast(q), "word")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tok"),
            (
                F.sum(F.col("tf") * F.col("q_surprisal")).cast("double")
                / F.sum("tf")
                / F.lit(1e6)
            ).alias("avg_surprisal"),
        )
    )


@query(
    "q_text_slice_windows",
    oracle="""
    WITH t AS (
      SELECT doc_id, str_split(text, ' ') AS toks FROM documents
    ),
    w AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks), 1), 24)) AS start
      FROM t
    )
    SELECT doc_id,
           CAST(start / 24 AS INT) AS win_id,
           array_to_string(toks[start + 1 : start + 32], ' ') AS chunk,
           CAST(least(32, len(toks) - start) AS INT) AS chunk_tokens
    FROM w
    """,
)
def q_text_slice_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking with overlap — the step that turns a
    variable-length document corpus into model-sized training windows
    (size 32 tokens, stride 24 → 8-token overlap so no span is ever
    split without context). Pure JVM column algebra: tokenize once
    (`split`), generate the window starts with `sequence`, `explode`,
    then `slice` + `array_join` — no shuffle at all (the plan is a
    single projection stage over the scan; fan-out is row-local), no
    Python in the row path, and the ~k× row fan-out streams through
    whole-stage codegen. At 100 TB this is a map-only job whose output
    partitioning follows the input — exactly what you want feeding a
    pack/shuffle stage downstream.

    The oracle replays it with DuckDB's list algebra (both engines
    treat an empty text as one empty token, so short/empty docs emit
    exactly one window — the two-case behavior is covered at every
    SF)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks")
    ).withColumn("n", F.size("toks"))
    wins = toks.select(
        "doc_id",
        "toks",
        "n",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(24))
        ).alias("start"),
    )
    return wins.select(
        "doc_id",
        (F.col("start") / 24).cast("int").alias("win_id"),
        F.array_join(F.slice("toks", F.col("start") + 1, 32), " ").alias(
            "chunk"
        ),
        F.least(F.lit(32), F.col("n") - F.col("start"))
        .cast("int")
        .alias("chunk_tokens"),
    )


@query(
    "q_text_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
      WHERE len(text) > 0
    ),
    cc AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY 1, 2),
    n  AS (SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n FROM cc GROUP BY 1),
    q AS (
      SELECT cc.doc_id, cc.k,
             CAST(floor(ln(CAST(n.n AS DOUBLE) / cc.k) * 1e6 + 0.5)
                  AS BIGINT) AS q_surp
      FROM cc JOIN n USING (doc_id)
    )
    SELECT q.doc_id,
           CAST(CAST(SUM(q.k * q.q_surp) AS BIGINT) AS DOUBLE)
             / SUM(q.k) / 1e6 AS char_entropy
    FROM q
    GROUP BY q.doc_id
    """,
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-entropy quality signal (the Gopher/C4 heuristic family:
    near-zero entropy = boilerplate/repeated filler, unusually high =
    binary junk or encoding noise): per document,
    H = Σ (k/n)·ln(n/k) over its character frequencies.

    Same determinism discipline as `q_text_unigram_logprob`: each
    (doc, char)'s surprisal ln(n/k) is quantized ONCE to integer
    micro-nats, the per-doc combination is an exact integer dot
    (Σ k·q) — order-free under any shuffle, bit-identical across
    engines; the single division at the end is deterministic. Scale:
    explode to char grain is a map-only fan-out; one groupBy to
    (doc, char), one re-aggregate to doc grain — alphabet-bounded
    state (≤ ~100 distinct chars per doc), never O(text²)."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    ch = d.select("doc_id", F.explode(F.split("text", "")).alias("c"))
    cc = ch.groupBy("doc_id", "c").agg(F.count("*").alias("k"))
    w = Window.partitionBy("doc_id")
    q = cc.withColumn("n", F.sum("k").over(w)).withColumn(
        "q_surp",
        F.floor(
            F.log(F.col("n").cast("double") / F.col("k")) * F.lit(1e6)
            + F.lit(0.5)
        ).cast("bigint"),
    )
    return q.groupBy("doc_id").agg(
        (
            F.sum(F.col("k") * F.col("q_surp")).cast("double")
            / F.sum("k")
            / F.lit(1e6)
        ).alias("char_entropy")
    )


@query(
    "q_dataset_shard_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             md5(CAST(doc_id AS VARCHAR) || ':42') AS rnd,
             strpos('0123456789abcdef',
                    substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 1))
               % 8 AS shard
      FROM documents
    )
    SELECT doc_id, shard,
           ROW_NUMBER() OVER (PARTITION BY shard ORDER BY rnd, doc_id)
             AS pos
    FROM keyed
    """,
)
def q_dataset_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC GLOBAL SHUFFLE + SHARDING for training data: every
    document gets a content-addressed pseudorandom key
    ``md5(doc_id:seed)``; the key's first hex digit picks one of 8
    shards and the key orders rows WITHIN the shard (``pos`` is the
    document's position in its training shard). No RNG state anywhere:
    the permutation is a pure function of (doc_id, seed), so re-running
    on re-partitioned, re-compacted, or incrementally-grown input
    reproduces the identical order — the property a resumable 100 TB
    training-data pipeline needs from its shuffle (seed bump = fresh
    epoch permutation).

    Execution shape: one hash projection (map-only, codegen) + ONE
    shuffle — the window's hash partitioning on the 8 shard keys; no
    global sort, no driver involvement. At 1000 executors the shard
    count would be O(output files) instead of 8, keeping each window
    partition executor-sized. Cross-engine: Spark and DuckDB md5 agree
    byte-for-byte, so the oracle replays the exact permutation."""
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    rnd = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":42")))
    keyed = d.select(
        "doc_id",
        rnd.alias("rnd"),
        (
            F.expr("locate(substring(md5(concat(cast(doc_id as string), "
                   "':42')), 1, 1), '0123456789abcdef')") % 8
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("rnd", "doc_id")
    return keyed.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos")
    )


@query(
    "q_dataset_length_buckets",
    oracle="""
    WITH s AS (SELECT MIN(n_chars) AS mn, MAX(n_chars) AS mx
               FROM documents),
    b AS (
      SELECT d.doc_id, d.n_chars,
             (d.n_chars - s.mn) * 16 // (s.mx - s.mn + 1) AS bucket
      FROM documents d, s
    )
    SELECT bucket, COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS DOUBLE) / (COUNT(*) * MAX(n_chars))
             AS pack_eff
    FROM b GROUP BY bucket
    """,
)
def q_dataset_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LENGTH-BUCKETED BATCHING for training: assign every document to
    one of 16 equi-width length buckets and report each bucket's
    padding efficiency (sum(len) / (n · max(len)) — the fraction of a
    fixed-shape batch that is real tokens rather than padding).
    Length-grouping is the standard way to cut padding waste when
    packing variable-length documents into fixed-shape training
    batches; the per-bucket ``pack_eff`` is the metric a curation
    pipeline watches to pick bucket counts.

    Scale shape: deliberately NOT an ntile (a global order-statistics
    window serializes through one partition at 100 TB). Instead: one
    metadata-sized global min/max aggregate broadcast to a map-only
    integer bucket assignment, then an ordinary partial-aggregated
    groupBy on 16 keys — every stage codegen, one real shuffle.
    Integer floor-division keeps the bucket ids bit-exact across
    engines."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s = d.agg(F.min("n_chars").alias("mn"), F.max("n_chars").alias("mx"))
    b = d.crossJoin(F.broadcast(s)).withColumn(
        "bucket", F.expr("(n_chars - mn) * 16 div (mx - mn + 1)")
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (
            F.sum("n_chars").cast("double")
            / (F.count(F.lit(1)) * F.max("n_chars"))
        ).alias("pack_eff"),
    )


@query(
    "q_text_zipf",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ),
    counts AS (SELECT word, COUNT(*) AS freq FROM tok GROUP BY word),
    tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total FROM counts),
    top AS (SELECT word, freq FROM counts ORDER BY freq DESC, word LIMIT 200),
    ranked AS (
      SELECT word, freq,
             ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rank,
             CAST(SUM(freq) OVER (ORDER BY freq DESC, word
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM top
    )
    SELECT rank, word, freq,
           CAST(freq AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
    FROM ranked CROSS JOIN tot
    """,
)
def q_text_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS VOCABULARY / ZIPF STATISTICS (tokenizer-training prep):
    the top-200 words by corpus frequency with rank, corpus share, and
    cumulative coverage — the curve that tells you how much of a
    corpus a vocabulary of size k captures.

    Scale shape: ONE shuffle (groupBy word); the global top-k is
    TakeOrderedAndProject (per-partition heaps, never a global sort),
    and the rank/cumulative window runs over the 200 survivors only —
    the vocabulary-wide global-sort trap (the ntile antipattern) is
    deliberately avoided. The total-token count rides in as a 1-row
    broadcast. Shares are single IEEE divisions of exact bigint
    counts, so DuckDB reproduces them bit-for-bit.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    total = counts.agg(F.sum("freq").alias("total"))
    top = counts.orderBy(F.desc("freq"), "word").limit(200)
    w = Window.orderBy(F.desc("freq"), "word")
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum",
            F.sum("freq").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "word",
            "freq",
            (F.col("freq").cast("double") / F.col("total").cast("double"))
            .alias("share"),
            (F.col("cum").cast("double") / F.col("total").cast("double"))
            .alias("cum_share"),
        )
    )


@query(
    "q_dataset_interleave",
    oracle="""
    WITH idx AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR))
             ) AS idx,
             CASE WHEN source = 'src0' THEN 1
                  WHEN source = 'src1' THEN 2
                  ELSE 4 END AS stride
      FROM documents
    )
    SELECT source, doc_id, idx, idx * stride AS pos_key
    FROM idx
    """,
)
def q_dataset_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC WEIGHTED SOURCE INTERLEAVE (stride scheduling,
    the training-curriculum ordering op): each source's documents are
    deterministically shuffled within the source (md5 order), then
    assigned an all-integer position key ``idx * stride`` where
    stride ∝ 1/weight (weights src0:4, src1:2, rest:1 → strides
    1/2/4 over their LCM). Reading the dataset ordered by
    ``(pos_key, source, idx)`` yields an interleave whose every
    prefix holds the sources in weight proportion — without any
    global shuffle or RNG state: the order is a pure function of
    (doc_id, source), so it is resumable mid-epoch and identical
    across cluster sizes.

    Execution shape: ONE shuffle (the per-source window's hash
    partitioning); the position key is map-side integer arithmetic.
    The global sort is deliberately NOT materialized here — at 100 TB
    ordering is the write's job (sortWithinPartitions by pos_key per
    output shard); emitting the key keeps this operator shuffle-
    minimal. All-integer keys → bit-exact oracle."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    win = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string"))
    )
    stride = (
        F.when(F.col("source") == "src0", F.lit(1))
        .when(F.col("source") == "src1", F.lit(2))
        .otherwise(F.lit(4))
    )
    return d.select(
        "source",
        "doc_id",
        F.row_number().over(win).cast("long").alias("idx"),
        (F.row_number().over(win).cast("long") * stride).alias("pos_key"),
    )
