"""Pipeline-algebra demos (SURVEY.md §2.B "Pipeline-algebra demos").

Layer-A constructs (Task/Pype/fan/merge/iff/contracts) exercised
end-to-end on real tables, each provably equal to one declarative SQL
query — demonstrating that the algebra is *pure composition*: Catalyst
sees one fused plan per terminal, with pushdown and pruning working
across task boundaries exactly as if the user had written the single
query by hand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spype_spark.pipeline import Pype, expect, expect_schema, task
from spype_spark.registry import query
from spype_spark.tables import load_table


@query(
    "q_pipe_chain",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 1e4 + 0.5)
                         AS BIGINT)) AS DOUBLE) / 1e4 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q_pipe_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: three chained Tasks (filter → derive → aggregate) ≡ one query.

    The composed lineage fuses into a single scan+filter+project+agg
    plan — the shipdate predicate still reaches the Parquet reader
    through two task boundaries.
    """

    @task(requires=["l_shipdate"], produces={"l_returnflag": None,
                                             "l_extendedprice": None,
                                             "l_discount": None})
    def recent(df: DataFrame) -> DataFrame:
        return df.filter(
            F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz")
        ).select("l_returnflag", "l_extendedprice", "l_discount")

    @task(requires=["l_extendedprice", "l_discount"])
    def derive(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "revenue_raw", F.col("l_extendedprice") * (1 - F.col("l_discount"))
        )

    @task(requires=["revenue_raw", "l_returnflag"])
    def summarize(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag").agg(
            F.count("*").alias("n"),
            (
                F.sum(F.floor(F.col("revenue_raw") * F.lit(1e4) + F.lit(0.5)))
                / F.lit(1e4)
            ).alias("revenue"),
        )

    pipeline = recent | derive | summarize
    return pipeline.apply(load_table(spark, sf_dir, "lineitem"))


@query(
    "q_pipe_fan_merge",
    oracle="""
    WITH qty AS (
      SELECT l_returnflag, SUM(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_returnflag
    ),
    cnt AS (
      SELECT l_returnflag, COUNT(*) AS n_lines
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT qty.l_returnflag, qty.total_qty, cnt.n_lines
    FROM qty JOIN cnt ON qty.l_returnflag = cnt.l_returnflag
    """,
)
def q_pipe_fan_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4+A5: fan one source into two branch aggregates, merge on key.

    Fan-out duplicates *lineage*, not data (each branch is its own
    plan over the shared scan); the keyed-join merge is the default
    fan-in semantics documented in SURVEY §7.3.
    """

    @task
    def qty_by_flag(df: DataFrame) -> DataFrame:
        return df.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("total_qty"))

    @task
    def count_by_flag(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("l_returnflag").alias("flag2")).agg(
            F.count("*").alias("n_lines")
        )

    @task(n_inputs=2)
    def merge(a: DataFrame, b: DataFrame) -> DataFrame:
        return a.join(b, a.l_returnflag == b.flag2).select(
            "l_returnflag", "total_qty", "n_lines"
        )

    @task
    def source(df: DataFrame) -> DataFrame:
        return df

    pipeline = source | (qty_by_flag, count_by_flag) | merge
    return pipeline.apply(load_table(spark, sf_dir, "lineitem"))


@query(
    "q_pipe_iff",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_totalprice * 0.1 AS fee
    FROM orders
    WHERE o_totalprice > 200000
    """,
)
def q_pipe_iff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: conditional gate — the task runs only on rows passing `iff`.

    spype gates whole objects per edge; the DataFrame analog gates
    rows, and the predicate merges into the scan filter in the fused
    plan.
    """

    @task
    def add_fee(df: DataFrame) -> DataFrame:
        return df.select(
            "o_orderkey", "o_totalprice",
            (F.col("o_totalprice") * 0.1).alias("fee"),
        )

    gated = add_fee.iff(F.col("o_totalprice") > 200000)
    pipeline = Pype.from_node(gated)
    return pipeline.apply(load_table(spark, sf_dir, "orders"))


@query(
    "q_pipe_validate",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    WHERE o_totalprice > 0 AND o_orderstatus IN ('F', 'O', 'P')
    """,
)
def q_pipe_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8+A14: schema + value contracts; valid rows out, violations counted.

    expect_schema fails fast (driver-side, no job) if the input shape
    drifts; expect() splits valid rows and embeds an observe() metric
    counting violations into the same single pass — no second scan.
    """

    @task(requires={"o_orderkey": "bigint", "o_totalprice": "double"})
    def validate(df: DataFrame) -> DataFrame:
        expect_schema(
            df, {"o_orderkey": "bigint", "o_totalprice": "double",
                 "o_orderstatus": None}
        )
        valid = expect(
            df,
            (F.col("o_totalprice") > 0)
            & F.col("o_orderstatus").isin("F", "O", "P"),
            name="orders_contract",
        )
        return valid.select("o_orderkey", "o_totalprice", "o_orderstatus")

    pipeline = Pype.from_node(validate)
    return pipeline.apply(load_table(spark, sf_dir, "orders"))


@query(
    "q_pipe_curation",
    oracle="""
    WITH capped AS (
      SELECT doc_id, text, source FROM (
        SELECT doc_id, text, source,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(text), doc_id) AS rn
        FROM documents) t
      WHERE rn <= 5
    ),
    sh AS MATERIALIZED (
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
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
    contaminated AS (SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (shingle)),
    clean AS (
      SELECT c.doc_id, c.text, c.source FROM capped c
      WHERE c.doc_id >= 20
        AND c.doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    h AS (
      SELECT doc_id, source,
             list_transform(string_split(text, ' '), w ->
               list_reduce(
                 list_prepend(0, list_transform(range(1, length(w) + 1),
                                                i -> ascii(w[i]))),
                 (a, c) -> (a * 31 + c) % 1000003
               )) AS whs
      FROM clean
    ),
    fp AS (
      SELECT doc_id, source,
             CAST(list_reduce(list_prepend(0, whs),
                  (a, x) -> (a * 131 + x) % 1000003) AS BIGINT) AS fingerprint
      FROM h
    )
    SELECT doc_id, source,
           CASE WHEN fingerprint % 10 < 8 THEN 'train'
                WHEN fingerprint % 10 = 8 THEN 'valid'
                ELSE 'test' END AS split
    FROM fp
    """,
)
def q_pipe_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END training-data pipeline as a Layer-A Pype:
    fan the corpus into (per-source cap, eval-shingle extraction),
    merge by decontaminating the capped branch against the eval
    branch, then assign content-addressed splits.

    Every stage is a library op (window cap, word_shingles,
    dataset_split) wired through the spype algebra — fan-out shares
    one scan's lineage, the n_inputs=2 merge is the keyed anti-join,
    and the whole DAG fuses into one Catalyst plan whose answer the
    oracle recomputes as a single SQL query. This is the contract that
    proves Layer A and the curation family compose.
    """
    from pyspark.sql import Window

    from spype_spark.functions import dataset_split, word_shingles

    @task
    def cap(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("source").orderBy(
            F.md5(F.col("text").cast("binary")), F.asc("doc_id")
        )
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .drop("rn")
        )

    @task
    def eval_shingles(df: DataFrame) -> DataFrame:
        return (
            df.filter(F.col("doc_id") < 20)
            .select(F.explode(word_shingles("text", 3)).alias("shingle"))
            .distinct()
        )

    @task(n_inputs=2)
    def decontaminate_and_split(capped: DataFrame, ev: DataFrame) -> DataFrame:
        sh = capped.select(
            "doc_id", F.explode(word_shingles("text", 3)).alias("shingle")
        )
        contaminated = (
            sh.join(F.broadcast(ev), "shingle").select("doc_id").distinct()
        )
        clean = capped.filter(F.col("doc_id") >= 20).join(
            contaminated, "doc_id", "left_anti"
        )
        return dataset_split(clean).select("doc_id", "source", "split")

    @task
    def source(df: DataFrame) -> DataFrame:
        return df

    pipeline = source | (cap, eval_shingles) | decontaminate_and_split
    return pipeline.apply(load_table(spark, sf_dir, "documents"))
