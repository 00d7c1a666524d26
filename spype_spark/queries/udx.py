"""UDF / UDAF / UDTF surface (SURVEY.md §2.B "UDF / UDAF / UDTF").

Engine policy is builtins-first (every other module avoids Python in
the row path); these four queries exist to prove the full user-defined
surface, each with the pattern that scales:

- scalar Python UDF: the slow path, shown once (q_udf_python);
- vectorized Arrow paths: applyInPandas grouped-map (q_udf_pandas) and
  grouped-agg (q_udaf_grouped) — Arrow batch transfer, pandas kernels,
  ~10-100× the row-at-a-time UDF;
- Python UDTF (Spark 4) with a lateral join (q_udtf_explode).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from spype_spark.registry import query
from spype_spark.tables import load_table


@query(
    "q_udf_python",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS tier
    FROM orders
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (tier label) — surface proof only.

    DO NOT copy this pattern for real pipelines: the same logic is one
    CASE expression (exactly this contract's own oracle SQL, or
    ``F.when``-chains as in q_cond_funcs) that stays inside whole-stage
    codegen at zero Python cost; when Python is genuinely required,
    reach for the Arrow-batched form (q_udf_pandas) first. This
    variant pays one Python round-trip per batch of rows and exists so
    the engine's UDF registration path is exercised and measured —
    policy is builtins-first, and tests/test_plans.py asserts no
    PythonUDF leaks into the relational contracts' plans.
    """

    @F.udf(returnType=StringType())
    def tier(price: float) -> str:
        if price > 300000:
            return "big"
        if price > 100000:
            return "mid"
        return "small"

    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", tier("o_totalprice").alias("tier"))


@query(
    "q_udf_pandas",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           round((o_totalprice - AVG(o_totalprice) OVER w)
                 / stddev_samp(o_totalprice) OVER w, 6) AS z
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus)
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized z-score of order price per status via applyInPandas.

    Grouped-map Arrow path: each status group arrives as one pandas
    DataFrame, normalized with ddof=1 (≡ stddev_samp). Rounded to 6 —
    pandas pairwise summation vs SQL aggregation differ at ~1e-12
    relative. At scale the group count (3 statuses) is tiny but each
    group is huge → this exact shape would instead use a two-pass
    join-with-stats; the grouped-map form is the API contract shown.
    """
    o = load_table(spark, sf_dir, "orders")
    schema = StructType(
        [
            StructField("o_orderkey", o.schema["o_orderkey"].dataType),
            StructField("o_orderstatus", StringType()),
            StructField("z", DoubleType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["o_totalprice"]
        z = ((x - x.mean()) / x.std(ddof=1)).round(6)
        return pd.DataFrame(
            {
                "o_orderkey": pdf["o_orderkey"],
                "o_orderstatus": pdf["o_orderstatus"],
                "z": z,
            }
        )

    return o.groupBy("o_orderstatus").applyInPandas(zscore, schema)


@query(
    "q_udaf_grouped",
    oracle="""
    SELECT l_returnflag,
           round(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
             AS wavg_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregation (quantity-weighted avg price).

    applyInPandas as a UDAF: sorts the group batch by its unique key
    before reducing so the float sum is run-to-run deterministic, then
    rounds to 4 (cross-engine sum-order noise ~1e-10 relative).
    """
    li = load_table(spark, sf_dir, "lineitem")
    schema = "l_returnflag string, wavg_price double, n long"

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["l_orderkey", "l_linenumber"])
        num = (pdf["l_extendedprice"] * pdf["l_quantity"]).sum()
        den = pdf["l_quantity"].sum()
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "wavg_price": [round(num / den, 4)],
                "n": [len(pdf)],
            }
        )

    return li.groupBy("l_returnflag").applyInPandas(wavg, schema)


@query(
    "q_udtf_explode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents
    """,
)
def q_udtf_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one text row → (pos, word) rows, LATERAL.

    Registered table function applied per input row via a lateral
    join — the Python-side generalization of explode for logic a
    builtin can't express (here it *could*, which is what the oracle
    exploits).
    """

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" ")):
                yield i, w

    spark.udtf.register("spype_split_words", SplitWords)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("spype_udtf_docs")
    return spark.sql(
        """
        SELECT doc_id, s.pos, s.word
        FROM spype_udtf_docs, LATERAL spype_split_words(text) s
        """
    )
