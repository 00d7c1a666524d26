"""Scalar functions: string / date / math / conditional / cast / array /
map / json (SURVEY.md §2.B).

All expressions are built-in `pyspark.sql.functions` — JVM-side inside
whole-stage codegen, no Python per row. Oracle SQL casts DuckDB's wider
default types (BIGINT length, HUGEINT sums, DOUBLE floor) down to
Spark's output types so schemas align.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spype_spark.queries._util import dstr
from spype_spark.registry import query
from spype_spark.tables import load_table


@query(
    "q_str_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS u,
           lower(c_mktsegment) AS lo,
           substr(c_name, 10, 9) AS sub,
           CAST(length(c_name) AS INT) AS name_len,
           concat(c_name, '/', c_mktsegment) AS joined,
           trim(concat(' ', c_mktsegment, ' ')) AS trimmed,
           replace(c_name, 'Customer#', 'C-') AS replaced,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
           array_to_string(string_split(c_name, '#'), '|') AS parts
    FROM customer
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/length/concat/trim/replace/lpad/split."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("u"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 10, 9).alias("sub"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("joined"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias(
            "trimmed"
        ),
        F.replace(F.col("c_name"), F.lit("Customer#"), F.lit("C-")).alias("replaced"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded"),
        # array output joined to a scalar string: the driver canonicalizes
        # through pandas, where ndarray cells are unhashable (VERDICT r1 §wrong-2)
        F.array_join(F.split("c_name", "#"), "|").alias("parts"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(quarter(o_orderdate) AS INT) AS q,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INT) AS days_to_2002,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
    FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/quarter/date_trunc/datediff/date_add/last_day."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        dstr(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        dstr(F.date_add(F.col("o_orderdate"), 30)).alias("plus_30d"),
        dstr(F.last_day("o_orderdate")).alias("month_end"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / 7, 2) AS r2,
           CAST(floor(l_extendedprice) AS BIGINT) AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
           abs(l_discount - 0.05) AS ab,
           pow(l_quantity, 2) AS p2,
           sqrt(l_extendedprice) AS sq,
           round(ln(l_extendedprice), 6) AS lg,
           round(exp(l_discount), 6) AS ex,
           CAST(l_quantity AS INT) % 7 AS md,
           CAST(sign(l_discount - 0.05) AS INT) AS sg
    FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/floor/ceil/abs/pow/sqrt/ln/exp/mod/sign.

    sqrt is IEEE-correctly-rounded (bit-identical everywhere); ln/exp
    may differ by an ulp between libm implementations → rounded to 6.
    round() operates on x/7 — a non-terminating decimal, so no .xx5
    repr ties exist for the engines' differing round algorithms to
    disagree on (x*0.1 of a 2-decimal price would tie constantly).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 7, 2).alias("r2"),
        F.floor("l_extendedprice").alias("fl"),
        F.ceil("l_extendedprice").alias("ce"),
        F.abs(F.col("l_discount") - 0.05).alias("ab"),
        F.pow("l_quantity", F.lit(2)).alias("p2"),
        F.sqrt("l_extendedprice").alias("sq"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("lg"),
        F.round(F.exp("l_discount"), 6).alias("ex"),
        (F.col("l_quantity").cast("int") % 7).alias("md"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("sg"),
    )


@query(
    "q_cond_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS size_tier,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
           GREATEST(o_totalprice, 150000.0) AS hi,
           LEAST(o_totalprice, 150000.0) AS lo
    FROM orders
    """,
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / greatest / least."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("size_tier"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        F.greatest("o_totalprice", F.lit(150000.0)).alias("hi"),
        F.least("o_totalprice", F.lit(150000.0)).alias("lo"),
    )


@query(
    "q_cast_types",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INT) AS qty_int,
           CAST(l_orderkey AS VARCHAR) AS okey_str,
           CAST(l_orderkey AS DOUBLE) AS okey_dbl,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
           CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS ln_roundtrip,
           strftime(CAST(strftime(l_shipdate, '%Y-%m-%d') AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS ship_ts_str
    FROM lineitem
    """,
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across int/double/string/decimal/timestamp.

    double→string is deliberately absent: Java and C++ shortest-repr
    formatting disagree (1.2345E8 vs 123450000.0), so the engine treats
    it as presentation, not computation (use format_number instead).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("okey_str"),
        F.col("l_orderkey").cast("double").alias("okey_dbl"),
        # decimal cast exercised, then widened to double: DuckDB DECIMAL
        # lands in the driver's pandas frame as float64 while Spark ships
        # decimal.Decimal objects — canonical strings differ (VERDICT r1 §wrong-1)
        F.col("l_extendedprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        F.col("l_linenumber").cast("string").cast("int").alias("ln_roundtrip"),
        F.date_format(
            dstr("l_shipdate").cast("timestamp_ntz"), "yyyy-MM-dd HH:mm:ss"
        ).alias("ship_ts_str"),
    )


@query(
    "q_str_funcs2",
    oracle="""
    SELECT p_partkey,
           reverse(p_name) AS rev,
           repeat(p_brand, 2) AS rep,
           CAST(strpos(p_name, ' ') AS INT) AS space_pos,
           translate(p_type, 'AEO', 'aeo') AS xlat,
           left(p_name, 4) AS l4,
           right(p_name, 3) AS r3,
           CAST(unicode(p_type) AS INT) AS first_cp
    FROM part
    """,
)
def q_str_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: reverse/repeat/position/translate/left/
    right/codepoint."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.reverse("p_name").alias("rev"),
        F.repeat("p_brand", 2).alias("rep"),
        F.instr(F.col("p_name"), " ").alias("space_pos"),
        F.translate("p_type", "AEO", "aeo").alias("xlat"),
        F.left(F.col("p_name"), F.lit(4)).alias("l4"),
        F.right(F.col("p_name"), F.lit(3)).alias("r3"),
        F.ascii("p_type").alias("first_cp"),
    )


@query(
    "q_bitwise_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey & 255 AS band,
           l_orderkey | 7 AS bor,
           xor(l_orderkey, l_linenumber) AS bxor,
           l_orderkey << 2 AS shl,
           l_orderkey >> 3 AS shr
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
)
def q_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression family (AND/OR/XOR/shifts) — integer-exact."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("band"),
        F.col("l_orderkey").bitwiseOR(F.lit(7)).alias("bor"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_linenumber").cast("long")).alias(
            "bxor"
        ),
        F.shiftleft(F.col("l_orderkey"), 2).alias("shl"),
        F.shiftright(F.col("l_orderkey"), 3).alias("shr"),
    )


@query(
    "q_hash_funcs",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           CAST(length(md5(text)) AS INT) AS md5_len
    FROM documents
    """,
)
def q_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content hashes (md5/sha256) — the content-
    addressing primitives for dedup keys and shard-stable ids; hex
    output matches across engines byte-for-byte."""
    d = load_table(spark, sf_dir, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.md5(payload).alias("h_md5"),
        F.sha2(payload, 256).alias("h_sha256"),
        F.length(F.md5(payload)).alias("md5_len"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS n,
           CAST(embedding[1] AS DOUBLE) AS e1,
           CAST(embedding[2] AS DOUBLE) AS e2,
           CAST(embedding[3] AS DOUBLE) AS e3,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 3) AS norm2,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
    FROM embeddings
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column.

    size/element_at/slice/transform/filter/aggregate — the L2-norm² of
    each unit vector rounds to exactly 1.0. Element-wise math casts
    float→double *before* multiplying on both engines so the sequential
    sums are bit-identical.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("n"),
        F.element_at(emb_d, 1).alias("e1"),
        # slice still exercised, but emitted as scalar doubles instead of an
        # array column (driver pandas canon can't hash ndarray cells)
        F.element_at(F.slice(emb_d, 1, 3), 2).alias("e2"),
        F.element_at(F.slice(emb_d, 1, 3), 3).alias("e3"),
        F.round(
            F.aggregate(
                emb_d,
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            ),
            3,
        ).alias("norm2"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
    )


@query(
    "q_array_setops",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             string_split(text, ' ')[1:12] AS wa,
             string_split(text, ' ')[8:20] AS wb
      FROM documents
    )
    SELECT doc_id,
           COALESCE(array_to_string(list_sort(list_distinct(
               list_intersect(wa, wb))), '|'), '') AS inter,
           COALESCE(array_to_string(list_sort(list_distinct(
               list_concat(wa, wb))), '|'), '') AS uni,
           COALESCE(array_to_string(list_sort(list_distinct(list_filter(wa,
               x -> NOT list_contains(wb, x)))), '|'), '') AS diff,
           list_has_any(wa, wb) AS overlaps
    FROM t
    """,
)
def q_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations (intersect/union/except/overlap) on token
    slices — all outputs canonicalized by sort+distinct since set-op
    result ORDER is engine-defined in both engines."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    wa, wb = F.slice(ws, 1, 12), F.slice(ws, 8, 13)
    return d.select(
        "doc_id",
        F.array_join(
            F.array_sort(F.array_distinct(F.array_intersect(wa, wb))), "|"
        ).alias("inter"),
        F.array_join(F.array_sort(F.array_union(wa, wb)), "|").alias("uni"),
        F.array_join(
            F.array_sort(F.array_distinct(F.array_except(wa, wb))), "|"
        ).alias("diff"),
        F.arrays_overlap(wa, wb).alias("overlaps"),
    )


@query(
    "q_explode_posexplode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
           CAST(UNNEST(embedding) AS DOUBLE) AS val
    FROM embeddings
    WHERE vec_id < 50
    """,
)
def q_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnest with position: posexplode ≡ UNNEST WITH ORDINALITY."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).withColumn("val", F.col("val").cast("double"))


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k,
           array_to_string(list_sort(json_keys(props)), '|') AS ks,
           CAST(len(json_keys(props)) AS INT) AS n_keys
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON string → MapType, then map_keys / element_at / size."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    return ev.select(
        "event_id",
        F.element_at(m, "k").alias("k"),
        # key order is engine-defined → sort then join to a scalar string
        F.array_join(F.array_sort(F.map_keys(m)), "|").alias("ks"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "q_json_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_var,
           CAST(json_extract(props, '$.k') AS INT) * 2 AS k_doubled,
           json_extract(props, '$.missing') IS NULL AS miss_null
    FROM events
    """,
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse_json once, then
    typed path extraction with variant_get — the open-schema ingestion
    pattern (parse at the edge, bind types per access) vs the closed
    from_json schema of q_map_funcs. Missing paths yield NULL, not
    errors.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k_var"),
        (k * 2).alias("k_doubled"),
        F.variant_get(v, "$.missing", "int").isNull().alias("miss_null"),
    )
