"""Additional source/sink formats and layouts (completing the
"sources / sinks" family beyond the parquet round trip).

Scale notes: the partitioned-write contract is *the* 100 TB layout
pattern — `partitionBy` produces the directory structure that later
enables partition pruning (verified in tests/test_plans.py for the
scan side); CSV/JSON are the interchange formats whose readers must
agree with the Parquet truth.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spype_spark.registry import query
from spype_spark.tables import load_table


def _scratch(prefix: str) -> str:
    os.makedirs("/root/repo/.scratch", exist_ok=True)
    return tempfile.mkdtemp(prefix=prefix, dir="/root/repo/.scratch")


@query("q_sink_csv_roundtrip", oracle=None)  # touches local disk
def q_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV write → schema-on-read back → aggregate equality summary.

    Verifies header handling, type inference vs explicit schema, and
    that a lossy text format round-trips exactly for the column types
    it can carry (ints, strings; doubles written with full precision).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    tmp = _scratch("spype_csv_")
    try:
        path = f"{tmp}/orders_csv"
        o.write.mode("overwrite").option("header", True).csv(path)
        back = (
            spark.read.option("header", True)
            .schema("o_orderkey long, o_custkey long, o_orderstatus string, "
                    "o_totalprice double")
            .csv(path)
        )
        return back.agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
            (F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)) / 100).alias(
                "total_sum"
            ),
            F.countDistinct("o_orderstatus").alias("n_status"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query("q_sink_json_roundtrip", oracle=None)  # touches local disk
def q_sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write → read back with explicit schema → summary.

    Exercises nested values too: the events props string is parsed to
    a map before writing, so the reader must reconstruct MapType.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.from_json("props", "map<string,int>").alias("props_map"),
    )
    tmp = _scratch("spype_json_")
    try:
        path = f"{tmp}/events_json"
        ev.write.mode("overwrite").json(path)
        back = spark.read.schema(
            "event_id long, user_id long, event_type string, "
            "props_map map<string,int>"
        ).json(path)
        return back.agg(
            F.count("*").alias("n"),
            F.sum(F.element_at("props_map", "k")).alias("k_sum"),
            F.countDistinct("event_type").alias("n_types"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query("q_sink_partitioned_write", oracle=None)  # touches local disk
def q_sink_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned Parquet write + partition-pruned read.

    Writes orders partitioned by year(o_orderdate) — the layout a
    100 TB table uses — then reads back ONE partition; the scan lists
    only that directory (partition pruning, no data skipped-read). The
    returned summary proves values survived the layout change.
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    tmp = _scratch("spype_part_")
    try:
        path = f"{tmp}/orders_by_year"
        o.write.mode("overwrite").partitionBy("o_year").parquet(path)
        back = spark.read.parquet(path).filter(F.col("o_year") == 1997)
        n_dirs = len(
            [d for d in os.listdir(path) if d.startswith("o_year=")]
        )
        return back.agg(
            F.count("*").alias("n_1997"),
            F.countDistinct("o_custkey").alias("n_cust_1997"),
            F.lit(n_dirs).alias("n_partitions_written"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query("q_sink_orc_roundtrip", oracle=None)  # touches local disk
def q_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC write → read → aggregate equality summary (the other
    columnar interchange format; type fidelity incl. timestamps)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    tmp = _scratch("spype_orc_")
    try:
        path = f"{tmp}/orders_orc"
        o.write.mode("overwrite").orc(path)
        back = spark.read.orc(path)
        return back.agg(
            F.count("*").alias("n"),
            F.sum("o_orderkey").alias("key_sum"),
            (F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)) / 100).alias(
                "total_sum"
            ),
            F.countDistinct("o_orderstatus").alias("n_status"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_d"),
        ).localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query("q_source_binaryfile", oracle=None)  # touches local disk
def q_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-media ingestion via the binaryFile source: loose files on
    disk become (path, length, content: binary) rows — the entry point
    a real image/audio corpus takes before the multimodal ops. Writes
    a deterministic set of payload files, reads them back with
    format('binaryFile'), and verifies content integrity by hash."""
    import os as _os

    tmp = _scratch("spype_binf_")
    try:
        media_dir = f"{tmp}/media"
        _os.makedirs(media_dir, exist_ok=True)
        # deterministic fake media files (text bytes as payload)
        rows = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 20)
            .select("doc_id", "text")
            .toPandas()
        )
        for _, r in rows.iterrows():
            with open(f"{media_dir}/doc_{int(r.doc_id):05d}.bin", "wb") as f:
                f.write(r.text.encode())
        back = spark.read.format("binaryFile").load(media_dir)
        return (
            back.select(
                F.regexp_extract(
                    F.col("path"), r"doc_(\d+)\.bin$", 1
                ).cast("long").alias("doc_id"),
                F.col("length"),
                F.md5("content").alias("content_md5"),
            )
            .orderBy("doc_id")
            .localCheckpoint()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
