"""Distributed Avro DataFrame source/sink (spype_spark/avro_table.py).

The codec layer is covered in test_iceberg_interop; these tests cover
the TABLE layer: executor-side encode/decode through mapInPandas,
schema derivation from one container header, null round-trips,
temporal logical types, and the loud out-of-profile gates.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spype_spark import avro_table as at


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_avro_table_round_trip(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("x"),
        F.concat(F.lit("s"), F.col("id")).alias("s"),
        (F.col("id") % 2 == 0).alias("b"),
    )
    d = str(tmp_path / "t")
    manifest = at.write_avro_table(df.repartition(4), d)
    assert sum(m["rows"] for m in manifest) == 100
    assert len(manifest) <= 4
    back = at.read_avro_table(spark, d)
    assert back.columns == ["k", "x", "s", "b"]
    assert _rows(back) == _rows(df)


def test_avro_table_nulls_and_temporals(spark, tmp_path):
    df = spark.sql(
        """
        SELECT id AS k,
               IF(id % 3 = 0, NULL, id * 2)                    AS v,
               IF(id % 4 = 0, NULL,
                  DATE'2024-01-01' + CAST(id AS INT))          AS d,
               TIMESTAMP'2024-06-01 12:00:00' + make_interval(0,0,0,0,0,0,id)
                                                               AS ts
        FROM range(50)
        """
    )
    d = str(tmp_path / "t")
    at.write_avro_table(df.repartition(3), d)
    back = at.read_avro_table(spark, d)
    assert back.schema.simpleString() == df.schema.simpleString()
    assert _rows(back) == _rows(df)
    assert back.filter("v IS NULL").count() == df.filter("v IS NULL").count()


def test_avro_table_empty_frame_round_trips(spark, tmp_path):
    df = spark.range(0).select(F.col("id").alias("k"))
    d = str(tmp_path / "e")
    man = at.write_avro_table(df, d)
    assert man and man[0]["rows"] == 0
    back = at.read_avro_table(spark, d)
    assert back.count() == 0
    assert back.columns == ["k"]


def test_avro_table_out_of_profile_is_loud(spark, tmp_path):
    nested = spark.range(3).select(F.array(F.col("id")).alias("a"))
    with pytest.raises(ValueError, match="profile"):
        at.write_avro_table(nested, str(tmp_path / "n"))
    with pytest.raises(ValueError, match="no .avro files"):
        at.read_avro_table(spark, str(tmp_path))


def test_avro_table_mixed_schema_directory_is_loud(spark, tmp_path):
    d = str(tmp_path / "mix")
    a = spark.range(5).select(F.col("id").alias("k"))
    b = spark.range(5).select(F.col("id").alias("other"))
    at.write_avro_table(a.coalesce(1), d)
    at.write_avro_table(b.coalesce(1), d)
    with pytest.raises(Exception, match="writer schema differs"):
        at.read_avro_table(spark, d).collect()
