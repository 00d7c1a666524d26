"""Z-order layout: the file-skipping claim, measured.

A single-column-sorted table prunes files on that column only; the
z-ordered rewrite prunes on BOTH clustered dimensions at once. We
verify on actual written Parquet by computing each file's min/max on
both dimensions and counting files a band predicate would have to
read, for three layouts: date-sorted, custkey-sorted, z-ordered.

Also pins the normalization requirement: interleaving raw unequal-
width values degenerates to a single-column sort (the reason
layout.minmax_scale exists).
"""

import datetime as dt
import glob

import pyspark.sql.functions as F
import pytest

from spype_spark import lakehouse
from spype_spark.layout import minmax_scale, morton2, zorder_repartition

N_FILES = 8
CUST_BAND = (10, 40)  # ~1/5 of the 150-customer key space at sf0.001
DATE_BAND = (dt.datetime(1996, 1, 1), dt.datetime(1996, 3, 1))


def _files_hit(spark, files, col, lo, hi):
    hit = 0
    for f in files:
        row = (
            spark.read.parquet(f)
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .collect()[0]
        )
        if row["hi"] >= lo and row["lo"] <= hi:
            hit += 1
    return hit


@pytest.fixture(scope="module")
def layouts(spark, sf_dir, tmp_path_factory):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    b = o.agg(
        F.min("o_custkey"),
        F.max("o_custkey"),
        F.min("o_orderdate"),
        F.max("o_orderdate"),
    ).collect()[0]
    day = F.datediff(F.col("o_orderdate"), F.lit(b[2].date()).cast("date"))
    n_days = (b[3] - b[2]).days
    scaled = o.withColumn(
        "za", minmax_scale(F.col("o_custkey"), b[0], b[1])
    ).withColumn("zb", minmax_scale(day, 0, n_days))
    base = tmp_path_factory.mktemp("layout")
    dirs = {
        "by_date": str(base / "by_date"),
        "by_cust": str(base / "by_cust"),
        "zorder": str(base / "zorder"),
    }
    o.repartitionByRange(N_FILES, "o_orderdate").write.parquet(dirs["by_date"])
    o.repartitionByRange(N_FILES, "o_custkey").write.parquet(dirs["by_cust"])
    zorder_repartition(scaled, morton2("za", "zb"), N_FILES).drop(
        "za", "zb"
    ).write.parquet(dirs["zorder"])
    return {
        k: sorted(glob.glob(f"{d}/part-*.parquet")) for k, d in dirs.items()
    } | {"orders": o}


def _profile(spark, layouts, name):
    files = layouts[name]
    assert len(files) == N_FILES
    cust = _files_hit(spark, files, "o_custkey", *CUST_BAND)
    date = _files_hit(spark, files, "o_orderdate", *DATE_BAND)
    return cust, date


def test_zorder_preserves_rows(spark, layouts):
    n = layouts["orders"].count()
    assert spark.read.parquet(*layouts["zorder"]).count() == n


def test_zorder_prunes_both_dimensions(spark, layouts):
    """Single-column layouts read ALL files for the other dimension's
    band; z-order reads a strict subset for BOTH bands, and strictly
    wins on total files touched across the two predicates."""
    d_cust, d_date = _profile(spark, layouts, "by_date")
    c_cust, c_date = _profile(spark, layouts, "by_cust")
    z_cust, z_date = _profile(spark, layouts, "zorder")
    assert d_cust == N_FILES  # date layout can't prune custkey bands
    assert c_date == N_FILES  # cust layout can't prune date bands
    assert z_cust < N_FILES
    assert z_date < N_FILES
    assert z_cust + z_date < min(d_cust + d_date, c_cust + c_date)


def test_raw_interleave_degenerates_without_scaling(spark, layouts, tmp_path):
    """The anti-claim that motivates minmax_scale: raw unequal-width
    dimensions make morton ≈ sort-by-the-wider-dimension."""
    o = layouts["orders"]
    raw = o.withColumn("za", F.col("o_custkey")).withColumn(
        "zb",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint"),
    )
    d = str(tmp_path / "raw")
    zorder_repartition(raw, morton2("za", "zb"), N_FILES).drop(
        "za", "zb"
    ).write.parquet(d)
    files = sorted(glob.glob(f"{d}/part-*.parquet"))
    cust = _files_hit(spark, files, "o_custkey", *CUST_BAND)
    assert cust == N_FILES  # every file spans the whole custkey range


def test_compact_zorder_roundtrip(spark, sf_dir, tmp_path):
    """lakehouse.compact(zorder_code=…) rewrites content-identically."""
    path = str(tmp_path / "tbl")
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(500)
    lakehouse.write_table(src, path)
    v = lakehouse.compact(
        spark,
        path,
        target_files=4,
        zorder_code=morton2("o_custkey % 65536", "o_orderkey % 65536"),
    )
    out = lakehouse.read_table(spark, path, version=v)
    assert out.count() == 500
    assert (
        out.select(F.sum("o_orderkey")).collect()[0][0]
        == src.select(F.sum("o_orderkey")).collect()[0][0]
    )
