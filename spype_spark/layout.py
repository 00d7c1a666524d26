"""Data-layout optimization: Z-order (Morton) clustering for
multi-dimensional file skipping.

The 100 TB problem this solves: Parquet row-group/file min-max stats
prune scans only along the sort order. A table sorted by date answers
date filters with few files but custkey filters with ALL files. Z-order
interleaves the bits of several key columns so every file covers a
small hyper-rectangle of the key space — min/max stats then prune on
ANY of the clustered dimensions (Delta OPTIMIZE ZORDER BY / Iceberg
sort-order semantics, re-expressed as plain column arithmetic +
repartitionByRange; no format support needed).

The Morton code is pure integer expression work (shiftleft/shiftright/
mask folded over the bit positions) — JVM-side, codegen'd, and
engine-portable (the oracle reproduces it bit-for-bit in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Bits per dimension in the interleave (16 → 32-bit codes for 2 dims).
MORTON_BITS = 16


def morton2(a: str, b: str, bits: int = MORTON_BITS) -> Column:
    """Interleave the low ``bits`` of two non-negative integer columns
    into a Morton (Z-order) code: bit i of ``a`` lands at position 2i,
    bit i of ``b`` at 2i+1.

    Callers map their keys onto the 16-bit domain first (modulo for
    ids, epoch-day offsets for dates, quantile rank for skewed
    continuous values) — the interleave itself is domain-agnostic.
    """
    terms = (
        f"transform(sequence(0, {bits - 1}), i -> "
        f"  shiftleft(shiftright(CAST({a} AS BIGINT), i) & 1, 2 * i)"
        f"  + shiftleft(shiftright(CAST({b} AS BIGINT), i) & 1, 2 * i + 1))"
    )
    return F.expr(
        f"aggregate({terms}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )


def morton2_sql(a: str, b: str, bits: int = MORTON_BITS) -> str:
    """The DuckDB oracle fragment computing the same code (list_reduce
    with a prepended init, matching the engine's no-init reduce)."""
    return f"""
    list_reduce(
      list_prepend(CAST(0 AS BIGINT),
        list_transform(range(0, {bits}), i ->
          CAST((((CAST({a} AS BIGINT) >> i) & 1) << (2 * i))
             + (((CAST({b} AS BIGINT) >> i) & 1) << (2 * i + 1)) AS BIGINT))),
      (acc, x) -> acc + x)
    """


def minmax_scale(col: Column, lo: float, hi: float, bits: int = MORTON_BITS) -> Column:
    """Map a numeric column onto the full ``bits``-wide integer domain
    by min-max scaling.

    Interleaving RAW values breaks z-order when dimensions have
    different magnitudes — the wider dimension's high bits dominate
    the code and the layout degenerates to a single-column sort
    (measured in tests/test_layout.py). Every dimension must occupy
    the same bit-width before interleaving; min-max is the cheap map
    for roughly-uniform keys (one agg to find lo/hi), quantile rank
    the robust one for skewed keys (one window — Delta's OPTIMIZE uses
    the same trick via range-ids).
    """
    span = float(hi) - float(lo)
    top = float((1 << bits) - 1)
    return F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(top)
    ).cast("bigint")


def zorder_repartition(
    df: DataFrame, code: Column, n_files: int
) -> DataFrame:
    """Cluster ``df`` into ``n_files`` range-partitions of the given
    layout code (Morton or any other space-filling curve), sorted
    within each partition.

    ``repartitionByRange`` samples the code distribution, so files get
    balanced row counts even when the key space is unevenly populated;
    the within-partition sort tightens row-group stats inside each
    file. One shuffle — the same cost as any compaction rewrite, which
    is when this should run (see ``lakehouse.compact``).
    """
    tagged = df.withColumn("__zcode", code)
    return (
        tagged.repartitionByRange(n_files, F.col("__zcode"))
        .sortWithinPartitions("__zcode")
        .drop("__zcode")
    )
