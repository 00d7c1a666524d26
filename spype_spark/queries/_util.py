"""Shared helpers for oracle-checked queries.

Determinism discipline (SURVEY.md §5.2 item 4):
- every computed column is aliased identically in Spark and oracle SQL;
- timestamps in *outputs* are rendered as explicit-format strings on
  both sides (`date_format` vs `strftime`) so value-hashing never
  depends on engine-specific datetime stringification;
- raw per-row doubles pass through **unrounded** (identical IEEE-754
  expressions are bit-deterministic in both engines, while `round()`
  itself diverges on decimal-repr ties: Spark rounds the shortest
  decimal repr via BigDecimal, DuckDB rounds the binary value —
  e.g. 70975.7*0.95 → 67426.92 vs 67426.91);
- money-like double *sums/averages* are computed as exact DECIMAL sums
  cast back to double (:func:`dsum` / :func:`davg`) — addition order
  varies with partitioning, so a double sum is nondeterministic at the
  last ulps and no rounding scheme is safe near ties; decimal sums are
  exact and identical on both engines;
- only inherently-noisy aggregates (stddev/corr/ln/tf-idf) round, at a
  scale coarse relative to their numeric noise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Spark / DuckDB format-string pairs used by the helpers below.
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"
D_FMT_SPARK = "yyyy-MM-dd"
D_FMT_DUCK = "%Y-%m-%d"


def tstr(col: Column | str) -> Column:
    """Render a timestamp column as 'YYYY-MM-DD HH:MM:SS' (second grain)."""
    return F.date_format(col, TS_FMT_SPARK)


def dstr(col: Column | str) -> Column:
    """Render a timestamp/date column as 'YYYY-MM-DD'."""
    return F.date_format(col, D_FMT_SPARK)


def ts_lit(s: str) -> Column:
    """A timestamp_ntz literal from 'YYYY-MM-DD[ HH:MM:SS]'."""
    return F.lit(s).cast("timestamp_ntz")


def rnd(col: Column, scale: int = 2) -> Column:
    return F.round(col, scale)


def dsum(col: Column | str, scale: int = 2, prec: int = 18) -> Column:
    """Exact deterministic sum of money-like doubles via DECIMAL.

    The input doubles carry values with ≤``scale`` true decimal places
    (prices, discounts, and their short products in this corpus), so the
    per-row decimal cast recovers the exact value; the decimal sum is
    then order-independent, and one final cast to double is correctly
    rounded — bit-identical across engines and partitionings.

    Oracle-side equivalent: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({prec},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, prec: int = 18) -> Column:
    """Deterministic average: exact decimal sum ÷ non-null count.

    Oracle-side: ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale, prec) / F.count(c)
