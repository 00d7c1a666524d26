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
- money-like double *sums/averages* go through scaled-long
  accumulation (:func:`dsum` / :func:`davg`): per-row
  ``floor(x·10^s + 0.5)`` recovers the exact fixed-decimal value as an
  integer (pure double arithmetic, computed identically by both
  engines — immune to the round() divergence), and integer sums are
  order-independent, so the final ``sum/10^s`` double is bit-identical
  under any partitioning. (An exact-DECIMAL formulation is equivalent
  but costs ~1.2 s of extra Catalyst planning per query — measured —
  so the long form is the production path.);
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


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact deterministic sum of money-like doubles via scaled longs.

    The input doubles carry values with ≤``scale`` true decimal places
    (prices, discounts, their short products); ``floor(x·10^s + 0.5)``
    recovers each exact integer (the representation error of x is ≪ 0.5
    at the scaled magnitude), the long sum is exact and
    order-independent, and the final division is one correctly-rounded
    double op — bit-identical across engines and partitionings.

    Oracle-side equivalent (DuckDB floor returns DOUBLE, sum of BIGINT
    is HUGEINT — both cast back down):
    ``CAST(SUM(CAST(floor(x * 1e<s> + 0.5) AS BIGINT)) AS DOUBLE) / 1e<s>``.
    """
    c = F.col(col) if isinstance(col, str) else col
    m = float(10**scale)
    return F.sum(F.floor(c * F.lit(m) + F.lit(0.5))) / F.lit(m)


def dsum_sql(expr: str, scale: int = 2) -> str:
    """The DuckDB oracle fragment matching :func:`dsum`."""
    m = f"1e{scale}"
    return f"CAST(SUM(CAST(floor(({expr}) * {m} + 0.5) AS BIGINT)) AS DOUBLE) / {m}"


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic average: exact scaled-long sum ÷ non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def davg_sql(expr: str, scale: int = 2) -> str:
    """The DuckDB oracle fragment matching :func:`davg`."""
    return f"{dsum_sql(expr, scale)} / COUNT({expr})"
