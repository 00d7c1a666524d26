"""Skew-handling utilities (SCALE.md "Skew" — the explicit patterns).

AQE's skew-join split handles most cases automatically (enabled in the
session factory; tests/test_skew.py asserts the split fires on the
constructed 70 %-hot join); these helpers are the *explicit* forms for
the cases AQE can't or won't cover. The decision rule:

- **Let AQE handle it** when the hot key feeds a JOIN whose output has
  no downstream distribution requirement: the runtime split is free,
  needs no code, and adapts to skew you didn't predict.
- **Salt explicitly** when (a) the hot key feeds an AGGREGATION —
  AQE's skew rule only rewrites joins, a hot groupBy reducer is
  invisible to it; (b) the join's output flows into another shuffle on
  the same key (sort, groupBy, window) — OptimizeSkewedJoin skips the
  split rather than break the required distribution (forcing it via
  ``forceOptimizeSkewedJoin`` re-shuffles, usually a wash); or (c) the
  execution must be deterministic partition-for-partition (regression
  tests, bit-exactness audits) — AQE's split boundaries depend on
  observed sizes, salting is the same plan every run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with salting for hot grouping keys.

    Phase 1 groups by (keys + salt) so a hot key's rows spread over
    ``n_salts`` reducers; phase 2 merges the partials per key. Only
    decomposable aggregates are supported — pass the *partial*
    expression per output column; the merge re-applies a compatible
    combiner (sum→sum, count→sum, min→min, max→max) inferred from the
    partial's name.

    Example::

        salted_agg(df, ["k"], {"total": F.sum("v"), "n": F.count("*")})

    Correctness: for decomposable aggregates the result is identical to
    the direct groupBy (asserted in tests/test_skew.py); the win is
    that no single reducer sees more than ~1/n_salts of a hot key.
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id()),
                  F.lit(n_salts)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[expr.alias(f"__p_{name}") for name, expr in aggs.items()]
    )

    def combiner(name: str, expr: Column) -> Column:
        # Whitelist, not blacklist: only aggregates whose partials merge
        # losslessly are accepted (sum/count → sum, min → min, max → max).
        # Anything else (first, collect_list, stddev, approx_count_distinct,
        # avg, DISTINCT...) is NOT salt-decomposable with these combiners
        # and silently defaulting to sum would return wrong results.
        #
        # Detection uses the unresolved expression node, not the Column's
        # toString: Spark 4 renders count(DISTINCT v) as plain 'count(v)',
        # so a string check cannot see DISTINCT.
        fn_name, is_distinct = None, False
        reflected = False
        try:
            node = expr._jc.node()
            fn_name = str(node.functionName()).lower()
            is_distinct = bool(node.isDistinct())
            reflected = True
        except Exception:
            # non-UnresolvedFunction column (arithmetic over aggregates,
            # literals...) OR a build without the private _jc/node()
            # API (Spark Connect, future drift). Fall through to the
            # string-prefix check below so plain sum/count/min/max stay
            # usable when reflection itself is unavailable.
            pass
        if reflected:
            s = str(expr._jc)
        else:
            # str(Column) renders as "Column<'sum(v)'>"; unwrap it.
            s = str(expr)
            if s.startswith("Column<'") and s.endswith("'>"):
                s = s[len("Column<'") : -2]
        if not reflected and fn_name is None:
            # Portability fallback: match the rendered prefix. Spark 4
            # renders count(DISTINCT v) as plain 'count(v)', so this
            # path cannot see DISTINCT — reflection (above) is the
            # primary detector; this only runs when it's unavailable.
            for prefix, fallback in (
                ("sum(", "sum"),
                ("count(", "count"),
                ("min(", "min"),
                ("max(", "max"),
            ):
                if s.lower().startswith(prefix):
                    fn_name = fallback
                    break
        if is_distinct:
            raise ValueError(
                f"aggregate {name!r} ({s}) is not salt-decomposable — "
                "DISTINCT partials cannot be merged; use a pre-distinct"
            )
        col = F.col(f"__p_{name}")
        if fn_name == "min":
            return F.min(col).alias(name)
        if fn_name == "max":
            return F.max(col).alias(name)
        if fn_name in ("sum", "count"):
            return F.sum(col).alias(name)
        raise ValueError(
            f"aggregate {name!r} ({s}) is not salt-decomposable — "
            "supported partials: sum/count/min/max; compute avg as "
            "sum/count and merge sketches/collections explicitly"
        )

    return partial.groupBy(*keys).agg(
        *[combiner(name, expr) for name, expr in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skewed equi-join: salt the fact side, replicate the dim side.

    The fact rows get a random-ish (hash-derived, deterministic) salt
    in [0, n_salts); the dim side is exploded n_salts× so every
    (key, salt) bucket finds its match. Turns one hot reducer into
    ``n_salts`` evenly loaded ones at the cost of replicating the
    smaller side — the standard remedy when the dim is too big to
    broadcast and one probe key dominates.
    """
    f = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)),
    )
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = f.join(
        d,
        (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]),
    )
    return out.drop("__salt")
