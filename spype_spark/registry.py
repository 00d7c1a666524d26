"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2.B registers itself here via
the :func:`query` decorator, providing

- a name (the key the driver iterates),
- a callable ``(spark, sf_dir) -> DataFrame`` (the Spark plan), and
- optionally an ANSI-SQL oracle string DuckDB runs on the same Parquet
  (``oracle=None`` → the driver records a weaker rows-only check; only
  used for genuinely non-SQL-expressible ops).

``__spark_entry__.py`` simply re-exports this registry, so adding an
operator is one decorated function — no other wiring.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as a driver-visible query contract."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query key: {name}")
        REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco
