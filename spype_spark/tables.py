"""Table sources: load the test-corpus Parquet tables (FIXTURES.md).

The corpus is a TPC-H-ish star schema plus an ``events`` stream table,
``documents`` (text) and ``embeddings`` (64-dim unit-norm vectors).

Scale notes (100 TB): each table here is a single Parquet file; on a
cluster these become partitioned directories (e.g. lineitem partitioned
by ship month) and the *same* ``spark.read.parquet`` call picks up
partition pruning automatically. Column pruning + predicate pushdown are
preserved because loaders return raw scans (no caching, no forced
materialization) — every query composes filters/projections directly
onto the scan node so Catalyst can push them into the Parquet reader.
The one transformation applied at load (events ts normalization) is a
cheap per-row projection that stays inside whole-stage codegen — and a
no-op when the corpus already stores native µs timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spype_spark.session import ensure_session_confs

#: All tables in the corpus, in FK-dependency order.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale
#: (region=5, nation=25 rows always; supplier/part grow slowly).
BROADCAST_DIMS = ("region", "nation", "supplier", "part")


def normalize_events_ts(df: DataFrame, target: str = "timestamp_ntz") -> DataFrame:
    """Normalize ``events.ts`` to ``target`` regardless of corpus encoding.

    The test corpus has shipped ``ts`` two ways across regenerations:

    * TIMESTAMP(NANOS) — Spark 4.x cannot map it natively (SURVEY.md
      §7.4 G1); with the nanosAsLong conf it arrives as **bigint**
      nanoseconds. Converted with *integer* division (``div``) to avoid
      double-precision loss on 1.7e18-scale values.
    * timestamp[us] (the current corpus) — arrives natively as
      ``timestamp_ntz`` (or ``timestamp`` if the writer marked UTC).

    Branching on the *loaded* dtype makes both the batch loader and the
    stream reader robust to either encoding, and keeps them on one code
    path so they cannot diverge. ``target`` is ``timestamp_ntz`` for
    batch (matches DuckDB's naive timestamps) and ``timestamp`` for
    streaming (watermarks require TIMESTAMP; session tz is pinned UTC so
    rendered strings agree with the batch side).
    """
    t = df.schema["ts"].dataType.simpleString()
    if t == "bigint":
        ts = F.timestamp_micros(F.expr("ts div 1000")).cast(target)
    elif t != target:
        ts = F.col("ts").cast(target)
    else:
        return df
    return df.withColumn("ts", ts)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table as a DataFrame.

    ``events.ts`` is normalized to ``timestamp_ntz`` whatever the
    on-disk encoding (see :func:`normalize_events_ts`).
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load several corpus tables at once (dict keyed by table name)."""
    return {n: load_table(spark, sf_dir, n) for n in names}
