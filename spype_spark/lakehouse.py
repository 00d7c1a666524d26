"""Minimal versioned-Parquet table format — lakehouse semantics
(MERGE/upsert, DELETE, time travel, compaction, history) without
Delta/Iceberg jars (absent from this container; ROADMAP "No lakehouse
table format").

Layout: every table version is a complete immutable snapshot directory::

    <table>/v=0/part-*.parquet   (+ _SUCCESS)
    <table>/v=1/part-*.parquet   (+ _SUCCESS)

A version becomes visible only when its ``_SUCCESS`` marker exists
(Spark writes it last), so readers never observe a half-written
snapshot — the same commit-by-marker idea a real table format
implements with a transaction log. Writers race at the granularity of
"next version number"; production formats resolve that with an atomic
log append (Delta) or catalog swap (Iceberg) — the *reader-facing*
semantics (versioned snapshots, time travel, content-equal compaction)
are identical, which is what the contracts verify.

Snapshot-level copy-on-write: MERGE/DELETE rewrite the full table into
the next version. Real formats rewrite only affected files and track
the rest in manifests; at 100 TB one partitions the table and rewrites
only touched partitions (``merge_upsert`` takes the update set as a
DataFrame, so the partition-pruned variant is the same call over a
partition-filtered read). Content semantics are unchanged.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_RE = re.compile(r"^v=(\d+)$")


def versions(path: str) -> list[int]:
    """All committed (SUCCESS-marked) snapshot versions, ascending."""
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        m = _VERSION_RE.match(d)
        if m and os.path.exists(os.path.join(path, d, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def latest_version(path: str) -> int:
    vs = versions(path)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {path}")
    return vs[-1]


def _snapshot_dir(path: str, version: int) -> str:
    return f"{path}/v={version}"


def write_table(df: DataFrame, path: str) -> int:
    """Create a table at ``path`` as version 0 (errors if it exists)."""
    if versions(path):
        raise FileExistsError(f"table already exists at {path}")
    df.write.mode("errorifexists").parquet(_snapshot_dir(path, 0))
    return 0


def _write_next(df: DataFrame, path: str) -> int:
    v = latest_version(path) + 1
    df.write.mode("errorifexists").parquet(_snapshot_dir(path, v))
    return v


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot; ``version=None`` → latest, else time travel."""
    v = latest_version(path) if version is None else version
    if v not in versions(path):
        raise FileNotFoundError(f"version {v} not committed under {path}")
    return spark.read.parquet(_snapshot_dir(path, v))


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    evolve_schema: bool = False,
) -> int:
    """MERGE: update-wins on key match, insert otherwise. Returns the
    new version number.

    The relational core is one anti-join: new snapshot =
    ``updates ∪ (target ⟕̸ updates on keys)``. Matched target rows are
    replaced by their update row, unmatched updates are inserts,
    untouched target rows carry over — exactly Delta's
    ``whenMatchedUpdateAll + whenNotMatchedInsertAll``.

    ``evolve_schema=True`` is Delta's mergeSchema: columns present only
    in ``updates`` are ADDED to the table (carried-over target rows get
    NULL), columns only in the target persist (update rows get NULL).
    Off by default: silent widening is how typo'd column names corrupt
    a table.
    """
    tgt = read_table(spark, path)
    if evolve_schema:
        merged = updates.unionByName(
            tgt.join(updates.select(*keys), keys, "left_anti"),
            allowMissingColumns=True,
        )
    else:
        extra = set(updates.columns) - set(tgt.columns)
        if extra:
            raise ValueError(
                f"updates carry columns not in the table schema {sorted(extra)}; "
                "pass evolve_schema=True to add them"
            )
        merged = updates.select(*tgt.columns).unionByName(
            tgt.join(updates, keys, "left_anti")
        )
    return _write_next(merged, path)


def delete_where(spark: SparkSession, path: str, cond) -> int:
    """DELETE rows matching ``cond``; NULL-evaluating rows are KEPT
    (they do not match the delete predicate — SQL DELETE semantics).
    Returns the new version number."""
    tgt = read_table(spark, path)
    keep = ~F.coalesce(cond, F.lit(False))
    return _write_next(tgt.filter(keep), path)


def compact(spark: SparkSession, path: str, target_files: int = 1) -> int:
    """Rewrite the latest snapshot into ``target_files`` files (small-file
    compaction). Content-identical by construction; returns the new
    version."""
    tgt = read_table(spark, path)
    return _write_next(tgt.repartition(target_files), path)


def data_files(path: str, version: int) -> list[str]:
    """Parquet data files of one committed snapshot."""
    d = _snapshot_dir(path, version)
    return sorted(
        f for f in os.listdir(d) if f.endswith(".parquet")
    )


def history(spark: SparkSession, path: str) -> DataFrame:
    """Table history as a DataFrame: (version, n_files)."""
    rows = [(v, len(data_files(path, v))) for v in versions(path)]
    return spark.createDataFrame(rows, "version int, n_files int")
