"""Continuous CDC replication: a foreign Delta table mirrored into a
native manifest table by ONE Structured Streaming pipeline.

This is the migration story a reference user asks for first: "keep my
Delta table and this engine's table in sync while I switch". The
pieces already exist — :mod:`spype_spark.cdf_source` tails the Delta
change feed as a stream, the lakehouse verbs apply changes — and this
module is the ~zero-glue composition:

    q = replicate_delta_to_lake(
        spark, delta_path, lake_path, checkpoint, keys=["o_orderkey"])
    q.awaitTermination()

Mechanics: ``readStream.format("delta_cdf")`` delivers per-commit
change rows; ``foreachBatch`` applies them IN COMMIT ORDER —
``delete`` rows become a merge-on-read :func:`lakehouse.delete_keys`
(O(deleted keys), no rewrite), ``insert``/``update_postimage`` rows
become one :func:`lakehouse.merge_upsert` per source commit
(``update_preimage`` rows are the CDC before-image, informational for
an upsert-by-key application). The first commit bootstraps the native
table via :func:`lakehouse.write_table`.

Consistency: offsets live in Spark's checkpoint, so restarts resume
from the last fully applied microbatch; within the at-least-once
replay window of ``foreachBatch``, re-applying a commit is IDEMPOTENT
by construction — an upsert of the same rows and a key-delete of
already-deleted keys both land the table in the same state — which is
exactly how Delta's own ``foreachBatch``-based CDC application
achieves effective exactly-once. Cost per poll is O(changed rows) at
the source plus O(touched partitions) for the merge — table size
never enters.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from spype_spark import lakehouse as lake
from spype_spark.cdf_source import register_delta_cdf

_CDF_META = ("_change_type", "_commit_version")


def apply_cdf_batch(
    spark: SparkSession, batch_df, lake_path: str, keys: list[str]
) -> None:
    """Apply one microbatch of change rows to the native table, one
    source commit at a time (commit order is the correctness
    boundary: a delete and a re-insert of the same key in different
    commits must land in sequence)."""
    batch_df = batch_df.localCheckpoint(eager=True)
    # ONE batch-level aggregation replaces the version-list collect AND
    # the per-commit verb-count probes (r16, advice r15): a batch of N
    # source commits paid 1 + N probe jobs; this dict answers both the
    # commit ordering and every per-commit verb decision in one job.
    probe = batch_df.groupBy("_commit_version", "_change_type").agg(
        F.count("*").alias("n")
    )
    # metadata-sized collect: one row per (commit, change type) — ≤ 4N
    verb_counts: dict[tuple[int, str], int] = {
        (r["_commit_version"], r["_change_type"]): r["n"] for r in probe.collect()
    }
    versions = sorted({v for v, _ in verb_counts})
    for v in versions:
        ch = batch_df.filter(F.col("_commit_version") == v)
        upserts = ch.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).drop(*_CDF_META)
        deletes = (
            ch.filter(F.col("_change_type") == "delete")
            .select(*keys)
            .distinct()
        )
        # KEY-CHANGING updates: a preimage whose key tuple has no
        # postimage means the UPDATE moved the row to a new key — the
        # old key must be deleted or the mirror keeps a ghost row
        stale = (
            ch.filter(F.col("_change_type") == "update_preimage")
            .select(*keys)
            .join(
                ch.filter(
                    F.col("_change_type") == "update_postimage"
                ).select(*keys),
                keys,
                "left_anti",
            )
            .distinct()
        )
        deletes = deletes.unionByName(stale).distinct()
        exists = True
        try:
            lake.latest_version(lake_path)
        except Exception:
            exists = False
        if not exists:
            lake.write_table(upserts, lake_path)
            continue
        # verb decisions come from the batch-level dict (no per-commit
        # probe job); the stale-preimage probe only runs when preimages
        # exist WITHOUT certain deletes.
        has_delete = verb_counts.get((v, "delete"), 0) > 0
        if not has_delete and verb_counts.get((v, "update_preimage"), 0) > 0:
            has_delete = bool(deletes.limit(1).count())  # stale keys?
        if has_delete:
            lake.delete_keys(spark, lake_path, deletes)
        if (
            verb_counts.get((v, "insert"), 0)
            + verb_counts.get((v, "update_postimage"), 0)
            > 0
        ):
            lake.merge_upsert(spark, lake_path, upserts, keys=keys)


def replicate_delta_to_lake(
    spark: SparkSession,
    delta_path: str,
    lake_path: str,
    checkpoint: str,
    keys: list[str],
    available_now: bool = True,
):
    """Start the replication stream; returns the StreamingQuery. With
    ``available_now`` (default) the query drains everything committed
    so far and stops — run it on a schedule or with
    ``available_now=False`` for a continuous mirror."""
    register_delta_cdf(spark)
    stream = (
        spark.readStream.format("delta_cdf")
        .option("path", delta_path)
        .load()
    )

    def _apply(bdf, _bid: int) -> None:
        apply_cdf_batch(spark, bdf, lake_path, keys)

    w = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def replicate_lake_to_lake(
    spark: SparkSession,
    src_path: str,
    lake_path: str,
    checkpoint: str,
    keys: list[str],
    available_now: bool = True,
):
    """NATIVE→NATIVE replication (round 14) — the same zero-glue
    composition over the native change-feed format:
    ``readStream.format("spype_lake").option("readChangeFeed","true")``
    emits exactly the Delta-CDF column shape (table columns +
    ``_change_type`` + ``_commit_version``), so the Delta apply
    function is reused verbatim. The standby/DR mirror story: a table
    on one storage root tailed into another with O(changed rows) per
    poll, restart-safe through Spark's checkpoint, idempotent by
    upsert/key-delete construction."""
    from spype_spark.lake_sink import register_lake_sink

    register_lake_sink(spark)
    stream = (
        spark.readStream.format("spype_lake")
        .option("path", src_path)
        .option("readChangeFeed", "true")
        .option("keys", ",".join(keys))
        .load()
    )

    def _apply(bdf, _bid: int) -> None:
        apply_cdf_batch(spark, bdf, lake_path, keys)

    w = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def apply_iceberg_batch(
    spark: SparkSession, batch_df, lake_path: str, keys: list[str],
    chain: list[int],
) -> None:
    """Apply one microbatch of Iceberg change rows in SNAPSHOT-CHAIN
    order. Snapshot ids are content-random longs, so ordering comes
    from the table's own chain (``chain`` = ids in commit order, a
    metadata-sized read the caller does once per batch)."""
    batch_df = batch_df.localCheckpoint(eager=True)
    # ONE batch-level aggregation replaces the snapshot-list collect
    # AND the per-snapshot verb-count probes (r16, advice r15): a batch
    # of N snapshots paid 1 + N probe jobs; this dict answers both.
    probe = batch_df.groupBy("_snapshot_id", "_change_type").agg(
        F.count("*").alias("n")
    )
    # metadata-sized collect: one row per (snapshot, change type) ≤ 2N
    verb_counts: dict[tuple[int, str], int] = {
        (r["_snapshot_id"], r["_change_type"]): r["n"] for r in probe.collect()
    }
    present = {s for s, _ in verb_counts}
    orphans = present - set(chain)
    if orphans:
        raise ValueError(
            f"iceberg replication: snapshot(s) {sorted(orphans)} in the "
            f"change batch are no longer in the metadata chain "
            f"(expired/rewritten mid-apply) — ordering is undecidable; "
            f"restart the mirror from a retained snapshot"
        )
    for sid in [s for s in chain if s in present]:
        ch = batch_df.filter(F.col("_snapshot_id") == sid)
        upserts = ch.filter(F.col("_change_type") == "insert").drop(
            "_change_type", "_snapshot_id"
        )
        deletes = (
            ch.filter(F.col("_change_type") == "delete")
            .select(*keys)
            .distinct()
        )
        exists = True
        try:
            lake.latest_version(lake_path)
        except Exception:
            exists = False
        if not exists:
            lake.write_table(upserts, lake_path)
            continue
        # verb decisions come from the batch-level dict — zero
        # per-snapshot probe jobs (r16, advice r15)
        if verb_counts.get((sid, "delete"), 0) > 0:
            lake.delete_keys(spark, lake_path, deletes)
        if verb_counts.get((sid, "insert"), 0) > 0:
            lake.merge_upsert(spark, lake_path, upserts, keys=keys)


def replicate_iceberg_to_lake(
    spark: SparkSession,
    iceberg_path: str,
    lake_path: str,
    checkpoint: str,
    keys: list[str],
    available_now: bool = True,
):
    """The Iceberg twin of :func:`replicate_delta_to_lake`:
    ``readStream.format("iceberg_cdc")`` tails per-snapshot row-level
    changes (per-file mask diffs, ordinal offsets) and ``foreachBatch``
    applies them in chain order. Same idempotence argument; same
    O(changed rows) per poll."""
    from spype_spark.iceberg_cdc import register_iceberg_cdc

    register_iceberg_cdc(spark)
    stream = (
        spark.readStream.format("iceberg_cdc")
        .option("path", iceberg_path)
        .load()
    )

    def _apply(bdf, _bid: int) -> None:
        from spype_spark import iceberg_log as ilog

        chain = [
            int(s["snapshot-id"])
            for s in (
                ilog.current_metadata(iceberg_path).get("snapshots") or []
            )
        ]
        apply_iceberg_batch(spark, bdf, lake_path, keys, chain)

    w = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
