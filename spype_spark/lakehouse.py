"""Minimal versioned-Parquet table format — lakehouse semantics
(MERGE/upsert, DELETE, time travel, compaction, history) without
Delta/Iceberg jars (absent from this container; ROADMAP "No lakehouse
table format").

Layout: every table version is a complete immutable snapshot directory::

    <table>/v=0/part-*.parquet   (+ _SUCCESS)
    <table>/v=1/part-*.parquet   (+ _SUCCESS)

Commit protocol (round 3): a writer never writes into ``v=N``
directly. It writes the full snapshot to a hidden ``.tmp-<uuid>``
directory (Spark's ``_SUCCESS`` lands there), then publishes with ONE
``os.rename(tmp, v=N)`` — atomic on POSIX, and it FAILS if ``v=N``
already exists, so two racing writers can never interleave files in
one snapshot directory. Concurrency is optimistic, like Delta's
log-append / Iceberg's catalog swap: each mutation captures the
table's latest version as its base and commits only to ``base+1``; if
a concurrent writer got there first the rename raises
:class:`ConcurrentWriteError` and the LOSER's temp dir is removed —
the caller re-reads and retries the whole mutation. Readers still
require the ``_SUCCESS`` marker (belt on top of the atomic-rename
suspenders), so a half-written snapshot is unobservable twice over.

Copy-on-write granularity (round 7): an unpartitioned table rewrites
the full snapshot per mutation; a table created with
``write_table(..., partition_by=col_or_list)`` gets PARTITION-LEVEL
copy-on-write — MERGE/DELETE rewrite only the ``col=value`` leaf
partitions their keys/predicate touch and hardlink every untouched
partition directory into the new snapshot (zero data copied; both
snapshots share the same immutable files, exactly how real formats
share unchanged data files through manifests). Inside the touched
partitions, single-key MERGE goes one level finer — FILE-level
manifest pruning: parquet FOOTER min/max statistics on the merge key
(the same stats a manifest would carry) prove which data files cannot
contain a matched row; those hardlink over individually and only the
possibly-matching files are read back as the rewrite input, so an
insert-heavy CDC merge writes the new rows and links nearly everything
else. Every pruning layer falls back to the next-coarser rewrite
whenever it can't prove safety (null/path-special partition values,
missing or non-numeric footer stats) — correctness over cleverness.
At 100 TB this is the difference between a mutation costing O(table)
and O(touched files).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_RE = re.compile(r"^v=(\d+)$")


class ConcurrentWriteError(RuntimeError):
    """A concurrent writer committed the version this mutation was
    based on. The table is uncorrupted; re-read and retry the whole
    mutation (optimistic concurrency, as in Delta/Iceberg commits)."""


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


def _meta_path(path: str) -> str:
    return os.path.join(path, "_table.json")


def table_meta(path: str) -> dict:
    """Table-level metadata (currently: ``partition_by``, normalized to
    a list of column names). Written once at :func:`write_table`;
    static for the table's lifetime."""
    p = _meta_path(path)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        meta = json.load(f)
    pb = meta.get("partition_by")
    if isinstance(pb, str):
        meta["partition_by"] = [pb]
    return meta


def _link_tree(src: str, dst: str) -> None:
    """Recursively hardlink ``src`` into ``dst`` — the copy-on-write
    carry-over for untouched partition directories (or, at file
    granularity, a single untouched data file): zero data copied, both
    snapshots share the same immutable parquet files (same filesystem
    by construction — both live under the table root)."""
    if os.path.isfile(src):
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(src, dst)
        return
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        s, d = os.path.join(src, name), os.path.join(dst, name)
        if os.path.isdir(s):
            _link_tree(s, d)
        else:
            os.link(s, d)


def _norm_pcols(partition_by) -> list[str] | None:
    """Accept a column name or a list of names; None stays None."""
    if partition_by is None:
        return None
    if isinstance(partition_by, str):
        return [partition_by]
    return list(partition_by)


def _commit_snapshot(
    df: DataFrame,
    path: str,
    version: int,
    partition_by=None,
    carry_from: str | None = None,
    carry_rels: list[str] | None = None,
) -> int:
    """Write ``df`` as snapshot ``version`` via temp-dir + atomic rename.

    The Spark job writes to ``.tmp-<uuid>`` (invisible to
    :func:`versions`); the single ``os.rename`` publishes it. Rename to
    an existing ``v=N`` fails at the filesystem level, so exactly one
    of any number of racing writers wins version N — the losers' temp
    dirs are cleaned up and they get :class:`ConcurrentWriteError`
    without having touched the table.

    ``carry_rels`` (snapshot-relative partition-directory paths, e.g.
    ``["p=1", "d=2024/h=03"]``) are hardlinked from ``carry_from`` (the
    BASE snapshot dir) into the new snapshot after the write —
    partition-level copy-on-write: only touched partitions pay a
    rewrite, untouched ones are shared by reference, and the
    atomic-rename publish still covers the whole snapshot.
    """
    pcols = _norm_pcols(partition_by)
    tmp = os.path.join(path, f".tmp-{uuid.uuid4().hex}")
    # An EMPTY partitioned write produces no partition dirs and no
    # parquet footers — an unreadable snapshot. Two empty-rewrite cases:
    # with carried partitions, the carries ARE the snapshot (write only
    # the _SUCCESS marker — a flat 0-row file would collide with
    # partition discovery); with none, write the empty frame FLAT so
    # the single 0-row footer preserves the schema.
    empty = pcols is not None and df.isEmpty()
    if empty and carry_rels:
        os.makedirs(tmp)
        open(os.path.join(tmp, "_SUCCESS"), "w").close()
    else:
        writer = df.write.mode("errorifexists")
        if pcols and not empty:
            writer = writer.partitionBy(*pcols)
        writer.parquet(tmp)
    # Per-snapshot schema (Delta keeps it in the commit log): readers
    # pass it to spark.read.schema(...) so partition values round-trip
    # with their DECLARED types — without it, partition-discovery type
    # inference retypes a string partition value '001' to int 1, which
    # breaks the copy-on-write touched-partition matcher (stale
    # partitions get carried AND rewritten under a new dir name) and
    # silently retypes columns for every reader. Written into the temp
    # dir, so the atomic rename publishes data + schema together.
    with open(os.path.join(tmp, "_schema.json"), "w") as f:
        f.write(df.schema.json())
    try:
        for rel in carry_rels or []:
            _link_tree(os.path.join(carry_from, rel), os.path.join(tmp, rel))
    except FileNotFoundError as exc:
        # The base snapshot vanished mid-carry: a vacuum dropped it
        # after this mutation captured it as its base (the writer lost
        # the optimistic race AND its base got retention-collected).
        # The table is uncorrupted — clean up and surface it as the
        # same stale-base signal a lost rename produces.
        shutil.rmtree(tmp, ignore_errors=True)
        raise ConcurrentWriteError(
            f"base snapshot of {path} was vacuumed while this mutation "
            f"was committing (stale base); re-read and retry"
        ) from exc
    final = _snapshot_dir(path, version)
    try:
        os.rename(tmp, final)
    except OSError as exc:
        shutil.rmtree(tmp, ignore_errors=True)
        raise ConcurrentWriteError(
            f"version {version} of {path} was committed concurrently "
            f"(base version is stale); re-read and retry"
        ) from exc
    return version


def write_table(df: DataFrame, path: str, partition_by=None) -> int:
    """Create a table at ``path`` as version 0 (errors if it exists).

    ``partition_by`` (a column name or a LIST of names — e.g.
    ``["ship_date", "shard"]``, the date+shard layout SCALE.md assumes
    at 100 TB) lays every snapshot out as nested Hive-style
    ``col=value`` directories and enables PARTITION-LEVEL copy-on-write
    for all subsequent mutations: MERGE/DELETE rewrite only the leaf
    partitions their keys/predicate touch and hardlink the rest (see
    :func:`merge_upsert`). Partition values should be simple scalars
    (string without path-special characters, int) — the
    touched-partition matcher compares their canonical string forms
    against directory names; a null partition value falls back to a
    full-snapshot rewrite rather than guessing Hive's default-partition
    encoding.
    """
    pcols = _norm_pcols(partition_by)
    if versions(path):
        raise FileExistsError(f"table already exists at {path}")
    os.makedirs(path, exist_ok=True)
    if pcols:
        with open(_meta_path(path), "w") as f:
            json.dump({"partition_by": pcols}, f)
    return _commit_snapshot(df, path, 0, partition_by=pcols)


def _write_next(
    df: DataFrame,
    path: str,
    base: int | None = None,
    partition_by=None,
    carry_from: str | None = None,
    carry_rels: list[str] | None = None,
) -> int:
    """Commit ``df`` as ``base+1`` (optimistic: raises
    :class:`ConcurrentWriteError` if someone else already did)."""
    v = (latest_version(path) if base is None else base) + 1
    return _commit_snapshot(
        df,
        path,
        v,
        partition_by=partition_by,
        carry_from=carry_from,
        carry_rels=carry_rels,
    )


_SAFE_PART_VAL = re.compile(r"^[A-Za-z0-9._-]+$")


def _leaf_partition_rels(snap: str, pcols: list[str]) -> set[str]:
    """Relative paths of the LEAF partition directories of a snapshot
    (depth = len(pcols), each level a ``col=value`` dir)."""
    rels = {""}
    for c in pcols:
        nxt = set()
        for r in rels:
            d = os.path.join(snap, r) if r else snap
            for n in os.listdir(d):
                if n.startswith(f"{c}=") and os.path.isdir(
                    os.path.join(d, n)
                ):
                    nxt.add(os.path.join(r, n) if r else n)
        rels = nxt
    return rels


def _file_key_interval(fpath: str, key: str):
    """(min, max) of ``key`` across a parquet file's row groups, read
    from the FOOTER statistics only (a metadata-sized driver read, the
    same stats a manifest would carry) — or None when any row group
    lacks min/max, in which case the caller must treat the file as
    possibly-matching and rewrite it."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fpath).metadata
    idx = None
    for i in range(md.num_columns):
        if md.schema.column(i).name == key:
            idx = i
            break
    if idx is None:
        return None
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)


def _file_cow_split(
    snap: str, touched_rels: list[str], key: str, umin, umax
) -> tuple[list[str], list[str]] | None:
    """FILE-level manifest pruning inside the touched partitions:
    split their data files into (linkable_rels, rewrite_paths) using
    footer min/max stats on the merge key — a file whose key interval
    cannot intersect [umin, umax] provably contains no matched row and
    is carried by hardlink; everything else is read back as the
    rewrite input. Returns None when stats are unusable (caller falls
    back to rewriting the whole touched partitions). Interval pruning
    is conservative by construction: it only ever EXCLUDES files whose
    ranges cannot match."""
    if umin is None or umax is None:
        return None
    link_rels: list[str] = []
    rewrite: list[str] = []
    for rel in touched_rels:
        d = os.path.join(snap, rel) if rel else snap
        if not os.path.isdir(d):
            continue  # insert-only partition: nothing to carry/rewrite
        for name in os.listdir(d):
            if not name.endswith(".parquet"):
                continue
            fpath = os.path.join(d, name)
            try:
                iv = _file_key_interval(fpath, key)
            except Exception:
                return None
            frel = os.path.join(rel, name) if rel else name
            # numeric stats only: parquet writers may truncate string
            # min/max (or omit them); int/float footer stats are exact.
            # bool excluded — it is an int subclass but not a key type.
            numeric = iv is not None and all(
                isinstance(v, (int, float)) and not isinstance(v, bool)
                for v in iv
            )
            try:
                disjoint = numeric and (iv[1] < umin or iv[0] > umax)
            except TypeError:
                # umin/umax not comparable to the numeric footer stats
                # (e.g. string bounds on an int column — between() would
                # cast, the footer compare can't): stats unusable, the
                # caller falls back to the coarser rewrite.
                return None
            if disjoint:
                link_rels.append(frel)
            else:
                rewrite.append(fpath)
    return link_rels, rewrite


def _cow_plan(
    path: str, base: int, pcols: list[str], touched_vals: set
) -> tuple[list[str], object] | None:
    """Partition-level copy-on-write plan:
    (carry_rels, touched_filter) for a mutation that touches only the
    ``touched_vals`` leaf partitions (each a TUPLE of values, one per
    partition column) — or None when the plan can't be built safely (a
    value whose canonical string form wouldn't round-trip through its
    Hive ``col=value`` directory name, e.g. null or path-special
    characters), in which case the caller falls back to the
    full-snapshot rewrite. Correctness over cleverness: a mismatched
    name would silently CARRY a partition that should have been
    rewritten."""
    tuples = []
    for vt in touched_vals:
        parts = []
        for v in vt:
            sv = str(v)
            if v is None or not _SAFE_PART_VAL.match(sv):
                return None
            parts.append(sv)
        tuples.append(parts)
    snap = _snapshot_dir(path, base)
    existing = _leaf_partition_rels(snap, pcols)
    touched_rels = {
        os.path.join(*[f"{c}={sv}" for c, sv in zip(pcols, parts)])
        for parts in tuples
    }
    # Defense-in-depth against value/directory-name ambiguity: a
    # touched tuple whose rel is NOT an existing leaf is normally a
    # fresh-partition insert (fine), but if it compares EQUAL to an
    # existing leaf after value normalization ('1' vs '001', '1' vs
    # '1.0', 'True' vs 'true') while spelling differently, the string
    # match can no longer prove which directory holds the rows — carry
    # nothing, rewrite the full snapshot. With per-snapshot schemas the
    # table's own values round-trip exactly; this catches differently
    # typed values arriving in a caller's updates frame.
    def _norm_val(s: str):
        ls = s.lower()
        if ls in ("true", "false"):
            return ("b", ls)
        try:
            return ("n", float(s))
        except ValueError:
            return ("s", s)

    existing_norm = {
        tuple(_norm_val(seg.split("=", 1)[1]) for seg in r.split(os.sep)): r
        for r in existing
    }
    for parts in tuples:
        rel = os.path.join(*[f"{c}={sv}" for c, sv in zip(pcols, parts)])
        if rel in existing:
            continue
        clash = existing_norm.get(tuple(_norm_val(sv) for sv in parts))
        if clash is not None:
            return None
    carry = sorted(existing - touched_rels)
    # touched filter compares on canonical strings — the same form the
    # directory names carry, so typed partition columns (int) match.
    # NUL-joined so multi-column tuples can't alias each other.
    if tuples:
        key = F.concat_ws(
            "\x00", *[F.col(c).cast("string") for c in pcols]
        )
        touched_filter = key.isin(["\x00".join(p) for p in tuples])
    else:
        touched_filter = F.lit(False)
    return carry, touched_filter


def read_table(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot; ``version=None`` → latest, else time travel.

    When the snapshot carries a ``_schema.json`` (every snapshot
    committed since the schema-persistence fix does), the read uses it
    as the explicit source schema: partition-discovery type inference
    is bypassed, so partition values keep their declared types (string
    '001' stays '001' instead of becoming int 1, booleans stay
    boolean). Pre-fix snapshots without the file fall back to the old
    inferring read."""
    v = latest_version(path) if version is None else version
    if v not in versions(path):
        raise FileNotFoundError(f"version {v} not committed under {path}")
    snap = _snapshot_dir(path, v)
    sp = os.path.join(snap, "_schema.json")
    if os.path.exists(sp):
        from pyspark.sql.types import StructType

        with open(sp) as f:
            schema = StructType.fromJson(json.load(f))
        return spark.read.schema(schema).parquet(snap)
    return spark.read.parquet(snap)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    keys: list[str],
    evolve_schema: bool = False,
    match_condition=None,
) -> int:
    """MERGE: update-wins on key match, insert otherwise. Returns the
    new version number.

    The relational core is one anti-join: new snapshot =
    ``updates ∪ (target ⟕̸ updates on keys)``. Matched target rows are
    replaced by their update row, unmatched updates are inserts,
    untouched target rows carry over — exactly Delta's
    ``whenMatchedUpdateAll + whenNotMatchedInsertAll``.

    ``match_condition`` is Delta's ``whenMatchedUpdate(condition=…)``
    (SQL ``MERGE … WHEN MATCHED AND <cond> THEN UPDATE``): a function
    ``(upd_struct, tgt_struct) -> Column`` deciding, per matched key,
    whether the update replaces the target row (else the target row
    survives). The CDC staple — e.g. out-of-order event streams merge
    with "newer timestamp wins" so replayed or shuffled batches
    converge to the same table. Implemented as one full-outer struct
    join; NULL/absent condition falls back to unconditional
    update-wins. ``updates`` must be key-unique (pre-reduce upstream,
    as the CDC job does per batch) — duplicate update keys fan out,
    the same situation SQL MERGE defines as a multiple-match error.

    ``evolve_schema=True`` is Delta's mergeSchema: columns present only
    in ``updates`` are ADDED to the table (carried-over target rows get
    NULL), columns only in the target persist (update rows get NULL).
    Off by default: silent widening is how typo'd column names corrupt
    a table. (Mutually exclusive with ``match_condition``.)
    """
    base = latest_version(path)
    tgt = read_table(spark, path, version=base)
    if evolve_schema and match_condition is not None:
        raise ValueError("match_condition with evolve_schema is unsupported")
    # Partition-level copy-on-write (tables created with partition_by):
    # touched partitions = where updates LAND (their own partition
    # values) ∪ where matched target keys LIVE (an update may move a
    # row across partitions — the old partition must be rewritten too).
    # Only those partitions join the merge; the rest hardlink over.
    # evolve_schema forces the full rewrite: carried-over files would
    # lack the new columns and plain parquet reads don't schema-merge.
    pcols = table_meta(path).get("partition_by")
    cow = None
    if pcols is not None and not evolve_schema:
        missing = [c for c in pcols if c not in updates.columns]
        if missing:
            raise ValueError(
                f"updates must carry partition column(s) {missing}"
            )
        # metadata-sized collect: distinct partition values of the
        # update set — bounded by the partition dimension, not the data
        touched = {
            tuple(r) for r in updates.select(*pcols).distinct().collect()
        } | {
            tuple(r)
            # metadata-sized collect: partitions holding matched keys
            for r in tgt.join(updates.select(*keys), keys, "left_semi")
            .select(*pcols)
            .distinct()
            .collect()
        }
        cow = _cow_plan(path, base, pcols, touched)
        file_links: list[str] = []
        if cow is not None:
            # FILE-level manifest pruning inside the touched partitions
            # (single-key merges): footer min/max stats prove which
            # data files cannot contain a matched key — those hardlink
            # over like untouched partitions, and the rewrite input
            # shrinks to exactly the possibly-matching files (read with
            # basePath so partition columns reconstruct). Insert-heavy
            # CDC merges thus rewrite almost nothing: new rows write,
            # everything else links.
            snap = _snapshot_dir(path, base)
            touched_rels = sorted(
                _leaf_partition_rels(snap, pcols) - set(cow[0])
            )
            fsplit = None
            if len(keys) == 1:
                row = updates.agg(
                    F.min(keys[0]).alias("lo"), F.max(keys[0]).alias("hi")
                ).first()
                fsplit = _file_cow_split(
                    snap, touched_rels, keys[0], row["lo"], row["hi"]
                )
            if fsplit is not None:
                file_links, rewrite_paths = fsplit
                if rewrite_paths:
                    tgt = (
                        spark.read.option("basePath", snap)
                        .parquet(*rewrite_paths)
                        .select(*tgt.columns)
                    )
                else:
                    tgt = spark.createDataFrame([], tgt.schema)
            else:
                tgt = tgt.filter(cow[1])
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
        if match_condition is None:
            merged = updates.select(*tgt.columns).unionByName(
                tgt.join(updates, keys, "left_anti")
            )
        else:
            cols = tgt.columns
            u = updates.select(
                *keys,
                F.struct(*[F.col(c) for c in cols]).alias("__u"),
            )
            t = tgt.select(
                *keys,
                F.struct(*[F.col(c) for c in cols]).alias("__t"),
            )
            both = t.join(u, keys, "full_outer")
            winner = (
                F.when(F.col("__t").isNull(), F.col("__u"))  # insert
                .when(F.col("__u").isNull(), F.col("__t"))  # carry-over
                .when(
                    match_condition(F.col("__u"), F.col("__t")), F.col("__u")
                )
                .otherwise(F.col("__t"))
            )
            merged = both.select(winner.alias("__w")).select(
                *[F.col("__w")[c].alias(c) for c in cols]
            )
    if cow is not None:
        return _write_next(
            merged,
            path,
            base=base,
            partition_by=pcols,
            carry_from=_snapshot_dir(path, base),
            carry_rels=cow[0] + file_links,
        )
    # full rewrite (unpartitioned table, unsafe partition values, or
    # evolve_schema) — a partitioned table KEEPS its layout either way:
    # a flat snapshot would break every later copy-on-write plan
    return _write_next(merged, path, base=base, partition_by=pcols)


def delete_where(spark: SparkSession, path: str, cond) -> int:
    """DELETE rows matching ``cond``; NULL-evaluating rows are KEPT
    (they do not match the delete predicate — SQL DELETE semantics).
    Returns the new version number.

    On a partitioned table only partitions that actually contain
    matching rows are rewritten (the rest hardlink over) — and when
    ``cond`` references the partition column, Catalyst partition-prunes
    the touched-value scan itself, so a partition-aligned delete never
    reads the untouched data at all."""
    base = latest_version(path)
    tgt = read_table(spark, path, version=base)
    hit = F.coalesce(cond, F.lit(False))
    keep = ~hit
    pcols = table_meta(path).get("partition_by")
    if pcols is not None:
        touched = {
            tuple(r)
            # metadata-sized collect: partitions containing deleted rows
            for r in tgt.filter(hit).select(*pcols).distinct().collect()
        }
        cow = _cow_plan(path, base, pcols, touched)
        if cow is not None:
            return _write_next(
                tgt.filter(cow[1]).filter(keep),
                path,
                base=base,
                partition_by=pcols,
                carry_from=_snapshot_dir(path, base),
                carry_rels=cow[0],
            )
    return _write_next(tgt.filter(keep), path, base=base, partition_by=pcols)


def delete_range(
    spark: SparkSession, path: str, col: str, lo, hi
) -> int:
    """DELETE WHERE ``col BETWEEN lo AND hi`` with FILE-level manifest
    pruning: parquet footer min/max stats on ``col`` prove which data
    files contain no row in the deleted interval — those hardlink over
    untouched (across ALL partitions), and only the intersecting files
    are read back and rewritten with the keep filter. The explicit
    interval form exists because a general ``delete_where`` predicate
    can't be evaluated against footer stats; range deletes (retention
    windows, backfill corrections) are the shape that can. Falls back
    to :func:`delete_where` whenever stats are unusable. Result is
    row-identical to ``delete_where(col BETWEEN lo AND hi)``
    (NULL ``col`` rows are kept, SQL DELETE semantics — a NULL never
    matches BETWEEN)."""
    base = latest_version(path)
    tgt = read_table(spark, path, version=base)
    between = F.col(col).between(F.lit(lo), F.lit(hi))
    pcols = table_meta(path).get("partition_by")
    snap = _snapshot_dir(path, base)
    leaves = sorted(_leaf_partition_rels(snap, pcols)) if pcols else [""]
    split = _file_cow_split(snap, leaves, col, lo, hi)
    if split is None:
        return delete_where(spark, path, between)
    link_rels, rewrite_paths = split
    keep = ~F.coalesce(between, F.lit(False))
    if rewrite_paths:
        cols = tgt.columns
        rewrite = (
            spark.read.option("basePath", snap)
            .parquet(*rewrite_paths)
            .select(*cols)
            .filter(keep)
        )
    else:
        rewrite = spark.createDataFrame([], tgt.schema)
    return _write_next(
        rewrite,
        path,
        base=base,
        partition_by=pcols,
        carry_from=snap,
        carry_rels=link_rels,
    )


def compact(
    spark: SparkSession,
    path: str,
    target_files: int = 1,
    zorder_code=None,
) -> int:
    """Rewrite the latest snapshot into ``target_files`` files (small-file
    compaction). Content-identical by construction; returns the new
    version.

    ``zorder_code`` (a Column, e.g. :func:`spype_spark.layout.morton2`
    over the query dimensions) switches the rewrite from hash
    repartitioning to Z-order range-clustering — Delta's ``OPTIMIZE
    ZORDER BY``: same one-shuffle cost, but the produced files carry
    tight min/max stats on every clustered dimension, so subsequent
    scans prune files on any of them (see tests/test_layout.py for the
    measured skipping win).
    """
    from spype_spark.layout import zorder_repartition

    base = latest_version(path)
    tgt = read_table(spark, path, version=base)
    if zorder_code is not None:
        out = zorder_repartition(tgt, zorder_code, target_files)
    else:
        out = tgt.repartition(target_files)
    # a partitioned table keeps its layout (target_files becomes
    # files-per-partition rather than a global count)
    return _write_next(
        out, path, base=base, partition_by=table_meta(path).get("partition_by")
    )


def table_diff(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    keys: list[str],
) -> DataFrame:
    """Change-data-feed between two committed versions: one row per
    changed key with ``op`` ∈ {insert, update, delete}.

    Delta's ``table_changes`` equivalent, derived from the snapshot
    pair instead of a change log: full-outer join the two snapshots on
    the keys and classify — key only in ``v_to`` → insert, only in
    ``v_from`` → delete, in both with any non-key column differing →
    update (unchanged rows emit nothing). Struct equality does the
    whole-row compare in one codegen'd expression. At 100 TB the same
    call runs over partition-filtered reads of the two snapshots.
    """
    a = read_table(spark, path, version=v_from)
    b = read_table(spark, path, version=v_to)
    cols = a.columns
    if set(cols) != set(b.columns):
        raise ValueError(
            f"schema changed between v{v_from} and v{v_to}; diff needs the "
            "common-column projection chosen explicitly"
        )
    fa = a.select(*keys, F.struct(*[F.col(c) for c in cols]).alias("__a"))
    fb = b.select(*keys, F.struct(*[F.col(c) for c in cols]).alias("__b"))
    both = fa.join(fb, keys, "full_outer")
    op = (
        F.when(F.col("__a").isNull(), F.lit("insert"))
        .when(F.col("__b").isNull(), F.lit("delete"))
        .when(F.col("__a") != F.col("__b"), F.lit("update"))
    )
    return (
        both.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(*keys, "op")
    )


def data_files(path: str, version: int) -> list[str]:
    """Parquet data files of one committed snapshot (snapshot-relative
    paths; recursive, so partitioned snapshots list the files inside
    their ``col=value`` directories)."""
    d = _snapshot_dir(path, version)
    out = []
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(root, f), d))
    return sorted(out)


def vacuum(path: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` committed snapshots;
    returns the removed version numbers.

    Safe by construction against the copy-on-write carries: shared
    data files are HARDLINKS, so removing an old snapshot directory
    only decrements their link count — every file still referenced by
    a surviving snapshot stays on disk untouched. Time travel to a
    vacuumed version subsequently raises (the retention trade every
    real format makes); latest-version reads are unaffected. The
    removal is per-directory ``rmtree`` of already-superseded
    snapshots. A writer whose BASE snapshot gets vacuumed mid-commit
    (it lost the optimistic race and then retention collected its
    base) surfaces as :class:`ConcurrentWriteError` from the commit's
    carry path — stale base, retry — not as corruption; aggressive
    ``keep_last=1`` retention under concurrent writers simply forces
    those retries, the same trade Delta's ``VACUUM RETAIN 0`` makes.
    """
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    vs = versions(path)
    drop = vs[:-keep_last]
    for v in drop:
        shutil.rmtree(_snapshot_dir(path, v), ignore_errors=True)
    return drop


def history(spark: SparkSession, path: str) -> DataFrame:
    """Table history as a DataFrame: (version, n_files)."""
    rows = [(v, len(data_files(path, v))) for v in versions(path)]
    return spark.createDataFrame(rows, "version int, n_files int")
