"""Iceberg INCREMENTAL READ as a Spark *format* — the Spark 4 Python
DataSource API over :mod:`spype_spark.iceberg_log`, the Iceberg twin
of :mod:`spype_spark.cdf_source`.

``spark.read.format("iceberg_cdc")`` / ``spark.readStream.format(
"iceberg_cdc")`` deliver the per-snapshot row-level change feed of
:func:`spype_spark.iceberg_interop.iceberg_changes` through a real
DataFrame source: batch windows ``(fromSnapshotId, toSnapshotId]``
(Iceberg's own incremental-scan convention), and genuine Structured
Streaming whose offsets are snapshot-chain ordinals — Spark's
checkpoint carries ``{ordinal, snapshot_id}``, restarts resume
exactly-once, and an expired/rewritten chain fails LOUDLY on the
ordinal/id mismatch instead of replaying wrong windows.

Why this can distribute per file with no joins: Iceberg row identity
inside an immutable data file is its position, and every delete
mechanism resolves to a per-file row mask — position deletes name
``(file_path, pos)`` outright, equality deletes hide rows of files
with strictly smaller data sequence numbers. The PLANNER (a no-Spark
data-source worker — hence :mod:`iceberg_log`'s by-value
registration) walks the metadata chain, diffs file sets per snapshot
pair, and attaches to each task exactly the delete state that can
reach its file: position lists, equality tuples (both bounded by what
the delete files themselves serialized — the metadata cost class).
EXECUTORS then scan one data file per task, apply the masks with
pyarrow/numpy, and emit Arrow record batches:

- added file → its live rows at the new snapshot, ``insert``;
- removed file → its live rows at the OLD snapshot, ``delete``;
- surviving file reached by a CHANGED delete file → the mask diff
  (live-before ∧ ¬live-after = ``delete``, the reverse = restore
  ``insert``) — only the targeted files, same as the batch reader's
  ``file_subset`` path.

Snapshots whose summary operation is ``replace`` (compaction) are
row-preserving by spec and plan nothing; rewrites without row lineage
raise — never a silently wrong feed. Column resolution is per-file BY
FIELD ID from the parquet footer (renames safe), with the table's
name-mapping property as the spec fallback for id-less migrated
files; columns added after a file was written read as NULL.
"""

from __future__ import annotations

import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from spype_spark import iceberg_log as ilog
from spype_spark.arrow_shape import shape_batches

CHANGE_TYPE_COL = "_change_type"
SNAPSHOT_ID_COL = "_snapshot_id"

FORMAT_NAME = "iceberg_cdc"


def register_iceberg_cdc(spark) -> None:
    """Register the ``iceberg_cdc`` format on a live session."""
    spark.dataSource.register(IcebergCDCDataSource)


def _norm(fp: str) -> str:
    return os.path.abspath(re.sub(ilog.URI_SCHEME_RE, "", fp))


# ---------------------------------------------------------------------------
# planning — pure Python, runs in the data-source worker
# ---------------------------------------------------------------------------


class _IceChangePartition(InputPartition):
    """One data file to scan. ``kind``: ``insert`` (emit live rows at
    the new snapshot) / ``delete`` (live rows at the old one) /
    ``diff`` (emit both mask differences). ``pos_before/after`` are
    deleted row positions, ``eq_before/after`` are equality groups
    ``(logical column names, delete value tuples)`` — exactly the
    delete state whose sequence numbers reach this file."""

    def __init__(
        self,
        file: str,
        kind: str,
        snapshot_id: int,
        pos_before=None,
        eq_before=None,
        pos_after=None,
        eq_after=None,
        fields=None,
        namemap=None,
    ):
        self.file = file
        self.kind = kind
        self.snapshot_id = snapshot_id
        self.pos_before = pos_before or []
        self.eq_before = eq_before or []
        self.pos_after = pos_after or []
        self.eq_after = eq_after or []
        self.fields = fields or []
        self.namemap = namemap or {}


class _DeleteStateCache:
    """Memoized pyarrow reads of delete files within one plan call —
    each file's rows are read once however many data files its
    sequence number reaches."""

    def __init__(self, path: str, meta: dict):
        self.path = path
        self.id2name = {
            int(f["id"]): f["name"] for f in ilog.current_fields(meta)
        }
        self._pos: dict[str, list[tuple[str, int]]] = {}
        self._eq: dict[str, tuple[tuple, list[tuple]]] = {}

    def pos_rows(self, fp: str) -> list[tuple[str, int]]:
        if fp not in self._pos:
            import pyarrow.parquet as pq

            t = pq.read_table(fp, columns=["file_path", "pos"])
            self._pos[fp] = [
                (_norm(f), int(p))
                for f, p in zip(
                    t.column("file_path").to_pylist(),
                    t.column("pos").to_pylist(),
                )
            ]
        return self._pos[fp]

    def eq_rows(self, fp: str, ids: tuple[int, ...]):
        if fp not in self._eq:
            import pyarrow.parquet as pq

            try:
                names = tuple(self.id2name[i] for i in ids)
            except KeyError as exc:
                raise ValueError(
                    f"equality_ids {list(ids)} name a field id missing "
                    f"from the current schema"
                ) from exc
            # delete files written before a rename carry old physical
            # names — resolve by footer field id, spec rule
            id2phys = ilog.parquet_field_ids(fp)
            cols = [id2phys.get(i, self.id2name[i]) for i in ids]
            t = pq.read_table(fp, columns=cols)
            rows = list(
                zip(*(t.column(c).to_pylist() for c in cols))
            ) if ids else []
            self._eq[fp] = (names, rows)
        return self._eq[fp]


def _file_delete_state(
    info: dict, file_norm: str, file_seq: int, cache: _DeleteStateCache
):
    """(positions, equality groups) of every delete file in ``info``
    whose sequence number reaches a data file at ``file_seq`` —
    position deletes apply at seq ≤ theirs, equality deletes strictly
    below theirs (the spec's sequence rules)."""
    positions: list[int] = []
    for dfp, dseq in info["pos"]:
        if file_seq <= int(dseq):
            positions.extend(
                p for f, p in cache.pos_rows(dfp) if f == file_norm
            )
    eq_groups = []
    for dfp, dseq, ids in info["eq"]:
        if file_seq < int(dseq):
            names, rows = cache.eq_rows(dfp, tuple(int(i) for i in ids))
            if rows:
                eq_groups.append((names, rows))
    return sorted(set(positions)), eq_groups


def plan_iceberg_changes(
    path: str, meta: dict, start_idx: int, end_idx: int
) -> list[_IceChangePartition]:
    """Partition plan for snapshots ``snaps[start_idx..end_idx]`` — the
    no-Spark twin of ``iceberg_changes``' classification, emitting one
    task per affected data file."""
    snaps = list(meta.get("snapshots") or [])
    fields = [
        {"id": int(f["id"]), "name": f["name"]}
        for f in ilog.current_fields(meta)
    ]
    namemap = ilog.name_mapping(meta)
    cache = _DeleteStateCache(path, meta)
    parts: list[_IceChangePartition] = []

    def part(file, kind, sid, **kw):
        parts.append(
            _IceChangePartition(
                file, kind, sid, fields=fields, namemap=namemap, **kw
            )
        )

    for i in range(start_idx, end_idx + 1):
        snap = snaps[i]
        sid = int(snap["snapshot-id"])
        op = str((snap.get("summary") or {}).get("operation", ""))
        if op == "replace":
            continue  # row-preserving compaction by spec
        cur_info = ilog.snapshot_files(path, snap, None)
        if i == 0:
            prev_info: dict = {"data": [], "pos": [], "eq": []}
        else:
            prev_info = ilog.snapshot_files(path, snaps[i - 1], None)
        cur_seq = {_norm(fp): int(s) for fp, s in cur_info["data"]}
        prev_seq = {_norm(fp): int(s) for fp, s in prev_info["data"]}
        added = set(cur_seq) - set(prev_seq)
        removed = set(prev_seq) - set(cur_seq)
        if added and removed:
            raise ValueError(
                f"iceberg_cdc: snapshot {sid} (operation {op!r}) "
                f"rewrites data files — row-level changes are "
                f"undecidable from file diffs"
            )
        for f in sorted(added):
            pos, eq = _file_delete_state(cur_info, f, cur_seq[f], cache)
            part(f, "insert", sid, pos_after=pos, eq_after=eq)
        for f in sorted(removed):
            pos, eq = _file_delete_state(prev_info, f, prev_seq[f], cache)
            part(f, "delete", sid, pos_before=pos, eq_before=eq)
        # targeted row-level diff on surviving files: only the common
        # files a CHANGED delete file can reach (position deletes name
        # their targets; equality deletes reach strictly smaller seqs)
        pos_delta = set(map(tuple, prev_info["pos"])) ^ set(
            map(tuple, cur_info["pos"])
        )
        eq_delta = {
            (fp, s, tuple(e)) for fp, s, e in prev_info["eq"]
        } ^ {(fp, s, tuple(e)) for fp, s, e in cur_info["eq"]}
        common = set(cur_seq) & set(prev_seq)
        if not common or not (pos_delta or eq_delta):
            continue
        targeted: set[str] = set()
        for dfp, _ds in pos_delta:
            targeted |= {f for f, _p in cache.pos_rows(dfp)}
        if eq_delta:
            max_eq = max(int(s) for _fp, s, _ids in eq_delta)
            targeted |= {f for f in common if cur_seq[f] < max_eq}
        for f in sorted(targeted & common):
            pb, eb = _file_delete_state(prev_info, f, prev_seq[f], cache)
            pa, ea = _file_delete_state(cur_info, f, cur_seq[f], cache)
            if (pb, eb) == (pa, ea):
                continue  # this file's reachable state didn't change
            part(
                f, "diff", sid,
                pos_before=pb, eq_before=eb,
                pos_after=pa, eq_after=ea,
            )
    return parts


# ---------------------------------------------------------------------------
# executor-side read — per-file masks, Arrow batches out
# ---------------------------------------------------------------------------


def _read_ice_change_file(part: _IceChangePartition, schema):
    """Yield Arrow record batches for one data-file task: resolve
    columns by footer field id (name-mapping fallback), build the
    live-row masks from the attached delete state, emit the rows the
    partition kind calls for with ``_change_type``/``_snapshot_id``
    appended."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    data_names = [
        f.name
        for f in schema.fields
        if f.name not in (CHANGE_TYPE_COL, SNAPSHOT_ID_COL)
    ]

    pf = pq.ParquetFile(part.file)
    fschema = pf.schema_arrow
    present = set(fschema.names)
    id2phys = {}
    for f in fschema:
        fid = (f.metadata or {}).get(b"PARQUET:field_id")
        if fid is not None:
            id2phys[int(fid)] = f.name
    phys_of = {}
    for fd in part.fields:
        fid, ln = fd["id"], fd["name"]
        if fid in id2phys:
            phys_of[ln] = id2phys[fid]
        else:
            phys_of[ln] = next(
                (n for n in part.namemap.get(fid, []) if n in present),
                ln,
            )
    want = sorted({p for p in phys_of.values() if p in present})
    tbl = pf.read(columns=want)
    n = tbl.num_rows

    def mask_of(pos, eq_groups):
        m = np.ones(n, dtype=bool)
        if pos:
            m[np.asarray(pos, dtype=np.int64)] = False
        for names, rows in eq_groups:
            key = set(rows)
            cols = [
                tbl.column(phys_of[nm]).to_pylist()
                if phys_of[nm] in present
                else [None] * n
                for nm in names
            ]
            hit = np.fromiter(
                (t in key for t in zip(*cols)), dtype=bool, count=n
            )
            m &= ~hit
        return m

    def emit(mask, kind):
        idx = np.flatnonzero(mask)
        if idx.size == 0:
            return
        sel = tbl.take(pa.array(idx, type=pa.int64()))

        def resolve(name):
            if name == CHANGE_TYPE_COL:
                return ("const", kind)
            if name == SNAPSHOT_ID_COL:
                return ("const", part.snapshot_id)
            if phys_of.get(name) in sel.column_names:
                return ("col", sel.column(phys_of[name]))
            return None

        yield from shape_batches(target, idx.size, resolve)

    if part.kind == "insert":
        yield from emit(mask_of(part.pos_after, part.eq_after), "insert")
    elif part.kind == "delete":
        yield from emit(mask_of(part.pos_before, part.eq_before), "delete")
    else:  # diff
        before = mask_of(part.pos_before, part.eq_before)
        after = mask_of(part.pos_after, part.eq_after)
        yield from emit(before & ~after, "delete")
        yield from emit(~before & after, "insert")


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------


def _chain(meta: dict) -> list[int]:
    return [int(s["snapshot-id"]) for s in (meta.get("snapshots") or [])]


def _ordinal_of(ids: list[int], snapshot_id, what: str) -> int:
    if int(snapshot_id) not in ids:
        raise ValueError(
            f"iceberg_cdc: {what} {snapshot_id} not in snapshot chain"
        )
    return ids.index(int(snapshot_id))


class _IceCDCBatchReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.path = options["path"]
        self.from_id = options.get("fromsnapshotid")
        self.to_id = options.get("tosnapshotid")

    def partitions(self):
        meta = ilog.current_metadata(self.path)
        ids = _chain(meta)
        if not ids:
            raise ValueError(
                f"Iceberg table {self.path} has no snapshots"
            )
        start = (
            _ordinal_of(ids, self.from_id, "fromSnapshotId") + 1
            if self.from_id is not None
            else 0
        )
        end = (
            _ordinal_of(ids, self.to_id, "toSnapshotId")
            if self.to_id is not None
            else len(ids) - 1
        )
        return plan_iceberg_changes(self.path, meta, start, end)

    def read(self, partition):
        # an empty partitions() list surfaces here as a single None
        # partition (the API's empty-input convention)
        if partition is None:
            return
        yield from _read_ice_change_file(partition, self.schema)


class _IceCDCStreamReader(DataSourceStreamReader):
    """Offsets are snapshot-chain ordinals with the snapshot id pinned
    alongside: ``{"ordinal": i, "snapshot_id": id}`` means "snapshots
    up to chain position i consumed". A chain whose id at that
    ordinal no longer matches (expired/rewritten history) fails
    loudly — the consumer must restart from a valid position, never
    silently re-window."""

    def __init__(self, schema, options):
        self.schema = schema
        self.path = options["path"]
        self.from_id = options.get("fromsnapshotid")
        self.max_snaps = (
            int(options["maxsnapshotspertrigger"])
            if "maxsnapshotspertrigger" in options
            else None
        )
        self._pos: int | None = None

    def initialOffset(self):
        if self.from_id is not None:
            ids = _chain(ilog.current_metadata(self.path))
            o = _ordinal_of(ids, self.from_id, "fromSnapshotId")
            self._pos = o
            return {"ordinal": o, "snapshot_id": int(self.from_id)}
        self._pos = -1
        return {"ordinal": -1, "snapshot_id": None}

    def latestOffset(self):
        ids = _chain(ilog.current_metadata(self.path))
        if not ids:
            raise ValueError(
                f"Iceberg table {self.path} has no snapshots"
            )
        head = len(ids) - 1
        if self.max_snaps is not None and self._pos is not None:
            head = min(head, self._pos + self.max_snaps)
        self._pos = head
        return {"ordinal": head, "snapshot_id": ids[head]}

    def partitions(self, start, end):
        lo, hi = int(start["ordinal"]), int(end["ordinal"])
        if self._pos is None or self._pos < hi:
            self._pos = hi
        # identity check FIRST: an expired/rewritten chain must fail
        # even when the window looks empty (ordinal equality with a
        # different snapshot id is exactly the rewrite signature)
        meta = ilog.current_metadata(self.path)
        ids = _chain(meta)
        for off, what in ((start, "start"), (end, "end")):
            o, sid = int(off["ordinal"]), off.get("snapshot_id")
            if o < 0 or sid is None:
                continue
            if o >= len(ids) or ids[o] != int(sid):
                raise ValueError(
                    f"iceberg_cdc: checkpointed {what} offset "
                    f"(ordinal {o}, snapshot {sid}) no longer matches "
                    f"the snapshot chain — history was expired or "
                    f"rewritten; restart the stream from a valid "
                    f"snapshot"
                )
        if hi <= lo:
            return []
        return plan_iceberg_changes(self.path, meta, lo + 1, hi)

    def read(self, partition):
        # an empty partitions() list surfaces here as a single None
        # partition (the API's empty-input convention)
        if partition is None:
            return
        yield from _read_ice_change_file(partition, self.schema)

    def commit(self, end):
        pass


class IcebergCDCDataSource(DataSource):
    """``format("iceberg_cdc")`` — batch + streaming incremental read
    over a foreign Iceberg table. Options: ``path`` (table root,
    required), ``fromSnapshotId`` (exclusive), ``toSnapshotId``
    (inclusive, batch only), ``maxSnapshotsPerTrigger`` (streaming
    admission hint). Output schema: the table schema +
    ``_change_type`` string + ``_snapshot_id`` long — identical to
    :func:`iceberg_interop.iceberg_changes`."""

    @classmethod
    def name(cls):
        return FORMAT_NAME

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError(
                "iceberg_cdc requires .option('path', <table root>) or "
                ".load(<table root>)"
            )
        return p

    def schema(self):
        from pyspark.sql.types import StructType

        meta = ilog.current_metadata(self._path())
        base = ilog.ice_schema_to_spark(meta)
        out = StructType(list(base.fields))
        out.add(CHANGE_TYPE_COL, "string", False)
        out.add(SNAPSHOT_ID_COL, "long", False)
        return out

    def reader(self, schema):
        opts = {k.lower(): v for k, v in self.options.items()}
        opts["path"] = self._path()
        return _IceCDCBatchReader(schema, opts)

    def streamReader(self, schema):
        opts = {k.lower(): v for k, v in self.options.items()}
        opts["path"] = self._path()
        return _IceCDCStreamReader(schema, opts)


# Ship the class and this module's planner/reader code inside the
# pickle: data-source workers cannot import spype_spark.
try:  # pragma: no cover
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass
