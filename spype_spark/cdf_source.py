"""Foreign-Delta CHANGE DATA FEED as a Spark *format* — the Spark 4
Python DataSource API (``pyspark.sql.datasource``) over
:mod:`spype_spark.delta_log`.

:func:`spype_spark.delta_interop.delta_changes` gives a CDC consumer a
batch DataFrame of row-level changes; this module lifts the same feed
into a registered data source with BOTH halves of the DataFrame API:

- ``spark.read.format("delta_cdf").option("path", p).load()`` — one
  window ``[startingVersion, endingVersion]`` as a batch frame;
- ``spark.readStream.format("delta_cdf").option("path", p).load()`` —
  genuine Structured Streaming: offsets are Delta commit versions, so
  checkpoint/restart resume EXACTLY-ONCE from the last committed
  version, microbatches are per-commit change sets, and every sink /
  stateful operator Spark offers composes downstream. This is the
  capability the drain-based native ``ChangesStream`` could not offer:
  a real ``writeStream`` pipeline tailing a foreign Delta table with
  no jars.

Execution model (how this distributes):

- **Planning** (``partitions()``) runs in Spark's data-source worker —
  a plain Python process with no SparkSession, which is why the log
  layer lives in the no-pyspark :mod:`spype_spark.delta_log`. Cost is
  O(log metadata): JSON commit parse, lazy pyarrow checkpoint replay,
  deletion-vector payloads (bounded by the cardinality the commit
  itself serialized — the same class as the batch reader's decode).
- **Reading** runs on executors, one task per change FILE (the same
  unit of parallelism the batch ``delta_changes`` scan uses), emitting
  Arrow record batches — the vectorized channel, no per-row Python.
- Change classification is byte-for-byte the ``delta_changes`` rules:
  ``cdc`` actions authoritative, file-diff reconstruction for
  append/delete/DV-delta commits, a LOUD error for rewrites without
  cdc — never a silently wrong feed.

The module is registered for cloudpickle by-value pickling (the
roaring/avro_io/codecs pattern): the DataSource class crosses to
JVM-spawned workers that cannot import ``spype_spark``.
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import urllib.parse

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from spype_spark import delta_log as dlog
from spype_spark.roaring import deserialize_array64
from spype_spark.arrow_shape import shape_batches

CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"

FORMAT_NAME = "delta_cdf"


def register_delta_cdf(spark) -> None:
    """Register the ``delta_cdf`` format on a live session (idempotent
    — re-registration replaces the prior entry)."""
    spark.dataSource.register(DeltaCDFDataSource)


# ---------------------------------------------------------------------------
# partition-value parsing (Delta spec "Partition Value Serialization")
# ---------------------------------------------------------------------------


def _pv_value(type_json, s: str | None):
    """One partitionValues string decoded per the Delta spec for the
    column's schema-JSON type. ``None`` / absent key means NULL."""
    if s is None:
        return None
    t = type_json if isinstance(type_json, str) else str(type_json)
    if t == "string":
        return s
    if t in ("long", "integer", "short", "byte"):
        return int(s)
    if t in ("double", "float"):
        return float(s)
    if t == "boolean":
        return s == "true"
    if t == "date":
        return datetime.date.fromisoformat(s)
    if t == "timestamp":
        # "yyyy-MM-dd HH:mm:ss[.ffffff]" — UTC-adjusted per spec
        return datetime.datetime.fromisoformat(s)
    if t.startswith("decimal"):
        return decimal.Decimal(s)
    raise ValueError(
        f"partition value of type {t!r} is not supported by the "
        f"delta_cdf source"
    )


# ---------------------------------------------------------------------------
# planning — pure Python, runs in the data-source worker
# ---------------------------------------------------------------------------


class _ChangeFilePartition(InputPartition):
    """One change file to scan: the streaming/batch unit of work.

    ``kind``: ``cdc`` (file carries ``_change_type`` in-band) /
    ``insert`` / ``delete`` (constant type column). ``positions``
    restricts to exactly those row indexes (deletion-vector DELTAS);
    ``exclude`` drops those indexes (a removed file's live rows, or a
    fresh add born with a vector). ``pvals`` are decoded partition
    values keyed by LOGICAL column; ``rename`` maps physical file
    column names to logical; ``idmap`` maps parquet field ids to
    logical names (column-mapping id mode, resolved per file footer).
    """

    def __init__(
        self,
        file: str,
        kind: str,
        version: int,
        positions: list[int] | None = None,
        exclude: list[int] | None = None,
        pvals: dict | None = None,
        rename: dict | None = None,
        idmap: dict | None = None,
    ):
        self.file = file
        self.kind = kind
        self.version = version
        self.positions = positions
        self.exclude = exclude
        self.pvals = pvals or {}
        self.rename = rename or {}
        self.idmap = idmap or {}


def _dv_positions(table_path: str, dvd: dict | None) -> set[int]:
    if not dvd:
        return set()
    pos = set(deserialize_array64(dlog.load_dv_bytes(table_path, dvd)))
    card = dvd.get("cardinality")
    if card is not None and len(pos) != int(card):
        raise ValueError(
            f"deletion vector decodes to {len(pos)} positions != "
            f"cardinality {card}"
        )
    return pos


def _mapping_context(meta: dict) -> tuple[dict, dict, dict]:
    """(physical→logical rename, field-id→logical idmap,
    logical→physical) for the table's column-mapping mode. Empty maps
    in ``none`` mode."""
    mode, _pj, l2p = dlog.mapping_info(meta)
    if mode == "none":
        return {}, {}, {}
    rename = {p: l for l, p in l2p.items()}
    idmap: dict[int, str] = {}
    for f in json.loads(meta["schemaString"])["fields"]:
        cid = (f.get("metadata") or {}).get("delta.columnMapping.id")
        if cid is not None:
            idmap[int(cid)] = f["name"]
    return rename, idmap, l2p


def plan_changes(
    path: str,
    start_version: int,
    end_version: int,
    meta: dict,
    state: dict[str, dict] | None = None,
) -> list[_ChangeFilePartition]:
    """Partition plan for the change feed of commits
    ``[start_version, end_version]`` — the no-Spark twin of
    :func:`spype_spark.delta_interop.delta_changes`' classification,
    emitting scan work instead of DataFrames. ``state`` (path → add
    action entering the window) is reconstructed lazily via
    :func:`delta_log.replay_state_py` only when a diff references a
    pre-window file, so tailing pure appends never replays."""
    avail = set(dlog.commit_versions(path))
    window = list(range(start_version, end_version + 1))
    missing = [v for v in window if v not in avail]
    if missing:
        raise ValueError(
            f"delta_cdf: commits {missing} not retained as JSON "
            f"(checkpoint-truncated) — change window unavailable"
        )
    rename, idmap, l2p = _mapping_context(meta)
    schema_fields = json.loads(meta["schemaString"])["fields"]
    ltype = {f["name"]: f["type"] for f in schema_fields}
    p2l_pv = {l2p.get(line, line): line for line in ltype}

    def abs_path(rel: str) -> str:
        return os.path.abspath(
            os.path.join(path, urllib.parse.unquote(rel))
        )

    def pvals_of(a: dict) -> dict:
        out = {}
        for k, s in (a.get("partitionValues") or {}).items():
            lk = p2l_pv.get(k, k)
            out[lk] = _pv_value(ltype.get(lk, "string"), s)
        return out

    parsed: list[tuple[int, list[dict], list[dict], list[dict]]] = []
    for v in window:
        adds_v: list[dict] = []
        rms_v: list[dict] = []
        cdc_v: list[dict] = []
        with open(dlog.commit_path(path, v)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    adds_v.append(action["add"])
                elif "remove" in action:
                    rms_v.append(action["remove"])
                elif "cdc" in action:
                    cdc_v.append(action["cdc"])
        parsed.append((v, adds_v, rms_v, cdc_v))

    if state is None:
        state = {}
        if start_version > 0:
            known: set[str] = set()
            need_state = False
            for _v, adds_v, rms_v, cdc_v in parsed:
                if not cdc_v and any(
                    r["path"] not in known
                    for r in rms_v
                    if r.get("dataChange", True)
                ):
                    need_state = True
                    break
                known.update(a["path"] for a in adds_v)
            if need_state:
                st0 = dlog.replay_state_py(path, start_version - 1)
                state = {a["path"]: a for a in st0["adds"]}

    parts: list[_ChangeFilePartition] = []

    def part(file, kind, v, a, positions=None, exclude=None):
        parts.append(
            _ChangeFilePartition(
                file,
                kind,
                v,
                positions=sorted(positions) if positions else None,
                exclude=sorted(exclude) if exclude else None,
                pvals=pvals_of(a) if a is not None else {},
                rename=rename,
                idmap=idmap,
            )
        )

    for v, adds_v, rms_v, cdc_v in parsed:
        if cdc_v:
            for c in cdc_v:
                part(abs_path(c["path"]), "cdc", v, c)
        else:
            da = [a for a in adds_v if a.get("dataChange", True)]
            dr = [r for r in rms_v if r.get("dataChange", True)]
            add_paths = {a["path"] for a in da}
            rm_paths = {r["path"] for r in dr}
            pure_adds = [a for a in da if a["path"] not in rm_paths]
            pure_rms = [r for r in dr if r["path"] not in add_paths]
            if pure_adds and pure_rms:
                raise ValueError(
                    f"delta_cdf: commit {v} rewrites files without cdc "
                    f"actions — the row-level change set is undecidable; "
                    f"enable Change Data Feed on the writer"
                )
            for a in pure_adds:
                part(
                    abs_path(a["path"]), "insert", v, a,
                    exclude=_dv_positions(path, a.get("deletionVector")),
                )
            for r in pure_rms:
                prev = state.get(r["path"])
                if prev is None:
                    raise ValueError(
                        f"delta_cdf: commit {v} removes {r['path']} "
                        f"which is not in the tracked state — window "
                        f"must start at table birth or a replayable "
                        f"version"
                    )
                part(
                    abs_path(r["path"]), "delete", v, prev,
                    exclude=_dv_positions(path, prev.get("deletionVector")),
                )
            for a in da:
                if a["path"] not in rm_paths:
                    continue
                prev = state.get(a["path"]) or {}
                old_dvd = prev.get("deletionVector")
                new_dvd = a.get("deletionVector")
                if new_dvd is None and old_dvd is None:
                    raise ValueError(
                        f"delta_cdf: commit {v} re-adds {a['path']} "
                        f"unchanged and un-vectored — row-level change "
                        f"set undecidable without cdc"
                    )
                old_pos = _dv_positions(path, old_dvd)
                new_pos = _dv_positions(path, new_dvd)
                if new_pos - old_pos:
                    part(abs_path(a["path"]), "delete", v, a,
                         positions=new_pos - old_pos)
                if old_pos - new_pos:
                    part(abs_path(a["path"]), "insert", v, a,
                         positions=old_pos - new_pos)
        for r in rms_v:
            state.pop(r["path"], None)
        for a in adds_v:
            state[a["path"]] = a
    return parts


# ---------------------------------------------------------------------------
# executor-side read — Arrow batches, one task per change file
# ---------------------------------------------------------------------------


def _read_change_file(part: _ChangeFilePartition, schema):
    """Yield Arrow record batches for one change-file partition,
    shaped exactly to the declared Spark schema (table columns +
    ``_change_type`` + ``_commit_version``). Columns are resolved
    physical→logical per file (field ids first — id mode —, then the
    physicalName map), missing columns fill NULL (schema evolution),
    partition columns fill as constants from the add's
    ``partitionValues``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    target = to_arrow_schema(schema)
    data_names = [
        f.name
        for f in schema.fields
        if f.name not in (CHANGE_TYPE_COL, COMMIT_VERSION_COL)
    ]

    pf = pq.ParquetFile(part.file)
    fschema = pf.schema_arrow
    names = {}
    for f in fschema:
        fid = (f.metadata or {}).get(b"PARQUET:field_id")
        if part.idmap and fid is not None and int(fid) in part.idmap:
            names[f.name] = part.idmap[int(fid)]
        elif f.name in part.rename:
            names[f.name] = part.rename[f.name]
        else:
            names[f.name] = f.name
    want = [
        p
        for p in fschema.names
        if names[p] in data_names
        or (part.kind == "cdc" and names[p] == CHANGE_TYPE_COL)
    ]
    tbl = pf.read(columns=want)
    tbl = tbl.rename_columns([names[c] for c in tbl.column_names])

    if part.positions is not None:
        tbl = tbl.take(pa.array(part.positions, type=pa.int64()))
    elif part.exclude:
        import numpy as np

        mask = np.ones(tbl.num_rows, dtype=bool)
        mask[np.asarray(part.exclude, dtype=np.int64)] = False
        tbl = tbl.filter(pa.array(mask))
    n = tbl.num_rows
    if n == 0:
        return

    def resolve(name):
        if name == CHANGE_TYPE_COL:
            if part.kind == "cdc":
                return ("col", tbl.column(CHANGE_TYPE_COL))
            return ("const", part.kind)
        if name == COMMIT_VERSION_COL:
            return ("const", part.version)
        if name in tbl.column_names:
            return ("col", tbl.column(name))
        if name in part.pvals:
            return ("const", part.pvals[name])
        return None

    yield from shape_batches(target, n, resolve)


# ---------------------------------------------------------------------------
# the DataSource
# ---------------------------------------------------------------------------


class _DeltaCDFBatchReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.path = options["path"]
        self.start = int(options.get("startingversion", 0))
        self.end = (
            int(options["endingversion"])
            if "endingversion" in options
            else None
        )

    def partitions(self):
        end = self.end
        if end is None:
            end = dlog.commit_versions(self.path)[-1]
        meta = dlog.replay_state_py(self.path, end)["meta"]
        return plan_changes(self.path, self.start, end, meta)

    def read(self, partition):
        # an empty partitions() list surfaces here as a single None
        # partition (the API's empty-input convention)
        if partition is None:
            return
        yield from _read_change_file(partition, self.schema)


class _DeltaCDFStreamReader(DataSourceStreamReader):
    """Offsets are Delta commit versions: ``{"version": N}`` means
    "commits ≤ N consumed". ``latestOffset`` advances to the log head
    (optionally rate-limited by ``maxVersionsPerTrigger``);
    ``partitions(start, end)`` plans the change files of
    ``(start, end]``. Restart resumes from Spark's own checkpointed
    offset — exactly-once without any source-side state."""

    def __init__(self, schema, options):
        self.schema = schema
        self.path = options["path"]
        self.start = int(options.get("startingversion", 0))
        self.max_versions = (
            int(options["maxversionspertrigger"])
            if "maxversionspertrigger" in options
            else None
        )
        #: rate-limit cursor: the last version this reader has either
        #: offered (latestOffset) or seen Spark plan (partitions).
        #: None until the first call — an uncapped first offer after a
        #: restart is safe (the limit is an admission hint, never a
        #: correctness boundary).
        self._pos: int | None = None
        self._meta_cache: tuple[int, dict] | None = None

    def initialOffset(self):
        self._pos = self.start - 1
        return {"version": self.start - 1}

    def latestOffset(self):
        head = dlog.commit_versions(self.path)[-1]
        if self.max_versions is not None and self._pos is not None:
            head = min(head, self._pos + self.max_versions)
        self._pos = head
        return {"version": head}

    def partitions(self, start, end):
        lo, hi = int(start["version"]), int(end["version"])
        # sync the rate-limit cursor with Spark's (checkpointed) truth —
        # on restart initialOffset is never called, so the first capped
        # latestOffset after a restart bases off the real position here
        if self._pos is None or self._pos < hi:
            self._pos = hi
        if hi <= lo:
            return []
        if self._meta_cache is not None and self._meta_cache[0] >= hi:
            meta = self._meta_cache[1]
        else:
            meta = dlog.replay_state_py(self.path, hi)["meta"]
            self._meta_cache = (hi, meta)
        return plan_changes(self.path, lo + 1, hi, meta)

    def read(self, partition):
        # an empty partitions() list surfaces here as a single None
        # partition (the API's empty-input convention)
        if partition is None:
            return
        yield from _read_change_file(partition, self.schema)

    def commit(self, end):
        pass


class DeltaCDFDataSource(DataSource):
    """``format("delta_cdf")`` — batch + streaming change feed over a
    foreign Delta table. Options: ``path`` (table root, required),
    ``startingVersion`` (default 0), ``endingVersion`` (batch only,
    default head), ``maxVersionsPerTrigger`` (streaming rate limit).
    Output schema: the table schema + ``_change_type`` string +
    ``_commit_version`` long — identical to
    :func:`delta_interop.delta_changes`."""

    @classmethod
    def name(cls):
        return FORMAT_NAME

    def _path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError(
                "delta_cdf requires .option('path', <table root>) or "
                ".load(<table root>)"
            )
        return p

    def schema(self):
        from pyspark.sql.types import StructType

        path = self._path()
        end = (
            int(self.options["endingversion"])
            if "endingversion" in self.options
            else None
        )
        st = dlog.replay_state_py(path, end)
        base = StructType.fromJson(json.loads(st["meta"]["schemaString"]))
        out = StructType(list(base.fields))
        out.add(CHANGE_TYPE_COL, "string", False)
        out.add(COMMIT_VERSION_COL, "long", False)
        return out

    def reader(self, schema):
        opts = {k.lower(): v for k, v in self.options.items()}
        opts["path"] = self._path()
        return _DeltaCDFBatchReader(schema, opts)

    def streamReader(self, schema):
        opts = {k.lower(): v for k, v in self.options.items()}
        opts["path"] = self._path()
        return _DeltaCDFStreamReader(schema, opts)


# Ship the class (and this module's planner/reader code) inside the
# pickle: data-source workers cannot import spype_spark.
try:  # pragma: no cover
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass
