"""Interop with the Delta Lake transaction-log format — pure Python.

The first thing a user with an EXISTING lakehouse hits is "can this
engine read my Delta table?". The Delta log is an open spec
(delta-io PROTOCOL.md) and its read path needs no jars: commits are
newline-delimited JSON action files under ``_delta_log/``
(``%020d.json``), periodically compacted into a parquet checkpoint
(``%020d.checkpoint.parquet``) pointed at by ``_last_checkpoint``.
:func:`read_delta` replays that log with the standard library + one
Spark parquet scan:

- actions understood: ``add`` / ``remove`` (file-level state machine,
  keyed by path), ``metaData`` (schemaString is a Spark StructType
  JSON — ``StructType.fromJson`` parses it directly), ``protocol``
  (gate: ``minReaderVersion`` > 1 or reader features ⇒ a loud
  ValueError, never silently-wrong data), ``commitInfo``/``txn``
  (ignored, as the spec allows for readers);
- checkpoint parquet: read through Spark, adds/metaData/protocol
  extracted (metadata-sized — one row per live file), then JSON
  commits after the checkpoint replayed on top;
- ``version=`` time travel: replay stops at the requested version
  (the checkpoint is only used when it is ≤ the requested version);
- partitioned tables: Delta data files do NOT store partition
  columns — values live in each add's ``partitionValues``. When every
  add's path carries the exact Hive-style ``col=value/`` prefix those
  values imply (the layout every mainstream writer produces), the
  table reads as ONE Spark scan with ``basePath`` partition discovery
  + the metaData schema (types enforced, no inference drift). Adds
  whose paths disagree with their ``partitionValues`` fall back to
  per-partition-group scans with literal columns — partitionValues
  stay authoritative per spec, whatever the layout.

Scale: log replay is O(actions) driver-side metadata work — the same
cost class as the engine's own manifest planning — and the data read
is one declarative Spark scan, so pruning/pushdown apply unchanged.

The module also carries a fixture-grade but SPEC-SHAPED writer
(:func:`write_delta`, :func:`checkpoint_delta`): real part files
written by Spark, real URL-encoded relative paths, real
protocol/metaData/add/remove actions and a real single-file
checkpoint + ``_last_checkpoint``. It exists so contracts and tests
can fabricate conforming Delta layouts (including ones with
checkpoints, multi-commit histories, and partition directories)
without shipping delta jars — and doubles as a minimal export path.
"""

from __future__ import annotations

import json
import os
import shutil
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "read_delta",
    "delta_history",
    "import_delta",
    "export_delta",
    "write_delta",
    "checkpoint_delta",
]

_LOG_DIR = "_delta_log"
#: Reader features this implementation supports (none beyond base
#: protocol 1 — deletion vectors / column mapping / v2 checkpoints are
#: out of profile and must FAIL the read, not corrupt it).
_SUPPORTED_READER_FEATURES: frozenset[str] = frozenset()


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG_DIR)


def _commit_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.json")


def _checkpoint_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.checkpoint.parquet")


def _commit_versions(path: str) -> list[int]:
    """Sorted versions that have a JSON commit file present."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"{path} has no {_LOG_DIR} — not a Delta table")
    out = []
    for n in os.listdir(d):
        if n.endswith(".json") and len(n) == 25:
            try:
                out.append(int(n[:20]))
            except ValueError:
                continue
    return sorted(out)


def _last_checkpoint(path: str) -> dict | None:
    p = os.path.join(_log_dir(path), "_last_checkpoint")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _check_protocol(protocol: dict | None) -> None:
    if protocol is None:
        return
    reader = int(protocol.get("minReaderVersion", 1))
    feats = set(protocol.get("readerFeatures") or [])
    unsupported = feats - _SUPPORTED_READER_FEATURES
    if reader > 1 and reader != 3:
        raise ValueError(
            f"Delta minReaderVersion {reader} is not supported by this "
            f"reader (base protocol 1 only)"
        )
    if reader == 3 and unsupported:
        raise ValueError(
            f"Delta reader features {sorted(unsupported)} are not "
            f"supported by this reader"
        )
    if reader == 3 and not feats:
        raise ValueError("Delta protocol 3 without readerFeatures is malformed")


def _replay(
    spark: SparkSession, path: str, version: int | None
) -> tuple[dict, list[dict], int]:
    """Replay the log up to ``version`` (default: head). Returns
    (metaData, live add actions, resolved version)."""
    versions = _commit_versions(path)
    ckpt = _last_checkpoint(path)
    head = versions[-1] if versions else (ckpt["version"] if ckpt else None)
    if head is None:
        raise FileNotFoundError(f"empty Delta log under {path}")
    v = head if version is None else int(version)
    meta: dict | None = None
    protocol: dict | None = None
    live: dict[str, dict] = {}  # add.path -> add action
    start = 0
    if ckpt is not None and ckpt["version"] <= v:
        cv = int(ckpt["version"])
        parts = ckpt.get("parts")
        files = (
            [_checkpoint_path(path, cv)]
            if not parts
            else [
                os.path.join(
                    _log_dir(path),
                    f"{cv:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet",
                )
                for i in range(int(parts))
            ]
        )
        cp = spark.read.parquet(*files)
        # metadata-sized collect: one checkpoint row per live file /
        # metadata action — the same cost class as manifest planning
        for row in cp.collect():
            d = row.asDict(recursive=True)
            if d.get("add"):
                live[d["add"]["path"]] = d["add"]
            elif d.get("metaData") and d["metaData"].get("schemaString"):
                meta = d["metaData"]
            elif d.get("protocol") and d["protocol"].get("minReaderVersion"):
                protocol = d["protocol"]
        start = cv + 1
    missing = [t for t in range(start, v + 1) if t not in set(versions)]
    if missing:
        raise FileNotFoundError(
            f"Delta log of {path} is missing commit(s) {missing} "
            f"between checkpoint and version {v}"
        )
    for t in range(start, v + 1):
        with open(_commit_path(path, t)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    protocol = action["protocol"]
                # commitInfo / txn / cdc: ignored on the read path
    _check_protocol(protocol)
    if meta is None:
        raise ValueError(f"Delta log of {path} has no metaData action")
    fmt = (meta.get("format") or {}).get("provider", "parquet")
    if fmt != "parquet":
        raise ValueError(f"unsupported Delta data format {fmt!r}")
    return meta, list(live.values()), v


def _hive_prefix(pcols: list[str], pvals: dict) -> str:
    """The Hive-style directory prefix a partitioned add's path carries
    when the writer used directory layout (every mainstream writer)."""
    segs = []
    for c in pcols:
        val = pvals.get(c)
        if val is None:
            segs.append(f"{c}=__HIVE_DEFAULT_PARTITION__")
        else:
            segs.append(f"{c}={urllib.parse.quote(str(val), safe='')}")
    return "/".join(segs) + "/"


def read_delta(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a Delta Lake table (optionally at a historical version)
    without delta jars — see the module docstring for the protocol
    profile. Returns a DataFrame with the table's metaData schema."""
    meta, adds, _v = _replay(spark, path, version)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    pcols = list(meta.get("partitionColumns") or [])
    if not adds:
        return spark.createDataFrame([], schema)
    rel_paths = [urllib.parse.unquote(a["path"]) for a in adds]
    abs_paths = [os.path.join(path, p) for p in rel_paths]
    if not pcols:
        return spark.read.schema(schema).parquet(*abs_paths)
    # partitioned: partitionValues are authoritative. One scan with
    # Hive-style discovery when the layout matches them exactly …
    hive_ok = all(
        urllib.parse.unquote(a["path"]).startswith(
            _hive_prefix(pcols, a.get("partitionValues") or {})
        )
        for a in adds
    )
    if hive_ok:
        return (
            spark.read.schema(schema)
            .option("basePath", path)
            .parquet(*abs_paths)
        )
    # … else per-partition-group scans with literal columns (correct
    # for ANY layout; group count = touched partitions, a metadata
    # quantity). Data columns keep their file schema; partition
    # columns are cast from the spec's string encoding.
    data_schema = StructType(
        [f for f in schema.fields if f.name not in set(pcols)]
    )
    by_group: dict[tuple, list[str]] = {}
    for a, ap in zip(adds, abs_paths):
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in pcols)
        by_group.setdefault(key, []).append(ap)
    out = None
    for key, files in sorted(by_group.items(), key=lambda kv: str(kv[0])):
        part = spark.read.schema(data_schema).parquet(*files)
        for c, val in zip(pcols, key):
            typ = schema[c].dataType
            part = part.withColumn(
                c,
                F.lit(val).cast(typ) if val is not None else F.lit(None).cast(typ),
            )
        part = part.select(*[f.name for f in schema.fields])
        out = part if out is None else out.unionByName(part)
    return out


def import_delta(
    spark: SparkSession,
    delta_path: str,
    table_path: str,
    version: int | None = None,
    materialize: bool | None = None,
) -> int:
    """MIGRATE a Delta table into the native manifest format — the
    switch-over path for a user with existing lakehouse data. Returns
    the new manifest table's version (0).

    Unpartitioned tables import BY REFERENCE: one manifest commit
    whose entries name the Delta data files ABSOLUTELY (the same
    cross-root convention branch forks use — `_m_repath`), with footer
    stats recomputed per file so stats/null/slab pruning work
    immediately; ZERO data copied, and the Delta log is left
    untouched, so both engines keep reading their own metadata over
    the same immutable files. The importing table's vacuum can never
    reclaim the foreign files: the GC refcounts by absolute path but
    only sweeps candidates under its own root.

    Partitioned tables MATERIALIZE (``materialize=True``; forced when
    partition columns exist): the two formats disagree about file
    content — Delta EXCLUDES partition columns from data files
    (values live in each add's ``partitionValues``), while the
    manifest read contract expects every schema column in-file
    (absent columns read as NULL, the schema-evolution rule) — so a
    by-reference import would silently null the partition columns.
    Instead the snapshot is read once through :func:`read_delta` and
    rewritten via ``write_table(partition_by=<same identity
    columns>)``, preserving partition-level COW for future mutations.
    """
    from spype_spark import lakehouse as lake

    meta, adds, _v = _replay(spark, delta_path, version)
    pcols = list(meta.get("partitionColumns") or [])
    if pcols or materialize:
        df = read_delta(spark, delta_path, version)
        lake.write_table(df, table_path, partition_by=pcols or None)
        return 0
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    entries = []
    for a in adds:
        ap = os.path.abspath(
            os.path.join(delta_path, urllib.parse.unquote(a["path"]))
        )
        if not os.path.exists(ap):
            raise FileNotFoundError(
                f"Delta add action names a missing data file: {ap}"
            )
        entries.append(
            {"path": ap, "partition": {}, "seq": 0, **lake._m_file_stats(ap)}
        )
    entries.sort(key=lambda e: e["path"])
    os.makedirs(table_path, exist_ok=True)
    manifest = lake._m_manifest(
        table_path, 0, None, schema.jsonValue(), None, entries
    )
    lake._m_publish(table_path, 0, manifest)
    return 0


def export_delta(
    spark: SparkSession, table_path: str, delta_path: str | None = None
) -> int:
    """Mirror a native manifest table's CURRENT snapshot as a Delta
    commit — the reverse of :func:`import_delta`, so any Delta reader
    can consume this engine's tables. Zero data copied: the commit's
    add actions name the manifest's existing parquet files (relative
    when they sit under the Delta root, absolute URIs otherwise — both
    legal per spec). ``delta_path`` defaults to the TABLE ROOT itself,
    making the table dual-format in place (``_delta_log`` next to
    ``_manifests`` over the same immutable files). Re-export after
    native commits appends a snapshot-replace Delta commit (remove-all
    + add-all — overwrite semantics, a correct incremental mirror).
    Returns the Delta version written. The mirror is a SNAPSHOT: the
    native table's vacuum does not consult the Delta log, so after
    native rewrites, re-export BEFORE vacuuming if Delta readers are
    live (the same contract as any external snapshot consumer).

    Out of profile (loud errors, never a silently-wrong export):
    partitioned tables (the formats disagree on in-file partition
    columns — Delta data files must NOT contain them, this engine's
    do), pending equality/positional deletes (compact first; a plain
    file list cannot express them), and column-mapping renames/drops
    (logical names would diverge from the files' physical names,
    which Delta expresses only through reader feature
    ``columnMapping``)."""
    from spype_spark import lakehouse as lake

    v = lake.latest_version(table_path)
    m = lake._m_load(table_path, v)
    if m.get("partition_by"):
        raise ValueError(
            "export_delta: partitioned tables are out of profile — "
            "this engine stores partition columns IN the data files, "
            "Delta's spec excludes them; rewrite unpartitioned first"
        )
    if m.get("deletes") or m.get("pos_deletes"):
        raise ValueError(
            "export_delta: pending merge-on-read deletes cannot be "
            "expressed as a plain Delta file list — compact first"
        )
    fields = (m.get("schema") or {}).get("fields", [])
    if m.get("retired") or any(
        f.get("metadata", {}).get("spype_physical") not in (None, f["name"])
        for f in fields
    ):
        raise ValueError(
            "export_delta: column-mapping renames/drops would need the "
            "columnMapping reader feature — export before renaming, or "
            "rewrite the table"
        )
    root = table_path if delta_path is None else delta_path
    entries = lake._m_entries(table_path, m)
    now_ms = int(os.path.getmtime(table_path) * 1000)
    adds = []
    for e in entries:
        ap = (
            e["path"]
            if os.path.isabs(e["path"])
            else os.path.abspath(os.path.join(table_path, e["path"]))
        )
        rp = os.path.relpath(ap, os.path.abspath(root))
        loc = ap if rp.startswith("..") else rp.replace(os.sep, "/")
        adds.append(
            {
                "path": urllib.parse.quote(loc, safe="/="),
                "partitionValues": {},
                "size": int(e.get("bytes") or os.path.getsize(ap)),
                "modificationTime": now_ms,
                "dataChange": True,
            }
        )
    versions = _commit_versions(root) if os.path.isdir(_log_dir(root)) else []
    dv = (versions[-1] + 1) if versions else 0
    actions: list[dict] = []
    if dv == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(m["schema"]),
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    else:
        _meta, prev_adds, _pv = _replay(spark, root, None)
        actions.extend(
            {
                "remove": {
                    "path": a["path"],
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
            for a in prev_adds
        )
    actions.extend({"add": a} for a in adds)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "SPYPE EXPORT",
                "operationParameters": {"tableVersion": v},
            }
        }
    )
    os.makedirs(_log_dir(root), exist_ok=True)
    tmp = _commit_path(root, dv) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _commit_path(root, dv))
    return dv


def delta_history(spark: SparkSession, path: str) -> DataFrame:
    """One row per commit: version, timestamp (the commit file's
    mtime, as Delta's FileStreamSource does absent commitInfo), number
    of add/remove actions — the DESCRIBE HISTORY analogue for a
    foreign Delta log."""
    rows = []
    for t in _commit_versions(path):
        p = _commit_path(path, t)
        n_add = n_remove = 0
        with open(p) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                n_add += 1 if "add" in action else 0
                n_remove += 1 if "remove" in action else 0
        rows.append((t, int(os.path.getmtime(p) * 1000), n_add, n_remove))
    return spark.createDataFrame(
        rows, "version long, timestamp_ms long, n_added long, n_removed long"
    )


# ---------------------------------------------------------------------------
# Fixture-grade writer — spec-shaped actions, real part files.
# ---------------------------------------------------------------------------


def _list_part_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for n in files:
            if n.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(dirpath, n), root))
    return sorted(out)


def _pvals_from_rel(rel: str, pcols: list[str]) -> dict:
    vals: dict[str, str | None] = {}
    for seg in rel.split("/")[:-1]:
        if "=" not in seg:
            continue
        c, _, raw = seg.partition("=")
        if c in pcols:
            vals[c] = (
                None
                if raw == "__HIVE_DEFAULT_PARTITION__"
                else urllib.parse.unquote(raw)
            )
    return {c: vals.get(c) for c in pcols}


def write_delta(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
) -> int:
    """Write ``df`` as a Delta-layout commit: Spark writes the part
    files (Hive-style partition dirs under ``partition_by``), then one
    JSON commit publishes protocol/metaData (version 0) and the
    add (+ remove, for overwrite) actions. Returns the new version."""
    if mode not in ("error", "append", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r}")
    versions = _commit_versions(path) if os.path.isdir(_log_dir(path)) else []
    ckpt = _last_checkpoint(path) if os.path.isdir(_log_dir(path)) else None
    exists = bool(versions) or ckpt is not None
    if exists and mode == "error":
        raise FileExistsError(f"Delta table {path} already exists")
    version = (
        max(versions[-1] if versions else -1, ckpt["version"] if ckpt else -1)
        + 1
        if exists
        else 0
    )
    pcols = list(partition_by or [])
    if exists:
        meta_prev, prev_adds, _ = _replay(spark, path, None)
        prev_pcols = list(meta_prev.get("partitionColumns") or [])
        if pcols and pcols != prev_pcols:
            raise ValueError(
                f"partition_by {pcols} != existing table's {prev_pcols}"
            )
        pcols = prev_pcols
    # stage through a temp dir so the files THIS commit adds are known
    # exactly, then hard-move them into the table root
    stage = os.path.join(path, f".stage-{uuid.uuid4().hex}")
    w = df.write.mode("overwrite")
    if pcols:
        w = w.partitionBy(*pcols)
    w.parquet(stage)
    adds = []
    now_ms = int(os.path.getmtime(stage) * 1000)
    for rel in _list_part_files(stage):
        src = os.path.join(stage, rel)
        dst = os.path.join(path, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(src, dst)
        adds.append(
            {
                "path": urllib.parse.quote(rel, safe="/="),
                "partitionValues": _pvals_from_rel(rel, pcols),
                "size": os.path.getsize(dst),
                "modificationTime": now_ms,
                "dataChange": True,
            }
        )
    shutil.rmtree(stage, ignore_errors=True)
    actions: list[dict] = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": pcols,
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    if mode == "overwrite" and exists:
        for a in prev_adds:
            actions.append(
                {
                    "remove": {
                        "path": a["path"],
                        "deletionTimestamp": now_ms,
                        "dataChange": True,
                    }
                }
            )
    actions.extend({"add": a} for a in adds)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "WRITE",
                "operationParameters": {"mode": mode.upper()},
            }
        }
    )
    os.makedirs(_log_dir(path), exist_ok=True)
    tmp = _commit_path(path, version) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _commit_path(path, version))
    return version


#: The classic checkpoint schema subset this writer emits (single-file
#: form). Struct fields mirror the action shapes above.
_CKPT_SCHEMA = (
    "txn struct<appId:string,version:bigint>, "
    "add struct<path:string,partitionValues:map<string,string>,size:bigint,"
    "modificationTime:bigint,dataChange:boolean>, "
    "remove struct<path:string,deletionTimestamp:bigint,dataChange:boolean>, "
    "metaData struct<id:string,format:struct<provider:string,"
    "options:map<string,string>>,schemaString:string,"
    "partitionColumns:array<string>,configuration:map<string,string>,"
    "createdTime:bigint>, "
    "protocol struct<minReaderVersion:int,minWriterVersion:int>"
)


def checkpoint_delta(spark: SparkSession, path: str) -> int:
    """Compact the current snapshot into a classic single-file parquet
    checkpoint + ``_last_checkpoint`` pointer (the form every Delta
    reader must support). Returns the checkpointed version."""
    meta, adds, v = _replay(spark, path, None)
    rows = [
        (
            None,
            None,
            None,
            (
                meta["id"],
                (
                    meta["format"].get("provider", "parquet"),
                    meta["format"].get("options") or {},
                ),
                meta["schemaString"],
                list(meta.get("partitionColumns") or []),
                meta.get("configuration") or {},
                meta.get("createdTime"),
            ),
            None,
        ),
        (None, None, None, None, (1, 2)),
    ]
    for a in adds:
        rows.append(
            (
                None,
                (
                    a["path"],
                    a.get("partitionValues") or {},
                    int(a.get("size", 0)),
                    int(a.get("modificationTime", 0)),
                    bool(a.get("dataChange", True)),
                ),
                None,
                None,
                None,
            )
        )
    cp = spark.createDataFrame(rows, _CKPT_SCHEMA).coalesce(1)
    stage = os.path.join(path, f".ckpt-{uuid.uuid4().hex}")
    cp.write.mode("overwrite").parquet(stage)
    part = [
        n for n in os.listdir(stage) if n.endswith(".parquet")
    ]
    if len(part) != 1:
        raise RuntimeError(f"expected one checkpoint part file, got {part}")
    os.replace(
        os.path.join(stage, part[0]), _checkpoint_path(path, v)
    )
    shutil.rmtree(stage, ignore_errors=True)
    lc = os.path.join(_log_dir(path), "_last_checkpoint")
    tmp = lc + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"version": v, "size": len(rows)}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, lc)
    return v
