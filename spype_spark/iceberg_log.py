"""Pure-Python Iceberg table-metadata primitives — importable without
a SparkSession.

The metadata layer of :mod:`spype_spark.iceberg_interop` (metadata
JSON chain, snapshot selection, manifest-list/manifest walks via the
in-repo Avro codec, parquet footer field-id maps, name mapping),
extracted so it can run inside the Spark 4 Python DataSource workers
behind :mod:`spype_spark.iceberg_cdc` — plain Python processes that
cannot import ``spype_spark``. Like :mod:`spype_spark.delta_log` /
:mod:`spype_spark.avro_io`, the module is registered for cloudpickle
BY-VALUE pickling, so any pickled object referencing these functions
ships the code itself. Everything here is metadata-sized work; no
table data is touched.

:mod:`spype_spark.iceberg_interop` imports these names under its
historical private aliases — one implementation, both execution
contexts.
"""

from __future__ import annotations

import json
import os
import re

from spype_spark.avro_io import read_avro  # by-value module: safe here

ICE_TO_SPARK = {
    "boolean": "boolean",
    "int": "integer",
    "long": "long",
    "float": "float",
    "double": "double",
    "date": "date",
    "string": "string",
    "binary": "binary",
    "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp",
}
def meta_dir(path: str) -> str:
    return os.path.join(path, "metadata")


def current_metadata(path: str) -> dict:
    """Load the current table metadata JSON: honor
    ``version-hint.text`` when present, else the highest-versioned
    ``*.metadata.json`` (both conventions appear in the wild)."""
    md = meta_dir(path)
    if not os.path.isdir(md):
        raise FileNotFoundError(f"{path} has no metadata/ — not an Iceberg table")
    hint = os.path.join(md, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            n = int(f.read().strip())
        p = os.path.join(md, f"v{n}.metadata.json")
        if not os.path.exists(p):
            raise FileNotFoundError(f"version-hint names missing {p}")
        with open(p) as f:
            return json.load(f)
    cands = []
    for n in os.listdir(md):
        m = re.match(r"^v?(\d+)[-.].*metadata\.json$|^v(\d+)\.metadata\.json$", n)
        if n.endswith(".metadata.json"):
            mm = re.search(r"(\d+)", n)
            cands.append((int(mm.group(1)) if mm else -1, n))
    if not cands:
        raise FileNotFoundError(f"no *.metadata.json under {md}")
    cands.sort()
    with open(os.path.join(md, cands[-1][1])) as f:
        return json.load(f)


def ice_schema_to_spark(meta: dict):
    """Current Iceberg schema -> Spark StructType (primitives +
    structs; other nesting gated loudly). pyspark import is local —
    installed site-packages resolve in any worker; only spype_spark
    itself needs the by-value channel."""
    from pyspark.sql.types import StructType
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        schema = next(
            (s for s in meta["schemas"] if s.get("schema-id") == sid), None
        )
        if schema is None:
            raise ValueError(f"current-schema-id {sid} not in schemas list")
    else:
        schema = meta.get("schema")
        if schema is None:
            raise ValueError("table metadata has no schema")

    def conv(t):
        if isinstance(t, str):
            if t in ICE_TO_SPARK:
                return ICE_TO_SPARK[t]
            m = re.match(r"^decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)$", t)
            if m:
                return f"decimal({m.group(1)},{m.group(2)})"
            raise ValueError(f"unsupported Iceberg type {t!r}")
        if isinstance(t, dict) and t.get("type") == "struct":
            return {
                "type": "struct",
                "fields": [
                    {
                        "name": f["name"],
                        "type": conv(f["type"]),
                        "nullable": not f.get("required", False),
                        "metadata": {},
                    }
                    for f in t["fields"]
                ],
            }
        raise ValueError(f"unsupported Iceberg type {t!r} (list/map not in profile)")

    return StructType.fromJson(conv(schema))


def resolve_file(path: str, file_path: str) -> str:
    """Iceberg file paths are full URIs (``file://…``) or absolute;
    tolerate table-relative too."""
    if file_path.startswith("file://"):
        return file_path[len("file:"):] if file_path.startswith("file:///") else file_path[len("file://"):]
    if os.path.isabs(file_path):
        return file_path
    return os.path.join(path, file_path)


def pick_snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta.get("snapshots") or []
    if not snaps:
        raise ValueError("Iceberg table has no snapshots")
    if snapshot_id is None:
        cur = meta.get("current-snapshot-id")
        snap = next((s for s in snaps if s["snapshot-id"] == cur), None)
        if snap is None:
            raise ValueError(f"current-snapshot-id {cur} not in snapshot list")
        return snap
    snap = next((s for s in snaps if s["snapshot-id"] == int(snapshot_id)), None)
    if snap is None:
        raise ValueError(f"snapshot {snapshot_id} not found")
    return snap


def pv_match(part: dict, partition_filter: dict) -> bool:
    """Does a manifest entry's typed partition record satisfy a
    {col: value-or-list} filter? Compared via str() so int/str typing
    differences between metadata and caller don't matter."""
    for c, want in partition_filter.items():
        got = (part or {}).get(c)
        vals = want if isinstance(want, (list, tuple, set, frozenset)) else [want]
        if not any(
            (got is None and w is None) or
            (got is not None and w is not None and str(got) == str(w))
            for w in vals
        ):
            return False
    return True


def snapshot_files(
    path: str, snap: dict, partition_filter: dict | None = None
) -> dict:
    """Walk manifest list -> manifests -> live file entries, split by
    content kind, with resolved SEQUENCE NUMBERS (entry-level when
    present, else inherited from the manifest-list record — the spec's
    inheritance rule for ADDED entries). Data entries whose partition
    record fails ``partition_filter`` are pruned BEFORE any file is
    listed into the scan; delete files are never partition-pruned
    (they may apply across the filtered partitions — an anti-join
    against absent rows is a no-op, pruning one that applies is
    corruption).

    Returns ``{"data": [(abs_path, seq)], "pos": [(abs_path, seq)],
    "eq": [(abs_path, seq, [equality field ids])]}``."""
    if "manifest-list" in snap:
        ml_path = resolve_file(path, snap["manifest-list"])
        _s, manifests = read_avro(ml_path)
    elif "manifests" in snap:  # v1 inline manifest list
        manifests = [{"manifest_path": p, "content": 0} for p in snap["manifests"]]
    else:
        raise ValueError("snapshot has neither manifest-list nor manifests")
    out: dict = {"data": [], "pos": [], "eq": []}
    for m in manifests:
        man_seq = int(m.get("sequence_number") or 0)
        man_content = int(m.get("content") or 0)
        _es, entries = read_avro(resolve_file(path, m["manifest_path"]))
        for e in entries:
            if int(e.get("status") or 0) == 2:  # DELETED
                continue
            seq = (
                int(e["sequence_number"])
                if e.get("sequence_number") is not None
                else man_seq
            )
            df_ = e.get("data_file") or {}
            fmt = str(df_.get("file_format") or "").upper()
            if fmt != "PARQUET":
                raise ValueError(
                    f"Iceberg file format {fmt!r} not supported "
                    f"(parquet only)"
                )
            fp = resolve_file(path, df_["file_path"])
            content = int(df_.get("content") or 0)
            if content not in (0, 1, 2):
                raise ValueError(
                    f"Iceberg data_file content kind {content} not supported"
                )
            # spec: data manifests (content=0) hold only data files,
            # delete manifests (content=1) only delete files — a
            # mismatch is a malformed log, and silently treating a
            # delete manifest's entries as data would DUPLICATE rows
            if (man_content == 0) != (content == 0):
                raise ValueError(
                    f"malformed Iceberg metadata: manifest content "
                    f"{man_content} lists a data_file with content "
                    f"{content} ({fp})"
                )
            if content == 0:
                if partition_filter and not pv_match(
                    df_.get("partition"), partition_filter
                ):
                    continue
                out["data"].append((fp, seq))
            elif content == 1:
                out["pos"].append((fp, seq))
            elif content == 2:
                ids = [int(i) for i in (df_.get("equality_ids") or [])]
                if not ids:
                    raise ValueError(
                        f"equality-delete file {fp} has no equality_ids"
                    )
                out["eq"].append((fp, seq, ids))
            else:
                raise ValueError(
                    f"Iceberg data_file content kind {content} not supported"
                )
    return out


def current_fields(meta: dict) -> list[dict]:
    """The current schema's field dicts (id/name/type/required)."""
    if "schemas" in meta:
        sid = meta.get("current-schema-id", 0)
        schema = next(
            (s for s in meta["schemas"] if s.get("schema-id") == sid), None
        )
        if schema is None:
            raise ValueError(f"current-schema-id {sid} not in schemas list")
        return schema["fields"]
    return meta["schema"]["fields"]


def parquet_footer_info(fp: str) -> tuple[dict[int, str], list[str]]:
    """(field-id -> column name, all top-level column names) from one
    parquet footer (PyArrow exposes Iceberg/Spark-written ids as
    ``PARQUET:field_id`` field metadata)."""
    import pyarrow.parquet as pq

    ids: dict[int, str] = {}
    names: list[str] = []
    for f in pq.read_schema(fp):
        names.append(f.name)
        fid = (f.metadata or {}).get(b"PARQUET:field_id")
        if fid is not None:
            ids[int(fid)] = f.name
    return ids, names


def parquet_field_ids(fp: str) -> dict[int, str]:
    """Top-level parquet field-id -> physical column name map from one
    footer. Fields without an id are omitted — they resolve by name
    (or name-mapping), the spec's fallback."""
    return parquet_footer_info(fp)[0]


def name_mapping(meta: dict) -> dict[int, list[str]]:
    """The table's ``schema.name-mapping.default`` property (the
    spec's projection rule for data files written WITHOUT field ids —
    Hive/Spark-migrated files): field id -> candidate column names."""
    raw = (meta.get("properties") or {}).get("schema.name-mapping.default")
    if not raw:
        return {}
    out: dict[int, list[str]] = {}
    try:
        for entry in json.loads(raw):
            fid = entry.get("field-id")
            names = entry.get("names") or []
            if fid is not None and names:
                out[int(fid)] = [str(n) for n in names]
    except (ValueError, TypeError, AttributeError) as exc:
        raise ValueError(
            "malformed schema.name-mapping.default property"
        ) from exc
    return out




URI_SCHEME_RE = r"^file:(//)?"


# Ship this module's code inside pickled objects (Python DataSource
# planners/readers cross to JVM-spawned workers that cannot import
# spype_spark) — the delta_log/roaring/avro_io pattern.
try:  # pragma: no cover
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass
