"""Pure-Python Delta transaction-log primitives — NO pyspark imports.

The log layer of :mod:`spype_spark.delta_interop` (path scheme, z85,
protocol gate, checkpoint resolution, deletion-vector payloads, column
-mapping schema walk), extracted so it can run where a SparkSession
does not exist: the Spark 4 **Python DataSource** planner/executor
workers behind :mod:`spype_spark.cdf_source`. Those workers are plain
Python processes spawned by the JVM — they cannot import
``spype_spark`` — so, like :mod:`spype_spark.roaring` /
:mod:`spype_spark.avro_io` / :mod:`spype_spark.codecs`, this module is
registered for cloudpickle **by-value** pickling: any DataSource
object referencing these functions ships the code itself.

Everything here is O(log metadata) driver-class work: JSON commit
parsing, checkpoint manifests (read via pyarrow, one row per live
file), compressed bitmap payloads. No table DATA is ever touched.

:mod:`spype_spark.delta_interop` imports these names (under its
historical private aliases) so both the Spark read path and the
no-Spark workers replay byte-identical state.
"""

from __future__ import annotations

import json
import os
import re
import struct
import uuid
import zlib

LOG_DIR = "_delta_log"

#: Reader features this implementation supports. ``columnMapping``
#: (name mode — physical parquet names resolved back to logical
#: schema names; id mode resolved per file by parquet field id) and
#: ``deletionVectors`` (roaring-bitmap row tombstones) both graduated
#: round 13. Features beyond these must FAIL the read, not corrupt it.
SUPPORTED_READER_FEATURES: frozenset[str] = frozenset(
    {"columnMapping", "deletionVectors", "v2Checkpoint"}
)

#: Z85 alphabet (ZeroMQ spec 32/Z85) — Delta encodes deletion-vector
#: file UUIDs and inline bitmaps with it. NOT python's b85 variant.
Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
Z85_INDEX = {c: i for i, c in enumerate(Z85_CHARS)}

URI_RE = r"^file:(//)?"


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 encodes 4-byte groups")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, r = divmod(acc, 85)
            chunk.append(Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 decodes 5-char groups")
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for c in text[i:i + 5]:
            if c not in Z85_INDEX:
                raise ValueError(f"invalid z85 character {c!r}")
            acc = acc * 85 + Z85_INDEX[c]
        out += acc.to_bytes(4, "big")
    return bytes(out)


def log_dir(path: str) -> str:
    return os.path.join(path, LOG_DIR)


def commit_path(path: str, version: int) -> str:
    return os.path.join(log_dir(path), f"{version:020d}.json")


def checkpoint_path(path: str, version: int) -> str:
    return os.path.join(log_dir(path), f"{version:020d}.checkpoint.parquet")


def commit_versions(path: str) -> list[int]:
    """Sorted versions that have a JSON commit file present."""
    d = log_dir(path)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"{path} has no {LOG_DIR} — not a Delta table")
    out = []
    for n in os.listdir(d):
        if n.endswith(".json") and len(n) == 25:
            try:
                out.append(int(n[:20]))
            except ValueError:
                continue
    return sorted(out)


def last_checkpoint(path: str) -> dict | None:
    p = os.path.join(log_dir(path), "_last_checkpoint")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def check_protocol(protocol: dict | None) -> None:
    if protocol is None:
        return
    reader = int(protocol.get("minReaderVersion", 1))
    feats = set(protocol.get("readerFeatures") or [])
    unsupported = feats - SUPPORTED_READER_FEATURES
    # reader v2 == column mapping (pre-table-features encoding) — in
    # profile since r13; v3 == table features, gated per feature below
    if reader > 1 and reader not in (2, 3):
        raise ValueError(
            f"Delta minReaderVersion {reader} is not supported by this "
            f"reader"
        )
    if reader == 3 and unsupported:
        raise ValueError(
            f"Delta reader features {sorted(unsupported)} are not "
            f"supported by this reader"
        )
    if reader == 3 and not feats:
        raise ValueError("Delta protocol 3 without readerFeatures is malformed")


def resolve_checkpoint(path: str, cv: int, ckpt: dict) -> dict:
    """Locate the checkpoint at version ``cv``: classic (single-file
    or multi-part ``N.checkpoint[.i.of].parquet``) or a V2 checkpoint
    (uuid-named ``N.checkpoint.<uuid>.{json,parquet}`` top-level whose
    file actions live in ``_sidecars/`` parquet — the table-features
    form). Returns ``{"kind": "classic", "files": […]}`` or
    ``{"kind": "v2", "top": path, "format": "json"|"parquet"}``."""
    parts = ckpt.get("parts")
    classic = (
        [checkpoint_path(path, cv)]
        if not parts
        else [
            os.path.join(
                log_dir(path),
                f"{cv:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet",
            )
            for i in range(int(parts))
        ]
    )
    if all(os.path.exists(f) for f in classic):
        return {"kind": "classic", "files": classic}
    d = log_dir(path)
    pat = re.compile(
        rf"^{cv:020d}\.checkpoint\.[A-Za-z0-9-]+\.(json|parquet)$"
    )
    hits = sorted(n for n in os.listdir(d) if pat.match(n))
    if not hits:
        raise FileNotFoundError(
            f"_last_checkpoint names version {cv} of {path} but no "
            f"classic or v2 checkpoint file exists"
        )
    top = hits[-1]
    return {
        "kind": "v2",
        "top": os.path.join(d, top),
        "format": top.rsplit(".", 1)[1],
    }


def load_dv_bytes(table_path: str, dvd: dict) -> bytes:
    """The raw RoaringBitmapArray payload of one deletion-vector
    descriptor. Storage types per spec: ``i`` inline (z85 of the
    payload), ``u`` relative (optional random prefix + z85-encoded
    16-byte UUID naming ``deletion_vector_<uuid>.bin`` under the table
    root), ``p`` absolute path. File-stored DVs are framed as
    [1-byte format version = 1] then per-DV [int32 BE dataSize]
    [payload][int32 BE CRC-32 of payload] — ``offset`` points at the
    dataSize field; size and checksum are both verified loudly."""
    st = dvd.get("storageType")
    size = int(dvd.get("sizeInBytes") or 0)
    if st == "i":
        payload = z85_decode(dvd["pathOrInlineDv"])
        if size and len(payload) != size:
            raise ValueError(
                f"inline deletion vector size {len(payload)} != "
                f"sizeInBytes {size}"
            )
        return payload
    if st == "u":
        enc = dvd["pathOrInlineDv"]
        prefix, uid_part = enc[:-20], enc[-20:]
        u = uuid.UUID(bytes=z85_decode(uid_part))
        fp = os.path.join(table_path, prefix, f"deletion_vector_{u}.bin")
    elif st == "p":
        fp = dvd["pathOrInlineDv"]
    else:
        raise ValueError(f"deletion vector storageType {st!r} not supported")
    with open(fp, "rb") as f:
        head = f.read(1)
        if head != b"\x01":
            raise ValueError(
                f"deletion vector file {fp} has format version "
                f"{head!r} (expected 1)"
            )
        f.seek(int(dvd.get("offset") or 1))
        (dsize,) = struct.unpack(">i", f.read(4))
        if size and dsize != size:
            raise ValueError(
                f"deletion vector at {fp}:{dvd.get('offset')} has size "
                f"{dsize} != descriptor sizeInBytes {size}"
            )
        payload = f.read(dsize)
        if len(payload) != dsize:
            raise ValueError(f"truncated deletion vector in {fp}")
        (crc,) = struct.unpack(">i", f.read(4))
        if (crc & 0xFFFFFFFF) != zlib.crc32(payload):
            raise ValueError(f"deletion vector CRC mismatch in {fp}")
    return payload


def physical_json(node):
    """Schema-JSON node with every field renamed to its
    ``delta.columnMapping.physicalName`` (recursively — nested struct /
    array / map element fields carry their own mapping metadata), and
    the mapping metadata stripped (the physical files don't have it)."""
    if isinstance(node, dict) and node.get("type") == "struct":
        return {
            "type": "struct",
            "fields": [
                {
                    "name": (f.get("metadata") or {}).get(
                        "delta.columnMapping.physicalName", f["name"]
                    ),
                    "type": physical_json(f["type"]),
                    "nullable": f.get("nullable", True),
                    "metadata": {},
                }
                for f in node["fields"]
            ],
        }
    if isinstance(node, dict) and node.get("type") == "array":
        return {**node, "elementType": physical_json(node["elementType"])}
    if isinstance(node, dict) and node.get("type") == "map":
        return {**node, "valueType": physical_json(node["valueType"])}
    return node


def mapping_info(meta: dict) -> tuple[str, dict | None, dict]:
    """(mode, physical schema JSON or None, logical->physical name map
    for TOP-LEVEL columns). ``name`` mode covers what ALTER TABLE
    RENAME produces; ``id`` mode (files matched by parquet field id —
    the Iceberg-compatible form) needs per-file footer resolution,
    with the physicalName map as the spec's fallback for files
    without ids."""
    conf = meta.get("configuration") or {}
    mode = conf.get("delta.columnMapping.mode", "none")
    if mode in ("none", ""):
        return "none", None, {}
    if mode not in ("name", "id"):
        raise ValueError(
            f"Delta column mapping mode {mode!r} is not supported"
        )
    sj = json.loads(meta["schemaString"])
    pj = physical_json(sj)
    l2p = {
        lf["name"]: pf["name"] for lf, pf in zip(sj["fields"], pj["fields"])
    }
    return mode, pj, l2p


# ---------------------------------------------------------------------------
# no-Spark replay — the planner-worker twin of delta_interop._replay_state
# ---------------------------------------------------------------------------


def _checkpoint_rows_py(path: str, ck: dict) -> list[dict]:
    """Action dicts of a classic OR v2 checkpoint read via pyarrow
    (one row per live file / tombstone / metadata action — the
    metadata cost class). The v2 top-level's sidecar references are
    expanded; nested struct rows surface as plain dicts exactly as
    ``Row.asDict(recursive=True)`` does on the Spark path."""
    import pyarrow.parquet as pq

    def rows_of(files: list[str]) -> list[dict]:
        out: list[dict] = []
        for f in files:
            out.extend(pq.read_table(f).to_pylist())
        return out

    if ck["kind"] == "classic":
        return rows_of(ck["files"])
    # v2: top-level json or parquet + sidecar parquet expansion
    if ck["format"] == "json":
        with open(ck["top"]) as f:
            raw = [json.loads(line) for line in f if line.strip()]
    else:
        raw = [
            {k: v for k, v in d.items() if v is not None}
            for d in rows_of([ck["top"]])
        ]
    actions: list[dict] = []
    sidecars: list[str] = []
    for a in raw:
        if a.get("sidecar"):
            sp = re.sub(URI_RE, "", a["sidecar"]["path"])
            sidecars.append(
                sp
                if os.path.isabs(sp)
                else os.path.join(log_dir(path), "_sidecars", sp)
            )
        elif a:
            actions.append(a)
    for d in rows_of(sidecars):
        if d.get("add"):
            actions.append({"add": d["add"]})
        elif d.get("remove"):
            actions.append({"remove": d["remove"]})
    return actions


def replay_state_py(path: str, version: int | None = None) -> dict:
    """Replay the log up to ``version`` (default: head) WITHOUT Spark —
    checkpoint parquet via pyarrow, JSON commits via the stdlib.
    Returns the same shape as ``delta_interop._replay_state``:
    ``meta`` / ``protocol`` / ``adds`` (live add actions) /
    ``tombstones`` / ``txns`` / ``version``. Used by the Python
    DataSource planner workers, where no SparkSession exists; state is
    metadata-sized either way."""
    versions = commit_versions(path)
    ckpt = last_checkpoint(path)
    head = versions[-1] if versions else (ckpt["version"] if ckpt else None)
    if head is None:
        raise FileNotFoundError(f"empty Delta log under {path}")
    v = head if version is None else int(version)
    meta: dict | None = None
    protocol: dict | None = None
    live: dict[str, dict] = {}
    tombstones: dict[str, dict] = {}
    txns: dict[str, int] = {}
    start = 0
    if ckpt is not None and ckpt["version"] <= v:
        cv = int(ckpt["version"])
        for d in _checkpoint_rows_py(path, resolve_checkpoint(path, cv, ckpt)):
            if d.get("add"):
                live[d["add"]["path"]] = d["add"]
            elif d.get("remove"):
                tombstones[d["remove"]["path"]] = d["remove"]
            elif d.get("txn") and d["txn"].get("appId"):
                txns[d["txn"]["appId"]] = int(d["txn"].get("version") or 0)
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
        with open(commit_path(path, t)) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "add" in action:
                    p = action["add"]["path"]
                    live[p] = action["add"]
                    tombstones.pop(p, None)
                elif "remove" in action:
                    p = action["remove"]["path"]
                    live.pop(p, None)
                    tombstones[p] = action["remove"]
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "protocol" in action:
                    protocol = action["protocol"]
                elif "txn" in action and action["txn"].get("appId"):
                    txns[action["txn"]["appId"]] = int(
                        action["txn"].get("version") or 0
                    )
    check_protocol(protocol)
    if meta is None:
        raise ValueError(f"Delta log of {path} has no metaData action")
    fmt = (meta.get("format") or {}).get("provider", "parquet")
    if fmt != "parquet":
        raise ValueError(f"unsupported Delta data format {fmt!r}")
    return {
        "meta": meta,
        "protocol": protocol,
        "adds": list(live.values()),
        "tombstones": list(tombstones.values()),
        "txns": txns,
        "version": v,
    }


# Ship this module's code inside pickled objects (Python DataSource
# instances cross to JVM-spawned workers that cannot import
# spype_spark) — the roaring/avro_io/codecs pattern.
try:  # pragma: no cover
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass
