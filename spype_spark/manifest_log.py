"""Pure-Python manifest-log primitives of the native lakehouse
format — NO pyspark imports.

The commit-protocol core of :mod:`spype_spark.lakehouse` (version
listing, manifest load/entry resolution, the put-if-absent publish,
parquet-footer entry stats, the schema physical-name map), extracted
so it can run where a SparkSession does not exist: the Spark 4 Python
DataSource WRITER workers behind :mod:`spype_spark.lake_sink`, whose
``commit(messages, batchId)`` assembles and publishes a manifest in
the data-source worker process. Registered for cloudpickle BY-VALUE
pickling (the delta_log/iceberg_log pattern) so pickled writer objects
ship this code to workers that cannot import ``spype_spark``.

:mod:`spype_spark.lakehouse` imports these names under its historical
private aliases — one implementation of the commit protocol, both
execution contexts.
"""

from __future__ import annotations

import json
import os
import re
import uuid

class ConcurrentWriteError(RuntimeError):
    """A concurrent writer committed the version this mutation was
    based on. The table is uncorrupted; re-read and retry the whole
    mutation (optimistic concurrency, as in Delta/Iceberg commits)."""


_MANIFEST_RE = re.compile(r"^v=(\d+)\.json$")

#: schema-field metadata key naming the physical (in-file) column —
#: the column-mapping channel RENAME rides on
_PHYS_KEY = "spype_physical"


def m_path(path: str, version: int) -> str:
    return os.path.join(path, "_manifests", f"v={version}.json")


def m_versions(path: str) -> list[int]:
    mdir = os.path.join(path, "_manifests")
    if not os.path.isdir(mdir):
        return []
    out = []
    for n in os.listdir(mdir):
        m = _MANIFEST_RE.match(n)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def m_load(path: str, version: int) -> dict:
    p = m_path(path, version)
    if not os.path.exists(p):
        raise FileNotFoundError(f"version {version} not committed under {path}")
    with open(p) as f:
        return json.load(f)


_PART_INLINE_MAX = 64
# max manifest part slabs per data-commit uuid (see _m_write_parts)
_SLAB_MAX_GROUPS = 64


def m_entries(path: str, m: dict) -> list[dict]:
    """Resolve a manifest's file entries — inline ``files`` for small
    tables, concatenated part slabs otherwise."""
    if "files" in m:
        return m["files"]
    out: list[dict] = []
    for name in m["parts"]:
        with open(os.path.join(path, "_manifests", name)) as f:
            out.extend(json.load(f))
    return out


def m_publish(path: str, version: int, manifest: dict) -> None:
    """Put-if-absent publish of a complete manifest: write + fsync a
    temp file, then ``os.link`` it to ``v=N.json`` — atomic, and EEXIST
    means a concurrent writer won this version. On an object store this
    whole function is one conditional PUT of the manifest object; there
    is deliberately NO directory rename anywhere in the protocol, so a
    non-atomic rename primitive cannot half-publish a version — the
    manifest either exists (complete by construction) or doesn't."""
    mdir = os.path.join(path, "_manifests")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, f".tmp-{uuid.uuid4().hex}.json")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, m_path(path, version))
    except FileExistsError as exc:
        os.unlink(tmp)
        raise ConcurrentWriteError(
            f"version {version} of {path} was committed concurrently "
            f"(base version is stale); re-read and retry"
        ) from exc
    os.unlink(tmp)


def usable_stat_pair(lo, hi) -> bool:
    """True when a footer (min, max) pair is sound prune material:
    finite numerics (exact in parquet footers), or a str pair. String
    stats are safe even when the writer truncated them — the parquet
    spec requires truncated min to stay a valid LOWER bound (prefix
    truncation only decreases) and truncated max a valid UPPER bound
    (truncate-then-increment), so the recorded interval always contains
    the true one, and pruning needs containment, not exactness. Python
    str comparison (code points) matches Spark's UTF8 binary string
    ordering, so driver-side interval tests agree with ``between()``.
    bool is excluded — an int subclass but not key material; bytes are
    excluded (binary columns are payloads, not keys)."""
    import math

    if all(isinstance(v, str) for v in (lo, hi)):
        return True
    return all(
        isinstance(v, (int, float)) and not isinstance(v, bool)
        for v in (lo, hi)
    ) and all(math.isfinite(float(v)) for v in (lo, hi))


def m_file_stats(fpath: str) -> dict:
    """Manifest entry metadata for one data file: row count + per-column
    [min, max] from the parquet footer — finite numerics and strings
    (see :func:`usable_stat_pair` for why possibly-truncated string
    stats are still sound bounds; bools/bytes are not key material).
    A driver-side metadata read at commit time; at cluster scale the
    same numbers come back with the executor write results (as
    Iceberg's writers report them), identical content."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fpath).metadata
    stats: dict[str, list] = {}
    nulls: dict[str, int] = {}
    for i in range(md.num_columns):
        name = md.schema.column(i).name
        if "." in name:
            continue  # nested leaf — not a top-level prune key
        lo = hi = None
        ok = True
        nc = 0
        nc_ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None:
                ok = nc_ok = False
                break
            if st.has_null_count:
                nc += st.null_count
            else:
                nc_ok = False
            if not st.has_min_max:
                ok = False
                continue
            mn, mx = st.min, st.max
            if not usable_stat_pair(mn, mx) or (
                lo is not None and type(mn) is not type(lo)
            ):
                ok = False
                continue
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        if ok and lo is not None:
            stats[name] = [lo, hi]
        if nc_ok:
            # exact per-file null count (footers record it even for
            # all-null columns, where min/max is absent) — the material
            # for IS [NOT] NULL file pruning in scan_table
            nulls[name] = nc
    return {
        "rows": md.num_rows,
        # on-disk size, the bin-packing material for selective
        # OPTIMIZE (entries written before this key existed fall back
        # to a stat() at planning time)
        "bytes": os.path.getsize(fpath),
        "stats": stats,
        "nulls": nulls,
    }


def phys(f: dict) -> str:
    """Physical (in-file) column name of one schema-JSON field."""
    return (f.get("metadata") or {}).get(_PHYS_KEY, f["name"])


def col_map(schema_json: dict) -> dict[str, str]:
    """``{logical name: physical name}`` for a manifest schema."""
    return {f["name"]: phys(f) for f in schema_json["fields"]}


# Ship this module's code inside pickled objects — the
# delta_log/iceberg_log/roaring pattern.
try:  # pragma: no cover
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass
