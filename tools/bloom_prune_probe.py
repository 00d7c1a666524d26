"""Bloom-filter pruning probe (round 15 continuation).

The r14/r15 stats pruning refutes files by [min, max] ranges — which
is structurally blind on HASH-SHAPED keys (md5/uuid/content hashes):
every file's range spans the keyspace, so a point MERGE against an
unpartitioned hash-keyed table rewrites ALL of it. This probe measures
the new manifest-level per-file Bloom filters closing that hole:

- fixture: N rows keyed by md5(id), F files hash-bucketed on the key
  (every file's [min,max] ≈ ['000…','fff…'] — range pruning carries 0)
- workload: a 32-key point merge (vs 64 files — the regime a point
  CDC batch actually is at scale: keys ≪ files), and a 10-key absent
  delete via the predicate planner's eq/in leaves
- comparator: the identical table WITHOUT bloom_keys (range-only
  pruning → full rewrite)
- recorded: files carried, rows rewritten, merge wall, and the commit
  surcharge the filters cost at write time (the key-column read)

Usage: python tools/bloom_prune_probe.py [n_rows] [n_files]
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spype_spark import lakehouse as lake  # noqa: E402
from spype_spark.session import get_spark  # noqa: E402


def _md5(i) -> str:
    return hashlib.md5(str(i).encode()).hexdigest()


def run(spark, tmp: str, n: int, files: int, bloom: bool) -> dict:
    tag = "bloom" if bloom else "plain"
    path = os.path.join(tmp, f"t_{tag}")
    df = spark.range(n).select(
        F.md5(F.col("id").cast("string")).alias("k"),
        F.col("id").alias("v"),
    ).repartition(files, F.col("k"))
    t0 = time.perf_counter()
    lake.write_table(
        df, path, bloom_keys="k" if bloom else None
    )
    write_ms = (time.perf_counter() - t0) * 1e3

    ups = spark.createDataFrame(
        [(_md5(i), -1) for i in range(32)], "k string, v long"
    )
    t0 = time.perf_counter()
    v1 = lake.merge_upsert(spark, path, ups, keys=["k"])
    merge_ms = (time.perf_counter() - t0) * 1e3
    ents = lake._m_entries(path, lake._m_load(path, v1))
    carried = sum(1 for e in ents if e["seq"] != v1)
    rewritten_rows = sum(
        e.get("rows", 0) for e in ents if e["seq"] == v1
    )

    t0 = time.perf_counter()
    v2 = lake.delete_predicate(
        spark, path, ("in", "k", [_md5(f"absent-{i}") for i in range(10)])
    )
    del_ms = (time.perf_counter() - t0) * 1e3
    ents2 = lake._m_entries(path, lake._m_load(path, v2))
    del_read_back = sum(
        e.get("rows", 0) for e in ents2 if e["seq"] == v2
    )
    return {
        "layout": tag,
        "write_ms": round(write_ms),
        "merge_ms": round(merge_ms),
        "carried_files": carried,
        "rewritten_rows": rewritten_rows,
        "absent_delete_ms": round(del_ms),
        "absent_delete_rows_read_back": del_read_back,
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark()
    tmp = tempfile.mkdtemp(prefix="bloom_probe_")
    try:
        out = {"n_rows": n, "n_files": files, "runs": []}
        for bloom in (False, True):
            out["runs"].append(run(spark, tmp, n, files, bloom))
        print(json.dumps(out, indent=2))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
