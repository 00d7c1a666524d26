"""Manifest planning-scale probe (VERDICT r10 task 2).

Measures driver-side scan PLANNING cost as manifest entry count grows,
with and without slab-summary pruning. Fixture: a fabricated manifest
table — one real parquet data file hardlinked N times, entries
hand-assembled with realistic per-file stats, manifests published
through the real `_m_manifest`/`_m_publish` path (so slab grouping,
content addressing, and summaries are exactly what the writer
produces). Data content is irrelevant to planning (planning never
opens data files); the pruned `.count()` at the end confirms the read
side resolves.

Layout per config: P partitions x F files, partition p holding
k in [p*SPAN, (p+1)*SPAN). The probe predicate is a `between` on k
hitting ONE partition's range, so with summaries the planner must
decode exactly one slab.

Usage: python tools/plan_probe.py
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spype_spark import lakehouse as lake  # noqa: E402

SCRATCH = "/tmp/spype_plan_probe"
SPAN = 100_000  # k-range per partition


def build(spark, name: str, n_part: int, files_per: int, summaries: bool):
    """Fabricate a manifest table with n_part*files_per entries."""
    root = os.path.join(SCRATCH, name)
    shutil.rmtree(root, ignore_errors=True)
    seed = os.path.join(SCRATCH, "_seed")
    if not os.path.isdir(seed):
        df = spark.createDataFrame(
            [(k, k * 2, 0) for k in range(100)], "k long, v long, p long"
        )
        df.coalesce(1).write.parquet(seed)
    seed_file = next(
        os.path.join(seed, n) for n in os.listdir(seed) if n.endswith(".parquet")
    )
    # a single inode caps at ~65k hardlinks — rotate physical copies
    n_seeds = max(1, (n_part * files_per) // 30_000 + 1)
    seed_files = [seed_file]
    for i in range(1, n_seeds):
        sf = f"{seed_file}.copy{i}"
        if not os.path.exists(sf):
            shutil.copyfile(seed_file, sf)
        seed_files.append(sf)
    schema_json = json.loads(
        spark.createDataFrame([], "k long, v long, p long").schema.json()
    )
    entries = []
    uid = "probe0001"
    for p in range(n_part):
        d = os.path.join(root, "data", uid, f"{lake._SHADOW}p={p}")
        os.makedirs(d)
        base = p * SPAN
        step = SPAN // files_per
        for j in range(files_per):
            fn = f"part-{j:05d}.parquet"
            os.link(seed_files[(p * files_per + j) % n_seeds],
                    os.path.join(d, fn))
            lo = base + j * step
            entries.append(
                {
                    "path": f"data/{uid}/{lake._SHADOW}p={p}/{fn}",
                    "partition": {"p": str(p)},
                    "rows": 100,
                    "bytes": os.path.getsize(seed_file),
                    "stats": {
                        "k": [lo, lo + step - 1],
                        "v": [lo * 2, (lo + step) * 2],
                    },
                    "nulls": {"k": 0, "v": 0, "p": 0},
                    "seq": 0,
                }
            )
    man = lake._m_manifest(root, 0, None, schema_json, ["p"], entries)
    if not summaries:
        man.pop("part_summaries", None)
    lake._m_publish(root, 0, man)
    return root


def probe(spark, root: str, reps: int = 7) -> tuple[float, int]:
    """Best-of-reps planning wall time (scan_table construction only)
    for a between predicate covering one file range in partition 0."""
    best = float("inf")
    df = None
    for _ in range(reps):
        t0 = time.perf_counter()
        df = lake.scan_table(spark, root, where=("between", "k", 10, 50))
        best = min(best, time.perf_counter() - t0)
    return best, len(df.inputFiles())


def main():
    from spype_spark.session import get_spark

    spark = get_spark()
    os.makedirs(SCRATCH, exist_ok=True)
    print(f"{'config':>22} {'entries':>8} {'summaries':>9} "
          f"{'plan_ms':>8} {'files':>6}")
    for n_part, files_per in [(6, 50), (60, 50), (50, 200)]:
        n = n_part * files_per
        for summ in (False, True):
            tag = f"t{n}_{'s' if summ else 'n'}"
            root = build(spark, tag, n_part, files_per, summ)
            t, nf = probe(spark, root)
            print(
                f"{n_part:>4}p x {files_per:>4}f{'':>8} {n:>8} "
                f"{str(summ):>9} {t * 1e3:>8.1f} {nf:>6}"
            )
    # sanity: the pruned read resolves rows
    root = os.path.join(SCRATCH, "t300_s")
    cnt = lake.scan_table(spark, root, where=("between", "k", 10, 50)).count()
    print(f"pruned count sanity: {cnt} rows")


if __name__ == "__main__":
    main()
