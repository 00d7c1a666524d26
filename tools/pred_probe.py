"""Driver-side predicate-prune planning probe (no Spark).

Reproduces the SCALE.md "arbitrary-predicate pruning" measurement:
build 10⁶ synthetic manifest entries (1000 partitions × 1000
range-clustered files) and time the compiled evaluator
(`lakehouse._pred_compile`) against the reference recursion on a
7-leaf OR-of-ANDs. Usage: python tools/pred_probe.py [n_partitions]
[files_per_partition].
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spype_spark.lakehouse import _pred_compile, _pred_maybe_uncompiled


def main() -> int:
    n_parts = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    entries = []
    for p in range(n_parts):
        for f in range(n_files):
            lo = (p * n_files + f) * 100
            entries.append(
                {
                    "partition": {"p": str(p)},
                    "rows": 5000,
                    "stats": {"k": [lo, lo + 99]},
                    "nulls": {"k": 0, "s": 5000 if f % 2 else 0},
                }
            )
    pred = (
        "or",
        ("and", ("eq", "p", 7), ("between", "k", 700_000, 720_000)),
        ("and", ("in", "p", [500, 501]), ("ge", "k", 50_090_000)),
        ("and", ("eq", "p", n_parts - 1), ("isnull", "s")),
    )
    t0 = time.perf_counter()
    ref = sum(_pred_maybe_uncompiled(e, pred, ["p"]) for e in entries)
    t_ref = time.perf_counter() - t0
    maybe = _pred_compile(pred, ["p"])
    t0 = time.perf_counter()
    kept = sum(maybe(e) for e in entries)
    t_cmp = time.perf_counter() - t0
    assert kept == ref, f"compiled {kept} != reference {ref}"
    print(
        f"entries={len(entries):,} kept={kept} "
        f"reference={t_ref * 1000:.0f} ms compiled={t_cmp * 1000:.0f} ms "
        f"({t_ref / t_cmp:.1f}x)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
