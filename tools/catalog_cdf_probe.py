"""Catalog-CDF planning-scale probe (VERDICT r11 task 6).

Measures the DRIVER-SIDE cost of `Catalog.changes`'s record-log walk
as the transaction window grows — the catalog analogue of
plan_probe.py's manifest-planning probe. Fixture: a fabricated commit
log (records written through the catalog's own `_publish_record`, so
shape and publish semantics are exactly the transaction layer's) with
N_TABLES tables per record and one hot table whose version moves every
txn. The consumer follows ONLY a cold table (`keys_by_table` names a
table that never moves), so `changes()` does zero Spark work and the
measurement isolates the metadata walk: per-record JSON read + base
state resolution + moved-set scan.

The walk's asymptotic trap is the BASE lookup: every record's diff
needs the base record's table map, and re-reading it from disk makes
the walk 2 JSON reads per txn — with the fix (reuse the immediately
preceding record when base == prev txn, the no-contention common
case) it is 1. Both cost O(window x N_TABLES) JSON field parses;
numbers below go in SCALE.md.

Usage: python tools/catalog_cdf_probe.py
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spype_spark.catalog import Catalog  # noqa: E402

SCRATCH = "/tmp/spype_cdf_probe"
N_TABLES = 50


def build(n_txns: int) -> Catalog:
    root = os.path.join(SCRATCH, f"cat_{n_txns}")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    tables = {f"t{i:03d}": 0 for i in range(N_TABLES)}
    tables["cold"] = 0
    for t in range(n_txns):
        tables["hot"] = t  # one table moves per txn
        cat._publish_record(
            t,
            {
                "txn": t,
                "base": t - 1 if t else None,
                "tables": dict(tables),
                "changed": ["hot"],
                "ops": {"hot": {"mode": "add", "touched": [["p", t % 7]]}},
                "apps": {},
            },
        )
    return cat


def main() -> int:
    results = []
    for n in (100, 1_000, 10_000):
        cat = build(n)
        t0 = time.perf_counter()
        # txn_from=0 skips the creation txn (whose snapshot-insert
        # would need Spark); cold never moves after it, so the walk is
        # zero Spark work — pure record-log metadata (spark arg unused)
        feeds = cat.changes(None, {"cold": ["k"]}, txn_from=0)
        walk_ms = (time.perf_counter() - t0) * 1000
        assert feeds == {}
        # incremental window (the stream's steady state): last 100 txns
        t0 = time.perf_counter()
        feeds = cat.changes(
            None, {"cold": ["k"]}, txn_from=max(0, n - 101), txn_to=n - 1
        )
        inc_ms = (time.perf_counter() - t0) * 1000
        assert feeds == {}
        results.append((n, walk_ms, inc_ms))
        print(
            f"txns={n:>6}  full-history walk {walk_ms:8.1f} ms   "
            f"100-txn window {inc_ms:6.1f} ms"
        )
    print(json.dumps(
        {"n_tables": N_TABLES,
         "rows": [{"txns": n, "full_ms": round(w, 1), "win100_ms": round(i, 1)}
                  for n, w, i in results]}
    ))
    shutil.rmtree(SCRATCH, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
