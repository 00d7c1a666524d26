"""Concurrent-writer contention probe (VERDICT r10 task 8).

Measures the catalog commit protocol's behavior under N parallel
single-verb transactions:

- DISJOINT partitions: every writer merges rows of its own partition.
  The conflict rules prove the footprints disjoint, so later
  committers REBASE onto the new head instead of aborting — all N
  must commit, with zero application-level retries; the cost of
  contention is rebase work (re-staging a manifest), not wasted Spark
  jobs.
- OVERLAPPING partition: every writer merges the SAME partition.
  Footprints intersect, so commits serialize through
  ConcurrentWriteError + retry (`Catalog.run`) — the probe counts
  aborted attempts (wasted Spark-side work) and wall time.

Writers are threads sharing one SparkSession: the contention under
test lives in the catalog's put-if-absent record log and the
manifest CAS, which are filesystem-level and process-agnostic (the
cross-JVM race itself is pinned by test_branch_two_process_publish_
race); threads give N truly-simultaneous commit attempts without N
JVM startups.

Usage: python tools/contention_probe.py [N]
"""

import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SCRATCH = "/tmp/spype_contention_probe"


def probe(spark, n_writers: int, overlap: bool):
    from spype_spark import catalog as catmod
    from spype_spark.catalog import Catalog

    root = os.path.join(SCRATCH, "overlap" if overlap else "disjoint")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog(root)
    base = spark.createDataFrame(
        [(p * 1000 + j, float(j), p) for p in range(n_writers)
         for j in range(200)],
        "k long, v double, p long",
    )
    with cat.transaction(spark) as t:
        t.write(base.repartition(4, "p"), "t", partition_by="p")

    attempts = [0] * n_writers
    rebases = [0]
    real_rebase = catmod.Transaction._rebase_table

    def counting_rebase(self, *a, **kw):
        rebases[0] += 1
        return real_rebase(self, *a, **kw)

    catmod.Transaction._rebase_table = counting_rebase
    errors = []

    def writer(i: int):
        part = 0 if overlap else i
        upd = spark.createDataFrame(
            [(part * 1000 + j, 9999.0, part) for j in range(50)],
            "k long, v double, p long",
        )

        def fn(txn):
            attempts[i] += 1
            txn.merge_upsert("t", upd, keys=["k"])

        try:
            cat.run(spark, fn, retries=3 * n_writers)
        except Exception as exc:  # noqa: BLE001 - probe records, not hides
            errors.append((i, repr(exc)))

    t0 = time.perf_counter()
    threads = [
        threading.Thread(target=writer, args=(i,)) for i in range(n_writers)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0
    catmod.Transaction._rebase_table = real_rebase

    n_txns = len(cat.txns()) - 1  # minus the seed write
    total_attempts = sum(attempts)
    rows = cat.read(spark, "t").count()
    print(
        f"{'OVERLAP ' if overlap else 'DISJOINT'} n={n_writers}: "
        f"committed_txns={n_txns} attempts={total_attempts} "
        f"aborted={total_attempts - n_txns} rebases={rebases[0]} "
        f"wall={wall:.1f}s rows={rows} errors={errors}"
    )
    return {
        "writers": n_writers,
        "txns": n_txns,
        "attempts": total_attempts,
        "rebases": rebases[0],
        "wall_s": wall,
        "errors": errors,
    }


def main():
    from spype_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark()
    os.makedirs(SCRATCH, exist_ok=True)
    probe(spark, n, overlap=False)
    probe(spark, n, overlap=True)


if __name__ == "__main__":
    main()
