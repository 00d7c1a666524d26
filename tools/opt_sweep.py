"""Registry-wide optimization sweep (round 15, guide §1).

For EVERY key in the registry: build the query's DataFrame, dump its
``.explain("formatted")`` plan to ``<out>/<key>.txt``, time the
computation with the noop sink (guide §1.4 — times every column of
every row without sink cost), and scan the plan for the guide's
anti-patterns.  Emits one JSON summary with, per key:

- ``build_s``   — wall time of ``fn(spark, sf_dir)`` (eager side
  effects: lake mutations, streaming drains, fixture writes)
- ``noop_s``    — wall time of the noop write of the returned DF
  (the declarative part the driver's collect() pays)
- ``exchanges`` — count of Exchange nodes (shuffle boundaries)
- ``smj`` / ``bhj`` / ``shj`` / ``bnlj`` / ``cartesian`` — join nodes
- ``pyeval``    — BatchEvalPython/ArrowEvalPython/MapInArrow/
  FlatMapGroupsInPandas/MapInPandas node count (Python boundary)
- ``rowudf``    — BatchEvalPython count alone (row-at-a-time pickling)
- ``nofilter_scans`` — parquet scans whose PushedFilters is empty while
  the query filters (informational)
- ``sorts``     — global Sort nodes (Exchange rangepartitioning)

Usage: python tools/opt_sweep.py [sf_dir] [out_dir] [key_prefix...]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spype_spark.queries import REGISTRY  # noqa: E402
from spype_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def scan_plan(txt: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", txt)),
        "range_exchanges": len(re.findall(r"rangepartitioning", txt)),
        "smj": len(re.findall(r"SortMergeJoin", txt)),
        "bhj": len(re.findall(r"BroadcastHashJoin", txt)),
        "shj": len(re.findall(r"ShuffledHashJoin", txt)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", txt)),
        "cartesian": len(re.findall(r"CartesianProduct", txt)),
        "pyeval": len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas"
                r"|FlatMapGroupsInPandas|FlatMapCoGroupsInPandas"
                r"|PythonMapInArrow|AggregateInPandas",
                txt,
            )
        ),
        "rowudf": len(re.findall(r"BatchEvalPython", txt)),
        "empty_pushed": len(re.findall(r"PushedFilters: \[\]", txt)),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/opt_sweep"
    prefixes = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("spype-opt-sweep")
    summary: dict[str, dict] = {}
    keys = [
        k
        for k in sorted(REGISTRY)
        if not prefixes or any(k.startswith(p) for p in prefixes)
    ]
    for i, key in enumerate(keys):
        spark.sparkContext.setJobDescription(f"opt_sweep:{key}")
        row: dict = {}
        try:
            t0 = time.perf_counter()
            df = REGISTRY[key].fn(spark, sf_dir)
            row["build_s"] = round(time.perf_counter() - t0, 3)
            txt = plan_text(df)
            with open(os.path.join(out_dir, f"{key}.txt"), "w") as f:
                f.write(txt)
            row.update(scan_plan(txt))
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            row["noop_s"] = round(time.perf_counter() - t0, 3)
            row["total_s"] = round(row["build_s"] + row["noop_s"], 3)
        except Exception as e:  # keep sweeping
            row["error"] = f"{type(e).__name__}: {e}"
            traceback.print_exc(limit=3)
        summary[key] = row
        print(
            f"[{i+1}/{len(keys)}] {key}: "
            f"{row.get('total_s', row.get('error'))}",
            file=sys.stderr,
            flush=True,
        )
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    ok = [r for r in summary.values() if "total_s" in r]
    print(
        json.dumps(
            {
                "keys": len(keys),
                "ok": len(ok),
                "total_s": round(sum(r["total_s"] for r in ok), 1),
                "out": out_dir,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
