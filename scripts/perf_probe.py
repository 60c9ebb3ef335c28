#!/usr/bin/env python
"""Per-query optimization probe (round 12): for each named query,
capture `.explain("formatted")` to a file and time the line with
per-stage evidence (bench._stage_evidence — wall, executor run/cpu,
sched_overhead_share, per-stage shuffle bytes). One JSON line per query
to stdout; plans to --plans-dir when given.

Usage:
  python scripts/perf_probe.py [--plans-dir plans/r12 --suffix _before]
      [--repeat N] name [name ...]
  (no names = every pinned headline line)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from bench import GENERATIONS, _stage_evidence  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from uforwarder_spark.registry import QUERIES
    from uforwarder_spark.session import get_spark

    names = args.names or [
        n for _sfx, hl, _b, _c in GENERATIONS for n in hl
    ]
    pins = {n: b[n] for _sfx, _hl, b, _c in GENERATIONS for n in b}

    spark = get_spark("uforwarder-perf-probe")
    spark.sparkContext.setLogLevel("ERROR")
    warm_dir = "/root/testdata/sf0.001"
    # per-invocation stages log (ADVICE r12: the append-mode log grew
    # unboundedly across runs)
    open("/tmp/perf_probe_stages.jsonl", "w").close()

    for name in names:
        fn = QUERIES[name]
        if not args.plans_only:
            # warm generated code at sf0.001 (bench protocol)
            spark.sparkContext.setJobDescription(f"warm:{name}")
            fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
            spark.catalog.clearCache()
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = fn(spark, args.sf_dir)
            qe = df._jdf.queryExecution()
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
            plan = qe.explainString(mode)
            with open(
                os.path.join(args.plans_dir, f"{name}{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
            spark.catalog.clearCache()
        if args.plans_only:
            print(json.dumps({"name": name, "plan": "captured"}), flush=True)
            continue
        spark.sparkContext.setJobDescription(f"probe:{name}")
        best = None
        for _ in range(args.repeat):
            ev = _stage_evidence(spark, fn, args.sf_dir)
            if best is None or ev.get("wall_sec", 9e9) < best.get("wall_sec", 9e9):
                best = ev
        spark.sparkContext.setJobDescription(None)
        out = {
            "name": name,
            "pin": pins.get(name),
            "wall_sec": best.get("wall_sec"),
            "ratio_raw": round(best["wall_sec"] / pins[name], 3)
            if name in pins and best.get("wall_sec") is not None
            else None,
            "sched_overhead_share": best.get("sched_overhead_share"),
            "n_stages": best.get("n_stages"),
            "n_tasks": best.get("n_tasks"),
            "executor_run_sec": best.get("executor_run_sec"),
            "executor_cpu_sec": best.get("executor_cpu_sec"),
        }
        print(json.dumps(out), flush=True)
        with open("/tmp/perf_probe_stages.jsonl", "a") as f:
            f.write(json.dumps({"name": name, "evidence": best}) + "\n")


if __name__ == "__main__":
    main()
