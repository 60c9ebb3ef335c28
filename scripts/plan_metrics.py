#!/usr/bin/env python
"""Summarize captured explain('formatted') plans: Exchange count, join
strategies, Python eval nodes, SortAggregate, scans + pushed filters.

Usage: python scripts/plan_metrics.py plans/r12/*_before.txt
"""

from __future__ import annotations

import re
import sys


def metrics(text: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "bhj": text.count("BroadcastHashJoin"),
        "smj": text.count("SortMergeJoin"),
        "shj": text.count("ShuffledHashJoin"),
        "bnlj": text.count("BroadcastNestedLoopJoin"),
        "cartesian": text.count("CartesianProduct"),
        "python": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", text)
        ),
        "sort_agg": text.count("SortAggregate"),
        "hash_agg": text.count("HashAggregate"),
        "obj_hash_agg": text.count("ObjectHashAggregate"),
        "scans": len(re.findall(r"Scan parquet", text)),
        "take_ordered": text.count("TakeOrderedAndProject"),
        "windows": len(re.findall(r"\bWindow\b", text)),
        "sorts": len(re.findall(r"\bSort \[", text)),
    }


def main() -> None:
    for path in sys.argv[1:]:
        with open(path) as f:
            text = f.read()
        m = metrics(text)
        name = path.rsplit("/", 1)[-1]
        print(
            f"{name:48s} ex={m['exchanges']:2d} bhj={m['bhj']} smj={m['smj']} "
            f"shj={m['shj']} bnlj={m['bnlj']} cart={m['cartesian']} "
            f"py={m['python']} sortagg={m['sort_agg']} hashagg={m['hash_agg']} "
            f"scan={m['scans']} topk={m['take_ordered']} win={m['windows']} "
            f"sort={m['sorts']}"
        )


if __name__ == "__main__":
    main()
