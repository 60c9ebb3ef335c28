#!/usr/bin/env python
"""A day in the life of the proxy, end to end, on the sf0.001 sample.

Runs the full operator chain a uForwarder operator would actually use —
worker accounting, commit watermarks, health, flow control, autoscaling,
assignment — and prints each stage's result. Every frame here is one of
the registered `queries()` operators; this script only sequences them.

    python examples/proxy_day_in_the_life.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from uforwarder_spark.registry import QUERIES  # noqa: E402
from uforwarder_spark.session import get_spark  # noqa: E402

STAGES = [
    ("1. worker pass: fetch → filter → route → deliver/retry/DLQ", "worker_pipeline_summary"),
    ("2. commit watermarks (out-of-order acks)", "ack_commit_watermark"),
    ("3. pipeline health verdicts", "pipeline_health"),
    ("4. adaptive in-flight caps from p95 latency", "adaptive_inflight_vegas"),
    ("5. retry backoff eligibility", "retry_backoff_eligibility"),
    ("6. autoscale signal with hysteresis", "autoscale_hysteresis"),
    ("7. job assignment (rendezvous)", "partition_assignment"),
    ("8. live vs shadow rebalancer divergence", "rebalancer_shadow_compare"),
    ("9. reconciler heartbeat: RUN/UPDATE/CANCEL commands", "job_commands"),
    ("10. fetcher resume: seek-start offset resolution", "checkpoint_resume"),
    ("11. worker lease expiry → job reassignment", "worker_lease_reassignment"),
    ("12. projected time-to-quota (least-squares)", "autoscale_prediction"),
    ("13. cold-start slow-start: bootstrap → working phase", "inflight_bootstrap"),
    ("14. blocked-acquire drain order (round-robin)", "inflight_pending_order"),
    ("15. fetcher ack-side throughput → controller workload", "fetcher_throughput"),
    ("16. latency vs Little's-law ceilings", "latency_littles_law"),
    ("17. inflight-limit usage (lag caused by limiting?)", "inflight_usage_critical"),
    ("18. pod-ified rebalance groups with fallback", "pod_assignment_groups"),
    ("19. pipeline flow control (summed job quotas)", "flow_control_aggregate"),
    ("20. TTL-gated workload sums for the autoscaler", "workload_monitor_ttl"),
    ("21. DLQ/retry produce-side flush batches", "dlq_produce_batches"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("proxy-day", shuffle_partitions="8")
    spark.sparkContext.setLogLevel("ERROR")
    for title, name in STAGES:
        print(f"\n=== {title} [{name}] ===")
        QUERIES[name](spark, sf_dir).show(8, truncate=False)


if __name__ == "__main__":
    main()
