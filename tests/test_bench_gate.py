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

    first = {"raw_ratio": 1.2, "hf": 1.0, "sw_factor": 1.0, "ts": 1, "src_md5": "x"}
    got = bench.merge_history_entry(None, dict(first))
    assert got["raw_ratio"] == 1.2 and got["n_windows"] == 1
    worse = {"raw_ratio": 1.47, "hf": 1.0, "sw_factor": 0.93, "ts": 2, "src_md5": "x"}
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


def test_merge_history_entry_best_ages_out():
    """ADVICE r12: a kept best older than HISTORY_MAX_AGE_SEC yields to
    the current window's reading (and the corroboration count
    restarts) — the 'can this plan run at pin' witness must stay
    current, not historical-best-forever, or a persistent
    environment-driven slowdown of an unchanged plan never re-surfaces
    through the corroboration path."""
    import bench

    old = {"raw_ratio": 1.1, "hf": 1.0, "sw_factor": 1.0, "ts": 1_000, "src_md5": "x"}
    # within the horizon: best still wins
    recent = {
        "raw_ratio": 1.5,
        "hf": 1.0,
        "sw_factor": 1.0,
        "ts": 1_000 + bench.HISTORY_MAX_AGE_SEC,
        "src_md5": "x",
    }
    got = bench.merge_history_entry(dict(old), recent)
    assert got["raw_ratio"] == 1.1 and got["n_windows"] == 2
    # past the horizon: the stale best expires in favor of the current
    # reading, n_windows restarts
    late = dict(recent, ts=1_001 + bench.HISTORY_MAX_AGE_SEC)
    got = bench.merge_history_entry(dict(old), late)
    assert got["raw_ratio"] == 1.5 and got["n_windows"] == 1
    # ...and a plan still at pin simply renews its witness at the new ts
    renew = {"raw_ratio": 1.05, "hf": 1.0, "sw_factor": 1.0, "ts": late["ts"], "src_md5": "x"}
    got = bench.merge_history_entry(dict(old), renew)
    assert got["raw_ratio"] == 1.05 and got["ts"] == late["ts"]


def test_const_repr_plain_data_only_and_sorted():
    """The fingerprint's constant reprs must be process-stable: sets and
    dicts sort by element repr (str hash order is randomized per
    process), and anything non-plain-data (modules, functions, Column
    exprs) folds to None rather than a memory-address repr."""
    import bench

    assert bench._const_repr("abc") == repr("abc")
    assert bench._const_repr(42) == "42"
    assert bench._const_repr((1, "a")) == "[1,'a']"
    assert bench._const_repr({"b", "a"}) == "{'a','b'}"
    assert bench._const_repr({"k2": 2, "k1": 1}) == "{'k1':1,'k2':2}"
    assert bench._const_repr(bench) is None  # module
    assert bench._const_repr(bench._const_repr) is None  # function
    assert bench._const_repr({"k": bench}) is None  # poisoned container
    deep = [[[[[1]]]]]
    assert bench._const_repr(deep) is None  # depth-capped


def test_query_src_md5_covers_module_constants(monkeypatch):
    """ADVICE r12 (medium): plans built from module-level expression
    strings (TOKENS_SPARK, SENT_PACK, ...) must change their composed
    fingerprint when the constant changes — co_names reaches the name
    but the old FunctionType/type filter skipped its value, so editing
    such a constant changed every composed plan without invalidating
    its at-pin history entry."""
    import bench
    import uforwarder_spark.operators.dedup as dmod

    before = bench._query_src_md5("contamination_fraction")
    assert before is not None
    assert before == bench._query_src_md5("contamination_fraction")  # stable
    monkeypatch.setattr(
        dmod, "TOKENS_SPARK", dmod.TOKENS_SPARK + " /* edited */"
    )
    after = bench._query_src_md5("contamination_fraction")
    assert after is not None and after != before
    monkeypatch.undo()
    assert bench._query_src_md5("contamination_fraction") == before


def test_jit_episode_candidate_signature():
    """VERDICT r11 #2: the fresh-JVM re-time fires ONLY on the one-JVM
    codegen-storm signature — raw > 3x, genuine compute (sched share
    < 0.4), and an unchanged source whose history reading is in-band.
    Every other shape keeps its normal verdict path."""
    import bench

    inband = {"raw_ratio": 1.09, "src_md5": "x"}
    assert bench.jit_episode_candidate(7.9, 0.319, inband)
    assert not bench.jit_episode_candidate(2.9, 0.319, inband)  # below 3x
    assert not bench.jit_episode_candidate(7.9, 0.45, inband)  # host-priced
    assert not bench.jit_episode_candidate(7.9, None, inband)  # no evidence
    assert not bench.jit_episode_candidate(7.9, 0.319, None)  # no history
    assert not bench.jit_episode_candidate(None, 0.319, inband)
    outband = {"raw_ratio": 1.5, "src_md5": "x"}
    assert not bench.jit_episode_candidate(7.9, 0.319, outband)  # real drift


def test_apply_jit_adjudication_paths():
    """The episode clears only when the fresh JVM is itself at pin AND
    reads the line in-band; an out-of-band reading, a slow fresh
    engine, or a failed retime leaves plan_work standing — the record
    must never clear a real regression on a technicality."""
    import bench

    hist = {n: {"raw_ratio": 1.1, "src_md5": "x"} for n in "abcde"}
    raw = {n: 7.9 for n in "abcde"}
    sched = {n: 0.3 for n in "abcde"}
    verdicts = {n: "plan_work" for n in "abcde"}
    verdicts["e"] = "host_priced"  # never retimed
    fresh = {
        "a": {"ratio": 1.09, "sw_factor": 1.0},  # clears
        "b": {"ratio": 1.6, "sw_factor": 1.0},  # out-of-band: stands
        "c": {"ratio": 1.05, "sw_factor": 1.4},  # slow fresh JVM: stands
        "d": None,  # retime failed: stands
    }
    calls = []

    def retime(n):
        calls.append(n)
        return fresh[n]

    got, retimes = bench.apply_jit_adjudication(verdicts, raw, sched, hist, retime)
    assert got == {
        "a": "jit_episode",
        "b": "plan_work",
        "c": "plan_work",
        "d": "plan_work",
        "e": "host_priced",
    }
    assert sorted(calls) == ["a", "b", "c", "d"]  # host_priced skipped
    assert retimes == fresh
    # a line whose history is out-of-band is never retimed at all
    hist2 = {"a": {"raw_ratio": 1.5, "src_md5": "x"}}
    got2, retimes2 = bench.apply_jit_adjudication(
        {"a": "plan_work"}, raw, sched, hist2, retime
    )
    assert got2 == {"a": "plan_work"} and retimes2 == {}


def test_corroboration_reading_consults_history_best():
    """Round-12 rule (the r11 history-merge lesson one layer down): on
    an at-pin window, the corroboration reading is the BEST of this
    window's ratio and the recorded best-of-window entry — a line
    escalates to plan_work only when NO at-pin window has shown it
    in-band (window 4 of r12 shipped wordpiece_apply_fertility
    actionable at 1.36 when window 3 had just read the same bytes at
    0.94)."""
    import bench

    hist = {"raw_ratio": 0.94, "src_md5": "x"}
    assert bench.corroboration_reading(1.36, hist) == 0.94
    assert bench.corroboration_reading(0.91, hist) == 0.91
    assert bench.corroboration_reading(1.36, None) == 1.36
    assert bench.corroboration_reading(1.36, {"src_md5": "x"}) == 1.36
    assert bench.corroboration_reading(None, hist) == 0.94
    assert bench.corroboration_reading(None, None) is None
    # end-to-end with the verdict rule: in-band history clears the
    # escalation; absent history leaves it actionable
    v = bench.corroborated_verdict
    assert v("host_priced", bench.corroboration_reading(1.36, hist)) == "host_priced"
    assert v("host_priced", bench.corroboration_reading(1.36, None)) == "plan_work"


def test_corroboration_reading_is_host_calibrated():
    """Round-12 units lesson: the escalation bar is CALIBRATED, like
    the main per-line rule. A gen1 line pinned on the r03-era host
    (1.372x faster single-core than the r12 epoch) reading 1.34 raw on
    an at-pin engine is ~0.98 calibrated — at pin, not plan work (the
    dedup_simhash false-actionable class: six at-pin windows, best raw
    1.34, every one of them in-band once calibrated)."""
    import bench

    hist = {"raw_ratio": 1.34, "hf": 1.372, "src_md5": "x"}
    # window reading 1.9 raw at hf 1.372 -> 1.385 cal; history best
    # 1.34 raw at its window's hf 1.372 -> 0.98 cal; best wins
    got = bench.corroboration_reading(1.9, hist, 1.372)
    assert got == 0.98
    assert bench.corroborated_verdict("host_priced", got) == "host_priced"
    # entries without a recorded hf degrade to raw (conservative)
    assert bench.corroboration_reading(None, {"raw_ratio": 1.34, "src_md5": "x"}) == 1.34
    # a genuinely out-of-band calibrated reading still escalates
    bad = bench.corroboration_reading(1.9, {"raw_ratio": 1.9, "hf": 1.0}, 1.0)
    assert bench.corroborated_verdict("host_priced", bad) == "plan_work"


def test_jit_candidate_history_band_is_calibrated():
    """The JIT-episode candidate's 'history in-band' check uses the
    entry's own window host factor: a gen1 entry at raw 1.34 / hf
    1.372 is in-band (0.98 cal) and qualifies; the same raw without a
    factor (1.34 > 1.3) does not."""
    import bench

    base = dict(raw_ratio=1.34, src_md5="x")
    assert bench.jit_episode_candidate(7.9, 0.3, {**base, "hf": 1.372})
    assert not bench.jit_episode_candidate(7.9, 0.3, base)
    # and the fresh-JVM clear bar calibrates through hfs
    v, _ = bench.apply_jit_adjudication(
        {"a": "plan_work"}, {"a": 7.9}, {"a": 0.3},
        {"a": {**base, "hf": 1.372}},
        lambda n: {"ratio": 1.34, "sw_factor": 1.0},
        {"a": 1.372},
    )
    assert v == {"a": "jit_episode"}
    v2, _ = bench.apply_jit_adjudication(
        {"a": "plan_work"}, {"a": 7.9}, {"a": 0.3},
        {"a": {**base, "hf": 1.372}},
        lambda n: {"ratio": 1.34, "sw_factor": 1.0},
    )
    assert v2 == {"a": "plan_work"}  # no hfs -> raw bar stands


def test_merge_migrates_hf_less_entries():
    """Units-fix migration: a pre-fix history entry (no recorded window
    host factor) yields to the current at-pin reading even when its raw
    ratio looks better — its raw number is not comparable under the
    calibrated bar."""
    import bench

    old = {"raw_ratio": 1.34, "n_windows": 6, "ts": 100, "src_md5": "x"}
    new = {"raw_ratio": 1.4, "hf": 1.372, "ts": 200, "src_md5": "x"}
    got = bench.merge_history_entry(old, new)
    assert got["hf"] == 1.372 and got["n_windows"] == 1
    # post-fix entries keep best-of-window semantics
    got2 = bench.merge_history_entry(dict(got, ts=200), {"raw_ratio": 1.5, "hf": 1.37, "ts": 300, "src_md5": "x"})
    assert got2["raw_ratio"] == 1.4 and got2["n_windows"] == 2


def test_shed_never_drops_primary_queries():
    """The driver contract pins the compact line's shape: {"metric",
    "value", "unit", "queries", "sf"}. Round 12's real line grew past
    the 1900-char tail floor and the old shed order dropped the primary
    queries dict — which a contract check reads as "every query
    removed". shed_to_fit must drain every other sheddable field first
    and keep "queries" even if the line stays over the floor."""
    import json as _json

    from bench import GENERATIONS, SHED_FLOOR, shed_to_fit

    big = {"x" * 40: 1.234 for _ in range(1)}  # noqa: F841 (shape doc)
    compact = {
        "metric": "headline_queries_total_wall",
        "value": 10.0,
        "unit": "sec",
        "queries": {f"q{i:02d}_{'n' * 30}": 1.234 for i in range(12)},
    }
    for sfx, *_ in GENERATIONS[1:]:
        compact[f"queries{sfx}"] = dict(compact["queries"])
    for sfx, *_ in GENERATIONS:
        compact[f"per_line_breaches{sfx}"] = [f"q{i:02d}_{'n' * 30}" for i in range(6)]
    compact["breach_verdicts"] = {f"q{i:02d}_{'n' * 30}": "host_priced" for i in range(8)}
    compact["stage_evidence"] = {f"q{i:02d}_{'n' * 30}": 0.5 for i in range(8)}
    compact["normal_window_ratios"] = {f"q{i:02d}_{'n' * 30}": 1.1 for i in range(12)}
    compact["actionable_breaches"] = []
    compact["sf"] = 0.1
    assert len(_json.dumps(compact)) > SHED_FLOOR  # the test is real
    line = shed_to_fit(compact)
    parsed = _json.loads(line)
    assert len(line) <= SHED_FLOOR
    assert len(parsed["queries"]) == 12  # primary dict intact
    for k in ("metric", "value", "unit", "sf", "actionable_breaches"):
        assert k in parsed


def test_shed_order_prefers_ratios_over_name_lists():
    """normal_window_ratios (the host_priced corroboration proof,
    VERDICT r09 #2) outlives the per-line breach NAME lists: when the
    line only needs a small trim, the name lists go first."""
    import json as _json

    from bench import SHED_FLOOR, shed_to_fit

    compact = {
        "metric": "headline_queries_total_wall",
        "value": 10.0,
        "unit": "sec",
        "queries": {f"q{i:02d}": 1.234 for i in range(12)},
        "pad": "x" * (SHED_FLOOR - 500),
        "per_line_breaches": ["a" * 120],
        "normal_window_ratios": {"a" * 120: 1.1},
        "actionable_breaches": ["a" * 30],
        "sf": 0.1,
    }
    parsed = _json.loads(shed_to_fit(compact))
    assert "per_line_breaches" not in parsed
    assert "normal_window_ratios" in parsed
    assert "actionable_breaches" in parsed
    assert len(parsed["queries"]) == 12
