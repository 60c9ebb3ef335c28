"""Randomized multi-trigger replay tests for the three stateful
pipelines with the most state-machine surface (round-4 verdict item 6):
E12 scale windows, E13 delay-process, E24 funnel. Hypothesis draws the
event sequences AND the micro-batch boundaries, and every run includes
one mid-stream restart (phase 1 drains with availableNow, the query
stops, more files land, a new query resumes from the same checkpoint) —
so state-store round-trips, not just single-query state carry, are what
converge to the batch-twin / pure-Python model.
"""

from __future__ import annotations

import math
import os
import tempfile
import time as _time

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uforwarder_spark.streaming import pipelines as P

SETTINGS = dict(
    max_examples=3, deadline=None, derandomize=True,
    suppress_health_check=list(HealthCheck),
)


def _write_chunks(spark, chunks, schema, src, base_mtime, start_idx=0):
    """One parquet dir per chunk with strictly ascending mtimes so the
    file source (ordered by mtime) delivers chunk i as micro-batch i."""
    for i, pdf in enumerate(chunks, start=start_idx):
        d = os.path.join(src, f"f{i:03d}")
        spark.createDataFrame(pdf, schema).coalesce(1).write.mode("overwrite").parquet(d)
        for root, _, files in os.walk(d):
            for f in files:
                t = base_mtime + i
                os.utime(os.path.join(root, f), (t, t))


def _run_phase(spark, transform, schema, src, checkpoint, mode, collected):
    """Run one availableNow pass over the files currently in src,
    appending (batch_id, rows) to collected; returns after drain."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(src, "f*"))
    )
    q = (
        transform(stream)
        .writeStream.foreachBatch(
            lambda bdf, bid: collected.append((bid, bdf.collect()))
        )
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)


def _chunked(rows, assignment, n_chunks):
    return [
        [r for r, c in zip(rows, assignment) if c == k] for k in range(n_chunks)
    ]


# --- E12: scale windows ----------------------------------------------------
def _scalewin_model(topic, samples):
    """Pure-Python port of the reference's BoundedWindow accept-and-
    rebuild loop (the same model test_e12 validates single-run); the
    float ops mirror _scalewin_machine's exactly, so equality is
    bit-exact, not approximate."""
    cfg = {"click": (0.10, 0.10), "error": (1.00, 0.05), "purchase": (0.20, 0.08)}
    scale, quota = cfg[topic]
    NB, n = 100, 0

    def bounds(s):
        return {
            "up": (s, 2.0 * s, 0.5, 1.2 * s, 2.0 * s),
            "down": (0.5 * s, s, 0.99, 0.5 * s, 0.8 * s),
            "hib": (0.0, s, 0.99, 0.0, 0.0),
        }

    counts = {c: [0] * NB for c in bounds(scale)}
    for mps in samples:
        s = mps / (quota / 4.0)
        b = bounds(scale)
        for comp, (lo, hi, _, _, _) in b.items():
            w = (hi - lo) / NB
            counts[comp][min(NB - 1, max(0, math.ceil((s - lo) / w)))] += 1
        n += 1
        if n < 10:
            continue
        for comp, (lo, hi, pct, out_lo, out_hi) in b.items():
            w = (hi - lo) / NB
            pivot = int(pct * n)
            tot, idx = 0, 0
            for idx in range(NB):
                tot += counts[comp][idx]
                if tot >= pivot:
                    break
            prop = lo + idx * w
            if out_lo <= prop <= out_hi:
                scale, n = (prop if comp != "hib" else 0.0), 0
                counts = {c: [0] * NB for c in bounds(max(scale, 1e-9))}
                break
    return scale, n


@settings(**SETTINGS)
@given(
    mps_click=st.lists(st.floats(0.0005, 0.02, allow_nan=False), min_size=12, max_size=24),
    mps_error=st.lists(st.floats(0.0005, 0.02, allow_nan=False), min_size=12, max_size=24),
    n_chunks=st.integers(2, 4),
    assign_seed=st.randoms(use_true_random=False),
    restart_at=st.integers(1, 3),
)
def test_e12_randomized_replay_converges(
    spark, mps_click, mps_error, n_chunks, assign_seed, restart_at
):
    """E12 property: for ANY sample sequence and ANY micro-batch
    chunking with one mid-stream restart, the final (scale, n_samples)
    per topic equals the pure-Python online model run over the samples
    in effective stream order (chunk order, window_start order within
    a chunk — what the machine's in-batch sort produces)."""
    base = pd.Timestamp("2024-01-01")
    rows = []
    for topic, mps_list in (("click", mps_click), ("error", mps_error)):
        for i, mps in enumerate(mps_list):
            rows.append((topic, base + pd.Timedelta(minutes=5 * i), float(mps)))
    assignment = [assign_seed.randrange(n_chunks) for _ in rows]
    chunks = _chunked(rows, assignment, n_chunks)
    chunks = [c for c in chunks if c] or [rows]
    restart_at = min(restart_at, len(chunks))

    # effective per-topic order: batches in file order, sorted by
    # window_start inside each batch (== the machine's sort)
    effective: dict[str, list[float]] = {"click": [], "error": []}
    for c in chunks:
        for topic, _, mps in sorted(c, key=lambda r: (r[1],)):
            effective[topic].append(mps)

    schema = "topic string, window_start timestamp, mps double"
    tmp = tempfile.mkdtemp(prefix="e12rr")
    src, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "ckpt")
    cols = ["topic", "window_start", "mps"]
    to_pdf = lambda c: pd.DataFrame(c, columns=cols)  # noqa: E731
    now = _time.time() - 1000
    collected: list = []
    _write_chunks(spark, [to_pdf(c) for c in chunks[:restart_at]], schema, src, now)
    _run_phase(spark, P.scale_proposal_stream, schema, src, ckpt, "update", collected)
    if chunks[restart_at:]:
        _write_chunks(
            spark, [to_pdf(c) for c in chunks[restart_at:]], schema, src, now,
            start_idx=restart_at,
        )
        _run_phase(spark, P.scale_proposal_stream, schema, src, ckpt, "update", collected)

    final = {}
    for _, batch_rows in sorted(collected, key=lambda p: p[0]):
        for r in batch_rows:
            final[r.topic] = r
    for topic in ("click", "error"):
        if not effective[topic]:
            continue
        want_scale, want_n = _scalewin_model(topic, effective[topic])
        assert final[topic].scale == want_scale, topic
        assert final[topic].n_samples == want_n, topic


# --- E13: delay-process ----------------------------------------------------
@settings(**SETTINGS)
@given(
    n_msgs=st.integers(14, 30),
    minute_gaps=st.lists(st.integers(0, 90), min_size=30, max_size=30),
    n_chunks=st.integers(2, 4),
    assign_seed=st.randoms(use_true_random=False),
    restart_at=st.integers(1, 3),
)
def test_e13_randomized_replay_matches_model(
    spark, n_msgs, minute_gaps, n_chunks, assign_seed, restart_at
):
    """E13 property: for ANY event-time schedule, ANY chunking, and one
    mid-stream restart, every release row (offset, was_parked,
    released_ms) equals the pure-Python replay, and released + parked
    covers every input exactly once."""
    from tests.test_streaming import _delay_model

    base = pd.Timestamp("2024-01-01")
    rows = []
    for topic, pid in (("click", 0), ("view", 0), ("view", 1)):
        t = base
        for off in range(n_msgs):
            t = t + pd.Timedelta(minutes=minute_gaps[off % len(minute_gaps)])
            rows.append((topic, pid, off, t))
    assignment = [assign_seed.randrange(n_chunks) for _ in rows]
    chunks = _chunked(rows, assignment, n_chunks)
    chunks = [c for c in chunks if c] or [rows]
    restart_at = min(restart_at, len(chunks))

    cols = ["topic", "part_id", "msg_offset", "ts"]
    to_pdf = lambda c: pd.DataFrame(c, columns=cols)  # noqa: E731
    schema = "topic string, part_id long, msg_offset long, ts timestamp"
    tmp = tempfile.mkdtemp(prefix="e13rr")
    src, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "ckpt")
    now = _time.time() - 1000
    collected: list = []
    _write_chunks(spark, [to_pdf(c) for c in chunks[:restart_at]], schema, src, now)
    _run_phase(spark, P.delay_process_stream, schema, src, ckpt, "append", collected)
    if chunks[restart_at:]:
        _write_chunks(
            spark, [to_pdf(c) for c in chunks[restart_at:]], schema, src, now,
            start_idx=restart_at,
        )
        _run_phase(spark, P.delay_process_stream, schema, src, ckpt, "append", collected)

    from uforwarder_spark.operators.pipeline import DELAYS

    want, residual = _delay_model([to_pdf(c) for c in chunks], dict(DELAYS))
    got = [r for _, batch_rows in collected for r in batch_rows]
    assert len(got) == len(want)
    for r in got:
        key = (r.topic, r.part_id, r.msg_offset)
        assert key in want, f"unexpected release {key}"
        wp, rel = want[key]
        assert r.was_parked == wp, key
        assert r.released_ms == rel, key
    n_residual = sum(len(v) for v in residual.values())
    assert len(got) + n_residual == len(rows)


# --- E24: funnel -----------------------------------------------------------
@settings(**SETTINGS)
@given(
    etypes=st.lists(
        st.sampled_from(["view", "click", "purchase", "error"]),
        min_size=20,
        max_size=60,
    ),
    n_users=st.integers(2, 4),
    boundary_seed=st.randoms(use_true_random=False),
    restart_at=st.integers(1, 3),
)
def test_e24_randomized_replay_matches_first_reach(
    spark, etypes, n_users, boundary_seed, restart_at
):
    """E24 property: for ANY per-user event sequence, ANY contiguous
    event_id chunking (preserving per-user order, Kafka's per-key
    guarantee), and one mid-stream restart, the appended rows are
    EXACTLY each user's first-reach events (first view, first click
    after it, first purchase after that) — once each, never revised."""
    events = [
        (eid % n_users, eid, et) for eid, et in enumerate(etypes)
    ]  # event_id ascending; user round-robin keeps per-user order trivial
    # contiguous chunk boundaries preserve per-user event_id order
    n_chunks = boundary_seed.randint(2, 4)
    cuts = sorted(boundary_seed.sample(range(1, len(events)), min(n_chunks - 1, len(events) - 1)))
    chunks, prev = [], 0
    for c in [*cuts, len(events)]:
        chunks.append(events[prev:c])
        prev = c
    chunks = [c for c in chunks if c]
    restart_at = min(restart_at, len(chunks))

    # pure-Python first-reach model
    want: set[tuple[int, int, int]] = set()
    prog: dict[int, list] = {u: [None, None, None] for u in range(n_users)}
    for u, eid, et in events:
        e1, e2, e3 = prog[u]
        if e1 is None and et == "view":
            prog[u][0] = eid
            want.add((u, 1, eid))
        elif e1 is not None and e2 is None and et == "click" and eid > e1:
            prog[u][1] = eid
            want.add((u, 2, eid))
        elif e2 is not None and e3 is None and et == "purchase" and eid > e2:
            prog[u][2] = eid
            want.add((u, 3, eid))

    cols = ["user_id", "event_id", "event_type"]
    to_pdf = lambda c: pd.DataFrame(c, columns=cols)  # noqa: E731
    schema = "user_id long, event_id long, event_type string"
    tmp = tempfile.mkdtemp(prefix="e24rr")
    src, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "ckpt")
    now = _time.time() - 1000
    collected: list = []
    _write_chunks(spark, [to_pdf(c) for c in chunks[:restart_at]], schema, src, now)
    _run_phase(spark, P.funnel_stream, schema, src, ckpt, "append", collected)
    if chunks[restart_at:]:
        _write_chunks(
            spark, [to_pdf(c) for c in chunks[restart_at:]], schema, src, now,
            start_idx=restart_at,
        )
        _run_phase(spark, P.funnel_stream, schema, src, ckpt, "append", collected)

    got = [
        (int(r.user_id), int(r.step), int(r.event_id))
        for _, batch_rows in collected
        for r in batch_rows
    ]
    assert len(got) == len(set(got)), "a first-reach row fired twice"
    assert set(got) == want


# --- E14: bootstrap phase --------------------------------------------------
@settings(**SETTINGS)
@given(
    acks=st.lists(st.booleans(), min_size=80, max_size=260),
    n_chunks=st.integers(2, 4),
    assign_seed=st.randoms(use_true_random=False),
    restart_at=st.integers(1, 3),
)
def test_e14_randomized_replay_matches_counter_model(
    spark, acks, n_chunks, assign_seed, restart_at
):
    """E14 property: for ANY ack pattern, ANY chunking, and one
    mid-stream restart, every message's (phase, effective_cap,
    completed_after) equals the cumulative-completed replay over the
    EFFECTIVE stream order (batch order, offset order within batch) —
    the completed counter must survive both micro-batch boundaries and
    the state-store round-trip."""
    rows = [("t", 0, off, bool(a)) for off, a in enumerate(acks)]
    assignment = [assign_seed.randrange(n_chunks) for _ in rows]
    chunks = _chunked(rows, assignment, n_chunks)
    chunks = [c for c in chunks if c] or [rows]
    restart_at = min(restart_at, len(chunks))

    # effective order: chunk order, offset order within chunk
    effective = [r for c in chunks for r in sorted(c, key=lambda r: r[2])]
    BOOT_CAP, STEADY_CAP, THRESHOLD = 10, 50, 100
    completed, want = 0, {}
    for _, _, off, acked in effective:
        working = completed > THRESHOLD
        if acked:
            completed += 1
        want[off] = (
            "working" if working else "bootstrap",
            STEADY_CAP if working else min(BOOT_CAP, STEADY_CAP),
            completed,
        )

    cols = ["topic", "part_id", "msg_offset", "acked"]
    schema = "topic string, part_id long, msg_offset long, acked boolean"
    to_pdf = lambda c: pd.DataFrame(c, columns=cols)  # noqa: E731
    tmp = tempfile.mkdtemp(prefix="e14rr")
    src, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "ckpt")
    now = _time.time() - 1000
    collected: list = []
    _write_chunks(spark, [to_pdf(c) for c in chunks[:restart_at]], schema, src, now)
    _run_phase(spark, P.bootstrap_phase_stream, schema, src, ckpt, "append", collected)
    if chunks[restart_at:]:
        _write_chunks(
            spark, [to_pdf(c) for c in chunks[restart_at:]], schema, src, now,
            start_idx=restart_at,
        )
        _run_phase(
            spark, P.bootstrap_phase_stream, schema, src, ckpt, "append", collected
        )

    got = [r for _, batch_rows in collected for r in batch_rows]
    assert len(got) == len(rows)
    for r in got:
        assert (r.phase, r.effective_cap, r.completed_after) == want[r.msg_offset], (
            r.msg_offset
        )


# --- E16: AIMD limit -------------------------------------------------------
@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["DELIVERED", "RETRY", "DLQ"]), st.booleans()),
        min_size=120,
        max_size=320,
    ),
    n_chunks=st.integers(2, 4),
    assign_seed=st.randoms(use_true_random=False),
    restart_at=st.integers(1, 3),
)
def test_e16_randomized_replay_matches_aimd_fold(
    spark, events, n_chunks, assign_seed, restart_at
):
    """E16 property: for ANY outcome sequence, ANY chunking, and one
    mid-stream restart, the emitted limit trajectory equals the AIMD
    fold over the effective stream order — the partial adaptation batch
    (count + flags) must ride intact across micro-batch boundaries AND
    the restart."""
    rows = [("t", 0, off, oc, bool(a)) for off, (oc, a) in enumerate(events)]
    assignment = [assign_seed.randrange(n_chunks) for _ in rows]
    chunks = _chunked(rows, assignment, n_chunks)
    chunks = [c for c in chunks if c] or [rows]
    restart_at = min(restart_at, len(chunks))

    effective = [r for c in chunks for r in sorted(c, key=lambda r: r[2])]
    BATCH, LIM0, LMIN, LMAX = 50, 50, 4, 200
    in_b, drop, succ, lim, bid, ninc, ndec = 0, False, False, LIM0, 0, 0, 0
    want = []
    for _, _, off, oc, acked in effective:
        drop = drop or oc == "DLQ"
        succ = succ or acked
        in_b += 1
        if in_b == BATCH:
            if drop:
                lim = max(LMIN, lim // 2)
                ndec += 1
            elif succ:
                lim = min(LMAX, lim + 1)
                ninc += 1
            want.append((bid, drop, succ, lim, ninc, ndec))
            bid += 1
            in_b, drop, succ = 0, False, False

    cols = ["topic", "part_id", "msg_offset", "outcome", "acked"]
    schema = (
        "topic string, part_id long, msg_offset long, outcome string, acked boolean"
    )
    to_pdf = lambda c: pd.DataFrame(c, columns=cols)  # noqa: E731
    tmp = tempfile.mkdtemp(prefix="e16rr")
    src, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "ckpt")
    now = _time.time() - 1000
    collected: list = []
    _write_chunks(spark, [to_pdf(c) for c in chunks[:restart_at]], schema, src, now)
    _run_phase(spark, P.aimd_limit_stream, schema, src, ckpt, "append", collected)
    if chunks[restart_at:]:
        _write_chunks(
            spark, [to_pdf(c) for c in chunks[restart_at:]], schema, src, now,
            start_idx=restart_at,
        )
        _run_phase(spark, P.aimd_limit_stream, schema, src, ckpt, "append", collected)

    got = sorted(
        (
            (r.batch_id, r.has_drop, r.has_succ, r.limit_after, r.n_increase, r.n_decrease)
            for _, batch_rows in collected
            for r in batch_rows
        )
    )
    assert got == want


# --- E17: linger sampler ---------------------------------------------------
@settings(**SETTINGS)
@given(
    minute_gaps=st.lists(st.integers(0, 400), min_size=25, max_size=70),
    vals=st.lists(
        st.floats(-100.0, 100.0, allow_nan=False, allow_infinity=False),
        min_size=70,
        max_size=70,
    ),
    n_chunks=st.integers(2, 4),
    assign_seed=st.randoms(use_true_random=False),
    restart_at=st.integers(1, 3),
)
def test_e17_randomized_replay_matches_linger_gate(
    spark, minute_gaps, vals, n_chunks, assign_seed, restart_at
):
    """E17 property: for ANY read schedule (gaps straddling the linger
    interval both ways), ANY chunking, and one mid-stream restart,
    every read's (fresh, sample_age_ms, sampled_value) equals the
    rolling-gate replay over the effective stream order — the
    (lastTick, lastValue) pair must survive micro-batch boundaries and
    the state-store round-trip."""
    LINGER_MS = 10_000_000
    base = pd.Timestamp("2024-01-01")
    rows, t = [], base
    for off, g in enumerate(minute_gaps):
        t = t + pd.Timedelta(minutes=g)
        rows.append(("t", 0, off, t, float(vals[off])))
    assignment = [assign_seed.randrange(n_chunks) for _ in rows]
    chunks = _chunked(rows, assignment, n_chunks)
    chunks = [c for c in chunks if c] or [rows]
    restart_at = min(restart_at, len(chunks))

    # effective order: chunk order; (ts, offset) order within chunk
    effective = [r for c in chunks for r in sorted(c, key=lambda r: (r[3], r[2]))]
    last_tick, last_val, want = None, 0.0, {}
    for _, _, off, ts, v in effective:
        now = ts.value // 1_000_000
        if last_tick is None or now - last_tick > LINGER_MS:
            last_tick, last_val = now, v
            fresh = True
        else:
            fresh = False
        want[off] = (fresh, now - last_tick, last_val)

    cols = ["topic", "part_id", "msg_offset", "ts", "payload_value"]
    schema = (
        "topic string, part_id long, msg_offset long, ts timestamp, "
        "payload_value double"
    )
    to_pdf = lambda c: pd.DataFrame(c, columns=cols)  # noqa: E731
    tmp = tempfile.mkdtemp(prefix="e17rr")
    src, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "ckpt")
    now0 = _time.time() - 1000
    collected: list = []
    _write_chunks(spark, [to_pdf(c) for c in chunks[:restart_at]], schema, src, now0)
    _run_phase(spark, P.linger_sample_stream, schema, src, ckpt, "append", collected)
    if chunks[restart_at:]:
        _write_chunks(
            spark, [to_pdf(c) for c in chunks[restart_at:]], schema, src, now0,
            start_idx=restart_at,
        )
        _run_phase(
            spark, P.linger_sample_stream, schema, src, ckpt, "append", collected
        )

    got = [r for _, batch_rows in collected for r in batch_rows]
    assert len(got) == len(rows)
    for r in got:
        assert (r.fresh, r.sample_age_ms, r.sampled_value) == want[r.msg_offset], (
            r.msg_offset
        )
