"""Property-based checks (hypothesis): the frame-level operators agree
with straightforward pure-Python reference models on arbitrary ack
patterns — the state-machine logic holds beyond hand-picked cases.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from uforwarder_spark.operators.pipeline import (
    ack_watermark_frame,
    inflight_limiter_frame,
)

# a partition's history: distinct offsets with ack flags
pattern = st.lists(st.booleans(), min_size=1, max_size=30)


def _frame(spark, acks: list[bool]):
    rows = [("t", 0, off, acked) for off, acked in enumerate(acks)]
    return spark.createDataFrame(rows, ["topic", "part_id", "msg_offset", "acked"])


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(acks=pattern)
def test_ack_watermark_equals_reference_model(spark, acks):
    r = ack_watermark_frame(_frame(spark, acks)).collect()[0]
    # reference: committed = last offset of the acked prefix, None if empty
    committed = None
    for off, acked in enumerate(acks):
        if not acked:
            break
        committed = off
    assert r.committed_offset == committed
    assert r.high_watermark == len(acks) - 1
    assert r.n_acked == sum(acks)


@settings(max_examples=12, deadline=None, derandomize=True, suppress_health_check=list(HealthCheck))
@given(acks=pattern, limit=st.integers(min_value=1, max_value=10))
def test_inflight_limiter_equals_reference_model(spark, acks, limit):
    pending = [off for off, acked in enumerate(acks) if not acked]
    rows = inflight_limiter_frame(_frame(spark, acks), limit=limit).collect()
    if not pending:
        assert rows == []  # nothing unacked → no permits outstanding
        return
    r = rows[0]
    admitted = pending[:limit]
    assert r.n_pending == len(pending)
    assert r.n_admitted == len(admitted)
    assert r.n_blocked == len(pending) - len(admitted)
    assert r.last_admitted_offset == admitted[-1]
