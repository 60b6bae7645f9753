"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windowed aggregations (streaming/windows.py) cover
time-bucketed state; this operator demonstrates arbitrary per-key
state the built-ins cannot express: a per-user running profile
(event count, value total, max inter-event gap) maintained across
micro-batches with explicit state schema.

State lives in the state store (checkpointed, partitioned by key);
each micro-batch streams Arrow record batches per key through the
Python function. At scale, state size is O(distinct keys), not
O(events) — and distinct keys themselves are unbounded on a real
stream, so the production configuration sets an IDLE TIMEOUT
(`idle_timeout_ms`): a key with no events for that long is emitted
one final time and evicted from the store, bounding state to
currently-active keys. The default (no timeout) keeps the operator a
pure function of the input — the configuration the batch-SQL oracle
checks bit-for-bit.

Determinism: totals accumulate as integer cents and gaps as integer
microseconds, so the final profile is bit-identical regardless of
batch boundaries or accumulation order — and therefore checkable
against a batch SQL oracle (unlike float accumulation in arrival
order, which no set-oriented engine reproduces).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("max_gap_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
        T.StructField("max_gap_us", T.LongType()),
    ]
)


def _profile_row(user_id, n, cents, max_gap) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_cents": [cents],
            "max_gap_us": [max_gap],
        }
    )


def make_update_fn(idle_timeout_ms: int | None = None):
    """Build the per-key state-update function.

    With a timeout configured, a timed-out key emits its final profile
    and is REMOVED from the state store (bounded state); the timer is
    re-armed after every batch that touches the key.
    """

    def _update_user_profile(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # Idle eviction: flush the final profile, drop the state.
            n, cents, _last_us, max_gap = state.get
            state.remove()
            yield _profile_row(user_id, n, cents, max_gap)
            return

        if state.exists:
            n, cents, last_us, max_gap = state.get
            last_us = None if last_us < 0 else last_us
        else:
            n, cents, last_us, max_gap = 0, 0, None, 0

        for pdf in batches:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for ts_us, value in zip(pdf["ts_us"], pdf["value"]):
                if last_us is not None:
                    gap = int(ts_us) - int(last_us)
                    if gap > max_gap:
                        max_gap = gap
                last_us = int(ts_us)
                n += 1
                cents += int(round(float(value) * 100))

        state.update((n, cents, -1 if last_us is None else last_us, max_gap))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield _profile_row(user_id, n, cents, max_gap)

    return _update_user_profile


# Default (no-timeout) update function — the oracle-checked config.
_update_user_profile = make_update_fn(None)


def user_profile_stream(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Apply the stateful per-user profile over a (streaming) events
    DataFrame with columns (user_id, event_id, ts_us, value).

    `idle_timeout_ms` is the production knob: without it state is
    O(all keys ever seen); with it, idle keys are flushed + evicted,
    so the store holds only keys active within the timeout window.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        make_update_fn(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if idle_timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


FUNNEL_STATE_SCHEMA = "stage INT"
FUNNEL_OUTPUT_SCHEMA = "user_id LONG, stage INT"


def make_funnel_update_fn(steps: list[str]):
    """Per-user incremental funnel-stage tracker: the batch's events
    are folded in (ts_us, event_id) order, advancing the stage on
    each next-step match — the streaming twin of the batch fold in
    operators/analytics.py:funnel_analysis. State is ONE int per user
    (the reached stage), the smallest possible footprint. In-order
    batch delivery is assumed, like the profile operator above; for
    out-of-order sources, buffer within the watermark first."""

    def _update(key, batches, state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        stage = state.get[0] if state.exists else 0
        for pdf in batches:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for et in pdf["event_type"]:
                if stage < len(steps) and et == steps[stage]:
                    stage += 1
        state.update((stage,))
        yield pd.DataFrame({"user_id": [user_id], "stage": [stage]})

    return _update


def funnel_stream(events: DataFrame, steps: list[str]) -> DataFrame:
    """Apply the incremental funnel over a streaming DataFrame with
    columns (user_id, event_id, ts_us, event_type)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_funnel_update_fn(steps),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
