"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.8 — the streaming analog of the
batch ``events_sessions`` query).

Semantics (same rule as the batch query): a user's events belong to one
session until a gap > ``gap_s`` seconds; each closed session emits one row
(user_id, session_start, session_end, n_events). Sessions close either
because a later event arrives past the gap, or because the event-time
watermark passes session_end + gap (processing-time-free, replay-safe).

State per user = the open session (start, end, count) — O(1) per key, the
canonical GroupState shape. At 10^9 users the state store shards by
user_id across executors; nothing here is driver-side.

The batch query remains the exactness oracle: over a static input drained
with availableNow, emitted sessions must equal the batch window algebra
(asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", TimestampType(), False),
        StructField("session_end", TimestampType(), False),
        StructField("n_events", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType(), False),
        StructField("end_us", LongType(), False),
        StructField("n", LongType(), False),
    ]
)


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1000)


def sessionize_stream(events, gap_s: int = 1800, watermark_delay_s: int | None = None):
    """events (user_id, ts, ...) stream -> closed-session rows.

    ``withWatermark`` bounds state: an open session whose timeout expires
    (no event within the gap, watermark advanced past it) closes and emits.
    Gap arithmetic is whole microseconds — identical to the batch oracle.

    ``watermark_delay_s`` decouples allowed lateness from the session gap
    (default: equal to the gap). Late-but-within-watermark events arriving in
    a LATER micro-batch merge correctly into the open session (the session
    start moves back to min) or split into their own earlier session when
    they are more than a gap before the open session's start — the same
    result as the batch window algebra over the union of all batches. A late
    event that lands in a gap already proven closed by an earlier emission
    cannot retract it (append mode); size the watermark delay to the lateness
    you must absorb.
    """
    gap_us = gap_s * 1_000_000
    delay_s = gap_s if watermark_delay_s is None else watermark_delay_s

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us * 1000)],
                    "session_end": [pd.Timestamp(end_us * 1000)],
                    "n_events": [n],
                }
            )
            return
        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(_us(t) for t in pdf["ts"])
        if not ts_list:
            return
        # Atom merge: each new event is an interval atom (t, t, 1); the open
        # session (if any) is an atom (start, end, n) whose internal
        # consecutive gaps are all <= gap by construction. Sorting atoms by
        # start and merging adjacent ones whose boundary gap <= gap_us
        # reproduces the batch window algebra over the union — including
        # out-of-order events that move the open session's start BACKWARD
        # (min) or split into their own earlier session (start - t > gap).
        atoms = [(t, t, 1) for t in ts_list]
        if state.exists:
            atoms.append(tuple(state.get))
        atoms.sort()
        closed = []
        start_us, end_us, n = atoms[0]
        for s, e, c in atoms[1:]:
            if s - end_us <= gap_us:
                end_us = max(end_us, e)
                n += c
            else:
                closed.append((start_us, end_us, n))
                start_us, end_us, n = s, e, c
        state.update((start_us, end_us, n))
        # timeout when the watermark passes end + gap: the session can no
        # longer be extended by any non-late event (clamped above the
        # current watermark, which Spark requires)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(end_us // 1000 + gap_s * 1000, wm_ms + 1))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s * 1000) for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e * 1000) for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    return (
        events.withWatermark("ts", f"{delay_s} seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
