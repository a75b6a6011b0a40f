"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (SURVEY.md §2.8 — the streaming analog of the
batch ``events_sessions`` query).

Semantics (same rule as the batch query): a user's events belong to one
session until a gap > ``gap_s`` seconds; each session emits one row
(user_id, session_start, session_end, n_events) once it is SEALED — the
event-time watermark has passed session_end + gap, so no admissible (non-late)
event can ever extend, bridge, or back-fill it. Emission is therefore purely
watermark-driven (processing-time-free, replay-safe): a session that merely
LOOKS closed inside a batch (a later event arrived past the gap) stays in
state until the watermark proves it, because a late-but-within-watermark event
in a later micro-batch may still land inside the gap and merge the two
(the round-3 advisory: gap=600, delay=6000, events {0, 700} then {500} must
emit ONE session (0, 700, 3), not (0,0,1) + (500,700,2)).

State per user = the ordered list of unsealed session atoms (start, end,
count) — atoms are > gap apart by construction, and all but the last exist
only while the watermark lags their seal point, so the list stays short
(bounded by lateness/gap, not by history). At 10^9 users the state store
shards by user_id across executors; nothing here is driver-side.

The batch query remains the exactness oracle: over a static input drained
with availableNow, emitted sessions must equal the batch window algebra
(asserted in tests/test_streaming.py). Sealing rides on Spark's no-data
micro-batches: when the watermark advances past a pending seal point the
group's event-time timeout fires and the sealed sessions emit.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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

# unsealed session atoms, parallel arrays sorted by start
_STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType(), False), False),
        StructField("ends", ArrayType(LongType(), False), False),
        StructField("ns", ArrayType(LongType(), False), False),
    ]
)


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1000)


def sessionize_stream(events, gap_s: int = 1800, watermark_delay_s: int | None = None):
    """events (user_id, ts, ...) stream -> sealed-session rows.

    ``watermark_delay_s`` decouples allowed lateness from the session gap
    (default: equal to the gap). Late-but-within-watermark events arriving in
    a LATER micro-batch merge into whichever unsealed atom they fall within a
    gap of — moving its start back, extending its end, or bridging two atoms
    into one — exactly the batch window algebra over the union of all
    batches. Only the watermark passing ``end + gap`` seals an atom and emits
    it; an event later than the watermark (beyond the configured lateness) is
    dropped by Spark before reaching the operator, so a sealed session can
    never need retraction (append mode stays exact for all
    ``watermark_delay_s`` ≥ 0, not just the default).
    """
    gap_us = gap_s * 1_000_000
    gap_ms = gap_s * 1000
    delay_s = gap_s if watermark_delay_s is None else watermark_delay_s

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        atoms: list[list[int]] = []
        if state.exists:
            starts, ends, ns = state.get
            atoms = [list(t) for t in zip(starts, ends, ns)]
        for pdf in pdfs:  # empty iterator on a timeout invocation
            atoms.extend([_us(t), _us(t), 1] for t in pdf["ts"])
        if not atoms:
            return
        # Merge sorted atoms whose boundary gap <= gap: reproduces the batch
        # window algebra over (state ∪ new events), including out-of-order
        # arrivals that bridge previously separate atoms.
        atoms.sort()
        merged = [atoms[0][:]]
        for s, e, c in atoms[1:]:
            if s - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], e)
                merged[-1][2] += c
            else:
                merged.append([s, e, c])
        # Seal: watermark strictly past end + gap means no admissible event
        # (ts >= watermark) can land within a gap of the atom.
        wm_ms = state.getCurrentWatermarkMs()
        sealed = [a for a in merged if a[1] // 1000 + gap_ms < wm_ms]
        open_atoms = [a for a in merged if not (a[1] // 1000 + gap_ms < wm_ms)]
        if open_atoms:
            state.update(
                (
                    [a[0] for a in open_atoms],
                    [a[1] for a in open_atoms],
                    [a[2] for a in open_atoms],
                )
            )
            # wake when the watermark reaches the earliest pending seal point
            # (clamped above the current watermark, which Spark requires)
            next_ms = min(a[1] // 1000 + gap_ms for a in open_atoms)
            state.setTimeoutTimestamp(max(next_ms, wm_ms + 1))
        else:
            state.remove()
        if sealed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(sealed),
                    "session_start": [pd.Timestamp(s * 1000) for s, _, _ in sealed],
                    "session_end": [pd.Timestamp(e * 1000) for _, e, _ in sealed],
                    "n_events": [c for _, _, c in sealed],
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
