"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.3-S "custom stateful operators").

Example operator: per-user running activity tracker — emits, on every
micro-batch, the user's cumulative event count, cumulative value sum
(integer cents — same determinism discipline as the batch engine), and
last-seen event time. State is one tiny tuple per user; with a timeout it
would expire idle users (GroupStateTimeout.ProcessingTimeTimeout) — left
NoTimeout here because the replay harness is bounded.

The state function is a SELF-CONTAINED closure (no package references) —
the same executor-import constraint as every other worker-side function
in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id LONG, n_events LONG, total_value_cents LONG, last_seen STRING"
)
STATE_SCHEMA = "n LONG, cents LONG, last_seen STRING"


def _make_tracker():
    def track(key, pdfs, state: GroupState):
        import pandas as _pd

        n, cents, last_seen = (
            state.get if state.exists else (0, 0, "")
        )
        for pdf in pdfs:
            n += len(pdf)
            # per-row cents with round-HALF-AWAY (pandas .round() is
            # banker's half-even and would drift from Spark/DuckDB on
            # exact .5 products) — matches the batch fixed-point discipline
            import numpy as _np

            v = pdf["value"].to_numpy() * 100.0
            cents += int(
                (_np.floor(_np.abs(v) + 0.5) * _np.sign(v)).astype(_np.int64).sum()
            )
            mx = pdf["ts"].max()
            s = mx.strftime("%Y-%m-%d %H:%M:%S")
            if s > last_seen:
                last_seen = s
        state.update((n, cents, last_seen))
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value_cents": [cents],
                "last_seen": [last_seen],
            }
        )

    return track


def user_activity_tracker(events: DataFrame) -> DataFrame:
    """events (streaming) → per-user cumulative stats, updated per batch."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_tracker(),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
