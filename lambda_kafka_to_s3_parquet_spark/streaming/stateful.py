"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.5/§2.9 — the escape hatch for semantics the declarative
window operators can't express).

The built-in surface covers tumbling/sliding/session windows and
watermarked dedup declaratively (``plans/streaming_queries.py``,
``streaming/pipeline.py``); this module demonstrates the arbitrary-state
API for genuinely custom semantics: a per-user *running profile* that
accumulates across micro-batches (count, value sum, min/max event time)
and emits an updated row per user per batch, with a processing-time
timeout that finalizes and evicts idle users' state.

Scale notes: state is partitioned by the grouping key across executors
(RocksDB state store — configured in ``session.get_spark``); each
micro-batch hands every updated key's rows to Python as Arrow batches.
Timeouts bound state size for abandoned keys — the same role the
watermark plays for the declarative operators.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (count, value_sum, first_ts_epoch_us, last_ts_epoch_us)
_STATE_SCHEMA = "cnt LONG, val_sum DOUBLE, first_us LONG, last_us LONG"

OUTPUT_SCHEMA = (
    "user_id LONG, n_events LONG, total_value DOUBLE, "
    "first_us LONG, last_us LONG, finalized BOOLEAN"
)


def make_profile_updater(timeout_ms: int = 0):
    """Build the state-update function (a closure over the idle timeout,
    captured by cloudpickle when the plan ships to executors)."""

    def _update_user_profile(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            cnt, val_sum, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "n_events": cnt,
                        "total_value": val_sum,
                        "first_us": first_us,
                        "last_us": last_us,
                        "finalized": True,
                    }
                ]
            )
            return

        cnt, val_sum, first_us, last_us = (
            state.get if state.exists else (0, 0.0, None, None)
        )
        for pdf in batches:
            ts_us = (pdf["ts"].astype("int64") // 1000) * 1000  # ns -> us, truncated
            cnt += len(pdf)
            val_sum += float(pdf["value"].sum())
            lo, hi = int(ts_us.min()), int(ts_us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((cnt, val_sum, first_us, last_us))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)  # evict after idle period
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": cnt,
                    "total_value": val_sum,
                    "first_us": first_us,
                    "last_us": last_us,
                    "finalized": False,
                }
            ]
        )

    return _update_user_profile


def running_user_profiles(events: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Streaming per-user running profile with stateful accumulation.

    Emits one row per user per micro-batch it appears in (update mode),
    carrying totals accumulated across ALL prior batches. With
    ``timeout_ms`` > 0, a final row with ``finalized=true`` fires when a
    user's state sits idle that long (processing time) and the state is
    evicted — bounding state for abandoned keys. Note a processing-time
    timeout keeps an AvailableNow drain alive until the idle period
    elapses, so bounded test runs use timeout_ms=0 and pin the eviction
    branch with a direct unit test instead.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        make_profile_updater(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout,
    )
