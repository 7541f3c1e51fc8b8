"""Custom stateful streaming operators via ``applyInPandasWithState``
(arbitrary keyed state — the escape hatch when built-in windows/dedup
can't express the semantics; SURVEY.md §2.6 "stateful ops" row).

The state store is keyed by the groupBy key; each micro-batch hands
the operator its key's accumulated state plus the batch's rows as
Arrow-backed pandas frames. State must stay small per key (it lives in
the executor state store, checkpointed per batch) — aggregates, not
row buffers.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["running_user_totals"]

_OUT_SCHEMA = (
    "user_id long, n_events long, total_value double, max_ts timestamp"
)
_STATE_SCHEMA = "n long, total double, max_ts timestamp"


def _update_totals(
    key: Tuple[Any, ...],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into (count, sum, max_ts) keyed state and
    emit the updated running totals once per batch."""
    if state.exists:
        n, total, max_ts = state.get
    else:
        n, total, max_ts = 0, 0.0, None
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        batch_max = pdf["ts"].max()
        # pandas max() of an all-null ts column is NaT, never None —
        # pd.isna is the real guard (r8 review: the old `is not None`
        # check was dead and could assign NaT into timestamp state)
        if not pd.isna(batch_max) and (max_ts is None or batch_max > max_ts):
            max_ts = batch_max
    state.update((n, total, max_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "max_ts": [max_ts],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value), max(ts)) maintained across
    micro-batches — emitted in update mode every time a user appears.

    Equivalent batch semantics (for the final state after draining the
    stream): ``events.groupBy(user_id).agg(count, round(sum,2), max)``
    — which is exactly what the test asserts.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
