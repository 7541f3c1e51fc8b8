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

__all__ = ["running_user_totals", "running_user_totals_v2"]

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


# -- state v2: transformWithStateInPandas --------------------------------------

_V2_OUT_SCHEMA = (
    "user_id long, n_events long, total_value double, n_types long"
)


def _load_tws():
    """Import the Spark 4 state-v2 base class lazily so the module
    stays importable on pyspark<4.0 (the operator then raises at
    call time with a clear message)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    return StatefulProcessor, StatefulProcessorHandle


def tws_protocol_available() -> bool:
    """True iff the state-v2 driver/worker protocol can run here: it
    speaks protobuf over a local state server, so a usable
    ``google.protobuf`` is required on BOTH driver and workers (real
    Spark distributions bundle it; this container does not)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _make_totals_v2_processor():
    StatefulProcessor, _ = _load_tws()

    class RunningTotalsV2(StatefulProcessor):
        """Per-user running totals on the state-v2 API
        (transformWithStateInPandas): a ValueState holds (n, total),
        a MapState holds per-event-type counts — composite typed
        state the v1 GroupState tuple cannot express. Emits one
        update row per (key, batch); the final row per key equals the
        batch aggregate (count, round(sum, 2), countDistinct(type)).
        Requires the RocksDB state store provider (the only provider
        state v2 supports)."""

        def init(self, handle) -> None:
            self._totals = handle.getValueState(
                "totals", "n long, total double"
            )
            self._types = handle.getMapState(
                "types", "event_type string", "n long"
            )

        def handleInputRows(self, key, rows, timer_values):
            cur = self._totals.get()
            n, total = (int(cur[0]), float(cur[1])) if cur else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
                for et, cnt in pdf.groupby("event_type").size().items():
                    k = (str(et),)
                    prev = (
                        int(self._types.getValue(k)[0])
                        if self._types.containsKey(k)
                        else 0
                    )
                    self._types.updateValue(k, (prev + int(cnt),))
            self._totals.update((n, float(total)))
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "n_types": [n_types],
                }
            )

        def close(self) -> None:
            pass

    return RunningTotalsV2()


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    """State-v2 twin of :func:`running_user_totals` — the Spark 4
    ``transformWithStateInPandas`` API with TYPED COMPOSITE state
    (ValueState + MapState) instead of one GroupState tuple. Update
    mode, processing-time-free (``timeMode='None'``): deterministic
    under an availableNow drain. Equivalent batch semantics for the
    final state per key:
    ``groupBy(user_id).agg(count, round(sum(value),2),
    countDistinct(event_type))``.

    NOTE: state v2 runs only on the RocksDB state store provider —
    start the query under ``ROCKSDB_STATE_CONF``
    (streaming/ingest.py), which is also the 100 TB configuration
    (disk-backed state, changelog checkpoints). Its driver/worker
    protocol needs ``google.protobuf`` (shipped with real Spark
    distributions); an environment without it gets a clear refusal
    here instead of a mid-query worker crash — this is a DECLARED
    environment boundary like the codec-entropy one, and
    tests/test_streaming.py skips accordingly."""
    if not tws_protocol_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf "
            "runtime for its state-server protocol; it is not "
            "installed in this environment. Use "
            "running_user_totals (applyInPandasWithState) — same "
            "semantics on the v1 state API."
        )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_totals_v2_processor(),
        outputStructType=_V2_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
