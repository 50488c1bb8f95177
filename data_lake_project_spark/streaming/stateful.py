"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no stateful op at all (SURVEY.md §2.8); the built-in
watermarked windows (``streaming.windows``) cover the declarative
cases. This module adds the *custom* state shape the built-ins can't
express: arbitrary per-key accumulators carried across micro-batches
with explicit timeout-based eviction — the Structured Streaming
analogue of a keyed operator state in Flink.

Scale: state lives in the executor state store partitioned by key
(RocksDB-backed on a real cluster); a processing-time timeout bounds
it to recently-active keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Per-key running (sum, count, max) across micro-batches.

    Each key's accumulator persists in the state store between
    batches; with ``timeout_ms`` set, keys idle longer than that are
    evicted and emit a final tombstone row (``closed = true``).

    Output: (key, total, n, vmax, closed) in ``update`` mode.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            total, n, vmax = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [k], "total": [total], "n": [n], "vmax": [vmax],
                 "closed": [True]}
            )
            return
        total, n, vmax = state.get if state.exists else (0.0, 0, float("-inf"))
        for pdf in pdfs:
            if len(pdf):
                total += float(pdf[value_col].sum())
                n += int(len(pdf))
                vmax = max(vmax, float(pdf[value_col].max()))
        state.update((total, n, vmax))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"key": [k], "total": [total], "n": [n], "vmax": [vmax],
             "closed": [False]}
        )

    return (
        events.selectExpr(f"CAST({key_col} AS STRING) AS key", value_col)
        .groupBy("key")
        .applyInPandasWithState(
            fn,
            outputStructType="key string, total double, n long, vmax double, closed boolean",
            stateStructType="total double, n long, vmax double",
            outputMode="update",
            timeoutConf=timeout,
        )
    )
