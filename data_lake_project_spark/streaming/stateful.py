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
from pyspark.sql import functions as F
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


def funnel_stages(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    max_gap_s: int | None = 86400,
) -> DataFrame:
    """Streaming twin of the q69 batch funnel: per-key n-stage state
    machine carried across micro-batches. Stage i+1 only fires
    STRICTLY after stage i's recorded timestamp and (with
    ``max_gap_s``) within that many seconds of it — the same
    strict-``>`` + conversion-horizon contract as the batch fold, so
    on an in-order stream the final update per key equals the batch
    result exactly (``test_funnel_stream_equals_batch``).

    State is one epoch-MICROSECOND timestamp per stage (-1 = not
    reached; ``unix_micros`` precision, matching the batch fold's
    strict-after compare) — O(stages) per key, store-backed on a
    cluster. Rows inside each micro-batch are processed in (ts, seq)
    order; cross-batch reordering follows the source's delivery
    order, the same contract as any non-watermarked stateful op
    (``test_funnel_shuffled_delivery_is_prefix_monotone`` pins the
    out-of-order behavior: a stage arriving in a LATER batch than a
    deeper stage it precedes in event time is not retro-applied).
    Rows with NULL ts or seq are dropped in the pre-filter — one bad
    row must not poison the stream (the batch fold's aggregate is
    null-tolerant the same way).

    Output (update mode): (key, stage) after every batch that touched
    the key, where stage is the deepest stage index reached (0 =
    none). Downstream takes the last update per key for the snapshot.
    """
    n = len(stages)
    stage_of = {s: i for i, s in enumerate(stages)}
    gap_us = max_gap_s * 1_000_000 if max_gap_s is not None else None

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        ts = list(state.get) if state.exists else [-1] * n
        # the iterator yields the group's rows as ARBITRARY Arrow
        # chunks — concatenate before sorting or the fold sees
        # chunk-local order, not batch order
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            # NULL ts/seq rows cannot be ordered, so they never fold a
            # stage — but they are dropped HERE, after grouping, so
            # the key itself still emits its depth row. Filtering them
            # before the groupBy would silently erase a user whose
            # only funnel events are null-stamped, while q69's batch
            # fold (null-tolerant aggregate) still reports 0_none —
            # a stream-vs-batch key-universe mismatch.
            batch = pd.concat(chunks, ignore_index=True).dropna(
                subset=[ts_col, seq_col]
            )
            for _, row in batch.sort_values([ts_col, seq_col]).iterrows():
                i = stage_of.get(row[type_col])
                if i is None or ts[i] != -1:
                    continue
                t = int(row[ts_col])
                if i == 0:
                    ts[i] = t
                elif ts[i - 1] != -1 and t > ts[i - 1] and (
                    gap_us is None or t <= ts[i - 1] + gap_us
                ):
                    ts[i] = t
        state.update(tuple(ts))
        depth = 0
        for i in range(n):
            if ts[i] == -1:
                break
            depth = i + 1
        yield pd.DataFrame({"key": [k], "stage": [depth]})

    # epoch MICROS, not seconds: the strict-after comparison must see
    # the same precision the batch fold sees, or a stage landing in
    # the same second as its predecessor (later by micros) is lost.
    filtered = (
        events.filter(F.col(type_col).isin(*stages))
        # null ts/seq rows are dropped INSIDE fn (see above), never
        # here — the key universe must match the batch fold's
        .selectExpr(
            f"CAST({key_col} AS STRING) AS key",
            f"unix_micros(CAST({ts_col} AS TIMESTAMP)) AS {ts_col}",
            f"CAST({seq_col} AS LONG) AS {seq_col}",
            type_col,
        )
    )
    return filtered.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType="key string, stage long",
        stateStructType=", ".join(f"s{i} long" for i in range(n)),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stages_eventtime(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    max_gap_s: int | None = 86400,
    delay: str = "10 minutes",
) -> DataFrame:
    """Out-of-order-robust twin of :func:`funnel_stages`: events
    buffer in state until the EVENT-TIME watermark passes them, then
    fold through the stage machine in (ts, seq) order — so any
    delivery order within the ``delay`` lateness horizon converges to
    exactly the batch result (``funnel_stages`` is forward-only and
    never retro-applies a late prerequisite;
    ``test_funnel_eventtime_shuffled_delivery_equals_batch`` pins the
    difference). Events later than the horizon are dropped by the
    watermark, the standard contract.

    State per key: one epoch-microsecond per stage + the buffer of
    not-yet-ripe events — O(stages + events inside the lateness
    horizon), the price of reordering; the watermark bounds it (a
    10-minute horizon holds ~minutes of one user's events, not the
    stream). Emits (key, stage) updates whenever ripe events fold;
    the snapshot per key is the max stage, as with the in-order
    funnel.

    A key with a non-empty buffer arms an EVENT-TIME TIMEOUT at its
    earliest buffered timestamp, so buffered events fold when the
    watermark passes them even if the key never receives another
    event (Spark's no-data micro-batches deliver the timeout) — a
    quiet user's funnel does not hang on traffic that never comes.
    """
    n = len(stages)
    stage_of = {s: i for i, s in enumerate(stages)}
    gap_us = max_gap_s * 1_000_000 if max_gap_s is not None else None

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            st = list(state.get)
            ts = list(st[:n])
            buf = list(zip(st[n], st[n + 1], st[n + 2]))
        else:
            ts, buf = [-1] * n, []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            for row in batch.itertuples(index=False):
                buf.append(
                    (
                        int(getattr(row, ts_col)),
                        int(getattr(row, seq_col)),
                        getattr(row, type_col),
                    )
                )
        # Fold everything the event-time watermark has passed, in
        # event-time order; keep the rest buffered. getCurrentWatermarkMs
        # is 0 until the first batch completes — nothing ripens then.
        wm_us = state.getCurrentWatermarkMs() * 1000
        ripe = sorted((e for e in buf if e[0] <= wm_us))
        buf = [e for e in buf if e[0] > wm_us]
        for t, _seq, typ in ripe:
            i = stage_of.get(typ)
            if i is None or ts[i] != -1:
                continue
            if i == 0:
                ts[i] = t
            elif ts[i - 1] != -1 and t > ts[i - 1] and (
                gap_us is None or t <= ts[i - 1] + gap_us
            ):
                ts[i] = t
        state.update(
            tuple(ts)
            + (
                [e[0] for e in buf],
                [e[1] for e in buf],
                [e[2] for e in buf],
            )
        )
        if buf:
            # wake this key when the watermark passes its earliest
            # buffered event (timeout must sit strictly beyond the
            # current watermark or Spark rejects it)
            wake_ms = min(e[0] for e in buf) // 1000 + 1
            state.setTimeoutTimestamp(max(wake_ms, wm_us // 1000 + 1))
        depth = 0
        for i in range(n):
            if ts[i] == -1:
                break
            depth = i + 1
        yield pd.DataFrame({"key": [k], "stage": [depth]})

    filtered = (
        events.withColumn("__ets", F.col(ts_col).cast("timestamp"))
        # the watermark must see every event's time BEFORE the stage
        # filter, so non-stage traffic still advances it
        .withWatermark("__ets", delay)
        .filter(F.col(type_col).isin(*stages))
        # unlike funnel_stages, null ts/seq rows drop BEFORE grouping
        # here: an event-time operator cannot buffer or ripen a row
        # with no event time (the watermark never passes it). A key
        # whose only events are null-stamped emits nothing — the
        # event-time contract, documented divergence from the
        # in-order twin's key universe.
        .filter(F.col(ts_col).isNotNull() & F.col(seq_col).isNotNull())
        .selectExpr(
            f"CAST({key_col} AS STRING) AS key",
            f"unix_micros(__ets) AS {ts_col}",
            f"CAST({seq_col} AS LONG) AS {seq_col}",
            type_col,
            # the watermarked column itself must survive to the
            # stateful operator or getCurrentWatermarkMs raises
            "__ets",
        )
    )
    state_schema = ", ".join(f"s{i} long" for i in range(n)) + (
        ", buf_ts array<long>, buf_seq array<long>, buf_typ array<string>"
    )
    return filtered.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType="key string, stage long",
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def ewma_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    value_col: str = "value",
    k: int = 8,
    alpha: float = 0.5,
    threshold: float = 150.0,
) -> DataFrame:
    """Streaming twin of ``operators.timeseries.ewma_residual`` + the
    q96 anomaly filter: per-key ring buffer of the K most recent
    values carried across micro-batches; each arriving event scores
    against the finite-window EWMA of its predecessors and is emitted
    iff ``|value - ewma_prev| > threshold``.

    The Python fold accumulates ``num``/``den`` in exactly the batch
    expression's order (most-recent lag first, weights alpha^j), so
    with a power-of-two alpha the streamed residuals are BIT-identical
    to the batch operator on an in-order stream
    (``test_ewma_stream_equals_batch``). NULL-value events are dropped
    before the fold; the batch twin skips them from its lag slots the
    same way (``ewma_residual`` lags over a null-filtered projection),
    so the equivalence holds on null-bearing streams too. Cross-batch
    reordering follows source delivery order — the same
    non-watermarked contract as ``funnel_stages``.

    State: K doubles + a fill count per key — O(K), store-backed.
    Output (update mode): one row per anomalous event in the batch.
    """
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (kk,) = key
        if state.exists:
            raw = list(state.get)
            n = int(raw[-1])
            buf = [float(v) for v in raw[:n]]  # most recent first
        else:
            buf = []
        ids: list[int] = []
        vals: list[float] = []
        ews: list[float] = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True)
            for _, row in batch.sort_values([ts_col, seq_col]).iterrows():
                x = float(row[value_col])
                num = 0.0
                den = 0.0
                for j, v in enumerate(buf):
                    w = alpha**j
                    num = num + v * w
                    den = den + w
                if den > 0.0:
                    ew = num / den
                    if abs(x - ew) > threshold:
                        ids.append(int(row[seq_col]))
                        vals.append(x)
                        ews.append(ew)
                buf = [x] + buf[: k - 1]
        state.update(tuple(buf + [0.0] * (k - len(buf))) + (len(buf),))
        yield pd.DataFrame(
            {
                "key": [kk] * len(ids),
                "seq": ids,
                "value": vals,
                "ewma_prev": ews,
            }
        )

    filtered = (
        events.filter(
            F.col(ts_col).isNotNull()
            & F.col(seq_col).isNotNull()
            & F.col(value_col).isNotNull()
        ).selectExpr(
            f"CAST({key_col} AS STRING) AS key",
            f"unix_micros(CAST({ts_col} AS TIMESTAMP)) AS {ts_col}",
            f"CAST({seq_col} AS LONG) AS {seq_col}",
            f"CAST({value_col} AS DOUBLE) AS {value_col}",
        )
    )
    state_fields = ", ".join(f"v{i} double" for i in range(k))
    return filtered.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType="key string, seq long, value double, "
        "ewma_prev double",
        stateStructType=f"{state_fields}, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
