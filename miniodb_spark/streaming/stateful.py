"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful stream processing at all (SURVEY §2.11);
these are the capability-upgrade operators a CDC/ingest pipeline needs:

- **streaming dedup**: drop records whose key was already seen in any
  earlier micro-batch (state = one flag per key, with an optional TTL
  so state doesn't grow unboundedly — the 100 TB concern);
- **running counters**: per-key running count/sum maintained across
  batches, emitting the updated value each batch.

State is partitioned by key across executors by the streaming engine;
each group's state is a few scalars, so state size is O(distinct keys)
regardless of stream length (and bounded by the TTL for dedup).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(df: DataFrame, key_col: str, ttl_minutes: int | None = None) -> DataFrame:
    """Exactly-one-output-per-key across micro-batches. Output schema ==
    input schema. With ``ttl_minutes``, a key's state expires after
    inactivity (late re-occurrences then pass again — the standard
    bounded-state trade-off)."""
    out_schema = df.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )

    def _dedup(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        if not seen:
            first = None
            for pdf in pdfs:
                if len(pdf):
                    first = pdf.iloc[[0]]
                    break
            state.update((True,))
            if ttl_minutes:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            if first is not None:
                yield first
        else:
            for _ in pdfs:  # drain
                pass
            if ttl_minutes:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)

    return df.groupBy(key_col).applyInPandasWithState(
        _dedup,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )


def running_counter_stream(
    df: DataFrame, key_col: str, value_col: str | None = None
) -> DataFrame:
    """Per-key running count (and sum of ``value_col`` if given),
    emitting the updated totals once per key per micro-batch."""
    out_schema = f"{key_col} long, n long, total double"

    def _count(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            if value_col:
                total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key_col: [key[0]], "n": [n], "total": [total]})

    return df.groupBy(key_col).applyInPandasWithState(
        _count,
        outputStructType=out_schema,
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_stream(
    df: DataFrame, shard_col: str, value_col: str, k: int = 32
) -> DataFrame:
    """Streaming heavy hitters: one Misra-Gries summary per shard,
    maintained across micro-batches in the state store and emitted
    (value, lower-bound count, decrements, total) each update — the
    streaming face of the batch sketch registry. Shard summaries are
    MERGEABLE (sketches.MisraGries.merge), so a downstream batch job
    folds the per-shard outputs into corpus-wide top-k.

    State per shard = one k-entry summary regardless of stream length —
    the bounded-state property that makes top-k over an unbounded
    stream feasible at all (exact per-value counters grow with
    distinct-value cardinality; MG does not)."""
    shard_type = df.schema[shard_col].dataType.simpleString()
    out_schema = (
        f"{shard_col} {shard_type}, value string, lower_bound long, "
        "decrements long, total long"
    )

    def _hh(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from ..sketches import MisraGries

        mg = (
            MisraGries.from_bytes(bytes(state.get[0]))
            if state.exists
            else MisraGries(k)
        )
        for pdf in pdfs:
            # skip nulls like the batch builders (isNotNull filter);
            # astype(str) would otherwise tally "None"/"nan" as values
            vals = pdf[value_col]
            vc = vals[vals.notna()].astype(str).value_counts()
            mg.add_values(vc.index.tolist(), vc.to_numpy())
        state.update((mg.to_bytes(),))
        items = sorted(mg.counters.items(), key=lambda kv: (-kv[1], kv[0]))
        yield pd.DataFrame(
            {
                shard_col: [key[0]] * len(items),
                "value": [v for v, _ in items],
                "lower_bound": [int(c) for _, c in items],
                "decrements": [mg.decrements] * len(items),
                "total": [mg.total] * len(items),
            }
        )

    return df.groupBy(shard_col).applyInPandasWithState(
        _hh,
        outputStructType=out_schema,
        stateStructType="sketch binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
)


class _SessionFinalizer(StatefulProcessor):
    """StatefulProcessor for :func:`session_finalize_stream` — kept
    module-level so Spark can pickle it to executors."""

    def __init__(self, key_col: str, ts_col: str, gap_ms: int):
        self.key_col = key_col
        self.ts_col = ts_col
        self.gap_ms = gap_ms

    def init(self, handle) -> None:
        self._handle = handle
        self._state = handle.getValueState(
            "session", "start_ms long, last_ms long, n long")

    def close(self) -> None:
        pass

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def _emit(self, key, start_ms, last_ms, n, via):
        return pd.DataFrame(
            {
                self.key_col: [key[0]],
                "start_ms": [int(start_ms)],
                "end_ms": [int(last_ms)],
                "n_events": [int(n)],
                "via": [via],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        cur = self._state.get() if self._state.exists() else None
        out = []
        ts = []
        for pdf in rows:
            ts.extend(int(v) for v in pdf[self.ts_col])
        ts.sort()
        for t in ts:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] > self.gap_ms:
                out.append(self._emit(key, *cur, "gap"))
                cur = (t, t, 1)
            else:
                # min() on start: a cross-batch late event older than the
                # open session's start merges in (its lateness is within
                # the gap of last_ms), and the emitted session start must
                # be min(ts) over everything merged, not first-seen
                cur = (min(cur[0], t), max(cur[1], t), cur[2] + 1)
        if cur is not None:
            self._state.update(cur)
            # one flush timer per key, re-armed at every input batch for
            # the key — DELIBERATELY even when the batch only carried
            # late (already-absorbed-range) timestamps: any arrival is
            # processing-time activity, and the idle flush measures
            # silence in processing time, not event time. The timer is
            # a liveness bound, not the session boundary — event-time
            # gaps still close sessions exactly via the branch above.
            for old in self._handle.listTimers():
                self._handle.deleteTimer(old)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + self.gap_ms)
        for pdf in out:
            yield pdf

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self._state.exists():
            cur = self._state.get()
            self._state.clear()
            yield self._emit(key, *cur, "timer")


def session_finalize_stream(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Timer-driven session finalization on Spark 4's
    ``transformWithStateInPandas`` (the successor API to
    ``applyInPandasWithState``): per-key sessions close EITHER when a
    later event arrives beyond the inactivity gap (input-driven, exact
    event-time boundaries) OR when the per-key processing-time timer
    fires with no further input — the idle-flush the old API cannot
    express, because it only runs user code when input (or a state
    timeout, without emit-on-expiry row access) arrives for the key.
    Emits one row per completed session ``(key, start_ms, end_ms,
    n_events, via)`` with ``via`` recording which path closed it.
    State per key = three longs + one timer, so state size is
    O(active keys) regardless of stream length.

    Runtime requirements (both environment-gated in the tests, which
    auto-unskip when present): ``google.protobuf`` — the
    transformWithState python<->JVM state protocol uses it — and, on
    some builds, the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass``)."""
    gap_ms = int(gap_minutes * 60 * 1000)
    out_schema = f"{key_col} long, start_ms long, end_ms long, n_events long, via string"
    return df.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_SessionFinalizer(key_col, ts_col, gap_ms),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="processingTime",
    )
