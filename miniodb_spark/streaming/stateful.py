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
