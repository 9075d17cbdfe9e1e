"""Streaming layer.

The reference's "streaming" is transport-level (StreamWrite batching,
StreamQuery pagination, CDC events to Redis Streams/Kafka — SURVEY
§2.11); it has no stream-relational algebra. Here:

- ingest.py   — Structured Streaming ingestion into the engine's
                parquet layout (foreachBatch → same flush sink)
- cdc.py      — DataEvent publication (insert/update/delete/batch)
                with pluggable sinks (in-memory, Kafka)
- windows.py  — the capability upgrades the reference lacks:
                watermarked tumbling/sliding/session windows
- stateful.py — applyInPandasWithState / transformWithState custom
                operators (streaming dedup, running counters, heavy
                hitters, timer-driven session finalization)
- rollup.py   — continuous aggregate (hypertable-style rollup):
                persisted time-bucketed mergeable aggregates updated
                additively per micro-batch, late-data-correct,
                replay-idempotent
"""
