"""CDC event publication.

Parity target: the reference's subscription system
(/root/reference/internal/subscription/event.go:11-58, 204-217;
redis_subscriber.go; kafka_subscriber.go) — insert/update/delete/batch
events published per table, with the DataEvent shape
``{event_id, event_type, table, timestamp, records[], metadata}``.

The publisher is pluggable: InMemorySink for tests / single process,
KafkaSink wraps a Structured Streaming ``writeStream.format("kafka")``
or a direct producer when available. Topic naming matches the
reference: ``<prefix><table>`` (kafka_subscriber.go:331-470).
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Any

EVENT_TYPES = ("insert", "update", "delete", "batch")


@dataclass
class DataEvent:
    event_id: str
    event_type: str
    table: str
    timestamp_us: int
    records: list[str]  # record ids
    metadata: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(asdict(self), separators=(",", ":"))


class InMemorySink:
    """Per-table event log with consumer offsets — the test double for
    Redis Streams / Kafka."""

    def __init__(self):
        self._events: dict[str, list[DataEvent]] = {}
        self._offsets: dict[tuple[str, str], int] = {}  # (group, table) -> offset
        self._lock = threading.Lock()

    def publish(self, event: DataEvent) -> None:
        with self._lock:
            self._events.setdefault(event.table, []).append(event)

    def read(self, group: str, table: str, max_events: int = 100) -> list[DataEvent]:
        """Consumer-group read: returns unacked events past the group's
        offset (XREADGROUP semantics, redis_subscriber.go:160-241)."""
        with self._lock:
            offset = self._offsets.get((group, table), 0)
            return self._events.get(table, [])[offset : offset + max_events]

    def ack(self, group: str, table: str, n: int) -> None:
        with self._lock:
            self._offsets[(group, table)] = self._offsets.get((group, table), 0) + n

    def all_events(self, table: str) -> list[DataEvent]:
        with self._lock:
            return list(self._events.get(table, []))


class FileSink:
    """Durable per-table event log on disk (NDJSON segments) with
    persisted consumer-group offsets — proves the replay semantics the
    external sinks (Kafka topics / Redis Streams) provide in a real
    deployment, in an environment where neither broker exists.

    Layout under ``root``::

        <table>.events.ndjson     append-only event log (fsync'd)
        _offsets.json             {group|table: offset}, atomic replace

    Delivery contract (mirrors redis_subscriber.go XREADGROUP/XACK):
    ``read`` returns events past the group's *durable* offset; ``ack``
    persists the new offset. A consumer that crashes between read and
    ack re-reads the same events on restart (at-least-once) — which is
    exactly what the engine's idempotent StreamWrite sink is built to
    absorb; a fresh group replays the log from offset 0.
    """

    def __init__(self, root: str, sync: bool = True):
        self.root = root
        self.sync = sync
        os.makedirs(root, exist_ok=True)
        self._lock = threading.Lock()
        self._offsets_path = os.path.join(root, "_offsets.json")
        self._repaired: set[str] = set()

    def _log_path(self, table: str) -> str:
        safe = "".join(c if c.isalnum() or c in "_-" else "_" for c in table)
        return os.path.join(self.root, f"{safe}.events.ndjson")

    def _repair_tail(self, path: str) -> None:
        """A crash mid-append can leave a final line without its
        newline. The next publish must NOT continue that line — the
        merged line would be unparseable and _events()'s stop-at-tear
        would hide every later event forever. Terminate the torn line
        once per (process, table); the torn record itself is dropped by
        the parser, which is the correct at-least-once outcome for an
        event whose write never completed."""
        try:
            with open(path, "rb") as fh:
                fh.seek(-1, os.SEEK_END)
                last = fh.read(1)
            if last != b"\n":
                with open(path, "ab") as fh:
                    fh.write(b"\n")
        except OSError:
            pass  # no file yet / empty file

    def publish(self, event: DataEvent) -> None:
        line = event.to_json() + "\n"
        with self._lock:
            path = self._log_path(event.table)
            if path not in self._repaired:
                self._repair_tail(path)
                self._repaired.add(path)
            with open(path, "a", encoding="utf-8") as fh:
                fh.write(line)
                fh.flush()
                if self.sync:
                    os.fsync(fh.fileno())

    def _load_offsets(self) -> dict[str, int]:
        try:
            with open(self._offsets_path, encoding="utf-8") as fh:
                return json.load(fh)
        except (OSError, json.JSONDecodeError):
            return {}

    def _events(self, table: str) -> list[DataEvent]:
        try:
            with open(self._log_path(table), encoding="utf-8") as fh:
                out = []
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    try:
                        out.append(DataEvent(**json.loads(line)))
                    except (json.JSONDecodeError, TypeError):
                        # a torn record terminated by _repair_tail: the
                        # write never completed, so dropping it is the
                        # correct at-least-once outcome; later complete
                        # lines must still be delivered
                        continue
                return out
        except OSError:
            return []

    def read(self, group: str, table: str, max_events: int = 100) -> list[DataEvent]:
        with self._lock:
            offset = self._load_offsets().get(f"{group}|{table}", 0)
            return self._events(table)[offset : offset + max_events]

    def ack(self, group: str, table: str, n: int) -> None:
        with self._lock:
            offsets = self._load_offsets()
            key = f"{group}|{table}"
            offsets[key] = offsets.get(key, 0) + n
            tmp = f"{self._offsets_path}.tmp.{os.getpid()}"
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump(offsets, fh)
            os.replace(tmp, self._offsets_path)

    def all_events(self, table: str) -> list[DataEvent]:
        with self._lock:
            return self._events(table)


class KafkaSink:
    """Kafka publication via Spark's kafka sink. Gated on the package
    being present; topic = <prefix><table>."""

    def __init__(self, spark, bootstrap_servers: str, topic_prefix: str = "miniodb-cdc-"):
        self.spark = spark
        self.servers = bootstrap_servers
        self.prefix = topic_prefix

    def publish(self, event: DataEvent) -> None:
        df = self.spark.createDataFrame(
            [(event.table, event.to_json())], "key string, value string"
        )
        (
            df.write.format("kafka")
            .option("kafka.bootstrap.servers", self.servers)
            .option("topic", f"{self.prefix}{event.table}")
            .save()
        )


class EventPublisher:
    """The engine-facing facade: builds DataEvents and fans out to sinks."""

    def __init__(self, sinks: list | None = None):
        self.sinks = sinks if sinks is not None else [InMemorySink()]

    @property
    def memory_sink(self) -> InMemorySink | None:
        for s in self.sinks:
            if isinstance(s, InMemorySink):
                return s
        return None

    def publish(
        self,
        event_type: str,
        table: str,
        record_ids: list[str],
        metadata: dict | None = None,
    ) -> DataEvent:
        if event_type not in EVENT_TYPES:
            raise ValueError(f"unknown event type: {event_type}")
        event = DataEvent(
            event_id=uuid.uuid4().hex,
            event_type=event_type,
            table=table,
            timestamp_us=int(time.time() * 1_000_000),
            records=list(record_ids),
            metadata=metadata or {},
        )
        for sink in self.sinks:
            sink.publish(event)
        return event
