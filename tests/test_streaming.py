"""Streaming layer tests: CDC events, windowed aggregations, stream ingest."""

import json
import shutil

import pytest
from pyspark.sql import functions as F

from miniodb_spark.engine import Engine
from miniodb_spark.queries import load, normalize_event_ts
from miniodb_spark.streaming.cdc import EventPublisher, InMemorySink
from miniodb_spark.streaming.ingest import stream_ingest
from miniodb_spark.streaming.windows import session, sliding, tumbling

US = 1_000_000
T0 = 1_700_000_000 * US


@pytest.fixture()
def cdc_engine(spark, tmp_path):
    pub = EventPublisher()
    return Engine(spark, str(tmp_path / "store"), event_publisher=pub)


def test_cdc_events_on_mutations(cdc_engine):
    eng = cdc_engine
    eng.write("t", {"v": 1}, record_id="a", timestamp_us=T0)
    eng.flush()
    eng.update("t", "a", {"v": 2}, timestamp_us=T0)
    eng.delete("t", "a")
    sink = eng.events.memory_sink
    types = [e.event_type for e in sink.all_events("t")]
    # update = delete(old) + insert(new) + update marker
    assert types[0] == "insert"
    assert "update" in types and "delete" in types
    assert all(e.table == "t" for e in sink.all_events("t"))


def test_cdc_consumer_group_offsets():
    sink = InMemorySink()
    pub = EventPublisher([sink])
    for i in range(5):
        pub.publish("insert", "t", [f"r{i}"])
    batch = sink.read("g1", "t", max_events=3)
    assert len(batch) == 3
    sink.ack("g1", "t", 3)
    rest = sink.read("g1", "t")
    assert len(rest) == 2 and rest[0].records == ["r3"]
    # a second group sees everything from the start
    assert len(sink.read("g2", "t")) == 5


def test_cdc_rejects_unknown_type():
    with pytest.raises(ValueError):
        EventPublisher().publish("upsert", "t", [])


def _events_df(spark, sf_dir):
    # one shim, one place: queries.load owns fixture-encoding compatibility
    return load(spark, sf_dir, "events")


def test_tumbling_window_batch_semantics(spark, sf_dir):
    ev = _events_df(spark, sf_dir)
    win = tumbling(ev, "ts", "1 hour", aggs=[F.count("*").alias("n")])
    total = win.agg(F.sum("n").alias("s")).first()["s"]
    assert total == ev.count()
    # window starts align to the hour and counts match a date_trunc group-by
    manual = {
        r["h"]: r["n"]
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for row in win.collect():
        assert manual[row["window"]["start"]] == row["n"]


def test_sliding_window_overlap(spark, sf_dir):
    ev = _events_df(spark, sf_dir).limit(500)
    win = sliding(ev, "ts", "2 hours", "1 hour", aggs=[F.count("*").alias("n")])
    # every event lands in exactly 2 overlapping windows
    assert win.agg(F.sum("n").alias("s")).first()["s"] == 2 * 500


def test_session_window_matches_gap_sessionization(spark, sf_dir):
    ev = _events_df(spark, sf_dir)
    sess = session(ev, "ts", "30 minutes", group_cols=["user_id"])
    n_sessions = {
        r["user_id"]: r["n"]
        for r in sess.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    # oracle: lag-based gap sessionization (the batch query in the registry)
    from miniodb_spark.queries import get_registry

    manual = {
        r["user_id"]: r["n_sessions"]
        for r in get_registry()["sessionize_30min"].fn(spark, sf_dir if isinstance(sf_dir, str) else sf_dir).collect()
    }
    assert n_sessions == manual


def test_stream_ingest_foreachbatch(spark, tmp_path, sf_dir):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    eng = Engine(spark, str(tmp_path / "store"), event_publisher=EventPublisher())
    batch_schema = spark.read.parquet(str(src)).schema
    stream = normalize_event_ts(
        spark.readStream.schema(batch_schema).parquet(str(src))
    )
    q = stream_ingest(
        eng, stream, "events_in", ts_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    got = json.loads(eng.query("SELECT count(*) AS n FROM events_in"))[0]["n"]
    assert got == expected
    batches = [e for e in eng.events.memory_sink.all_events("events_in")
               if e.event_type == "batch"]
    assert batches and batches[0].metadata["rows"] == expected

    # restart with same checkpoint: no duplicate ingestion (exactly-once)
    stream2 = normalize_event_ts(
        spark.readStream.schema(batch_schema).parquet(str(src))
    )
    q2 = stream_ingest(
        eng, stream2, "events_in", ts_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    got2 = json.loads(eng.query("SELECT count(*) AS n FROM events_in"))[0]["n"]
    assert got2 == expected


def test_stream_ingest_skips_redelivered_batch_id(spark, tmp_path, sf_dir):
    """A re-delivered batch_id (fresh checkpoint, same stream) must not
    duplicate rows: the catalog's commit registry makes the sink
    idempotent even when Structured Streaming's own checkpoint is lost."""
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    eng = Engine(spark, str(tmp_path / "store"))
    batch_schema = spark.read.parquet(str(src)).schema

    def run(ckpt):
        stream = normalize_event_ts(
            spark.readStream.schema(batch_schema).parquet(str(src))
        )
        q = stream_ingest(eng, stream, "events_replay", ts_col="ts",
                          checkpoint_dir=str(tmp_path / ckpt))
        q.awaitTermination(120)

    run("ckpt_a")
    expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    n1 = json.loads(eng.query("SELECT count(*) AS n FROM events_replay"))[0]["n"]
    assert n1 == expected
    assert eng.catalog.last_committed_batch("ingest:events_replay") == 0
    # lose the checkpoint: the same data re-arrives as batch_id 0 again
    run("ckpt_b")
    n2 = json.loads(eng.query("SELECT count(*) AS n FROM events_replay"))[0]["n"]
    assert n2 == expected


def test_file_sink_durable_replay(tmp_path):
    """The durable CDC sink: offsets survive process restart (simulated
    by constructing fresh FileSink instances over the same root), a
    crashed consumer re-reads unacked events, and a fresh group replays
    from the start — the at-least-once contract the idempotent
    StreamWrite sink absorbs."""
    from miniodb_spark.streaming.cdc import FileSink

    root = str(tmp_path / "cdc")
    pub = EventPublisher([FileSink(root)])
    for i in range(5):
        pub.publish("insert", "t", [f"r{i}"])

    # consumer 1 reads 3, acks 2, then "crashes"
    s1 = FileSink(root)
    got = s1.read("g1", "t", max_events=3)
    assert [e.records for e in got] == [["r0"], ["r1"], ["r2"]]
    s1.ack("g1", "t", 2)

    # restart: a brand-new instance over the same root resumes at the
    # durable offset — r2 is re-delivered (at-least-once), r0/r1 not
    s2 = FileSink(root)
    replay = s2.read("g1", "t")
    assert [e.records for e in replay] == [["r2"], ["r3"], ["r4"]]
    s2.ack("g1", "t", 3)
    assert s2.read("g1", "t") == []

    # a fresh group replays the full log from offset 0
    assert len(FileSink(root).read("g2", "t")) == 5
    # events are intact after all of this
    assert [e.records for e in s2.all_events("t")] == [[f"r{i}"] for i in range(5)]


def test_file_sink_torn_tail_dropped(tmp_path):
    """A torn final line (crash mid-append) must not poison the log:
    events before the tear remain readable, the torn record is dropped
    (its write never completed), and events published after restart are
    NOT merged into the torn line — they stay fully visible."""
    from miniodb_spark.streaming.cdc import FileSink

    root = str(tmp_path / "cdc2")
    sink = FileSink(root)
    pub = EventPublisher([sink])
    pub.publish("insert", "t", ["a"])
    pub.publish("insert", "t", ["b"])
    log = sink._log_path("t")
    with open(log, "a") as fh:
        fh.write('{"event_id": "xx", "trunc')  # torn write
    events = FileSink(root).read("g", "t")
    assert [e.records for e in events] == [["a"], ["b"]]

    # "restart": a fresh sink must repair the tail before appending, so
    # the post-crash event is parseable and delivered
    sink2 = FileSink(root)
    EventPublisher([sink2]).publish("insert", "t", ["c"])
    events = FileSink(root).read("g", "t")
    assert [e.records for e in events] == [["a"], ["b"], ["c"]]


def test_file_sink_engine_integration(spark, tmp_path):
    """Engine mutations land in the durable sink and a consumer can
    replay them after 'restart'."""
    from miniodb_spark.streaming.cdc import FileSink

    root = str(tmp_path / "cdc3")
    eng = Engine(spark, str(tmp_path / "store"),
                 event_publisher=EventPublisher([FileSink(root)]))
    eng.write("t", {"v": 1}, record_id="a", timestamp_us=T0)
    eng.flush()
    eng.delete("t", "a")
    types = [e.event_type for e in FileSink(root).all_events("t")]
    assert "insert" in types and "delete" in types


def test_dedup_stream_bounded_state_across_files(spark, tmp_path, sf_dir):
    """Duplicated source rows (producer retry shape: the same events
    delivered in two files) collapse to one copy through
    dedup_stream, and the dedup state is watermark-bounded."""
    from miniodb_spark.streaming.ingest import dedup_stream

    src = tmp_path / "dup_src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "a.parquet")
    shutil.copy(f"{sf_dir}/events.parquet", src / "b.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    schema = spark.read.parquet(str(src / "a.parquet")).schema
    stream = normalize_event_ts(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    deduped = dedup_stream(stream, keys=("event_id",), ts_col="ts",
                           horizon="10 days")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d "
        "FROM dedup_stream_sink"
    ).first()
    expected = events.select("event_id").distinct().count()
    assert got["d"] == expected
    assert got["n"] == got["d"]  # every survivor unique: dups dropped


def test_stream_upsert_cdc_apply(spark, tmp_path):
    """CDC-apply sink: a file-source change feed with multiple versions
    per key and delete ops lands as latest-version-per-key state; a
    checkpoint restart replays nothing."""
    import datetime

    from miniodb_spark.streaming.ingest import stream_upsert

    t0 = datetime.datetime(2023, 11, 14, tzinfo=datetime.timezone.utc)
    rows = [
        ("k1", 1, t0, "upsert"),
        ("k1", 11, t0 + datetime.timedelta(seconds=1), "upsert"),  # later wins
        ("k2", 2, t0, "upsert"),
        ("k3", 3, t0, "upsert"),
        ("k3", 0, t0 + datetime.timedelta(seconds=2), "delete"),   # deleted
    ]
    schema = "id string, v long, timestamp timestamp, op string"
    src = tmp_path / "cdc"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(src / "batch0"))

    eng = Engine(spark, str(tmp_path / "store"))
    eng.create_table("cdc_t")
    stream = spark.readStream.schema(schema).parquet(str(src / "batch0"))
    q = stream_upsert(eng, stream, "cdc_t", op_col="op",
                      checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {r["id"]: r["v"] for r in
           json.loads(eng.query("SELECT id, v FROM cdc_t ORDER BY id"))}
    assert got == {"k1": 11, "k2": 2}

    # restart on the same checkpoint: nothing re-applied
    stream2 = spark.readStream.schema(schema).parquet(str(src / "batch0"))
    q2 = stream_upsert(eng, stream2, "cdc_t", op_col="op",
                       checkpoint_dir=str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    got2 = {r["id"]: r["v"] for r in
            json.loads(eng.query("SELECT id, v FROM cdc_t ORDER BY id"))}
    assert got2 == got

    # a second feed directory updates k2 and re-creates k3
    rows2 = [("k2", 22, t0 + datetime.timedelta(minutes=1), "upsert"),
             ("k3", 33, t0 + datetime.timedelta(minutes=1), "upsert")]
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(src / "batch0"), mode="append")
    stream3 = spark.readStream.schema(schema).parquet(str(src / "batch0"))
    q3 = stream_upsert(eng, stream3, "cdc_t", op_col="op",
                       checkpoint_dir=str(tmp_path / "ckpt"))
    q3.awaitTermination(120)
    got3 = {r["id"]: r["v"] for r in
            json.loads(eng.query("SELECT id, v FROM cdc_t ORDER BY id"))}
    assert got3 == {"k1": 11, "k2": 22, "k3": 33}


def test_stream_upsert_null_op_rows_are_upserts(spark, tmp_path):
    """A CDC row with a NULL op must not vanish: under three-valued
    logic `op != 'delete'` is NULL (filtered out), so a plain filter
    would neither upsert nor delete malformed feed rows. The null-safe
    complement treats them as upserts (the reference's default op)."""
    import datetime

    from miniodb_spark.streaming.ingest import stream_upsert

    t0 = datetime.datetime(2023, 11, 14, tzinfo=datetime.timezone.utc)
    rows = [
        ("k1", 1, t0, "upsert"),
        ("k2", 2, t0, None),            # malformed feed row: NULL op
        ("k3", 3, t0, "delete"),
    ]
    schema = "id string, v long, timestamp timestamp, op string"
    src = tmp_path / "cdc"
    src.mkdir()
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(src / "b0"))

    eng = Engine(spark, str(tmp_path / "store"))
    eng.create_table("cdc_null")
    stream = spark.readStream.schema(schema).parquet(str(src / "b0"))
    q = stream_upsert(eng, stream, "cdc_null", op_col="op",
                      checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = {r["id"]: r["v"] for r in
           json.loads(eng.query("SELECT id, v FROM cdc_null ORDER BY id"))}
    assert got == {"k1": 1, "k2": 2}, got


def _rollup_env(spark, tmp_path):
    import datetime

    from miniodb_spark.engine import Engine

    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    mk = lambda h, m, typ, v: (t0 + datetime.timedelta(hours=h, minutes=m),
                               typ, float(v))
    schema = "ts timestamp, event_type string, value double"
    src = tmp_path / "roll_src"
    src.mkdir()
    eng = Engine(spark, str(tmp_path / "roll_store"))
    eng.create_table("agg_hourly")
    return eng, src, schema, mk


def _run_rollup(spark, eng, src, schema, ckpt):
    from miniodb_spark.streaming.rollup import continuous_rollup

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = continuous_rollup(eng, stream, "agg_hourly", ts_col="ts",
                          value_col="value", window="1 hour",
                          key_cols=("event_type",),
                          checkpoint_dir=str(ckpt))
    q.awaitTermination(180)


def test_continuous_rollup_matches_batch_recompute(spark, tmp_path):
    """Hypertable-style continuous aggregate: after several micro-
    batches (including late data for an already-finalized window), the
    rollup table equals a from-scratch batch aggregation of everything
    ingested, and a checkpoint replay adds nothing."""
    from miniodb_spark.streaming.rollup import read_rollup

    eng, src, schema, mk = _rollup_env(spark, tmp_path)
    b0 = [mk(0, 5, "click", 10), mk(0, 25, "click", 20), mk(0, 45, "view", 5),
          mk(1, 10, "click", 7)]
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append") \
        .parquet(str(src))
    _run_rollup(spark, eng, src, schema, tmp_path / "ck")

    # batch 2: new window PLUS late data into hour 0 (click)
    b1 = [mk(2, 0, "view", 3), mk(0, 59, "click", 40)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append") \
        .parquet(str(src))
    _run_rollup(spark, eng, src, schema, tmp_path / "ck")

    got = {
        (r["window_start"].hour, r["event_type"]):
            (r["n"], r["value_sum"], r["value_min"], r["value_max"],
             r["value_avg"])
        for r in read_rollup(eng, "agg_hourly").collect()
    }
    everything = spark.createDataFrame(b0 + b1, schema)
    want = {
        (r["h"], r["event_type"]):
            (r["n"], r["s"], r["lo"], r["hi"], r["s"] / r["n"])
        for r in everything.groupBy(
            F.hour("ts").alias("h"), "event_type").agg(
            F.count("*").alias("n"), F.sum("value").alias("s"),
            F.min("value").alias("lo"), F.max("value").alias("hi"),
        ).collect()
    }
    assert got == want, (got, want)
    # the late click merged ADDITIVELY into hour 0: 3 events, max 40
    assert got[(0, "click")][0] == 3 and got[(0, "click")][3] == 40.0

    # replay on the same checkpoint: nothing double-counted
    _run_rollup(spark, eng, src, schema, tmp_path / "ck")
    got2 = {(r["window_start"].hour, r["event_type"]): r["n"]
            for r in read_rollup(eng, "agg_hourly").collect()}
    assert got2 == {k: v[0] for k, v in got.items()}


def test_continuous_rollup_touches_only_batch_windows(spark, tmp_path):
    """Maintenance cost contract: a batch containing only hour-5 rows
    must not rewrite hour-0's rollup rows — untouched generations'
    files survive byte-for-byte (CoW rewrites only claimed partitions)."""
    import glob
    import os

    eng, src, schema, mk = _rollup_env(spark, tmp_path)
    spark.createDataFrame([mk(0, 5, "click", 10)], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    _run_rollup(spark, eng, src, schema, tmp_path / "ck")

    store = str(tmp_path / "roll_store" / "agg_hourly")
    before = {p: os.path.getmtime(p)
              for p in glob.glob(f"{store}/**/*.parquet", recursive=True)}
    assert before, "rollup table must have parquet files"

    spark.createDataFrame([mk(5, 1, "view", 2)], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))
    _run_rollup(spark, eng, src, schema, tmp_path / "ck")

    # hour-0's physical file still present and unmodified (merge_upsert
    # only sweeps partitions containing the batch's ids; hour 5 has a
    # different dt-partition id set)
    surviving = [p for p in before if os.path.exists(p)]
    assert any(os.path.getmtime(p) == before[p] for p in surviving), (
        "a single-window batch rewrote every rollup partition")


def test_continuous_rollup_null_key_accumulates(spark, tmp_path):
    """ADVICE r11: rollup_id_col maps a NULL key to the '\\N' sentinel,
    so two batches of NULL-keyed rows share one rollup row id — the
    merge semi-join must therefore be NULL-SAFE, or the second batch
    OVERWRITES the first batch's accumulated n/sum/min/max instead of
    adding to it."""
    from miniodb_spark.streaming.rollup import read_rollup

    eng, src, schema, mk = _rollup_env(spark, tmp_path)
    b0 = [mk(0, 5, None, 10), mk(0, 25, None, 20), mk(0, 45, "view", 5)]
    spark.createDataFrame(b0, schema).coalesce(1).write.mode("append") \
        .parquet(str(src))
    _run_rollup(spark, eng, src, schema, tmp_path / "ckn")

    # second batch: MORE NULL-keyed rows into the SAME hour-0 window
    b1 = [mk(0, 50, None, 40)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append") \
        .parquet(str(src))
    _run_rollup(spark, eng, src, schema, tmp_path / "ckn")

    got = {
        r["event_type"]: (r["n"], r["value_sum"], r["value_min"],
                          r["value_max"])
        for r in read_rollup(eng, "agg_hourly").collect()
    }
    # null bucket accumulated across batches: 3 rows, sum 70, max 40
    assert got[None] == (3, 70.0, 10.0, 40.0), got
    assert got["view"] == (1, 5.0, 5.0, 5.0), got
