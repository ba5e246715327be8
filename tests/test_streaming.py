"""Structured Streaming extension tests: file-source streams driven with
availableNow triggers into memory sinks."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from onetl_spark.file.format import JSONLine
from onetl_spark.streaming import (
    StreamDFReader,
    StreamDFWriter,
    StreamWriteOptions,
    deduplicate_stream,
    sessionize,
    stateful_running_agg,
    windowed_aggregate,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("user", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ],
)


@pytest.fixture()
def stream_dir(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    rows = [
        (1, "u1", "2026-01-01 10:00:00", 1.0),
        (2, "u1", "2026-01-01 10:02:00", 2.0),
        (3, "u2", "2026-01-01 10:00:30", 5.0),
        (2, "u1", "2026-01-01 10:02:00", 2.0),   # duplicate id
        (4, "u1", "2026-01-01 10:30:00", 4.0),   # new session for u1
    ]
    df = spark.createDataFrame(
        [(i, u, t, v) for i, u, t, v in rows], "id long, user string, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").json(str(src))
    return str(src)


def run_to_memory(spark, df, name, tmp_path, output_mode="append"):
    writer = StreamDFWriter(
        format="memory",
        options=StreamWriteOptions(
            output_mode=output_mode,
            checkpoint_location=str(tmp_path / f"ckpt-{name}"),
            trigger={"availableNow": True},
            query_name=name,
        ),
    )
    query = writer.run(df)
    query.awaitTermination(120)
    return spark.table(name)


def test_stream_read_and_windowed_aggregate(spark, stream_dir, tmp_path):
    stream = StreamDFReader(spark, JSONLine(), stream_dir, SCHEMA).run()
    assert stream.isStreaming
    agg = windowed_aggregate(
        stream,
        time_col="ts",
        window_duration="10 minutes",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
        group_by=["user"],
        watermark="1 minute",
    )
    out = run_to_memory(spark, agg, "win_agg", tmp_path)
    rows = {(r["user"], str(r["window_start"])): (r["n"], r["total"]) for r in out.collect()}
    assert rows[("u1", "2026-01-01 10:00:00")] == (3, 5.0)
    assert rows[("u2", "2026-01-01 10:00:00")] == (1, 5.0)
    # the 10:30 window is NOT finalized: watermark = max_ts - 1min < window
    # end, so append mode correctly withholds it until later data arrives
    assert ("u1", "2026-01-01 10:30:00") not in rows


def test_stream_dedup(spark, stream_dir, tmp_path):
    stream = StreamDFReader(spark, JSONLine(), stream_dir, SCHEMA).run()
    deduped = deduplicate_stream(stream, keys=["id"], time_col="ts", watermark="1 hour")
    out = run_to_memory(spark, deduped, "dedup", tmp_path)
    ids = sorted(r["id"] for r in out.collect())
    assert ids == [1, 2, 3, 4]


def test_sessionize(spark, stream_dir, tmp_path):
    stream = StreamDFReader(spark, JSONLine(), stream_dir, SCHEMA).run()
    sessions = sessionize(
        stream,
        time_col="ts",
        gap="5 minutes",
        aggs={"n_events": F.count(F.lit(1))},
        group_by=["user"],
        watermark="1 minute",
    )
    out = run_to_memory(spark, sessions, "sessions", tmp_path)
    rows = sorted((r["user"], r["n_events"]) for r in out.collect())
    # u1: 10:00/10:02 (+dup) form one closed session; the 10:30 session is
    # still open at the final watermark (10:29) so it is correctly withheld
    assert rows == [("u1", 3), ("u2", 1)]


def test_stateful_running_agg(spark, stream_dir, tmp_path):
    stream = StreamDFReader(spark, JSONLine(), stream_dir, SCHEMA).run()
    running = stateful_running_agg(stream, key_cols=["user"], value_col="value")
    out = run_to_memory(spark, running, "running", tmp_path, output_mode="update")
    rows = {r["user"]: (r["running_count"], r["running_sum"]) for r in out.collect()}
    assert rows["u1"] == (4, 9.0)
    assert rows["u2"] == (1, 5.0)


def test_file_sink_roundtrip(spark, stream_dir, tmp_path):
    stream = StreamDFReader(spark, JSONLine(), stream_dir, SCHEMA).run()
    target = str(tmp_path / "out")
    from onetl_spark.file.format import Parquet

    writer = StreamDFWriter(
        format=Parquet(),
        target_path=target,
        options=StreamWriteOptions(
            checkpoint_location=str(tmp_path / "ckpt-sink"),
            trigger={"availableNow": True},
        ),
    )
    query = writer.run(stream)
    query.awaitTermination(120)
    assert spark.read.parquet(target).count() == 5


def test_writer_rejects_batch_df(spark):
    with pytest.raises(ValueError):
        StreamDFWriter(format="memory").run(spark.range(3))


def test_kafka_stream_reader_from_hwm_offsets():
    """Batch→stream handoff: saved KeyValueIntHWM offsets become the
    stream's startingOffsets JSON (unseen partitions start at 0), and the
    YAML-store round-trip keeps partition keys int."""
    import json

    from onetl_spark.hwm.types import KeyValueIntHWM
    from onetl_spark.streaming.reader import KafkaStreamReader

    hwm = KeyValueIntHWM(name="t_hwm", entity="events")
    hwm.update({0: 100, 2: 50})
    reader = KafkaStreamReader.from_hwm(
        connection=None, topic="events", hwm=hwm, partitions=[0, 1, 2],
    )
    rendered = json.loads(reader.starting_offsets)
    assert rendered == {"events": {"0": 100, "1": 0, "2": 50}}

    # after a store round-trip (keys stringified on disk) the result is identical
    from onetl_spark.hwm.types import HWM

    restored = HWM.deserialize(hwm.serialize())
    reader2 = KafkaStreamReader.from_hwm(
        connection=None, topic="events", hwm=restored, partitions=[0, 1, 2],
    )
    assert json.loads(reader2.starting_offsets) == rendered


class TestForeachBatchSink:
    def _events_files(self, spark, tmp_path, n_files=3):
        src = str(tmp_path / "src")
        for i in range(n_files):
            spark.range(i * 10, (i + 1) * 10).selectExpr(
                "id", "id * 2 AS v",
            ).coalesce(1).write.mode("append").parquet(src)
        return src

    def test_foreach_batch_receives_all_rows(self, spark, tmp_path):
        from onetl_spark.streaming.writer import StreamDFWriter, StreamWriteOptions

        src = self._events_files(spark, tmp_path)
        out = str(tmp_path / "out")

        def sink(df, batch_id):
            df.write.mode("append").parquet(out)

        stream = spark.readStream.schema("id LONG, v LONG").parquet(src)
        q = StreamDFWriter(
            foreach_batch=sink,
            options=StreamWriteOptions(
                trigger={"availableNow": True},
                checkpoint_location=str(tmp_path / "ckpt"),
            ),
        ).run(stream)
        q.awaitTermination()
        got = spark.read.parquet(out)
        assert got.count() == 30
        assert got.agg({"v": "sum"}).collect()[0][0] == 2 * sum(range(30))

    def test_idempotent_sink_skips_replayed_epoch(self, spark, tmp_path):
        from onetl_spark.streaming.ops import idempotent_batch_sink

        calls = []

        def sink(df, batch_id):
            calls.append((batch_id, df.count()))

        wrapped = idempotent_batch_sink(sink, str(tmp_path / "ledger"))
        df = spark.range(5)
        wrapped(df, 0)
        wrapped(df, 1)
        wrapped(df, 0)  # replay after simulated crash — must be a no-op
        assert calls == [(0, 5), (1, 5)]

    def test_idempotent_sink_no_marker_on_failure(self, spark, tmp_path):
        import os

        from onetl_spark.streaming.ops import idempotent_batch_sink

        ledger = str(tmp_path / "ledger2")
        attempts = []

        def flaky(df, batch_id):
            attempts.append(batch_id)
            if len(attempts) == 1:
                raise RuntimeError("sink outage")

        wrapped = idempotent_batch_sink(flaky, ledger)
        with pytest.raises(RuntimeError):
            wrapped(spark.range(3), 7)
        assert not os.listdir(ledger)  # failed epoch left uncommitted
        wrapped(spark.range(3), 7)  # replay succeeds and commits
        assert attempts == [7, 7]
        assert os.path.exists(os.path.join(ledger, "epoch-7.committed"))

    def test_idempotent_sink_through_streaming_query(self, spark, tmp_path):
        from onetl_spark.streaming.ops import idempotent_batch_sink
        from onetl_spark.streaming.writer import StreamDFWriter, StreamWriteOptions

        src = self._events_files(spark, tmp_path)
        out = str(tmp_path / "out2")

        def sink(df, batch_id):
            df.write.mode("append").parquet(out)

        wrapped = idempotent_batch_sink(sink, str(tmp_path / "ledger3"))
        stream = spark.readStream.schema("id LONG, v LONG").parquet(src)

        def run_once():
            q = StreamDFWriter(
                foreach_batch=wrapped,
                options=StreamWriteOptions(
                    trigger={"availableNow": True},
                    checkpoint_location=str(tmp_path / "ckpt2"),
                ),
            ).run(stream)
            q.awaitTermination()

        run_once()
        run_once()  # second run: checkpoint says everything is consumed
        assert spark.read.parquet(out).count() == 30  # no duplicates


def test_streaming_cdc_apply_batch_split_invariant(spark, tmp_path):
    """Latest-wins CDC merge must produce the same final state whether the
    changelog arrives as one micro-batch or one file per micro-batch."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from onetl_spark.file.format.parquet import Parquet
    from onetl_spark.operators.cdc import cdc_latest_snapshot
    from onetl_spark.streaming.ops import idempotent_batch_sink
    from onetl_spark.streaming.reader import StreamDFReader
    from onetl_spark.streaming.writer import StreamDFWriter, StreamWriteOptions

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("v", T.StringType()),
        ]
    )
    src = tmp_path / "src"
    batches = [
        [(1, 10, 0, "I", "a"), (2, 10, 0, "I", "b")],
        [(1, 20, 0, "U", "a2"), (3, 10, 0, "I", "c")],
        [(2, 30, 0, "D", None), (1, 20, 1, "U", "a3")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"b{i}")
        )
    # flatten: file stream wants one dir of files
    flat = tmp_path / "flat"
    flat.mkdir()
    n = 0
    for i in range(len(batches)):
        for f in (src / f"b{i}").glob("*.parquet"):
            os.link(f, flat / f"{i:02d}_{n}.parquet")
            n += 1

    stream = StreamDFReader(
        spark=spark,
        format=Parquet(),
        source_path=str(flat),
        df_schema=schema,
        options={"maxFilesPerTrigger": "1"},
    ).run()

    target = str(tmp_path / "target")
    staging = str(tmp_path / "staging")
    seen_batches = []

    def merge(batch_df, batch_id):
        seen_batches.append(batch_id)
        state = batch_df
        if os.path.exists(target):
            state = spark.read.parquet(target).unionByName(batch_df)
        snap = cdc_latest_snapshot(state, ["k"], ["ts", "seq"])
        snap.write.mode("overwrite").parquet(staging)
        import shutil

        shutil.rmtree(target, ignore_errors=True)
        os.replace(staging, target)

    q = StreamDFWriter(
        foreach_batch=idempotent_batch_sink(merge, str(tmp_path / "ledger")),
        options=StreamWriteOptions(
            output_mode="append",
            trigger={"availableNow": True},
            checkpoint_location=str(tmp_path / "ckpt"),
        ),
    ).run(stream)
    q.awaitTermination()

    assert len(seen_batches) >= 2  # genuinely exercised multi-batch merging
    final = spark.read.parquet(target).filter("op <> 'D'")
    got = {r["k"]: r["v"] for r in final.collect()}
    # reference: single-shot CDC over the whole changelog
    whole = spark.createDataFrame([r for b in batches for r in b], schema)
    want = {
        r["k"]: r["v"]
        for r in cdc_latest_snapshot(whole, ["k"], ["ts", "seq"], op_col="op", delete_ops=("D",)).collect()
    }
    assert got == want == {1: "a3", 3: "c"}


def test_watermark_drops_late_rows_across_microbatches(spark, tmp_path):
    """The core watermark semantic, over four REAL micro-batches
    (maxFilesPerTrigger=1): a row arriving after the watermark has passed
    its window must be DROPPED (numRowsDroppedByWatermark), the finalized
    window must exclude it, and no duplicate window row may be emitted.

    Timing note this test pins: Spark's late-data filter uses the
    watermark computed through the PREVIOUS batch, and eviction merges
    the current batch's rows first — so a late row landing in the same
    batch that finalizes its window is still included; only rows arriving
    in later batches are dropped. Hence the spacer batches."""
    from onetl_spark.streaming.writer import StreamDFWriter, StreamWriteOptions

    src = tmp_path / "late-src"
    src.mkdir()

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            rows, "id long, user string, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        d = tmp_path / f"stage-{name}"
        df.coalesce(1).write.mode("overwrite").json(str(d))
        part = next(p for p in d.glob("part-*.json"))
        target = src / f"{name}.json"
        os.link(part, target)
        os.utime(target, (mtime, mtime))

    write_file("00", [(1, "u1", "2026-01-01 10:00:00", 1.0),
                      (2, "u1", "2026-01-01 10:20:00", 2.0)], 1_000_000_000)
    # advances the watermark to 11:29 (past the 10:00-11:00 window)...
    write_file("01", [(3, "u1", "2026-01-01 11:30:00", 7.0)], 1_000_000_100)
    # ...which takes effect here; the 10:00 window is finalized with n=2
    write_file("02", [(5, "u1", "2026-01-01 12:30:00", 9.0)], 1_000_000_200)
    # late row for the long-closed window: must be dropped
    write_file("03", [(4, "u1", "2026-01-01 10:10:00", 100.0)], 1_000_000_300)

    stream = StreamDFReader(
        spark=spark,
        format=JSONLine(),
        source_path=str(src),
        df_schema=SCHEMA,
        options={"maxFilesPerTrigger": "1", "latestFirst": "false"},
    ).run()
    agg = windowed_aggregate(
        stream,
        time_col="ts",
        window_duration="1 hour",
        watermark="1 minute",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
    )
    query = StreamDFWriter(
        format="memory",
        options=StreamWriteOptions(
            output_mode="append",
            checkpoint_location=str(tmp_path / "ckpt-late"),
            trigger={"availableNow": True},
            query_name="late_drop_sink",
        ),
    ).run(agg)
    query.awaitTermination(180)

    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in query.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1

    out = spark.table("late_drop_sink").collect()
    by_start = {}
    for r in out:
        by_start.setdefault(r["window_start"].isoformat(), []).append(r)
    # exactly ONE row for the 10:00 window (no late re-emission), late row excluded
    ten = by_start["2026-01-01T10:00:00"]
    assert len(ten) == 1
    assert ten[0]["n"] == 2 and ten[0]["total"] == 3.0


def test_session_merge_across_microbatches(spark, tmp_path):
    """Session windows must MERGE across micro-batches: activity arriving
    in a later batch within the gap extends the open session (one merged
    row, not two), while a quiet user's session closes at the watermark
    and is emitted once. Needs real multi-batch execution — a single
    AvailableNow batch can't exercise the session-state merge."""
    from onetl_spark.streaming.writer import StreamDFWriter, StreamWriteOptions

    src = tmp_path / "sess-src"
    src.mkdir()

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            rows, "id long, user string, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        d = tmp_path / f"sess-stage-{name}"
        df.coalesce(1).write.mode("overwrite").json(str(d))
        part = next(p for p in d.glob("part-*.json"))
        target = src / f"{name}.json"
        os.link(part, target)
        os.utime(target, (mtime, mtime))

    # batch 0: u1 active 10:00-10:02; u2 active 10:00
    write_file("00", [(1, "u1", "2026-01-01 10:00:00", 1.0),
                      (2, "u1", "2026-01-01 10:02:00", 2.0),
                      (3, "u2", "2026-01-01 10:00:00", 5.0)], 1_000_000_000)
    # batch 1: u1 continues at 10:05 (within the 10-min gap -> same session)
    write_file("01", [(4, "u1", "2026-01-01 10:05:00", 3.0)], 1_000_000_100)
    # batch 2: far-future row closes every session via the watermark
    write_file("02", [(9, "u3", "2026-01-01 12:00:00", 0.0)], 1_000_000_200)
    # batch 3: spacer so the watermark from batch 2 takes effect
    write_file("03", [(10, "u3", "2026-01-01 12:30:00", 0.0)], 1_000_000_300)

    stream = StreamDFReader(
        spark=spark,
        format=JSONLine(),
        source_path=str(src),
        df_schema=SCHEMA,
        options={"maxFilesPerTrigger": "1", "latestFirst": "false"},
    ).run()
    sessions = sessionize(
        stream,
        time_col="ts",
        gap="10 minutes",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
        group_by=("user",),
        watermark="1 minute",
    )
    query = StreamDFWriter(
        format="memory",
        options=StreamWriteOptions(
            output_mode="append",
            checkpoint_location=str(tmp_path / "ckpt-sess"),
            trigger={"availableNow": True},
            query_name="sess_sink",
        ),
    ).run(sessions)
    query.awaitTermination(180)

    rows = {
        (r["user"], r["session_start"].isoformat()): r
        for r in spark.table("sess_sink").collect()
    }
    # u1: ONE merged session 10:00 -> 10:15 (last event 10:05 + 10-min gap)
    u1 = rows[("u1", "2026-01-01T10:00:00")]
    assert u1["n"] == 3 and u1["total"] == 6.0
    assert u1["session_end"].isoformat() == "2026-01-01T10:15:00"
    assert sum(1 for (u, _) in rows if u == "u1") == 1
    # u2: single-event session, closed and emitted exactly once
    u2 = rows[("u2", "2026-01-01T10:00:00")]
    assert u2["n"] == 1 and u2["total"] == 5.0


def _write_batch_file(spark, tmp_path, src, name, rows, mtime):
    df = spark.createDataFrame(
        rows, "id long, user string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    d = tmp_path / f"bstage-{name}"
    df.coalesce(1).write.mode("overwrite").json(str(d))
    part = next(p for p in d.glob("part-*.json"))
    target = src / f"{name}.json"
    os.link(part, target)
    os.utime(target, (mtime, mtime))


def _file_stream(spark, src):
    return StreamDFReader(
        spark=spark,
        format=JSONLine(),
        source_path=str(src),
        df_schema=SCHEMA,
        options={"maxFilesPerTrigger": "1", "latestFirst": "false"},
    ).run()


def _run_append(df, tmp_path, name, output_mode="append"):
    from onetl_spark.streaming.writer import StreamDFWriter, StreamWriteOptions

    query = StreamDFWriter(
        format="memory",
        options=StreamWriteOptions(
            output_mode=output_mode,
            checkpoint_location=str(tmp_path / f"ckpt-{name}"),
            trigger={"availableNow": True},
            query_name=name,
        ),
    ).run(df)
    query.awaitTermination(180)
    return query


def test_stream_dedup_state_bounded_by_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark across micro-batches: a duplicate id
    arriving in a LATER batch within the watermark horizon is suppressed;
    once the watermark expires the key's state, the same id is emitted
    again (the documented within-horizon contract that bounds state on
    unbounded streams)."""
    src = tmp_path / "dd-src"
    src.mkdir()
    _write_batch_file(spark, tmp_path, src, "00",
                      [(1, "u1", "2026-01-01 10:00:00", 1.0)], 1_000_000_000)
    # same id, later batch, within the 10-min horizon → suppressed
    _write_batch_file(spark, tmp_path, src, "01",
                      [(1, "u1", "2026-01-01 10:01:00", 1.0)], 1_000_000_100)
    # advance event time far beyond the horizon (expires id=1 state)
    _write_batch_file(spark, tmp_path, src, "02",
                      [(2, "u2", "2026-01-01 13:00:00", 2.0)], 1_000_000_200)
    _write_batch_file(spark, tmp_path, src, "03",
                      [(3, "u2", "2026-01-01 13:01:00", 2.0)], 1_000_000_300)
    # id=1 reappears AFTER its state expired → emitted a second time
    _write_batch_file(spark, tmp_path, src, "04",
                      [(1, "u1", "2026-01-01 13:02:00", 1.0)], 1_000_000_400)

    deduped = deduplicate_stream(
        _file_stream(spark, src), keys=["id"], time_col="ts", watermark="10 minutes"
    )
    _run_append(deduped, tmp_path, "dd_sink")
    out = spark.table("dd_sink").collect()
    ids = sorted(r["id"] for r in out)
    # id=1 twice (horizon expired between), ids 2 and 3 once each
    assert ids == [1, 1, 2, 3]
    times_for_1 = sorted(r["ts"].isoformat() for r in out if r["id"] == 1)
    assert times_for_1 == ["2026-01-01T10:00:00", "2026-01-01T13:02:00"]


def test_stateful_running_agg_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-key state ALIVE across
    micro-batches: each batch emits the key's updated running totals,
    accumulated over every batch seen so far — the property a
    batch-scoped aggregate can't provide."""
    src = tmp_path / "ra-src"
    src.mkdir()
    _write_batch_file(spark, tmp_path, src, "00",
                      [(1, "u1", "2026-01-01 10:00:00", 1.0),
                       (2, "u1", "2026-01-01 10:01:00", 2.0)], 1_000_000_000)
    _write_batch_file(spark, tmp_path, src, "01",
                      [(3, "u1", "2026-01-01 10:02:00", 4.0),
                       (4, "u2", "2026-01-01 10:02:00", 10.0)], 1_000_000_100)
    _write_batch_file(spark, tmp_path, src, "02",
                      [(5, "u1", "2026-01-01 10:03:00", 8.0)], 1_000_000_200)

    agg = stateful_running_agg(_file_stream(spark, src), ["user"], "value")
    # applyInPandasWithState(update) requires Update output mode; the
    # memory sink then keeps every per-batch emission, which is exactly
    # what this test wants to observe
    _run_append(agg, tmp_path, "ra_sink", output_mode="update")
    # one emission per key per batch containing that key; totals accumulate
    u1 = sorted(
        (r["running_count"], r["running_sum"])
        for r in spark.table("ra_sink").collect() if r["user"] == "u1"
    )
    assert u1 == [(2, 3.0), (3, 7.0), (4, 15.0)]
    u2 = [(r["running_count"], r["running_sum"])
          for r in spark.table("ra_sink").collect() if r["user"] == "u2"]
    assert u2 == [(1, 10.0)]


def test_left_outer_join_evicts_across_microbatches(spark, tmp_path):
    """Stream-stream LEFT OUTER join over real micro-batches: a matched
    click emits on match; an unmatched click emits a null-extended row
    once the watermark proves no purchase can arrive (eviction), and an
    unmatched click still inside the final watermark horizon is NOT
    emitted — the semantics the streaming_left_outer_join oracle encodes."""
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", StringType()),
            StructField("ts", TimestampType()),
            StructField("event_type", StringType()),
        ]
    )

    src = tmp_path / "loj-src"
    src.mkdir()

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, ts string, event_type string"
        ).withColumn("ts", F.to_timestamp("ts"))
        d = tmp_path / f"loj-stage-{name}"
        df.coalesce(1).write.mode("overwrite").json(str(d))
        part = next(p for p in d.glob("part-*.json"))
        target = src / f"{name}.json"
        os.link(part, target)
        os.utime(target, (mtime, mtime))

    write_file(
        "00",
        [
            (1, "u1", "2026-01-01 10:00:00", "click"),
            (2, "u1", "2026-01-01 10:30:00", "purchase"),
            (3, "u2", "2026-01-01 10:00:00", "click"),
        ],
        1_000_000_000,
    )
    # spacer advances both watermarks to 12:59 → u2's click (window ended
    # 11:00) is evicted and emits null-extended
    write_file(
        "01",
        [
            (4, "u9", "2026-01-01 13:00:00", "click"),
            (5, "u9", "2026-01-01 13:00:00", "purchase"),
        ],
        1_000_000_100,
    )
    # unmatched click inside the final watermark horizon: NOT emitted
    write_file(
        "02",
        [(6, "u3", "2026-01-01 12:58:00", "click")],
        1_000_000_200,
    )

    def side(event_type, prefix):
        raw = StreamDFReader(
            spark=spark,
            format=JSONLine(),
            source_path=str(src),
            df_schema=schema,
            options={"maxFilesPerTrigger": "1", "latestFirst": "false"},
        ).run()
        return (
            raw.filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "1 minute")
        )

    clicks, purchases = side("click", "c"), side("purchase", "p")
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select(F.col("c_user").alias("user_id"), "c_id", "p_id")
    query = StreamDFWriter(
        format="memory",
        options=StreamWriteOptions(
            output_mode="append",
            checkpoint_location=str(tmp_path / "ckpt-loj"),
            trigger={"availableNow": True},
            query_name="loj_sink",
        ),
    ).run(joined)
    query.awaitTermination(180)

    got = {(r["user_id"], r["c_id"], r["p_id"]) for r in spark.table("loj_sink").collect()}
    # u9's click at 13:00 matches its own 13:00 purchase (window start is
    # inclusive); u3's click stays unemitted inside the watermark horizon
    assert got == {("u1", 1, 2), ("u2", 3, None), ("u9", 4, 5)}


def test_sliding_windows_merge_across_microbatches(spark, tmp_path):
    """Sliding windows over real micro-batches: an event contributes to
    BOTH covering windows even when its window-mates arrive in different
    batches, finalized windows emit exactly once (append mode), and a
    late row for a closed window is dropped."""
    src = tmp_path / "slide-src"
    src.mkdir()

    def write_file(name, rows, mtime):
        df = spark.createDataFrame(
            rows, "id long, user string, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        d = tmp_path / f"slide-stage-{name}"
        df.coalesce(1).write.mode("overwrite").json(str(d))
        part = next(p for p in d.glob("part-*.json"))
        target = src / f"{name}.json"
        os.link(part, target)
        os.utime(target, (mtime, mtime))

    # 1h windows sliding every 30min: event at 10:40 covers windows
    # starting 10:00 and 10:30
    write_file("00", [(1, "u1", "2026-01-01 10:40:00", 1.0)], 1_000_000_000)
    # same-window mate arrives in the NEXT batch (10:50 → same 2 windows)
    write_file("01", [(2, "u1", "2026-01-01 10:50:00", 2.0)], 1_000_000_100)
    # advance the watermark far past both windows
    write_file("02", [(3, "u1", "2026-01-01 13:00:00", 8.0)], 1_000_000_200)
    write_file("03", [(4, "u1", "2026-01-01 14:00:00", 9.0)], 1_000_000_300)
    # late row for the long-closed 10:00 window: dropped
    write_file("04", [(5, "u1", "2026-01-01 10:45:00", 100.0)], 1_000_000_400)

    stream = StreamDFReader(
        spark=spark,
        format=JSONLine(),
        source_path=str(src),
        df_schema=SCHEMA,
        options={"maxFilesPerTrigger": "1", "latestFirst": "false"},
    ).run()
    agg = windowed_aggregate(
        stream,
        time_col="ts",
        window_duration="1 hour",
        slide="30 minutes",
        watermark="1 minute",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
    )
    query = StreamDFWriter(
        format="memory",
        options=StreamWriteOptions(
            output_mode="append",
            checkpoint_location=str(tmp_path / "ckpt-slide"),
            trigger={"availableNow": True},
            query_name="slide_sink",
        ),
    ).run(agg)
    query.awaitTermination(180)

    out = spark.table("slide_sink").collect()
    by_start = {}
    for r in out:
        key = r["window_start"].isoformat()
        assert key not in by_start, f"window {key} emitted twice"
        by_start[key] = (r["n"], r["total"])
    # both sliding windows over 10:40+10:50 hold BOTH events, merged
    # across the two micro-batches; the late row (100.0) is in neither
    assert by_start["2026-01-01T10:00:00"] == (2, 3.0)
    assert by_start["2026-01-01T10:30:00"] == (2, 3.0)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in query.recentProgress
        if p["stateOperators"]
    )
    # sliding windows replicate each row per covering window BEFORE the
    # late filter, so ONE late event counts as TWO dropped rows here
    assert dropped == 2


def test_rollup_maintenance_split_independent_across_microbatches(spark, tmp_path):
    """Mergeable aggregate state maintained over three REAL micro-batches
    (maxFilesPerTrigger=1) must equal the from-scratch aggregate — the
    semigroup-state guarantee behind streaming_rollup_maintenance."""
    from onetl_spark.file.format import Parquet
    from onetl_spark.operators.maintenance import (
        aggregate_state,
        merge_aggregate_state,
    )
    from onetl_spark.streaming.ops import idempotent_batch_sink

    schema = "k string, v double"
    batches = [
        [("a", 1.25), ("b", 2.0)],
        [("a", None), ("c", 10.5)],
        [("a", 4.0), ("b", -3.0), ("c", 0.25)],
    ]
    flat = tmp_path / "flat"
    flat.mkdir()
    n = 0
    for i, rows in enumerate(batches):
        d = tmp_path / f"b{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(str(d))
        for f in d.glob("*.parquet"):
            os.link(f, flat / f"{i:02d}_{n}.parquet")
            n += 1

    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    stream = StreamDFReader(
        spark=spark,
        format=Parquet(),
        source_path=str(flat),
        df_schema=StructType(
            [StructField("k", StringType()), StructField("v", DoubleType())]
        ),
        options={"maxFilesPerTrigger": "1", "latestFirst": "false"},
    ).run()

    from onetl_spark.streaming.ops import load_published_state, publish_state

    run_dir = str(tmp_path / "state")
    os.makedirs(run_dir, exist_ok=True)
    seen = []

    def merge(batch_df, batch_id):
        seen.append(batch_id)
        prev, last_batch = load_published_state(spark, run_dir)
        if last_batch >= batch_id:
            return
        state = aggregate_state(batch_df, ["k"], "v")
        if prev is not None:
            state = merge_aggregate_state(prev, state, ["k"])
        publish_state(state, run_dir, batch_id)

    q = StreamDFWriter(
        foreach_batch=idempotent_batch_sink(merge, str(tmp_path / "ledger")),
        options=StreamWriteOptions(
            output_mode="append",
            trigger={"availableNow": True},
            checkpoint_location=str(tmp_path / "ckpt"),
        ),
    ).run(stream)
    q.awaitTermination()
    assert len(seen) >= 2  # genuinely multi-batch

    final, last_batch = load_published_state(spark, run_dir)
    # state-level idempotency: replaying an already-folded epoch is a no-op
    merge(spark.createDataFrame([("a", 99.0)], schema), last_batch)
    refetched, _ = load_published_state(spark, run_dir)
    got = {
        r["k"]: (r["n"], r["n_nulls"], float(r["sum"] or 0), r["min"], r["max"])
        for r in refetched.collect()
    }
    whole = spark.createDataFrame([r for b in batches for r in b], schema)
    want = {
        r["k"]: (r["n"], r["n_nulls"], float(r["sum"] or 0), r["min"], r["max"])
        for r in aggregate_state(whole, ["k"], "v").collect()
    }
    assert got == want
    assert got["a"] == (3, 1, 5.25, 1.25, 4.0)


def test_stateful_histogram_accumulates_across_batches(spark, tmp_path):
    """The per-key bin counters survive micro-batch boundaries, and the
    final emission equals the batch bucket counts (order-independence:
    this is what makes the streaming_value_histogram oracle exact)."""
    from onetl_spark.streaming.ops import stateful_histogram

    src = tmp_path / "sh-src"
    src.mkdir()
    _write_batch_file(spark, tmp_path, src, "00",
                      [(1, "u1", "2026-01-01 10:00:00", 5.0),
                       (2, "u1", "2026-01-01 10:01:00", 15.0)], 1_000_000_000)
    _write_batch_file(spark, tmp_path, src, "01",
                      [(3, "u1", "2026-01-01 10:02:00", 40.0),
                       (4, "u1", "2026-01-01 10:03:00", 15.0)], 1_000_000_100)

    hist = stateful_histogram(
        _file_stream(spark, src), ["user"], "value", edges=[10.0, 20.0]
    )
    _run_append(hist, tmp_path, "sh_sink", output_mode="update")
    rows = sorted(
        (r["n_total"], tuple(r["bin_counts"]))
        for r in spark.table("sh_sink").collect()
    )
    # batch 1: 5.0 -> bin0, 15.0 -> bin1; batch 2 adds 40.0 -> bin2, 15.0 -> bin1
    assert rows == [(2, (1, 1, 0)), (4, (1, 2, 1))]

    import pytest

    with pytest.raises(ValueError):
        stateful_histogram(_file_stream(spark, src), ["user"], "value", edges=[2.0, 1.0])


def test_stateful_topk_accumulates_across_batches(spark, tmp_path):
    """The per-key top-k survives micro-batch boundaries and the final
    emission equals the batch per-group top-k multiset (the property
    the streaming_type_topk_values oracle relies on)."""
    from onetl_spark.streaming.ops import stateful_topk

    src = tmp_path / "tk-src"
    src.mkdir()
    _write_batch_file(spark, tmp_path, src, "00",
                      [(1, "u1", "2026-01-01 10:00:00", 5.0),
                       (2, "u1", "2026-01-01 10:01:00", 15.0)], 1_000_000_000)
    _write_batch_file(spark, tmp_path, src, "01",
                      [(3, "u1", "2026-01-01 10:02:00", 40.0),
                       (4, "u1", "2026-01-01 10:03:00", 15.0)], 1_000_000_100)

    top = stateful_topk(_file_stream(spark, src), ["user"], "value", k=3)
    _run_append(top, tmp_path, "tk_sink", output_mode="update")
    rows = sorted(
        (r["n_seen"], tuple(r["topk_values"]))
        for r in spark.table("tk_sink").collect()
    )
    # batch 1: {15, 5}; batch 2 merges {40, 15} -> top3 = [40, 15, 15]
    assert rows == [(2, (15.0, 5.0)), (4, (40.0, 15.0, 15.0))]

    import pytest

    with pytest.raises(ValueError):
        stateful_topk(_file_stream(spark, src), ["user"], "value", k=0)


def test_stateful_daily_stats_accumulates_across_batches(spark, tmp_path):
    """The per-key daily (n, Σ, Σ²) grid survives micro-batch boundaries
    and the final state equals the batch daily aggregate exactly —
    integer micro-unit sums are commutative, the order-independence
    property the streaming_rolling_drift oracle relies on. Day retention
    keeps the max_days LARGEST day keys."""
    from onetl_spark.streaming.ops import stateful_daily_stats

    src = tmp_path / "ds-src"
    src.mkdir()
    # batch 1: two days; batch 2 adds to day 2 and introduces day 3
    _write_batch_file(spark, tmp_path, src, "00",
                      [(1, "u1", "2026-01-01 10:00:00", 1.5),
                       (2, "u1", "2026-01-02 10:01:00", 2.0)], 1_000_000_000)
    _write_batch_file(spark, tmp_path, src, "01",
                      [(3, "u1", "2026-01-02 10:02:00", 4.0),
                       (4, "u1", "2026-01-03 10:03:00", 3.0)], 1_000_000_100)

    prepped = _file_stream(spark, src).select(
        "user",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 1e6, 0).cast("long").alias("v_micro"),
        F.round(F.col("value") * F.col("value") * 1e6, 0).cast("long").alias("sq_micro"),
    )
    grid = stateful_daily_stats(prepped, key_cols=["user"], max_days=2)
    _run_append(grid, tmp_path, "ds_sink", output_mode="update")
    rows = {r["n_total"]: r for r in spark.table("ds_sink").collect()}
    assert set(rows) == {2, 3}  # batch1 kept 2 days; batch2 evicted day 1
    b1 = rows[2]
    assert list(b1["days"]) == ["2026-01-01", "2026-01-02"]
    assert list(b1["day_sum_micro"]) == [1_500_000, 2_000_000]
    assert list(b1["day_sq_micro"]) == [2_250_000, 4_000_000]
    b2 = rows[3]
    # max_days=2 keeps the two LARGEST days; day 2 accumulated across batches
    assert list(b2["days"]) == ["2026-01-02", "2026-01-03"]
    assert list(b2["day_n"]) == [2, 1]
    assert list(b2["day_sum_micro"]) == [6_000_000, 3_000_000]
    assert list(b2["day_sq_micro"]) == [20_000_000, 9_000_000]

    import pytest

    with pytest.raises(ValueError):
        stateful_daily_stats(prepped, key_cols=["user"], max_days=0)
