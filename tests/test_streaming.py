"""Structured Streaming ingestion test (AvailableNow, exactly-once files)."""

from __future__ import annotations

import os


def test_stream_extract_available_now(spark, tmp_path):
    from sparkdoc.streaming import stream_extract
    from sparkdoc.synth import raw_nodes_df

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    raw_nodes_df(spark, 12, 3, partitions=2).write.parquet(in_dir)

    q = stream_extract(spark, in_dir, out_dir)
    q.awaitTermination(120)
    assert not q.isActive

    docs = spark.read.parquet(os.path.join(out_dir, "documents"))
    n1 = docs.count()
    assert n1 > 0
    assert spark.read.parquet(os.path.join(out_dir, "chunks")).count() > 0

    # restart with no new files: checkpoint prevents reprocessing
    q2 = stream_extract(spark, in_dir, out_dir)
    q2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out_dir, "documents")).count() == n1

    # new files arrive → only they are processed
    raw_nodes_df(spark, 6, 99, partitions=1).write.mode("append").parquet(in_dir)
    q3 = stream_extract(spark, in_dir, out_dir)
    q3.awaitTermination(120)
    n2 = spark.read.parquet(os.path.join(out_dir, "documents")).count()
    assert n1 < n2 <= n1 + 6


def test_stream_dedup_first_seen_stateful(spark, tmp_path):
    """applyInPandasWithState dedup: first-seen emission survives restarts
    (state lives in the checkpoint, later batches never re-emit a key)."""
    from sparkdoc.streaming import stream_dedup_first_seen

    in_dir = str(tmp_path / "docs_in")
    out_dir = str(tmp_path / "dedup_out")
    spark.createDataFrame(
        [("a1", "alpha text"), ("a2", "alpha text"), ("b1", "beta text")],
        "doc_id string, text string",
    ).coalesce(1).write.parquet(in_dir)

    q = stream_dedup_first_seen(spark, in_dir, out_dir)
    q.awaitTermination(180)
    out1 = {r["fp"]: r for r in spark.read.parquet(out_dir + "/unique").collect()}
    assert len(out1) == 2  # alpha collapsed within-batch, beta unique
    alpha = [r for r in out1.values() if r["doc_id"] == "a1"]
    assert alpha and alpha[0]["n_dups_batch"] == 2  # min doc_id wins

    # batch 2: a replay of alpha + a new gamma → only gamma emits
    spark.createDataFrame(
        [("a3", "alpha text"), ("c1", "gamma text")], "doc_id string, text string"
    ).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = stream_dedup_first_seen(spark, in_dir, out_dir)
    q2.awaitTermination(180)
    out2 = spark.read.parquet(out_dir + "/unique").collect()
    assert len(out2) == 3
    assert {r["doc_id"] for r in out2} == {"a1", "b1", "c1"}


def test_stream_dedup_matches_batch_fingerprint_and_null_passthrough(spark, tmp_path):
    """Streaming dedup must (a) collapse case/whitespace variants exactly
    like the batch doc_fingerprint contract and (b) pass every NULL-text doc
    through as unique instead of collapsing them into one NULL group."""
    import os

    from sparkdoc.streaming import stream_dedup_first_seen

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    spark.createDataFrame(
        [("d1", "Foo  Bar"), ("d2", "foo bar"), ("d3", None), ("d4", None), ("d5", "other")],
        "doc_id string, text string",
    ).coalesce(1).write.mode("overwrite").parquet(in_dir)
    q = stream_dedup_first_seen(spark, in_dir, out_dir)
    q.awaitTermination()
    rows = {r["doc_id"]: r for r in spark.read.parquet(os.path.join(out_dir, "unique")).collect()}
    # d1/d2 are one fingerprint group (batch-parity normalization): min wins
    assert "d1" in rows and "d2" not in rows
    assert rows["d1"]["n_dups_batch"] == 2
    # NULL-text docs each pass through as unique
    assert "d3" in rows and "d4" in rows
    assert "d5" in rows


def test_stream_windowed_event_metrics_watermark_late_drop(spark, tmp_path):
    """Watermark + windowed agg (append mode): finalized windows emit exactly
    once across restarts, and a row arriving behind the checkpointed
    watermark is dropped — the batch-equivalent aggregation MINUS the late
    row is exactly what the sink holds once the watermark passes everything.

    Three AvailableNow runs on one checkpoint:
      run 1: base events spanning 4 windows → checkpoint watermark = maxA-2h
      run 2: on-time rows + one LATE row (behind run-1's watermark → dropped)
             + flush1 far in the future (advances the watermark past all of
             A∪B's windows for run 3's first batch)
      run 3: flush2 even further out → every A∪B window (and flush1's) is
             finalized; only flush2's own window stays open/pending.
    """
    import datetime as dt

    from pyspark.sql import functions as F

    from sparkdoc.streaming import EVENTS_SCHEMA, stream_windowed_event_metrics

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minutes, etype, value):
        return (i, t0 + dt.timedelta(minutes=minutes), 1, etype, float(value), "{}")

    # run 1: events across 4 hourly windows; max ts = t0+3h30 → watermark t0+1h30
    file_a = [
        ev(0, 10, "view", 1.0), ev(1, 20, "click", 2.0),   # window [0,1h)
        ev(2, 70, "view", 3.0),                            # window [1h,2h)
        ev(3, 130, "view", 4.0), ev(4, 150, "click", 5.0), # window [2h,3h)
        ev(5, 210, "view", 6.0),                           # window [3h,4h)
    ]
    spark.createDataFrame(file_a, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    stream_windowed_event_metrics(spark, in_dir, out_dir).awaitTermination()

    # run 2: one more on-time row, one LATE row (ts=t0+5min < watermark
    # t0+1h30 → must be dropped), and flush1 two days out
    late = ev(6, 5, "view", 100.0)
    file_b = [ev(7, 200, "click", 7.0), late, ev(8, 2880, "flush", 0.0)]
    spark.createDataFrame(file_b, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    stream_windowed_event_metrics(spark, in_dir, out_dir).awaitTermination()

    # run 3: flush2 four days out — run 3's first batch starts from run 2's
    # checkpointed watermark (t0+2d-2h), which closes every earlier window
    spark.createDataFrame([ev(9, 5760, "flush", 0.0)], EVENTS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    stream_windowed_event_metrics(spark, in_dir, out_dir).awaitTermination()

    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(os.path.join(out_dir, "window_metrics")).collect()
    }
    # exactly-once per finalized window: no duplicate (window, type) keys
    assert len(got) == len(set(got)) and len(got) > 0

    # batch equivalent over everything EXCEPT the late row and flush2
    # (flush2's window never finalized)
    expected_rows = file_a + [file_b[0], file_b[2]]
    exp = {
        ((r["ws"]), r["event_type"]): (r["n"], r["s"])
        for r in spark.createDataFrame(expected_rows, EVENTS_SCHEMA)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "s")
        .collect()
    }
    assert got == exp
    # and the late row's would-be contribution is verifiably absent
    w0_view = [v for (ws, et), v in got.items() if et == "view" and ws.hour == 0]
    assert w0_view == [(1, 1.0)]  # ev(0) only — not the late 100.0


def test_stream_sessionize_matches_batch_and_times_out(spark, tmp_path):
    """Streaming sessionization = the batch lag-window rule on the on-time
    rows: gap-closed sessions appear as soon as the successor arrives,
    straggler-less sessions close by event-time timeout when the watermark
    passes their gap horizon, and every session is emitted exactly once
    across restarts."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from sparkdoc.streaming import EVENTS_SCHEMA, stream_sessionize

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(i, minutes, user):
        return (i, t0 + dt.timedelta(minutes=minutes), user, "view", 1.0, "{}")

    # user 1: two sessions split by a 40-min gap (> 30-min rule); user 2: one
    # session (gaps <= 30); the second file's u1 event closes u1's second
    # session by GAP, and the far-future flush (user 99) advances the
    # watermark so everything else closes by TIMEOUT on run 3.
    file_a = [ev(0, 0, 1), ev(1, 10, 1), ev(2, 50, 1), ev(3, 0, 2), ev(4, 25, 2)]
    spark.createDataFrame(file_a, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    file_b = [ev(5, 130, 1), ev(6, 2880, 99)]  # 130 - 50 = 80 min > gap
    spark.createDataFrame(file_b, EVENTS_SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    # run 3: another flush so run-2's checkpointed watermark (t0+2d-2h)
    # becomes the operator watermark and fires the event-time timeouts
    spark.createDataFrame([ev(7, 5760, 99)], EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    rows = spark.read.parquet(os.path.join(out_dir, "sessions")).collect()
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"]): r["closed_by"]
        for r in rows
    }
    assert len(got) == len(rows)  # exactly-once: no duplicate sessions

    # batch twin over everything except the final still-open flush session
    all_rows = file_a + file_b
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    bat = (
        spark.createDataFrame(all_rows + [ev(7, 5760, 99)], EVENTS_SCHEMA)
        .withColumn(
            "new_s",
            F.when(
                (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))).isNull()
                | ((F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 1800),
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    exp = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in bat.collect()
    }
    # the flush user's LAST session (ev 7) is still open — everything else
    # must have been emitted
    open_key = (99, t0 + dt.timedelta(minutes=5760), t0 + dt.timedelta(minutes=5760), 1)
    assert set(got) == exp - {open_key}

    # closure attribution: u1's first session closed by gap (ev 2 arrived in
    # the same run), u1's second by gap (ev 5 in run 2); u2's lone session
    # and u1's third had no successor → timeout
    assert got[(1, t0, t0 + dt.timedelta(minutes=10), 2)] == "gap"
    assert got[(1, t0 + dt.timedelta(minutes=50), t0 + dt.timedelta(minutes=50), 1)] == "gap"
    assert got[(2, t0, t0 + dt.timedelta(minutes=25), 2)] == "timeout"
    assert got[(1, t0 + dt.timedelta(minutes=130), t0 + dt.timedelta(minutes=130), 1)] == "timeout"


def test_stream_curate_gates_and_restart(spark, tmp_path):
    """Streaming curation: quality rejects attributed (and kept out of the
    dedup state), first-seen kept, cross-batch exact dups flagged with
    dup_of after a restart, PII redacted in the kept text."""
    from sparkdoc.streaming import stream_curate

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    spark.createDataFrame(
        [
            ("a1", base + " one mail bob@corp.io inside"),
            ("a2", base + " one mail bob@corp.io inside"),  # within-batch dup
            ("q1", "short junk"),                            # quality reject
        ],
        "doc_id string, text string",
    ).coalesce(1).write.parquet(in_dir)
    q = stream_curate(spark, in_dir, out_dir)
    q.awaitTermination(180)
    rows = {r["doc_id"]: r for r in spark.read.parquet(out_dir + "/curated").collect()}
    assert rows["a1"]["verdict"] == "kept" and "[EMAIL]" in rows["a1"]["text"]
    assert rows["a2"]["verdict"] == "exact_dup" and rows["a2"]["dup_of"] == "a1"
    assert rows["q1"]["verdict"] == "quality"

    # batch 2 after restart: replayed fingerprint dups against batch-1 state;
    # a fresh doc is kept
    spark.createDataFrame(
        [("a3", base + " one mail bob@corp.io inside"), ("b1", base + " brand new two")],
        "doc_id string, text string",
    ).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = stream_curate(spark, in_dir, out_dir)
    q2.awaitTermination(180)
    rows = {r["doc_id"]: r for r in spark.read.parquet(out_dir + "/curated").collect()}
    assert len(rows) == 5
    assert rows["a3"]["verdict"] == "exact_dup" and rows["a3"]["dup_of"] == "a1"
    assert rows["b1"]["verdict"] == "kept"


def test_stream_extract_mixed(spark, tmp_path):
    """Incremental mixed-format ingest: sniff + route per micro-batch,
    idempotent batch_id sink, checkpointed restart, fmt preserved, span
    values matching the closed-form expectation."""
    from sparkdoc.streaming import stream_extract_mixed
    from sparkdoc.synth import expected_mixed_formats, mixed_corpus_df

    in_dir = str(tmp_path / "blobs_in")
    out_dir = str(tmp_path / "mix_out")
    mixed_corpus_df(spark, 21, 42, partitions=2).write.parquet(in_dir)

    q = stream_extract_mixed(spark, in_dir, out_dir)
    q.awaitTermination(180)
    assert not q.isActive
    docs = spark.read.parquet(os.path.join(out_dir, "documents"))
    assert docs.count() == 21
    fmts = {r.doc_id: r.fmt for r in docs.collect()}
    for e in expected_mixed_formats(21, 42):
        assert fmts[e["doc_id"]] == e["fmt"]
    assert spark.read.parquet(os.path.join(out_dir, "chunks")).count() > 0

    # restart with no new files: checkpoint prevents reprocessing
    q2 = stream_extract_mixed(spark, in_dir, out_dir)
    q2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out_dir, "documents")).count() == 21

    # new blobs arrive → only they are processed (7-format cycle continues)
    mixed_corpus_df(spark, 7, 99, partitions=1).write.mode("append").parquet(in_dir)
    q3 = stream_extract_mixed(spark, in_dir, out_dir)
    q3.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out_dir, "documents")).count() == 28


def test_stream_sessionize_out_of_order_cross_batch(spark, tmp_path):
    """A watermark-admitted event OLDER than the open session must extend
    the session START (or close as its own earlier session) — it must never
    drag session_end backwards or corrupt the boundary (the old
    `t - last <= gap` test was vacuously true for any older event)."""
    import datetime as dt

    from sparkdoc.streaming import EVENTS_SCHEMA, stream_sessionize

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, minutes, user):
        return (i, t0 + dt.timedelta(minutes=minutes), user, "view", 1.0, "{}")

    # batch 1: open session for u1 at [12:00, 12:10]
    spark.createDataFrame([ev(0, 0, 1), ev(1, 10, 1)], EVENTS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    # batch 2: u1 event 20 min BEFORE the session start (within gap=30 of
    # the interval -> start extends back); plus a far-future u99 flush
    spark.createDataFrame([ev(2, -20, 1), ev(3, 2880, 99)], EVENTS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    # batch 3: flush again so the timeout fires for u1
    spark.createDataFrame([ev(4, 5760, 99)], EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    rows = spark.read.parquet(os.path.join(out_dir, "sessions")).filter(
        "user_id = 1"
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_events"] == 3
    assert r["session_start"] == t0 + dt.timedelta(minutes=-20)
    assert r["session_end"] == t0 + dt.timedelta(minutes=10)
    assert r["session_end"] >= r["session_start"]


def test_stream_sessionize_multiple_late_events_form_one_session(spark, tmp_path):
    """Two admitted-late events within one gap of EACH OTHER (but > gap
    older than the open session) must come out as ONE late session under
    the batch gap rule — not one singleton per event; a late chain within
    gap of the open interval must bridge-merge into it."""
    import datetime as dt

    from sparkdoc.streaming import EVENTS_SCHEMA, stream_sessionize

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, minutes, user):
        return (i, t0 + dt.timedelta(minutes=minutes), user, "view", 1.0, "{}")

    # batch 1: open session for u1 at [12:00, 12:10] (gap = 30 min)
    spark.createDataFrame([ev(0, 0, 1), ev(1, 10, 1)], EVENTS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    # batch 2: two late u1 events at -55 and -50 min — 5 min apart (one
    # session together), both > 30 min older than the open start, and the
    # chain does NOT bridge (-50 -> 0 is 50 > 30). Watermark stays behind
    # (no newer u1 rows in this batch beyond the flusher).
    spark.createDataFrame(
        [ev(2, -55, 1), ev(3, -50, 1), ev(4, 2880, 99)], EVENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    # batch 3: flush so u1's open session times out
    spark.createDataFrame([ev(5, 5760, 99)], EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    rows = sorted(
        spark.read.parquet(os.path.join(out_dir, "sessions"))
        .filter("user_id = 1")
        .collect(),
        key=lambda r: r["session_start"],
    )
    assert [(r["n_events"], r["closed_by"]) for r in rows] == [(2, "gap"), (2, "timeout")]
    assert rows[0]["session_start"] == t0 + dt.timedelta(minutes=-55)
    assert rows[0]["session_end"] == t0 + dt.timedelta(minutes=-50)
    assert rows[1]["session_start"] == t0


def test_stream_sessionize_late_chain_bridges_into_open_session(spark, tmp_path):
    """Late events that chain up to within one gap of the open interval
    merge into it: [-40, -25] with gap 30 bridges -25 → 0, so everything is
    ONE session starting at -40."""
    import datetime as dt

    from sparkdoc.streaming import EVENTS_SCHEMA, stream_sessionize

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(i, minutes, user):
        return (i, t0 + dt.timedelta(minutes=minutes), user, "view", 1.0, "{}")

    spark.createDataFrame([ev(0, 0, 1), ev(1, 10, 1)], EVENTS_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    # -40 is > gap older than start 0; -25 chains to -40 (15 <= 30) AND is
    # within gap of the interval start (25 <= 30) → bridge: one session
    spark.createDataFrame(
        [ev(2, -40, 1), ev(3, -25, 1), ev(4, 2880, 99)], EVENTS_SCHEMA
    ).coalesce(1).write.mode("append").parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    spark.createDataFrame([ev(5, 5760, 99)], EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)
    stream_sessionize(spark, in_dir, out_dir).awaitTermination()

    rows = spark.read.parquet(os.path.join(out_dir, "sessions")).filter(
        "user_id = 1"
    ).collect()
    assert len(rows) == 1
    assert rows[0]["n_events"] == 4
    import datetime as dt2
    assert rows[0]["session_start"] == t0 + dt2.timedelta(minutes=-40)
