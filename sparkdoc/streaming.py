"""Incremental ingestion via Structured Streaming.

The reference is strictly batch (SURVEY §2.10) and the north rule needs only
resumable batch — but a 100 TB corpus arrives incrementally, so we provide a
file-source streaming job: new raw_nodes parquet files land in a directory,
``Trigger.AvailableNow`` drains whatever is present, foreachBatch runs the
SAME extract(+chunk) pipeline and writes each batch to a ``batch_id=N``
subdirectory with overwrite, so a replayed batch (foreachBatch is
at-least-once: a crash between the write and the checkpoint commit re-runs
the batch on restart) overwrites its own partition instead of appending
duplicates — end-to-end effectively-once at the file level
(complementing checkpoint.py's bucket manifest for batch).

Documents carry no event time, so the extract/dedup streams use no
watermarks (SURVEY §2.10); the EVENTS stream does — see
``stream_windowed_event_metrics`` for the watermark + windowed-agg path
with late-data drop semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from sparkdoc.schemas import RAW_NODES


def _start_doc_stream(stream_df, out_dir: str, docs_of_batch, chunk: bool, available_now: bool):
    """The ONE idempotent document sink behind every extract-flavored stream:
    each micro-batch OWNS its ``batch_id=N`` directory and overwrites it, so
    a post-write/pre-commit crash that replays the batch cannot duplicate
    rows (readers scan documents/batch_id=*/). Shared by stream_extract /
    stream_extract_mixed / stream_warc_extract — the three copies it
    replaces had already drifted on the chunker's column selection."""
    from sparkdoc.chunker import chunk_documents

    def process(batch_df: DataFrame, batch_id: int) -> None:
        docs = docs_of_batch(batch_df).persist()
        docs.write.mode("overwrite").parquet(
            os.path.join(out_dir, "documents", f"batch_id={batch_id}")
        )
        if chunk:
            chunk_documents(docs.select("doc_id", "spans")).write.mode(
                "overwrite"
            ).parquet(os.path.join(out_dir, "chunks", f"batch_id={batch_id}"))
        docs.unpersist()

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_extract(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    chunk: bool = True,
    available_now: bool = True,
):
    """Start the incremental extract job; returns the StreamingQuery.

    Caller awaits ``q.awaitTermination()`` (AvailableNow terminates when the
    backlog drains)."""
    from sparkdoc.spans import extract_documents

    # INPUT CONTRACT: a file is the unit of atomicity — every raw_nodes file
    # must contain WHOLE documents (all rows of a doc_id in one file). A doc
    # split across files can land in different micro-batches and would be
    # assembled as two partial documents in different batch_id partitions;
    # the streaming source has no cross-batch view to rejoin them. The batch
    # pipeline (checkpoint.run_resumable) has no such requirement.
    raw = (
        spark.readStream.schema(RAW_NODES)
        .option("maxFilesPerTrigger", 64)
        .parquet(in_dir)
    )
    return _start_doc_stream(raw, out_dir, extract_documents, chunk, available_now)


def stream_extract_mixed(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    chunk: bool = True,
    available_now: bool = True,
):
    """Incremental MIXED-FORMAT ingest: new (doc_id, blob binary) parquet
    files land in a directory; each micro-batch sniffs + routes every blob
    through ingest.mixed_to_documents (zero-shuffle) and writes its own
    ``batch_id=N`` partition — the same idempotent at-least-once-to-
    effectively-once sink as stream_extract, with ``fmt`` preserved.

    Unlike stream_extract there is NO file-atomicity caveat: one blob row
    IS one whole document, so any file split across batches is safe."""
    from sparkdoc.ingest import mixed_to_documents

    blobs = (
        spark.readStream.schema("doc_id string, blob binary")
        .option("maxFilesPerTrigger", 64)
        .parquet(in_dir)
    )
    return _start_doc_stream(blobs, out_dir, mixed_to_documents, chunk, available_now)


def stream_warc_extract(
    spark: SparkSession,
    warc_dir: str,
    out_dir: str,
    chunk: bool = True,
    available_now: bool = True,
):
    """Continuous crawl ingestion: watch a drop-point of ``.warc``/
    ``.warc.gz`` container FILES through the warc streaming Data Source
    (sparkdoc/warcsource.py — one InputPartition per new container, O(1)
    offsets on the append-only-name contract) and route every record's
    document through the mixed sniffer, landing each micro-batch in its own
    idempotent ``batch_id=N`` partition exactly like stream_extract_mixed.

    A container is atomic within a micro-batch (the source plans whole
    files), so no document ever straddles two batches; a query restart on
    the same checkpoint resumes after the last committed container.

    Note: Python stream sources don't implement Trigger.AvailableNow yet —
    Spark logs a warning and falls back to single-batch execution (one
    batch up to latestOffset, then terminate), which is exactly the
    drain-the-backlog semantics this helper wants; a continuous deployment
    passes ``available_now=False`` and gets normal micro-batching."""
    from sparkdoc.ingest import mixed_to_documents
    from sparkdoc.warcsource import register_warc_source

    register_warc_source(spark)
    blobs = spark.readStream.format("warc").load(warc_dir).select("doc_id", "blob")
    return _start_doc_stream(blobs, out_dir, mixed_to_documents, chunk, available_now)


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_windowed_event_metrics(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    window_dur: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
):
    """Watermarked event-time windowed aggregation over the events stream:
    per (window, event_type) count + value sum, append mode.

    Late-data contract (the standard Structured Streaming one): a row whose
    ``ts`` is older than ``max(ts seen) - watermark`` arrives after its
    window was finalized and is DROPPED — the already-emitted window row is
    never retracted, so the parquet sink sees each finalized window exactly
    once. State is one small row per open (window, event_type), evicted at
    finalization — bounded by watermark horizon × cardinality, not by stream
    length, which is what lets this run forever on the 100 TB firehose.

    Returns the StreamingQuery (AvailableNow — drains the backlog and
    terminates; re-running with the same checkpoint resumes the watermark,
    so late rows stay late across restarts)."""
    from pyspark.sql import functions as F

    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(in_dir)
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window_dur, slide or window_dur).alias("w"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "window_metrics"))
        .option("checkpointLocation", os.path.join(out_dir, "_window_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_first_seen(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    text_col: str = "text",
):
    """Stateful streaming exact-dedup: emit each content fingerprint the
    FIRST time it is ever seen across the whole stream (within-batch dups
    collapse to the min doc_id; later batches never re-emit a seen key).

    The custom stateful operator path (applyInPandasWithState): state =
    one running count per md5(text) fingerprint, persisted in the streaming
    checkpoint, so a restarted query continues deduping against everything
    already ingested. At 100 TB the state is one small row per distinct
    fingerprint, hash-partitioned by key across executors — configure the
    RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass) so state spills off-heap
    instead of living in executor memory.

    Output rows: (fp, doc_id, n_dups_batch). Returns the StreamingQuery
    (AvailableNow — drains the backlog and terminates).
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # schema derives from text_col — a hardcoded "text" here would null-fill
    # (or fail to resolve) any other column name and silently collapse every
    # document into one null-fingerprint group
    docs = (
        spark.readStream.schema(f"doc_id string, `{text_col}` string")
        .option("maxFilesPerTrigger", 64)
        .parquet(in_dir)
    )
    from sparkdoc.textops import doc_fingerprint

    # Fingerprint parity with the BATCH dedup contract (textops.doc_fingerprint:
    # md5 of whitespace-normalized lowercase — raw md5(text) would call
    # case/whitespace variants unique here while the batch path collapses
    # them). NULL text never groups: md5(NULL) = NULL would land every
    # failed-extraction doc in ONE group and silently delete all but one
    # (the batch path filters exactly this, dedup_text.py) — each NULL-text
    # doc gets a per-doc sentinel fingerprint and passes through as unique.
    fp = F.when(
        F.col(text_col).isNotNull(), doc_fingerprint(F.col(text_col))
    ).otherwise(F.concat(F.lit("null:"), F.col("doc_id")))
    keyed = docs.withColumn("fp", fp).groupBy("fp")

    def first_seen(key, pdfs, state: GroupState):
        seen = state.get[0] if state.exists else 0
        best = None
        n = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            m = pdf["doc_id"].min()
            best = m if best is None or m < best else best
        if seen == 0 and n > 0:
            yield pd.DataFrame(
                [(key[0], best, n)], columns=["fp", "doc_id", "n_dups_batch"]
            )
        state.update((seen + n,))

    dedup = keyed.applyInPandasWithState(
        first_seen,
        outputStructType="fp string, doc_id string, n_dups_batch long",
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        dedup.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "unique"))
        .option("checkpointLocation", os.path.join(out_dir, "_dedup_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    gap_s: int = 1800,
    watermark: str = "2 hours",
):
    """Stateful streaming sessionization: per-user sessions closed by a
    30-min (``gap_s``) inactivity gap — the streaming counterpart of the
    batch lag-window sessionize (__spark_entry__._events_sessionize, same
    gap rule and (ts, event_id) ordering tie-break).

    Custom stateful operator (applyInPandasWithState, EventTimeTimeout):
    state = the one OPEN session per user (start, last_ts, count). A session
    is emitted when a later event arrives past the gap (closed_by='gap') or
    when the watermark passes last_ts + gap with no successor
    (closed_by='timeout') — so every session is emitted exactly once, and
    state is one tiny row per user with an open session, evicted on close.
    Bounded by active-user cardinality, not stream length: the 100 TB
    firehose shape (with the RocksDB state store for off-heap state, as
    stream_dedup_first_seen documents).

    Late rows behind the watermark are dropped by the engine before the
    function sees them (standard arbitrary-stateful contract) — a late
    event never reopens or retro-extends an emitted session.

    Output rows: (user_id, session_start, session_end, n_events,
    closed_by). Returns the StreamingQuery (AvailableNow)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    events = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(in_dir)
    )
    keyed = (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "event_id")
        .groupBy("user_id")
    )
    gap_ms = gap_s * 1000

    def sessions(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(key[0], start_ms, last_ms, n, "timeout")],
                columns=["user_id", "start_ms", "end_ms", "n_events", "closed_by"],
            )
            return
        batch = [p for p in pdfs if len(p)]
        if not batch:
            return
        pdf = pd.concat(batch).sort_values(["ts", "event_id"])
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).tolist()
        cur = list(state.get) if state.exists else None  # [start, last, n]
        late = None  # open session among admitted-LATE events (see below)
        closed = []
        for t in ts_ms:
            if cur is not None and cur[0] - gap_ms <= t <= cur[1] + gap_ms:
                # inside (or within gap of) the open session INTERVAL — a
                # watermark-admitted out-of-order event can land BEFORE the
                # session start, so both boundaries extend (a plain
                # `t - cur[1] <= gap` test is vacuously true for any older
                # event and would drag session_end backwards)
                if late is not None:
                    if t - late[1] <= gap_ms:
                        # the late chain bridges into the open session: one
                        # session under the batch gap rule
                        cur[0] = min(cur[0], late[0])
                        cur[2] += late[2]
                    else:
                        closed.append((key[0], late[0], late[1], late[2], "gap"))
                    late = None
                cur[0] = min(cur[0], t)
                cur[1] = max(cur[1], t)
                cur[2] += 1
            elif cur is not None and t < cur[0] - gap_ms:
                # admitted late events older than the open session by more
                # than the gap sessionize AMONG THEMSELVES under the same
                # gap rule (emitting each as a singleton diverged from the
                # batch counterpart whenever a batch held >1 late event);
                # rows are time-sorted, so the late chain only extends right
                if late is None:
                    late = [t, t, 1]
                elif t - late[1] <= gap_ms:
                    late[1] = t
                    late[2] += 1
                else:
                    closed.append((key[0], late[0], late[1], late[2], "gap"))
                    late = [t, t, 1]
            else:
                if late is not None:
                    closed.append((key[0], late[0], late[1], late[2], "gap"))
                    late = None
                if cur is not None:
                    closed.append((key[0], cur[0], cur[1], cur[2], "gap"))
                cur = [t, t, 1]
        if late is not None:
            # still older than the open session by > gap: gap-closed now
            # (a LATER batch's admitted late event can no longer extend an
            # emitted session — the documented append-mode approximation)
            closed.append((key[0], late[0], late[1], late[2], "gap"))
        state.update(tuple(cur))
        # fires once the event-time watermark passes the gap horizon; the
        # input rows above are never behind the watermark, so this timestamp
        # is always in the engine's future
        state.setTimeoutTimestamp(cur[1] + gap_ms)
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "start_ms", "end_ms", "n_events", "closed_by"],
            )

    out = keyed.applyInPandasWithState(
        sessions,
        outputStructType=(
            "user_id long, start_ms long, end_ms long, n_events long, closed_by string"
        ),
        stateStructType="start_ms long, end_ms long, n_events long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    ).select(
        "user_id",
        F.timestamp_millis(F.col("start_ms")).alias("session_start"),
        F.timestamp_millis(F.col("end_ms")).alias("session_end"),
        "n_events",
        "closed_by",
    )
    return (
        out.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "sessions"))
        .option("checkpointLocation", os.path.join(out_dir, "_session_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_curate(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    min_words: int = 10,
):
    """Streaming training-data ingestion: the curation pipeline as a
    continuous query — PII redaction + quality gates run STATELESS per
    micro-batch, then a stateful cross-batch first-seen exact dedup
    (fingerprint state in the streaming checkpoint, so restarts keep
    deduping against everything ever ingested — the streaming counterpart
    of jobs/curate.py's batch gate order).

    Every input doc is emitted exactly once with attribution:
      verdict='kept'      survivor (first of its fingerprint, quality-ok)
      verdict='quality'   failed the quality gate (never enters dedup state)
      verdict='exact_dup' fingerprint already seen (dup_of = first doc id)

    State: one (first_id,) row per distinct KEPT fingerprint — quality
    rejects never pollute the state, matching the batch pipeline where the
    dedup gate only sees quality survivors. Output parquet under curated/.
    Returns the StreamingQuery (AvailableNow)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from sparkdoc.filters import with_pii_stats
    from sparkdoc.textops import doc_fingerprint, quality_filter

    docs = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 64)
        .parquet(in_dir)
    )
    redacted = with_pii_stats(docs).select(
        "doc_id", F.col("redacted").alias("text")
    )
    gated = quality_filter(redacted, min_words=min_words).select(
        "doc_id", "text", "quality_keep"
    )
    fp = F.when(
        (F.col("quality_keep") == 1) & F.col("text").isNotNull(),
        doc_fingerprint(F.col("text")),
    ).otherwise(F.concat(F.lit("reject:"), F.col("doc_id")))
    keyed = gated.withColumn("fp", fp).groupBy("fp")

    def curate_group(key, pdfs, state: GroupState):
        rows = []
        batch = [p for p in pdfs if len(p)]
        if not batch:
            return
        pdf = pd.concat(batch).sort_values("doc_id")
        if (pdf["quality_keep"] == 0).any():
            # reject:<doc_id> keys hold exactly one quality-rejected doc
            for _, r in pdf.iterrows():
                rows.append((r["doc_id"], r["text"], "quality", None))
            yield pd.DataFrame(rows, columns=["doc_id", "text", "verdict", "dup_of"])
            return
        first = state.get[0] if state.exists else None
        for _, r in pdf.iterrows():
            if first is None:
                first = r["doc_id"]
                rows.append((r["doc_id"], r["text"], "kept", None))
            else:
                rows.append((r["doc_id"], r["text"], "exact_dup", first))
        state.update((first,))
        yield pd.DataFrame(rows, columns=["doc_id", "text", "verdict", "dup_of"])

    out = keyed.applyInPandasWithState(
        curate_group,
        outputStructType="doc_id string, text string, verdict string, dup_of string",
        stateStructType="first_id string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        out.writeStream.format("parquet")
        .option("path", os.path.join(out_dir, "curated"))
        .option("checkpointLocation", os.path.join(out_dir, "_curate_checkpoint"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
