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
    from sparkdoc.chunker import chunk_documents
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

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # Idempotent sink: each batch owns its batch_id=N directory and
        # OVERWRITES it, so a post-write/pre-commit crash that replays the
        # batch cannot duplicate rows. Readers scan documents/batch_id=*/.
        docs = extract_documents(batch_df).persist()
        docs.write.mode("overwrite").parquet(
            os.path.join(out_dir, "documents", f"batch_id={batch_id}")
        )
        if chunk:
            chunk_documents(docs).write.mode("overwrite").parquet(
                os.path.join(out_dir, "chunks", f"batch_id={batch_id}")
            )
        docs.unpersist()

    writer = (
        raw.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(out_dir, "_stream_checkpoint"))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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
