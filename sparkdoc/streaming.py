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

No watermarks/event-time: documents carry no event time (SURVEY §2.10).
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
