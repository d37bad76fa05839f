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
