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
