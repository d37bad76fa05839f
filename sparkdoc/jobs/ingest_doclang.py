#!/usr/bin/env python
"""spark-submit entrypoint: DocLang ingest — load a corpus delivered as
DocLang serializations back into the engine's documents/spans table
(reference DoclangInputHandler, core/input/handlers.py:526-570, as a
cluster job).

    spark-submit --driver-memory 16g --py-files sparkdoc.zip sparkdoc/jobs/ingest_doclang.py \
        --input /data/dclg_dir --out /data/documents

Input is either a directory of ``*.dclg`` files (doc_id = file stem, one
document per file — the reference's file-at-a-time shape) or a parquet
dataset with (doc_id, dclg) columns (the engine's own doclang_documents
output). Output: the nested documents table
(doc_id, spans array<struct<kind,text,media_ref,offset>>) — BASELINE.json
input_hint shape — written bucketed by doc_id hash for co-located downstream
joins. Prints ONE JSON summary line."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir of *.dclg files, or parquet with (doc_id, dclg)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from sparkdoc.serialize import parse_doclang
    from sparkdoc.session import get_spark

    spark = get_spark("sparkdoc-ingest-doclang", shuffle_partitions=args.shuffle_partitions)

    has_dclg_files = os.path.isdir(args.input) and any(
        f.endswith(".dclg") for f in os.listdir(args.input)
    )
    if has_dclg_files:
        # one doc per file; wholetext keeps each serialization intact
        raw = spark.read.text(os.path.join(args.input, "*.dclg"), wholetext=True)
        # input_file_name() returns the URI-encoded path — decode so a file
        # named "quarterly report.dclg" yields doc_id "quarterly report",
        # not "quarterly%20report" (try_: never fail the ingest on a path
        # the JVM produced; fall back to the raw stem). url_decode is
        # FORM-decoding ('+' → space) but the JVM never form-encodes paths:
        # protect literal '+' so "a+b.dclg" stays doc_id "a+b" and can't
        # collide with "a b.dclg"
        stem = F.regexp_extract(F.input_file_name(), r"([^/]+)\.dclg$", 1)
        protected = F.replace(stem, F.lit("+"), F.lit("%2B"))
        docs = raw.select(
            F.coalesce(F.try_url_decode(protected), stem).alias("doc_id"),
            F.col("value").alias("dclg"),
        )
    else:
        docs = spark.read.parquet(args.input).select("doc_id", "dclg")

    spans = parse_doclang(docs)
    nested = (
        spans.repartition(args.buckets, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ).alias("_s")
        )
        .select(
            "doc_id",
            F.transform(
                "_s",
                lambda s: F.struct(
                    s["kind"].alias("kind"), s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"), s["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )
    # the canonical bucket formula (shared with the resumable extract job so
    # both outputs stay join-co-locatable on doc_id)
    from sparkdoc.checkpoint import with_bucket

    nested = with_bucket(nested, args.buckets)
    nested.write.mode("overwrite").partitionBy("bucket").parquet(os.path.join(args.out, "documents"))

    written = spark.read.parquet(os.path.join(args.out, "documents"))
    summary = written.agg(
        F.count("*").alias("docs"), F.sum(F.size("spans")).alias("spans")
    ).collect()[0]
    print(json.dumps(
        {"job": "ingest_doclang", "docs": int(summary["docs"]), "spans": int(summary["spans"] or 0)}
    ))
    spark.stop()


if __name__ == "__main__":
    main()
