#!/usr/bin/env python
"""spark-submit entrypoint: the resumable extraction job.

    spark-submit --driver-memory 16g --py-files sparkdoc.zip sparkdoc/jobs/extract.py \
        --input synth:100000 --out /data/out --buckets 64 --group-size 8

``--input`` is one of
  * a parquet path of raw_nodes (FIXTURES.md F2 schema),
  * ``synth:<n_docs>`` for the seeded layout-corpus generator,
  * ``html:<parquet path>`` — a (doc_id, html) table of raw HTML strings,
    flattened in-job by htmlparse.flatten_html (zero extra shuffle),
  * ``html-synth:<n_docs>`` for the seeded messy-HTML generator (F7),
  * ``md:<parquet path>`` — a (doc_id, markdown) table of raw Markdown,
  * ``md-synth:<n_docs>`` for the seeded messy-Markdown generator,
  * ``pdf:<parquet path>`` — a (doc_id, pdf binary) table of raw PDF bytes,
  * ``pdf-synth:<n_docs>`` for the seeded real-PDF generator,
  * ``docx:<parquet path>`` — a (doc_id, docx binary) table of OOXML
    packages, or ``docx-synth:<n_docs>`` for the seeded generator,
  * ``mixed:<parquet path>`` — a (doc_id, blob binary) table of
    format-heterogeneous documents (PDF/DOCX/XLSX/PPTX/HTML/Markdown/CSV/
    DocLang bytes and standalone images interleaved, as crawl dumps arrive); each row is sniffed and routed by
    ingest.mixed_to_documents in one zero-shuffle pass — the documents
    table gains a ``fmt`` column recording the detected format,
  * ``mixed-synth:<n_docs>`` for the seeded mixed-format generator,
  * ``xlsx:<parquet>`` / ``xlsx-synth:<n>`` and ``pptx:<parquet>`` /
    ``pptx-synth:<n>`` — homogeneous Office-format tables through the
    generic flatten → XY-cut path,
  * ``adoc:<parquet>`` / ``adoc-synth:<n>`` (AsciiDoc),
    ``vtt:<parquet>`` / ``vtt-synth:<n>`` (WebVTT transcripts), and
    ``jats:<parquet>`` / ``jats-synth:<n>`` (JATS XML articles), and
    ``uspto:<parquet>`` / ``uspto-synth:<n>`` (USPTO patent XML) likewise,
  * ``mets:<parquet>`` / ``mets-synth:<n>`` — (doc_id, blob binary) tables
    of METS/ALTO scan bundles (tar.gz: one METS manifest + per-page ALTO
    OCR), real multi-page geometry through the generic XY-cut path,
  * ``dljson:<parquet path>`` — a (doc_id, blob binary) table of serialized
    DoclingDocument JSON dumps (the reference's conversion-skipping input),
    or ``dljson-synth:<n_docs>`` for the seeded generator,
  * ``warc:<parquet path>`` — a (warc_name, content binary) table of WARC
    container files (plain or per-record-gzip): records split, HTTP
    payloads extracted, every document sniffed + routed like ``mixed:``,
  * ``warc-synth:<n_files>`` for the seeded WARC generator,
  * ``warcdir:<path>`` — real ``.warc``/``.warc.gz`` container FILES on the
    filesystem (a file, directory, or glob) via the warc Python Data Source
    (sparkdoc/warcsource.py): one input partition per container, records
    streamed off disk, no parquet staging step. Resumable runs bucket by
    CONTAINER (bucket = crc32 of the container name, applied as a
    planning-time listing filter in the source), so each container is
    opened exactly once per run — a doc-hash bucket filter would sit
    downstream of the container split and stream the whole crawl through
    IO+gzip once per bucket group.
The job commits per-bucket-group manifests (lineage + metrics) and resumes
from them — kill it mid-run and rerun the same command to continue.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def resolve_input(spark, spec: str, seed: int = 42, n_buckets: int | None = None):
    """Resolve an --input spec (see module docstring) to
    (raw, documents_fn, raw_for_group): ``raw`` is the frame run_resumable
    buckets, ``documents_fn`` is the deferred per-group blob parse for
    mixed/WARC inputs (None otherwise), and ``raw_for_group`` is the
    container-bucketed group factory for ``warcdir:`` inputs when
    ``n_buckets`` is given (None otherwise) — it makes the warc source list
    and read ONLY the group's container files (planning-time bucket filter
    on file_bucket(warc_name)), so each container is opened exactly once
    per run instead of once per bucket group (the doc-hash bucket filter
    sits downstream of the container split and cannot prune it).
    Shared by the extract job and the end-to-end web pipeline."""
    from sparkdoc.synth import raw_nodes_df

    documents_fn = None
    raw_for_group = None
    if spec.startswith("synth:"):
        raw = raw_nodes_df(spark, int(spec.split(":", 1)[1]), seed)
    elif spec.startswith("synth-skew:"):
        from sparkdoc.synth import skewed_raw_nodes_df

        raw = skewed_raw_nodes_df(spark, int(spec.split(":", 1)[1]), seed)
    elif spec.startswith("html-synth:"):
        from sparkdoc.htmlparse import flatten_html
        from sparkdoc.synth import html_corpus_df

        raw = flatten_html(
            html_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("html:"):
        from sparkdoc.htmlparse import flatten_html

        raw = flatten_html(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("md-synth:"):
        from sparkdoc.mdparse import flatten_markdown
        from sparkdoc.synth import md_corpus_df

        raw = flatten_markdown(
            md_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("md:"):
        from sparkdoc.mdparse import flatten_markdown

        raw = flatten_markdown(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("pdf-synth:"):
        from sparkdoc.pdfparse import flatten_pdf
        from sparkdoc.synth import pdf_corpus_df

        raw = flatten_pdf(
            pdf_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("pdf:"):
        from sparkdoc.pdfparse import flatten_pdf

        raw = flatten_pdf(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("docx-synth:"):
        from sparkdoc.docxparse import flatten_docx
        from sparkdoc.synth import docx_corpus_df

        raw = flatten_docx(
            docx_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("docx:"):
        from sparkdoc.docxparse import flatten_docx

        raw = flatten_docx(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("xlsx-synth:"):
        from sparkdoc.synth import xlsx_corpus_df
        from sparkdoc.xlsxparse import flatten_xlsx

        raw = flatten_xlsx(
            xlsx_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("xlsx:"):
        from sparkdoc.xlsxparse import flatten_xlsx

        raw = flatten_xlsx(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("pptx-synth:"):
        from sparkdoc.pptxparse import flatten_pptx
        from sparkdoc.synth import pptx_corpus_df

        raw = flatten_pptx(
            pptx_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("pptx:"):
        from sparkdoc.pptxparse import flatten_pptx

        raw = flatten_pptx(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("adoc-synth:"):
        from sparkdoc.adocparse import flatten_adoc
        from sparkdoc.synth import adoc_corpus_df

        raw = flatten_adoc(
            adoc_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("adoc:"):
        from sparkdoc.adocparse import flatten_adoc

        raw = flatten_adoc(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("vtt-synth:"):
        from sparkdoc.synth import vtt_corpus_df
        from sparkdoc.vttparse import flatten_vtt

        raw = flatten_vtt(
            vtt_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("vtt:"):
        from sparkdoc.vttparse import flatten_vtt

        raw = flatten_vtt(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("jats-synth:"):
        from sparkdoc.jatsparse import flatten_jats
        from sparkdoc.synth import jats_corpus_df

        raw = flatten_jats(
            jats_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("jats:"):
        from sparkdoc.jatsparse import flatten_jats

        raw = flatten_jats(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("uspto-synth:"):
        from sparkdoc.synth import uspto_corpus_df
        from sparkdoc.usptoparse import flatten_uspto

        raw = flatten_uspto(
            uspto_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("uspto:"):
        from sparkdoc.usptoparse import flatten_uspto

        raw = flatten_uspto(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("mets-synth:"):
        from sparkdoc.metsparse import flatten_mets
        from sparkdoc.synth import mets_corpus_df

        raw = flatten_mets(
            mets_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("mets:"):
        from sparkdoc.metsparse import flatten_mets

        raw = flatten_mets(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("mixed-synth:"):
        from sparkdoc.synth import mixed_corpus_df

        # blobs carry doc_id, so bucketing happens BEFORE the parse — the
        # sniff+route runs once per blob total, not once per bucket group
        raw = mixed_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
    elif spec.startswith("mixed:"):
        raw = spark.read.parquet(spec.split(":", 1)[1])
    elif spec.startswith("dljson-synth:"):
        from sparkdoc.dljson import flatten_docling_json
        from sparkdoc.synth import docling_json_corpus_df

        raw = flatten_docling_json(
            docling_json_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("dljson:"):
        from sparkdoc.dljson import flatten_docling_json

        raw = flatten_docling_json(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("warc-synth:"):
        from sparkdoc.synth import warc_corpus_df
        from sparkdoc.warc import warc_to_blobs

        # record split first (cheap header scan) so the bucket filter lands
        # between the container split and the expensive per-format parse
        raw = warc_to_blobs(
            warc_corpus_df(spark, int(spec.split(":", 1)[1]), seed)
        )
    elif spec.startswith("warc:"):
        from sparkdoc.warc import warc_to_blobs

        raw = warc_to_blobs(spark.read.parquet(spec.split(":", 1)[1]))
    elif spec.startswith("warcdir:"):
        # container FILES straight off the filesystem via the warc Python
        # Data Source: one input partition per file, records streamed —
        # no parquet staging step at all
        from sparkdoc.warcsource import register_warc_source

        register_warc_source(spark)
        wpath = spec.split(":", 1)[1]
        raw = (
            spark.read.format("warc")
            .load(wpath)
            .select("doc_id", "blob")
        )
        if n_buckets is not None:
            from pyspark.sql import functions as F

            from sparkdoc.ingest import mixed_to_documents

            nb = int(n_buckets)

            def raw_for_group(group, _path=wpath, _nb=nb):
                # bucket column = F.crc32 twin of warcsource.file_bucket —
                # the SAME hash the source's planning filter applied, so the
                # column is consistent with which files were listed
                return (
                    spark.read.format("warc")
                    .option("buckets", str(_nb))
                    .option("bucketGroup", ",".join(str(b) for b in group))
                    .load(_path)
                    .select(
                        "doc_id",
                        "blob",
                        F.pmod(
                            F.crc32(F.encode(F.col("warc_name"), "utf-8")),
                            F.lit(_nb),
                        ).cast("int").alias("bucket"),
                    )
                )

            documents_fn = lambda part: mixed_to_documents(  # noqa: E731
                part, passthrough=["bucket"]
            )
    else:
        raw = spark.read.parquet(spec)

    if documents_fn is None and spec.startswith(
        ("mixed:", "mixed-synth:", "warc:", "warc-synth:", "warcdir:")
    ):
        from sparkdoc.ingest import mixed_to_documents

        documents_fn = mixed_to_documents
    return raw, documents_fn, raw_for_group


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--input", required=True,
        help="raw_nodes parquet | synth:<n> | html:<parquet> | html-synth:<n> "
             "| md:<parquet> | md-synth:<n> | pdf:<parquet> | pdf-synth:<n> "
             "| docx:<parquet> | docx-synth:<n> | xlsx:<parquet> | xlsx-synth:<n> "
             "| pptx:<parquet> | pptx-synth:<n> | adoc:<parquet> | adoc-synth:<n> "
             "| vtt:<parquet> | vtt-synth:<n> | jats:<parquet> "
             "| jats-synth:<n> | uspto:<parquet> | uspto-synth:<n> "
             "| mets:<parquet> | mets-synth:<n> | mixed:<parquet> "
             "| mixed-synth:<n> | dljson:<parquet> | dljson-synth:<n> "
             "| warc:<parquet> | warc-synth:<n> | warcdir:<path>",
    )
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--group-size", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no-chunk", action="store_true")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from sparkdoc.checkpoint import run_resumable
    from sparkdoc.session import get_spark

    spark = get_spark("sparkdoc-extract", master=args.master)
    raw, documents_fn, raw_for_group = resolve_input(
        spark, args.input, args.seed, n_buckets=args.buckets
    )
    summary = run_resumable(
        spark,
        raw,
        args.out,
        n_buckets=args.buckets,
        group_size=args.group_size,
        chunk=not args.no_chunk,
        documents_fn=documents_fn,
        raw_for_group=raw_for_group,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
