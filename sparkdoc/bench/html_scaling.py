#!/usr/bin/env python
"""Two-parallelism scaling evidence for the raw-format first miles.

Same harness shape as sparkdoc/bench/run.py (see its docstring for why the
sandbox expresses the N→4N-executor criterion over 2→8 cores): the identical
parse → spans job on the same seeded corpus at local[low] and local[high] in
SEPARATE JVMs, best-of-N walls, efficiency
``eff = thr_high / ((high/low) * thr_low)``.

    python -m sparkdoc.bench.html_scaling --docs 24000 --low 2 --high 8
    python -m sparkdoc.bench.html_scaling --fmt pdf --docs 8000
    python -m sparkdoc.bench.html_scaling --fused   # zero-shuffle html path
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from sparkdoc.session import get_spark
from sparkdoc.htmlparse import flatten_html, html_to_documents_fused
from sparkdoc.mdparse import flatten_markdown, md_to_documents
from sparkdoc.docxparse import flatten_docx, docx_to_documents
from sparkdoc.pdfparse import flatten_pdf
from sparkdoc.ingest import mixed_to_documents
from sparkdoc.spans import extract_documents
from sparkdoc.synth import (
    html_corpus_df, md_corpus_df, docx_corpus_df, pdf_corpus_df,
    mixed_corpus_df, warc_corpus_df, xlsx_corpus_df, pptx_corpus_df,
    adoc_corpus_df, vtt_corpus_df, jats_corpus_df, uspto_corpus_df,
    mets_corpus_df,
)
from sparkdoc.xlsxparse import flatten_xlsx, xlsx_to_documents
from sparkdoc.pptxparse import flatten_pptx, pptx_to_documents
from sparkdoc.adocparse import flatten_adoc, adoc_to_documents
from sparkdoc.vttparse import flatten_vtt, vtt_to_documents
from sparkdoc.jatsparse import flatten_jats, jats_to_documents
from sparkdoc.usptoparse import flatten_uspto, uspto_to_documents
from sparkdoc.metsparse import flatten_mets
from sparkdoc.warc import warc_extract

cores = {cores}
n_docs = {docs}
fused = {fused}
fmt = {fmt!r}
CORPUS = dict(html=html_corpus_df, md=md_corpus_df, docx=docx_corpus_df,
              pdf=pdf_corpus_df, mixed=mixed_corpus_df,
              warc=warc_corpus_df, xlsx=xlsx_corpus_df,
              pptx=pptx_corpus_df, adoc=adoc_corpus_df,
              vtt=vtt_corpus_df, jats=jats_corpus_df,
              uspto=uspto_corpus_df, mets=mets_corpus_df)[fmt]
FLAT = dict(html=flatten_html, md=flatten_markdown, docx=flatten_docx,
            pdf=flatten_pdf, xlsx=flatten_xlsx, pptx=flatten_pptx,
            adoc=flatten_adoc, vtt=flatten_vtt, jats=flatten_jats,
            uspto=flatten_uspto, mets=flatten_mets).get(fmt)
FUSED = dict(html=html_to_documents_fused, md=md_to_documents,
             docx=docx_to_documents, mixed=mixed_to_documents,
             xlsx=xlsx_to_documents, pptx=pptx_to_documents,
             adoc=adoc_to_documents, vtt=vtt_to_documents,
             jats=jats_to_documents, uspto=uspto_to_documents).get(fmt)
if fused and FUSED is None and fmt not in ("mixed", "warc"):
    raise SystemExit("--fused: %s has no fused path (multi-page geometry)" % fmt)
if fmt == "mixed":
    job = lambda df: mixed_to_documents(df)  # sniff+route is fused by design
elif fmt == "warc":
    job = lambda df: warc_extract(df)  # --docs counts FILES (7 docs each)
elif fused:
    job = lambda df: FUSED(df)
else:
    job = lambda df: extract_documents(FLAT(df))
spark = get_spark("fmt-scaling-%d" % cores, master="local[%d]" % cores,
                  shuffle_partitions=cores * 4,
                  extra_conf={{"spark.sql.adaptive.coalescePartitions.enabled": "false"}})
html = CORPUS(spark, n_docs, 42, partitions=max(cores * 4, 16)).persist()
html.count()
warm = CORPUS(spark, 8 * cores, 7, partitions=cores)
job(warm).count()
walls = []
n_spans = 0
for _ in range({reps}):
    t0 = time.monotonic()
    n_spans = int(job(html).select(F.sum(F.size("spans"))).collect()[0][0])
    walls.append(time.monotonic() - t0)
wall = min(walls)
print("RESULT " + json.dumps({{"cores": cores, "wall_sec": round(wall, 3),
      "walls": [round(w, 2) for w in walls],
      "docs_per_sec": round(n_docs / wall, 2), "n_spans": n_spans}}))
spark.stop()
"""


def run_level(repo: str, cores: int, docs: int, reps: int, fused: bool = False,
              fmt: str = "html") -> dict:
    code = _WORKER.format(repo=repo, cores=cores, docs=docs, reps=reps,
                          fused=repr(fused), fmt=fmt)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT line (cores={cores}):\n{out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=24000)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fused", action="store_true",
                    help="measure the zero-shuffle fused documents path")
    ap.add_argument("--record", action="store_true",
                    help="write the result into BENCH/scaling.json")
    ap.add_argument("--fmt", default="html", choices=["html", "md", "docx", "pdf", "mixed", "warc", "xlsx", "pptx", "adoc", "vtt", "jats", "uspto", "mets"])
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lo = run_level(repo, args.low, args.docs, args.reps, args.fused, args.fmt)
    hi = run_level(repo, args.high, args.docs, args.reps, args.fused, args.fmt)
    assert lo["n_spans"] == hi["n_spans"], "span counts must match across levels"
    ratio = args.high / args.low
    eff = hi["docs_per_sec"] / (ratio * lo["docs_per_sec"])
    job = ("warc_container_ingest" if args.fmt == "warc"
           else "mixed_sniff_route" if args.fmt == "mixed"
           else f"{args.fmt}_fused" if args.fused
           else f"{args.fmt}_flatten_extract")
    print(json.dumps({
        "job": job,
        "docs": args.docs,
        "low": lo,
        "high": hi,
        "scaling_efficiency": round(eff, 3),
    }))
    if args.record:
        from sparkdoc.bench.record import record_scaling

        record_scaling(
            job,
            {
                "eff": round(eff, 3),
                "low_cores": args.low,
                "high_cores": args.high,
                "n_docs": args.docs,
                "docs_per_sec_high": hi["docs_per_sec"],
                "harness": "python -m sparkdoc.bench.html_scaling --fmt %s --docs %d --low %d --high %d%s"
                % (args.fmt, args.docs, args.low, args.high, " --fused" if args.fused else ""),
            },
        )


if __name__ == "__main__":
    main()
