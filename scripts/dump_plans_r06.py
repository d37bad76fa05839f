#!/usr/bin/env python
"""Dump .explain('formatted') for the round-6 touched queries to
plans/r06/<name>_{before,after}.txt (suffix from argv[1])."""
import io, os, sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import __spark_entry__ as entrymod
from sparkdoc.session import get_spark

def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()

spark = get_spark("plans-r06")
names = sys.argv[2:] or [
    "doc_rrf_hybrid", "doc_bm25", "doc_bm25_pruned", "emb_knn",
    "q5_local_supplier", "q3_unshipped", "q1_pricing_summary",
    "doc_minhash", "quality_lang",
]
qs = entrymod.queries()
# quality_lang is a bench-only composite; rebuild it like bench.py does
from sparkdoc.textops import quality_filter, with_language
from pyspark.sql import functions as F

for name in names:
    if name == "quality_lang":
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        df = with_language(quality_filter(docs)).select(
            F.sum("quality_keep"), F.count_distinct("lang_pred"))
    else:
        fn = qs.get(name) or getattr(entrymod, "_" + name)
        df = fn(spark, sf_dir)
    p = plan_of(df)
    out = f"plans/r06/{name}_{suffix}.txt"
    with open(out, "w") as f:
        f.write(p)
    print(out, len(p.splitlines()), "lines")
spark.stop()
