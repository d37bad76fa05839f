"""Salted two-phase aggregation tests."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_agg_equals_plain_agg(spark):
    from sparkdoc.skew import domain_of, domain_stats
    from sparkdoc.spans import extract_documents
    from sparkdoc.synth import raw_nodes_df

    docs = extract_documents(raw_nodes_df(spark, 64, 21, partitions=8)).persist()
    salted = {r["domain"]: (r["n_docs"], r["total_spans"], r["max_spans"]) for r in domain_stats(docs).collect()}
    plain = {
        r["domain"]: (r["n_docs"], r["total_spans"], r["max_spans"])
        for r in docs.withColumn("domain", domain_of(F.col("doc_id")))
        .withColumn("n_spans", F.size("spans"))
        .groupBy("domain")
        .agg(
            F.count("doc_id").alias("n_docs"),
            F.sum("n_spans").alias("total_spans"),
            F.max("n_spans").alias("max_spans"),
        )
        .collect()
    }
    assert salted == plain
    assert len(salted) >= 3  # multiple domains present
    # zipf skew present: acme dominates
    assert salted.get("acme", (0,))[0] >= max(v[0] for v in salted.values()) * 0.5


def test_salted_plan_has_two_aggregation_phases(spark):
    from sparkdoc.skew import domain_stats
    from sparkdoc.spans import extract_documents
    from sparkdoc.synth import raw_nodes_df

    docs = extract_documents(raw_nodes_df(spark, 8, 21, partitions=2))
    plan = domain_stats(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") >= 2  # salt phase + final phase
    assert "_salt" in plan
