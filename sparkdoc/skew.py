"""Skew handling: explicit salting for skewed-domain aggregations.

The corpus has zipf-skewed domains (FIXTURES F1: a handful of domains own
most documents) and long-tail document sizes. Joins get AQE skew-splitting
for free (session.py enables it); domain-keyed AGGREGATIONS don't — a
groupBy("domain") sends every acme row to one reducer. The standard fix is
two-phase salted aggregation:

  phase 1: groupBy(domain, salt = pmod(hash(doc_id), k)) — partial agg over
           k-way split hot keys (map-side combine still applies)
  phase 2: groupBy(domain) over the k partials — k rows per domain, trivial

north rule: "explicit salting of skewed-domain partitions"; SURVEY §4 skew
row and §7.3.4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 16


def with_salt(df: DataFrame, unique_col: str = "doc_id", k: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    return df.withColumn("_salt", F.pmod(F.hash(F.col(unique_col)), F.lit(k)))


def domain_of(doc_id: Column) -> Column:
    """doc_id carries a '<domain>-<n>' prefix (synth corpus convention)."""
    return F.substring_index(doc_id, "-", 1)


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    unique_col: str = "doc_id",
    k: int = DEFAULT_SALT_BUCKETS,
) -> DataFrame:
    """Two-phase salted aggregation.

    aggs: out_name → (fn, col) with fn ∈ {sum, count, min, max} — the
    fns whose partials re-combine with the same fn (count partials re-SUM).
    """
    phase1_exprs = []
    phase2_exprs = []
    for out, (fn, col) in aggs.items():
        part = f"_p_{out}"
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(part))
            phase2_exprs.append(F.sum(part).alias(out))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(part))
            phase2_exprs.append(F.sum(part).alias(out))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(part))
            phase2_exprs.append(F.min(part).alias(out))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(part))
            phase2_exprs.append(F.max(part).alias(out))
        else:
            raise ValueError(f"unsupported salted agg fn: {fn}")
    salted = with_salt(df, unique_col, k)
    p1 = salted.groupBy(*key_cols, "_salt").agg(*phase1_exprs)
    return p1.groupBy(*key_cols).agg(*phase2_exprs)


def domain_stats(documents: DataFrame, k: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Per-domain corpus stats via salted two-phase agg (the skewed 'acme'
    domain never lands on a single reducer)."""
    df = documents.withColumn("domain", domain_of(F.col("doc_id"))).withColumn(
        "n_spans", F.size("spans")
    )
    return salted_agg(
        df,
        ["domain"],
        {
            "n_docs": ("count", "doc_id"),
            "total_spans": ("sum", "n_spans"),
            "max_spans": ("max", "n_spans"),
        },
        k=k,
    )
