"""Provenance: verbatim anchor scan + ledger assembly.

The reference's anchor scan (core/provenance/anchor_scan.py:38-110) is a
string-containment theta join of node id values against chunk texts within a
document. Spark-first expression: equi-join on doc_id (co-partitioned), then
a JVM-side `locate()` containment predicate — no Python in the hot path.

Guards reproduced:
  * value length >= 3                          (anchor_scan.py:68-72)
  * pure-numeric values need >= 4 digits       (anchor_scan.py:68-72)
  * > 6 matching chunks ⇒ non-distinctive drop (anchor_scan.py:35,94-96)
  * XML-escape retry on no-match               (anchor_scan.py:98-110)
  * first occurrence span [start, end) per chunk
  * anchors capped at 8 per node               (provenance/identity.py:20-25)

Ledger shape: (doc_id, identity_key, path, ids, anchors) — FIXTURES.md F5;
anchor kinds observed|verbatim|derived|reconciled with strength ordering in
schemas.ANCHOR_KIND_STRENGTH (provenance/models.py:22-27).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve against module globals

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANCHOR_MIN_LEN = 3
ANCHOR_MIN_DIGITS = 4
MAX_VERBATIM_CHUNKS = 6
MAX_ANCHORS = 8


def _xml_escape(col):
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    return out


#: skew guard: distinct values scanned per document (deterministic prefix by
#: value order); a degenerate doc with 10^4 ids x 10^4 chunks would otherwise
#: build a 10^8-row theta intermediate
MAX_SCAN_VALUES_PER_DOC = 10_000


def anchor_scan(entities: DataFrame, chunks: DataFrame) -> DataFrame:
    """For every (node, id value), verbatim anchors into chunk texts.

    entities: (doc_id, node_id, ids map<string,string>, ...)
    chunks:   (doc_id, chunk_id, text, ...)
    returns:  (doc_id, node_id, field, value, chunk_id, start, end)

    Scale shape: the containment theta join runs over DISTINCT (doc, value)
    pairs only — repeated ids across nodes scan once and the per-doc
    intermediate is bounded by distinct values x chunks, further capped at
    MAX_SCAN_VALUES_PER_DOC values per doc (deterministic prefix; the
    reference's scan is naturally bounded by real extraction output, this
    guards the pathological corpus). Hits re-join to (node, field) rows on an
    equi key afterwards. The distinctiveness cap (> MAX_VERBATIM_CHUNKS
    chunks ⇒ anchors nothing) applies per (node, field) exactly as before.
    """
    values = (
        entities.select("doc_id", "node_id", F.explode("ids").alias("field", "value"))
        .filter(F.length("value") >= ANCHOR_MIN_LEN)
        .filter(
            ~(F.col("value").rlike("^[0-9]+$") & (F.length("value") < ANCHOR_MIN_DIGITS))
        )
        .withColumn("_lv", F.lower("value"))
    )
    # phase 1: scan DISTINCT values per doc (skew guard: capped, deterministic)
    wv = Window.partitionBy("doc_id").orderBy("_lv")
    dv = (
        values.groupBy("doc_id", "_lv")
        # one representative RAW spelling per lowered value — the needle for
        # chunks that fell back to case-sensitive scanning (below)
        .agg(F.min("value").alias("_rv"))
        .withColumn("_rn", F.row_number().over(wv))
        .filter(F.col("_rn") <= MAX_SCAN_VALUES_PER_DOC)
        .drop("_rn")
        .withColumn("_le", F.lower(_xml_escape(F.col("_lv"))))
    )
    # lower() can CHANGE string length (e.g. U+0130 lowers to two codepoints),
    # which would shift every span offset right of the fold point — offsets
    # into _lt must stay valid against the ORIGINAL text, so chunks where the
    # fold is not length-preserving fall back to case-sensitive scanning
    # (fewer matches, never a wrong span; the reference's exact-match
    # fallback inside _first_occurrence, anchor_scan.py:44-47)
    _low = F.lower("text")
    ch = chunks.select(
        "doc_id",
        "chunk_id",
        F.when(F.length(_low) == F.length("text"), _low).otherwise(F.col("text")).alias("_lt"),
        (F.length(_low) == F.length("text")).alias("_folded"),
    )
    dv = dv.withColumn("_resc", _xml_escape(F.col("_rv")))
    j = dv.join(ch, "doc_id")  # per-doc theta join on distinct values; AQE splits skew
    pos_raw = F.expr("locate(_lv, _lt)")
    pos_esc = F.expr("locate(_le, _lt)")
    pos_rv = F.expr("locate(_rv, _lt)")  # exact-case needles: fallback chunks
    pos_resc = F.expr("locate(_resc, _lt)")
    esc_differs = F.col("_le") != F.col("_lv")
    # raw and escaped hits tagged SEPARATELY: the reference retries the
    # escaped form GLOBALLY per value — only when the raw scan finds nothing
    # (or overflows the distinctiveness cap) across ALL the doc's chunks
    # (anchor_scan.py:74-80) — never chunk-by-chunk; a per-chunk cascade
    # would anchor the escaped spelling alongside raw hits in corpora mixing
    # escaped and unescaped chunk text (caught by the r5 reference-parity
    # fuzz)
    j = j.withColumn(
        "_hit_raw",
        F.when(F.col("_folded") & (pos_raw > 0),
               F.struct(pos_raw.alias("pos"), F.length("_lv").alias("len")))
        .when(~F.col("_folded") & (pos_rv > 0),
              F.struct(pos_rv.alias("pos"), F.length("_rv").alias("len"))),
    ).withColumn(
        "_hit_esc",
        F.when(esc_differs & F.col("_folded") & (pos_esc > 0),
               F.struct(pos_esc.alias("pos"), F.length("_le").alias("len")))
        .when(esc_differs & ~F.col("_folded") & (pos_resc > 0),
              F.struct(pos_resc.alias("pos"), F.length("_resc").alias("len"))),
    ).filter(F.col("_hit_raw").isNotNull() | F.col("_hit_esc").isNotNull())
    wv2 = Window.partitionBy("doc_id", "_lv")
    n_raw = F.count("_hit_raw").over(wv2)
    n_esc = F.count("_hit_esc").over(wv2)
    # distinctiveness cap applies per scan pass, exactly as the reference:
    # raw hits win when 1..MAX of them exist; otherwise (none, or too many)
    # the escaped retry's hits apply under the same cap
    use_raw = (n_raw >= 1) & (n_raw <= MAX_VERBATIM_CHUNKS)
    use_esc = ~use_raw & (n_esc >= 1) & (n_esc <= MAX_VERBATIM_CHUNKS)
    j = j.withColumn(
        "_hit",
        F.when(use_raw, F.col("_hit_raw")).when(use_esc, F.col("_hit_esc")),
    ).filter(F.col("_hit").isNotNull())
    hits = j.select("doc_id", "_lv", "chunk_id", "_hit")
    # phase 2: hits fan back out to (node, field) rows via an equi join
    j2 = values.join(hits, ["doc_id", "_lv"])
    return j2.select(
        "doc_id",
        "node_id",
        "field",
        "value",
        "chunk_id",
        (F.col("_hit.pos") - 1).alias("start"),
        (F.col("_hit.pos") - 1 + F.col("_hit.len")).alias("end"),
    )


def build_ledger(entities: DataFrame, chunks: DataFrame) -> DataFrame:
    """LEDGER-schema table: verbatim anchors from the scan; nodes with no
    verbatim hit fall back to 'observed' anchors at their first-emission
    chunks (binder ladder rungs 1+3, binder.py:172-356)."""
    scans = anchor_scan(entities, chunks)
    verb = scans.groupBy("doc_id", "node_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("chunk_id").cast("int").alias("chunk_id"),
                        F.lit("verbatim").alias("kind"),
                        F.array(F.col("start").cast("int"), F.col("end").cast("int")).alias("span"),
                    )
                )
            ),
            1,
            MAX_ANCHORS,
        ).alias("_verbatim")
    )
    base = entities.select("doc_id", "node_id", "path", "ids", "chunk_ids")
    out = base.join(verb, ["doc_id", "node_id"], "left")
    observed = F.slice(
        F.transform(
            F.coalesce(F.col("chunk_ids"), F.array()),
            lambda c: F.struct(
                c.cast("int").alias("chunk_id"),
                F.lit("observed").alias("kind"),
                F.array(F.lit(0), F.lit(0)).alias("span"),
            ),
        ),
        1,
        MAX_ANCHORS,
    )
    return out.select(
        "doc_id",
        F.col("node_id").alias("identity_key"),
        "path",
        "ids",
        F.coalesce(F.col("_verbatim"), observed).alias("anchors"),
    )


def coverage_stats(chunks: DataFrame, ledger: DataFrame) -> DataFrame:
    """Covered-chunk accounting (dense/orchestrator.py:1472-1480,2010-2070):
    per doc — total chunks, chunks referenced by any anchor, retention."""
    total = chunks.groupBy("doc_id").agg(F.countDistinct("chunk_id").alias("n_chunks"))
    covered = (
        ledger.select("doc_id", F.explode("anchors").alias("a"))
        .select("doc_id", F.col("a.chunk_id").alias("chunk_id"))
        # count only chunks that EXIST: an anchor referencing a phantom chunk
        # id (stale ledger, malformed anchor) must not inflate coverage past
        # 1.0 — retention is a ratio over the real chunk set
        .join(chunks.select("doc_id", "chunk_id").distinct(), ["doc_id", "chunk_id"], "left_semi")
        .groupBy("doc_id")
        .agg(F.countDistinct("chunk_id").alias("n_covered"))
    )
    return total.join(covered, "doc_id", "left").select(
        "doc_id",
        "n_chunks",
        F.coalesce("n_covered", F.lit(0)).alias("n_covered"),
        (F.coalesce("n_covered", F.lit(0)) / F.col("n_chunks")).alias("coverage"),
    )


# --- binder ladder: graph nodes × existing ledger ---------------------------

from functools import lru_cache


@lru_cache(maxsize=None)
def _canon_id_text_udf():
    """canonical_id_text (provenance/identity.py:63-66): canonicalized id
    values, sorted by field, space-joined — the fuzzy-containment key."""
    import json

    from pyspark.sql.functions import pandas_udf

    from sparkdoc.identity import canonicalize_identity

    @pandas_udf("string")
    def _udf(ids_json: pd.Series) -> pd.Series:
        def canon(j):
            ids = json.loads(j) if j else {}
            parts = [
                canonicalize_identity(v, k) for k, v in sorted(ids.items()) if v is not None
            ]
            return " ".join(p for p in parts if p)

        return ids_json.map(canon)

    return _udf


def bind_provenance(
    nodes: DataFrame,
    ledger: DataFrame,
    chunks: DataFrame | None = None,
    node_level: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The binder ladder (core/provenance/binder.py:172-356): annotate graph
    nodes with a compact provenance view from an EXISTING ledger. Every node
    gets exactly one of a resolved view or {"status": "unresolved"} — never a
    wrong attribution and never silence.

    Rungs, in order:
      1. exact      — ledger entry with the node's identity key (node ids are
                      registry-deterministic, so the key IS the node_id)
      2. fuzzy      — UNIQUE canonical-containment match within the same
                      catalog path (binder.py:154-170): skeleton-vs-fill id
                      drift ("Article 5" vs "article 5 termination") still
                      binds; ambiguous (>1 candidate) never binds
      3. verbatim   — the node's final id values located verbatim in chunk
                      texts (anchor_scan), when ``chunks`` is given
      4. fallback   — ``node_level=False`` (direct-contract ledgers) falls
                      back to document scope; node-level ledgers mark
                      unresolved

    nodes: (doc_id, node_id, path, ids, ...). Returns (nodes with a
    ``provenance`` JSON column, bind_stats one-row rollup).
    """
    n = nodes.withColumn("_ct", _canon_id_text_udf()(F.to_json("ids")))
    led = ledger.select(
        F.col("doc_id").alias("_l_doc"),
        F.col("identity_key").alias("_l_key"),
        F.col("path").alias("_l_path"),
        F.col("ids").alias("_l_ids"),
        F.col("anchors").alias("_l_anchors"),
    ).withColumn("_lt", _canon_id_text_udf()(F.to_json("_l_ids")))

    # rung 1: exact identity key
    exact = (
        n.join(led, (n["doc_id"] == led["_l_doc"]) & (n["node_id"] == led["_l_key"]))
        .select("doc_id", "node_id", F.col("_l_anchors").alias("_anchors"))
        .withColumn("_bind", F.lit("observed"))
        .dropDuplicates(["doc_id", "node_id"])
    )
    n2 = n.join(exact.select("doc_id", "node_id"), ["doc_id", "node_id"], "left_anti")

    # rung 2: unique same-path canonical containment (len >= 3)
    cand = (
        n2.filter(F.length("_ct") >= 3)
        .join(
            led,
            (n2["doc_id"] == led["_l_doc"])
            & (n2["path"] == led["_l_path"])
            # the len >= 3 guard applies to BOTH sides: a 1-2 char ledger
            # canonical would containment-match half the path and hand out
            # wrong fuzzy attributions
            & (F.length("_lt") >= 3)
            & (F.col("_ct").contains(F.col("_lt")) | F.col("_lt").contains(F.col("_ct"))),
        )
    )
    uniq = Window.partitionBy("doc_id", "node_id")
    fuzzy = (
        cand.withColumn("_n", F.count("*").over(uniq))
        .filter(F.col("_n") == 1)
        .select("doc_id", "node_id", F.col("_l_anchors").alias("_anchors"))
        .withColumn("_bind", F.lit("fuzzy"))
    )
    n3 = n2.join(fuzzy.select("doc_id", "node_id"), ["doc_id", "node_id"], "left_anti")

    # rung 3: verbatim locate of the node's final id values
    if chunks is not None:
        scans = anchor_scan(n3.select("doc_id", "node_id", "ids"), chunks)
        verb = (
            scans.groupBy("doc_id", "node_id")
            .agg(
                F.slice(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("chunk_id").cast("int").alias("chunk_id"),
                                F.lit("verbatim").alias("kind"),
                                F.array(
                                    F.col("start").cast("int"), F.col("end").cast("int")
                                ).alias("span"),
                            )
                        )
                    ),
                    1,
                    MAX_ANCHORS,
                ).alias("_anchors")
            )
            .withColumn("_bind", F.lit("verbatim"))
        )
    else:
        verb = exact.limit(0)

    resolved = exact.unionByName(fuzzy).unionByName(verb)
    bound = nodes.join(resolved, ["doc_id", "node_id"], "left").withColumn(
        "provenance",
        F.when(
            F.col("_bind").isNotNull(),
            F.to_json(F.struct(F.col("_bind").alias("kind"), F.col("_anchors").alias("anchors"))),
        ).otherwise(
            F.to_json(
                F.struct(
                    F.lit("document" if not node_level else "unresolved").alias(
                        "scope" if not node_level else "status"
                    )
                )
            )
        ),
    ).drop("_bind", "_anchors")

    stats = bound.select(
        F.get_json_object("provenance", "$.kind").alias("_k"),
        F.get_json_object("provenance", "$.status").alias("_s"),
    ).agg(
        F.count("*").alias("nodes_seen"),
        F.sum(F.when(F.col("_k") == "verbatim", 1).otherwise(0)).alias("bound_verbatim"),
        F.sum(F.when(F.col("_k").isin("observed", "fuzzy"), 1).otherwise(0)).alias("bound_observed"),
        F.sum(F.when(F.col("_k") == "fuzzy", 1).otherwise(0)).alias("bound_fuzzy"),
        F.sum(F.when(F.col("_k").isNull() & F.col("_s").isNull(), 1).otherwise(0)).alias("bound_document"),
        F.sum(F.when(F.col("_s") == "unresolved", 1).otherwise(0)).alias("unresolved"),
    )
    return bound, stats


def merge_ledgers(ledgers: list[DataFrame]) -> DataFrame:
    """Compact-view merge (provenance/identity.py:172-284 analog): union N
    ledgers, group by identity, union anchor sets with strength-max per
    (chunk_id, span) and the caps from MAX_ANCHORS."""
    from sparkdoc.schemas import ANCHOR_KIND_STRENGTH

    strength = F.create_map(
        *[F.lit(x) for kv in ANCHOR_KIND_STRENGTH.items() for x in kv]
    )
    all_l = ledgers[0]
    for l in ledgers[1:]:
        all_l = all_l.unionByName(l)
    exploded = all_l.select(
        "doc_id", "identity_key", "path", "ids", F.explode("anchors").alias("a")
    )
    best = (
        exploded.withColumn("_s", strength[F.col("a.kind")])
        .groupBy("doc_id", "identity_key", "path", F.col("a.chunk_id").alias("chunk_id"), F.col("a.span").alias("span"))
        .agg(
            F.max_by(F.col("a.kind"), F.col("_s")).alias("kind"),
            # deterministic ids pick when input ledgers disagree: richest map
            # wins, json tie-break (first() returns whichever partition lands
            # first — merged sidecars would differ run to run)
            F.max_by("ids", F.struct(F.size("ids"), F.to_json("ids"))).alias("ids"),
        )
    )
    return best.groupBy("doc_id", "identity_key", "path").agg(
        F.max_by("ids", F.struct(F.size("ids"), F.to_json("ids"))).alias("ids"),
        F.slice(
            F.array_sort(F.collect_list(F.struct("chunk_id", "kind", "span"))), 1, MAX_ANCHORS
        ).alias("anchors"),
    )
