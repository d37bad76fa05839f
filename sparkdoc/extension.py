"""User extension surface (SURVEY §2.11) — the five plug-in slots the
reference exposes, re-expressed for Spark:

  custom model backend      reference config.py:161-165 + protocols.py —
                            here: per-(class, field) extractor callables that
                            fill rule-less fields (fill.extract_fields
                            consults the registry for FieldSpec.rule_kind '')
                            and a root-identity proposer (rootid micro-pass).
  alias confirm callable    graph_converter.py:181-186 ``alias_llm_fn`` —
                            confirm/reject proposed containment alias pairs;
                            here: confirm_alias_pairs() applies the callable
                            as an Arrow-batched pandas UDF over the proposal
                            table (never auto-applied, mirroring the
                            reference's confirm-only contract).
  description summarizer    description_merger.py:49-67 — an optional
                            callable merging description fragments; falls
                            back to the deterministic sentence-dedup merge.
  chunk serializer          document_chunker.py:64,113-120
                            ``serializer_provider`` — a callable rendering a
                            span group to chunk text, overriding the default
                            trail rendering.
  template validators       generated-template validators (e.g.
                            tests/fixtures/templategen/golden/invoice.py) —
                            per-class callables returning extra error strings;
                            salvage_entities folds them into the fixer-ladder
                            error set.

Everything registered here must be picklable (plain functions, not lambdas
closing over Spark objects): the registry travels to executors inside task
closures, the Spark-idiomatic replacement for the reference's in-process
plugin objects.

Wiring: pass an ``Extensions`` instance to
``extractor.convert_document_graph(..., extensions=ext)`` — it routes
field_extractors + root_id_proposer + validators into fill/salvage,
chunk_serializer into chunk_documents, and alias_confirm through
confirm_alias_pairs over the containment proposals. The description
summarizer plugs into the merge side:
``merge.merge_graphs_policy(..., summarizer=ext.description_summarizer)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType


@dataclass
class Extensions:
    """The registry object. All slots optional; None/empty = deterministic
    default behavior everywhere."""

    #: (class_name, field_name) → fn(ids: dict, context: str) → str | None
    field_extractors: dict[tuple[str, str], Callable[[dict, str], Optional[str]]] = field(
        default_factory=dict
    )
    #: fn(base_label: str, superset_label: str) → bool (True = confirm merge)
    alias_confirm: Optional[Callable[[str, str], bool]] = None
    #: fn(parts: list[str], max_length: int) → str
    description_summarizer: Optional[Callable[[list, int], str]] = None
    #: fn(span: dict) → str | None — per content span (dict carries
    #: kind/text/media_ref/offset); None/exception falls back to span text
    chunk_serializer: Optional[Callable[[dict], Optional[str]]] = None
    #: class_name → fn(entity: dict) → list[str] (extra validation errors)
    validators: dict[str, Callable[[dict], list]] = field(default_factory=dict)
    #: fn(excerpt: str, field_name: str) → str | None (root-identity micro-pass)
    root_id_proposer: Optional[Callable[[str, str], Optional[str]]] = None

    def register_field_extractor(self, class_name: str, field_name: str, fn) -> None:
        self.field_extractors[(class_name, field_name)] = fn

    def register_validator(self, class_name: str, fn) -> None:
        self.validators[class_name] = fn


def confirm_alias_pairs(pairs: DataFrame, confirm_fn: Callable[[str, str], bool]) -> DataFrame:
    """Filter proposed alias pairs through the user confirm callable — the
    ``alias_llm_fn`` slot (graph_converter.py:181-186). Containment proposals
    are CANDIDATES only; a pair survives iff the callable confirms it. The
    callable runs Arrow-batched (pandas UDF), one call per pair, so a real
    LLM adapter should batch internally."""

    @F.pandas_udf(BooleanType())
    def _confirm(base: pd.Series, sup: pd.Series) -> pd.Series:
        return pd.Series(
            [bool(confirm_fn(b or "", s or "")) for b, s in zip(base, sup)]
        )

    # a real adapter is externally-effectful (LLM call) and need not be
    # pure: mark nondeterministic so Catalyst never pushes the predicate
    # past joins, duplicates it across plan branches, or re-evaluates it
    _confirm = _confirm.asNondeterministic()

    # the documented contract hands the callable HUMAN-READABLE labels —
    # casing/spacing/punctuation intact — not the squashed canon keys (an
    # LLM adapter judging 'acmecorp' vs 'acmecorporation' is materially
    # blinder than one seeing 'ACME Corp.' vs 'ACME Corporation'); canon is
    # the fallback for pair tables built without labels
    bcol = "base_label" if "base_label" in pairs.columns else "base_canon"
    scol = "superset_label" if "superset_label" in pairs.columns else "superset_canon"
    # cut lineage: apply_alias_merges' transitive-closure loop self-joins the
    # pair mapping 3x before its own checkpoint, embedding this plan up to 8
    # times — without truncation the confirm callable (a real LLM adapter)
    # would be re-invoked per plan copy, and copies could DISAGREE, leaving
    # chains half-merged (A→B kept while B itself survives in one branch)
    return pairs.filter(_confirm(F.col(bcol), F.col(scol))).localCheckpoint(eager=False)


def run_validators(
    entities: Iterable[dict], class_name: str, extensions: Optional[Extensions]
) -> list:
    """Extra per-entity errors from the registered class validator (used by
    salvage_entities); [] when no validator is registered."""
    if extensions is None:
        return [[] for _ in entities]
    fn = extensions.validators.get(class_name)
    if fn is None:
        return [[] for _ in entities]
    out = []
    for e in entities:
        try:
            errs = fn(e) or []
            if isinstance(errs, str):
                # easy contract mistake: a single message instead of a list —
                # iterating it would explode into one error per CHARACTER
                errs = [errs]
            out.append([str(x) for x in errs])
        except Exception as exc:  # a user validator must never kill the job
            out.append([f"validator_error: {exc}"])
    return out
