"""Seeded deterministic synthetic interleaved-document corpus.

Generates the FIXTURES.md F2 ``raw_nodes`` table (flattened DOM/layout node
rows) from which the extraction pipeline produces the F1 ``documents`` spans
table. All randomness derives from ``(seed, doc_index)`` so generation is
deterministic regardless of partitioning — the same doc index yields the same
nodes whether generated on the driver (tests) or on 1000 executors (bench).

Nasty cases baked in (FIXTURES.md F1/F2 requirements):
  * interleaving: text/heading runs broken by pictures, captions, tables
  * furniture: page header/footer repeated per page (tag header/footer)
  * boilerplate: nav blocks / link-farms with high link density
  * C0 control chars (NUL, BEL) inside text — sanitizer must strip
  * accents / unicode (NFKD normalizer fodder)
  * BOTTOMLEFT coordinate origins, some with unknown page height (dropped)
  * two-column pages (XY-cut reading order must recover column order)
  * node emission order shuffled (reading order must NOT come from node_id)
  * long-tail skew: ~2% of docs are 20-60 pages (vs 1-4 median) and doc_id
    carries a zipf-skewed domain prefix for salting tests
"""

from __future__ import annotations

import json
import random
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

from sparkdoc.clean import heading_text_py as _heading_text
from sparkdoc.schemas import RAW_NODES

# zipf-ish domain skew: first domain dominates (north-rule salting fodder)
DOMAINS = ["acme", "globex", "initech", "umbrella", "hooli", "wonka", "stark", "wayne"]
DOMAIN_WEIGHTS = [40, 20, 12, 9, 7, 5, 4, 3]

_WORDS = (
    "the quick brown fox jumps over lazy dog lorem ipsum dolor sit amet "
    "consectetur adipiscing elit sed do eiusmod tempor incididunt labore "
    "dolore magna aliqua revenue contract clause party obligation liability "
    "termination notice payment invoice delivery schedule warranty material "
    "électroménager propriétaire café naïve résumé zürich münchen "
    "analysis model data pipeline system process result table figure"
).split()

_PAGE_W, _PAGE_H = 612, 792
_MARGIN = 36


def _zip_writestr(zf, name: str, data) -> None:
    """writestr with a PINNED entry timestamp (1980-01-01, the DOS epoch)
    and fixed attrs: zipfile's default stamps wall-clock localtime into
    every local header, which made Office/zip blobs differ byte-for-byte
    between two runs of the "deterministic" generator (spans were stable,
    raw container bytes were not — the warc source's byte-parity test
    caught it)."""
    import zipfile as _zipfile

    zi = _zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
    zi.compress_type = zf.compression
    zi.external_attr = 0o600 << 16
    zf.writestr(zi, data)


def _pick_domain(rng: random.Random) -> str:
    return rng.choices(DOMAINS, weights=DOMAIN_WEIGHTS, k=1)[0]


def _sentence(rng: random.Random, n: int) -> str:
    ws = [rng.choice(_WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _entity_sentence(rng: random.Random) -> str:
    """Extractable entities (codes/emails/amounts) for the deterministic
    extraction shell + anchor-scan fodder."""
    kind = rng.random()
    if kind < 0.4:
        return f"Contract {rng.choice(['CT', 'INV', 'PO'])}-{rng.randint(1000, 99999)} applies."
    if kind < 0.7:
        return f"Contact {rng.choice(_WORDS[:20])}@example.com for details."
    return f"A fee of {rng.randint(10, 9000)}.{rng.randint(0, 99):02d} {rng.choice(['USD', 'EUR', 'GBP'])} is due."


def _paragraph(rng: random.Random, lo: int = 2, hi: int = 5) -> str:
    sentences = [_sentence(rng, rng.randint(6, 18)) for _ in range(rng.randint(lo, hi))]
    if rng.random() < 0.25:
        sentences.insert(rng.randrange(len(sentences) + 1), _entity_sentence(rng))
    return " ".join(sentences)


def doc_meta(doc_index: int, seed: int) -> dict:
    """Deterministic per-document shape parameters."""
    rng = random.Random(f"sparkdoc:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    heavy = rng.random() < 0.02
    n_pages = rng.randint(20, 60) if heavy else rng.randint(1, 4)
    return {
        "doc_id": f"{domain}-{doc_index:08d}",
        "rng": rng,
        "n_pages": n_pages,
        "two_col": rng.random() < 0.30,
        "bottomleft": rng.random() < 0.25,
        "unknown_height": rng.random() < 0.05,  # BOTTOMLEFT + unknown H ⇒ dropped nodes
    }


def synth_doc_nodes(doc_index: int, seed: int) -> list[dict]:
    """All raw_nodes rows for one document, in SHUFFLED emission order."""
    m = doc_meta(doc_index, seed)
    rng: random.Random = m["rng"]
    doc_id = m["doc_id"]
    page_h = None if (m["bottomleft"] and m["unknown_height"]) else _PAGE_H
    nodes: list[dict] = []
    nid = 0

    def emit(tag, text, page, x, y, w, h, n_links=0, parent=0):
        nonlocal nid
        nid += 1
        # layout y is authored TOPLEFT; convert to BOTTOMLEFT storage if asked:
        # stored bbox [l, t, r, b]; BOTTOMLEFT measures y up from page bottom
        # so t_stored = H - y (top edge) and b_stored = H - (y + h).
        if m["bottomleft"]:
            hh = page_h if page_h is not None else _PAGE_H
            bbox = [x, hh - y, x + w, hh - (y + h)]
        else:
            bbox = [x, y, x + w, y + h]
        nodes.append(
            {
                "doc_id": doc_id,
                "node_id": nid,
                "parent_id": parent,
                "tag": tag,
                "text": text,
                "n_chars": len(text),
                "n_links": n_links,
                "page_no": page,
                "bbox": bbox,
                "coord_origin": "BOTTOMLEFT" if m["bottomleft"] else "TOPLEFT",
                "page_width": _PAGE_W,
                "page_height": page_h,
            }
        )

    sec = 0
    for page in range(1, m["n_pages"] + 1):
        # furniture: repeated header/footer (reference analog: furniture
        # exclusion, orchestrator.py:127-144)
        emit("header", f"{doc_id} — CONFIDENTIAL", page, _MARGIN, 10, _PAGE_W - 2 * _MARGIN, 14)
        emit("footer", f"Page {page}", page, _MARGIN, _PAGE_H - 24, _PAGE_W - 2 * _MARGIN, 14)
        # occasional nav link-farm (boilerplate: link density ≈ 1 ⇒ dropped)
        if rng.random() < 0.4:
            links = " ".join(f"[{rng.choice(_WORDS)}]" for _ in range(8))
            # n_links = anchor CHARS (everything in a nav row is linked text),
            # the link-density numerator — see schemas.py DOM_NODE_SCHEMA
            emit("nav", links, page, _MARGIN, 28, _PAGE_W - 2 * _MARGIN, 12, n_links=len(links))

        two_col = m["two_col"] and page % 2 == 0
        col_w = (_PAGE_W - 2 * _MARGIN - 24) // 2 if two_col else _PAGE_W - 2 * _MARGIN
        cols = [(_MARGIN, 60), (_MARGIN + col_w + 24, 60)] if two_col else [(_MARGIN, 60)]
        ci = 0
        x, y = cols[0]
        n_blocks = rng.randint(4, 10)
        for _ in range(n_blocks):
            if y > _PAGE_H - 120:
                ci += 1
                if ci >= len(cols):
                    break
                x, y = cols[ci]
            r = rng.random()
            if r < 0.18:
                sec += 1
                lvl = rng.randint(1, 3)
                title = f"{'#' * lvl} §{sec} " + _sentence(rng, rng.randint(2, 5)).rstrip(".")
                emit(f"h{lvl}", title, page, x, y, col_w, 18)
                y += 26
            elif r < 0.60:
                txt = _paragraph(rng)
                if rng.random() < 0.06:  # C0 control chars → sanitizer fodder
                    txt = txt[: len(txt) // 2] + "\x00\x07" + txt[len(txt) // 2 :]
                if rng.random() < 0.03:  # oversized section → chunk re-split fodder
                    txt = _paragraph(rng, 30, 45)
                h = 14 * (1 + len(txt) // 80)
                emit("p", txt, page, x, y, col_w, h)
                y += h + 8
            elif r < 0.72:
                for _ in range(rng.randint(2, 4)):
                    item = "• " + _sentence(rng, rng.randint(4, 9))
                    emit("li", item, page, x, y, col_w, 13)
                    y += 15
                y += 6
            elif r < 0.84:
                rows = rng.randint(2, 4)
                cells = [
                    " | ".join(rng.choice(_WORDS) for _ in range(3)) for _ in range(rows)
                ]
                emit("table", "\n".join(cells), page, x, y, col_w, 16 * rows)
                y += 16 * rows + 8
            else:
                emit("img", "", page, x, y, min(col_w, 180), 120)
                y += 126
                if rng.random() < 0.6:
                    emit("figcaption", "Figure: " + _sentence(rng, rng.randint(3, 7)), page, x, y, col_w, 12)
                    y += 18

    rng.shuffle(nodes)  # reading order must be recovered by XY-cut, not node_id
    return nodes


def synth_corpus(n_docs: int, seed: int = 42) -> list[dict]:
    """Driver-side generation (tests / goldens). Rows across all docs."""
    out: list[dict] = []
    for i in range(n_docs):
        out.extend(synth_doc_nodes(i, seed))
    return out


# --------------------------------------------------------------------------
# Invoice-shaped corpus: acceptance input for the Pydantic template compiler
# (sparkdoc/template.py). Deterministic invoices/credit notes whose text the
# compiled template's discover/fill rules can extract exactly — the engine's
# analog of the reference's golden invoice template fixtures
# (tests/fixtures/templategen/golden/invoice.py as the template SHAPE, not
# its code).
# --------------------------------------------------------------------------

INVOICE_PARTIES = [
    "Acme GmbH", "Globex SARL", "Initech Ltd", "Umbrella SpA",
    "Hooli LLC", "Stark Industries", "Wonka Works", "Wayne Corp",
]
INVOICE_ITEMS = [
    ("USB-C cable", "Electronics"), ("Dock DS-300", "Electronics"),
    ("Laptop stand", "Furniture"), ("HDMI adapter", "Electronics"),
    ("Webcam W200", "Electronics"), ("Paper ream A4", "Office"),
    ("Desk lamp", "Furniture"), ("Ethernet switch", "Electronics"),
]


def synth_invoice_nodes(doc_index: int, seed: int) -> list[dict]:
    """raw_nodes rows for one synthetic invoice document (shuffled emission)."""
    rng = random.Random(f"sparkdoc-inv:{seed}:{doc_index}")
    doc_id = f"inv-{doc_index:06d}"
    is_credit = rng.random() < 0.2
    inv_no = f"{'CN' if is_credit else 'INV'}-2026-{1000 + doc_index}"
    seller, buyer = rng.sample(INVOICE_PARTIES, 2)
    vat_no = f"FR{rng.randint(10**10, 10**11 - 1)}"
    items = rng.sample(INVOICE_ITEMS, rng.randint(2, 4))
    currency = rng.choice(["EUR", "USD", "GBP"])
    issued = f"2026-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    tax_kind = rng.choice(["VAT", "GST"])
    tax_amt = f"{rng.randint(10, 900)}.{rng.randint(0, 99):02d}"

    nodes: list[dict] = []
    nid = 0
    y = 60

    def emit(tag, text, h=14, page=1, at_y=None):
        nonlocal nid, y
        nid += 1
        yy = y if at_y is None else at_y
        nodes.append(
            {
                "doc_id": doc_id,
                "node_id": nid,
                "parent_id": 0,
                "tag": tag,
                "text": text,
                "n_chars": len(text),
                "n_links": 0,
                "page_no": page,
                "bbox": [_MARGIN, yy, _PAGE_W - _MARGIN, yy + h],
                "coord_origin": "TOPLEFT",
                "page_width": _PAGE_W,
                "page_height": _PAGE_H,
            }
        )
        if at_y is None:
            y += h + 8

    emit("header", f"{doc_id} — internal copy", h=12, at_y=10)
    emit("footer", "Page 1", h=12, at_y=_PAGE_H - 24)
    emit("h1", f"# {'CREDIT NOTE' if is_credit else 'INVOICE'} {inv_no}", h=20)
    emit("p", f"Seller: {seller} (VAT {vat_no}).")
    emit("p", f"Bill To: {buyer}.")
    emit("p", f"Issued {issued}. Currency: {currency}.")
    emit("h2", "## Item Catalog", h=16)
    for name, cat in items:
        emit("li", f"* {name} [{cat}]")
    emit("h2", "## Billing Table", h=16)
    rows = []
    for rno in range(1, rng.randint(2, len(items) + 2)):
        name, _cat = rng.choice(items)
        qty = rng.randint(1, 9)
        rows.append(f"Row {rno}: {qty} x {name}.")
    emit("table", "\n".join(rows), h=16 * len(rows))
    emit("p", f"{tax_kind} {tax_amt} applied at document level.")
    emit("p", f"Total payable in {currency}. Thank you for your business.")
    rng.shuffle(nodes)
    return nodes


def invoice_corpus(n_docs: int, seed: int = 42) -> list[dict]:
    out: list[dict] = []
    for i in range(n_docs):
        out.extend(synth_invoice_nodes(i, seed))
    return out


def invoice_nodes_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed invoice-corpus generation (same shape as raw_nodes_df)."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for i in pdf["id"]:
                rows.extend(synth_invoice_nodes(int(i), seed))
            if rows:
                yield pd.DataFrame(rows)

    parts = partitions or max(4, n_docs // 256)
    return spark.range(0, n_docs, 1, parts).mapInPandas(gen, schema=RAW_NODES)


def skewed_raw_nodes_df(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    n_giants: int = 5,
    giant_factor: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """Long-haul skew corpus (``synth-skew:<n>`` input spec): the layout
    corpus with two deliberate pathologies —

    * ``n_giants`` GIANT documents (indexes 0..n_giants-1), each carrying
      ``giant_factor``× the normal span mass (100 sub-documents rebranded
      into one doc_id, node ids and pages shifted per chapter): the
      task-skew and Arrow-batch stressors the r4 verdict's 10M rehearsal
      asks for — each giant is generated, extracted and chunked inside ONE
      task/row.
    * every even doc index rebranded into the single ``acme`` domain
      (``acme-skew-…``), putting ~50% of the corpus mass in one domain on
      top of the generator's zipf head.

    Deterministic per (index, seed); giant sub-docs reuse indexes
    n_docs..n_docs+n_giants*giant_factor so they never collide with the
    base corpus ids."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for i in pdf["id"]:
                i = int(i)
                if i < n_giants:
                    gid = f"giant-{i:04d}"
                    for sub in range(giant_factor):
                        for r in synth_doc_nodes(n_docs + i * giant_factor + sub, seed):
                            r = dict(r)
                            r["doc_id"] = gid
                            r["node_id"] = r["node_id"] + sub * 100_000
                            if r.get("parent_id") is not None:
                                r["parent_id"] = r["parent_id"] + sub * 100_000
                            r["page_no"] = r["page_no"] + sub * 1_000
                            rows.append(r)
                elif i % 2 == 0:
                    did = f"acme-skew-{i:09d}"
                    for r in synth_doc_nodes(i, seed):
                        r = dict(r)
                        r["doc_id"] = did
                        rows.append(r)
                else:
                    rows.extend(synth_doc_nodes(i, seed))
            if rows:
                yield pd.DataFrame(rows)

    # coarser default than raw_nodes_df: the long-haul sizes (10^7 docs)
    # would otherwise schedule tens of thousands of generation tasks —
    # ~4k docs per partition keeps task count in the low thousands while
    # the giant docs still dominate their own tasks (the intended skew)
    parts = partitions or max(8, n_docs // 4096)
    return spark.range(0, n_docs, 1, parts).mapInPandas(gen, schema=RAW_NODES)


def raw_nodes_df(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    partitions: int | None = None,
    start: int = 0,
    stride: int = 1,
) -> DataFrame:
    """Distributed generation: spark.range → mapInPandas, deterministic per
    index. ``start``/``stride`` select a doc-id slice of the SAME corpus
    (ids start, start+stride, … < n_docs) — disjoint slices across workers
    union to exactly the stride-1 corpus, which is what lets the
    multi-executor scaling harness split one corpus across separate JVMs."""
    import pandas as pd

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for i in pdf["id"]:
                rows.extend(synth_doc_nodes(int(i), seed))
            if rows:
                yield pd.DataFrame(rows)

    parts = partitions or max(8, n_docs // 256)
    rng_df = spark.range(start, n_docs, stride, parts)
    return rng_df.mapInPandas(gen, schema=RAW_NODES)


def synth_text_documents(spark, n_docs: int, seed: int = 42, partitions: int | None = None, n_words: int = 80):
    """Deterministic (doc_id, text) corpus for the curation pipeline bench:
    word-salad base docs plus derived regimes keyed off doc_id —
      %7  == 0 → an EXACT duplicate twin at +10M (redaction-stable)
      %5  == 0 → a NEAR-duplicate twin at +20M (one word appended)
      %11 == 0 → trailing PII (email + phone snippets, doc_id-derived)
      %13 == 0 → a repetition-reject twin at +30M (one bigram × n)
    All generation is JVM exprs (hash-indexed vocab picks) — no Python in
    the generator, so the bench measures the PIPELINE, not corpus synthesis.
    """
    from pyspark.sql import functions as F

    vocab = F.array(*[F.lit(w) for w in _WORDS])
    base = spark.range(0, n_docs, 1, partitions or max(8, n_docs // 2048))
    wordseq = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.element_at(
            vocab, (F.abs(F.hash(F.col("id"), i, F.lit(seed))) % len(_WORDS)) + 1
        ),
    )
    did = F.col("id")
    pii = F.when(
        did % 11 == 0,
        F.concat(
            F.lit(" mail u"), did.cast("string"), F.lit("@corp.example now call 555-"),
            F.lpad((did % 1000).cast("string"), 3, "0"), F.lit("-"),
            F.lpad((did % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    docs = base.select(
        did.alias("doc_id"),
        F.concat(F.array_join(wordseq, " "), pii).alias("text"),
    )
    exact_twin = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
    )
    near_twin = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" trailing marker word")).alias("text"),
    )
    rep_twin = docs.filter(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 30_000_000).alias("doc_id"),
        F.concat(
            F.lit("hot pair " * 40), F.substring(F.col("text"), 1, 120)
        ).alias("text"),
    )
    return (
        docs.unionByName(exact_twin).unionByName(near_twin).unionByName(rep_twin)
    )


# ---------------------------------------------------------------------------
# Deterministic messy-HTML corpus with closed-form flattening expectations
# (htmlparse.flatten_html's gate fodder — FIXTURES.md F7)
# ---------------------------------------------------------------------------

def _esc(s: str) -> str:
    import html as _html

    return _html.escape(s, quote=False)


def _inline_wrap(rng: random.Random, text: str) -> str:
    """Render a paragraph with random inline markup (b/em/code/span) around
    1-2 words — the flattened text must still equal ``text`` exactly."""
    words = text.split(" ")
    wrapped = {}
    for i in rng.sample(range(len(words)), min(rng.randint(1, 2), len(words))):
        tag = rng.choice(["b", "em", "code", "span", "strong", "i"])
        wrapped[i] = f"<{tag}>{_esc(words[i])}</{tag}>"
    return " ".join(wrapped.get(i, _esc(w)) for i, w in enumerate(words))


def synth_html_doc(doc_index: int, seed: int) -> dict:
    """One messy HTML document + its closed-form flattened block plan.

    Returns {doc_id, html, expected: [(tag, text, n_links), ...]} where
    ``expected`` is authored ALONGSIDE the rendering from the same block
    plan — the parser under test never sees the plan, only the HTML string.
    Messiness exercised: head noise (style/script/meta), <title>→h1, nav
    link farms, inline markup, anchors (n_links accounting), entities &
    unicode, tables (th/td, ragged whitespace), figures with/without alt,
    unclosed <p> and <li> (implied end tags), pre whitespace preservation,
    comments, hr separators, blockquote, header/footer furniture.
    """
    rng = random.Random(f"sparkdoc-html:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-html-{doc_index:08d}"
    expected: list[tuple[str, str, int]] = []
    body: list[str] = []

    title = f"§{doc_index} " + _sentence(rng, rng.randint(3, 6)).rstrip(".")
    head_noise = (
        "<meta charset='utf-8'><style>body{margin:0}</style>"
        "<script>var x=1;</script>"
    )
    if doc_index % 2 == 0:
        head = f"<head>{head_noise}<title>{_esc(title)}</title></head>"
    else:
        head = f"<head>{head_noise}</head>"
        body.append(f"<h1>{_esc(title)}</h1>")
    expected.append(("h1", title, 0))

    # nav link farm: every word linked; n_links = sum of word lengths
    nav_words = [rng.choice(_WORDS) for _ in range(rng.randint(4, 8))]
    body.append(
        "<nav>" + " ".join(f'<a href="/{w}">{_esc(w)}</a>' for w in nav_words) + "</nav>"
    )
    expected.append(("nav", " ".join(nav_words), sum(len(w) for w in nav_words)))

    n_blocks = rng.randint(30, 60) if rng.random() < 0.10 else rng.randint(4, 9)
    for _ in range(n_blocks):
        if rng.random() < 0.15:
            body.append("<!-- boilerplate comment -->")
        if rng.random() < 0.08:
            body.append("<script>trackPage();</script>")
        r = rng.random()
        if r < 0.26:  # plain paragraph, inline markup
            text = _paragraph(rng)
            if rng.random() < 0.15:  # entity/unicode fodder
                text += " R&D <5% naïve café."
            closing = "" if rng.random() < 0.2 else "</p>"  # unclosed-p fodder
            body.append(f"<p>{_inline_wrap(rng, text)}{closing}")
            expected.append(("p", text, 0))
        elif r < 0.38:  # paragraph with one linked sentence
            pre_s = _sentence(rng, rng.randint(4, 9))
            link_s = _sentence(rng, rng.randint(3, 6)).rstrip(".")
            post_s = _sentence(rng, rng.randint(4, 9))
            body.append(
                f"<p>{_esc(pre_s)} <a href='#ref'>{_esc(link_s)}</a> {_esc(post_s)}</p>"
            )
            expected.append(
                ("p", f"{pre_s} {link_s} {post_s}", len(link_s))
            )
        elif r < 0.50:  # heading
            lvl = rng.randint(2, 4)
            text = _sentence(rng, rng.randint(2, 5)).rstrip(".")
            body.append(f"<h{lvl}>{_esc(text)}</h{lvl}>")
            expected.append((f"h{lvl}", text, 0))
        elif r < 0.64:  # list (sometimes unclosed li)
            items = ["• " + _sentence(rng, rng.randint(3, 8)) for _ in range(rng.randint(2, 4))]
            closing = "" if rng.random() < 0.3 else "</li>"
            body.append(
                "<ul>\n" + "\n".join(f"  <li>{_esc(i)}{closing}" for i in items) + "\n</ul>"
            )
            expected.extend(("li", i, 0) for i in items)
        elif r < 0.76:  # table, ragged whitespace, th header row
            rows = [[rng.choice(_WORDS) for _ in range(3)] for _ in range(rng.randint(2, 4))]
            cell = "th" if rng.random() < 0.5 else "td"
            parts = ["<table>"]
            for j, row in enumerate(rows):
                c = cell if j == 0 else "td"
                parts.append(
                    "  <tr>\n" + "\n".join(f"    <{c}> {_esc(x)} </{c}>" for x in row) + "\n  </tr>"
                )
            parts.append("</table>")
            body.append("\n".join(parts))
            expected.append(
                ("table", "\n".join(" | ".join(row) for row in rows), 0)
            )
        elif r < 0.86:  # figure: img (alt sometimes empty) + caption sometimes
            alt = "" if rng.random() < 0.4 else "Figure " + _sentence(rng, rng.randint(2, 5))
            cap = None if rng.random() < 0.5 else "Caption: " + _sentence(rng, rng.randint(3, 6))
            fig = f'<figure><img src="/img/{rng.randint(1, 999)}.png" alt="{_esc(alt)}">'
            if cap is not None:
                fig += f"<figcaption>{_esc(cap)}</figcaption>"
            fig += "</figure>"
            body.append(fig)
            expected.append(("img", alt, 0))
            if cap is not None:
                expected.append(("figcaption", cap, 0))
        elif r < 0.92:  # blockquote or pre
            if rng.random() < 0.5:
                text = _sentence(rng, rng.randint(5, 12))
                body.append(f"<blockquote>{_esc(text)}</blockquote>")
                expected.append(("blockquote", text, 0))
            else:
                code = f"def f_{rng.randint(0, 99)}(x):\n    return  x * {rng.randint(2, 9)}"
                body.append(f"<pre>{_esc(code)}</pre>")
                expected.append(("pre", code, 0))
        else:  # furniture
            tag = rng.choice(["header", "footer"])
            text = f"{doc_id} — {'top' if tag == 'header' else 'bottom'} matter"
            body.append(f"<{tag}>{_esc(text)}</{tag}>")
            expected.append((tag, text, 0))
        if rng.random() < 0.10:
            body.append("<hr>")

    html = (
        "<!DOCTYPE html><html>" + head + "<body><div class='main'>\n"
        + "\n".join(body) + "\n</div></body></html>"
    )
    return {"doc_id": doc_id, "html": html, "expected": expected}


def html_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, html) corpus — deterministic per index."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_html_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "html": r["html"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 256)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, html string"
    )


_HTML_KIND = {
    "h1": "heading", "h2": "heading", "h3": "heading", "h4": "heading",
    "h5": "heading", "h6": "heading", "li": "list", "table": "table",
    "img": "picture", "figcaption": "caption", "header": "furniture",
    "footer": "furniture",
}


def _expected_canvas_doc(doc_id: str, expected: list, kind_map: dict) -> list[dict]:
    """Single-canvas classify restatement shared by the html/md/docx
    expectations (nav/link-density drop, blank drop, kind map, media_ref
    from the flattener's 1-based node order) — one implementation so the
    per-format and mixed-corpus oracles can never drift apart."""
    out: list[dict] = []
    off = 0
    for nid, (tag, text, n_links) in enumerate(expected, start=1):
        if tag == "nav" or (n_links > 0 and 2 * n_links > len(text)):
            continue
        if tag != "img" and not text.strip():
            continue
        kind = kind_map.get(tag, "text")
        out.append({
            "doc_id": doc_id,
            "offset": off,
            "kind": kind,
            # heading spans carry their level as a '#'*level prefix (the
            # engine-wide convention the chunker's nesting trails read)
            "text": _heading_text(tag, text) if kind == "heading" else text,
            "media_ref": f"#/pictures/{nid}" if tag == "img" else "",
        })
        off += 1
    return out


def expected_html_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the WHOLE html→spans pipeline:
    independent restatement of the classify rules (nav/link-density drop,
    blank drop, kind map, media_ref from flatten's 1-based node order) over
    the authored block plans — never calls the parser or the engine."""
    out: list[dict] = []
    for i in range(n_docs):
        d = synth_html_doc(i, seed)
        out.extend(_expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND))
    return out


# ---------------------------------------------------------------------------
# Deterministic messy-Markdown corpus with closed-form block expectations
# (mdparse gate fodder — same authoring pattern as the HTML corpus above:
# the expected plan is written ALONGSIDE the rendering; the parser under
# test only ever sees the markdown string)
# ---------------------------------------------------------------------------


def _md_inline_wrap(rng: random.Random, text: str) -> str:
    """Render a paragraph with random inline markup (**bold** *em* `code`
    __strong__) around 1-2 words — stripped text must equal ``text``."""
    words = text.split(" ")
    wrapped = {}
    for i in rng.sample(range(len(words)), min(rng.randint(1, 2), len(words))):
        w = words[i]
        mark = rng.choice(["**", "*", "`", "__"])
        wrapped[i] = f"{mark}{w}{mark}"
    return " ".join(wrapped.get(i, w) for i, w in enumerate(words))


def _md_hard_wrap(rng: random.Random, text: str) -> str:
    """Soft-wrap fodder: break the rendered paragraph onto multiple lines at
    word boundaries (the parser re-joins with single spaces)."""
    words = text.split(" ")
    width = rng.randint(7, 12)
    return "\n".join(
        " ".join(words[j:j + width]) for j in range(0, len(words), width)
    )


def synth_md_doc(doc_index: int, seed: int) -> dict:
    """One messy Markdown document + its closed-form block plan.

    Returns {doc_id, markdown, expected: [(tag, text, n_links), ...]}.
    Messiness exercised: ATX vs setext headings (trailing-# runs), link
    farms (boilerplate density fodder), inline emphasis/code/links/escapes,
    hard-wrapped paragraphs, list markers -/*/+/1./1) with indented
    continuation lines, ragged pipe tables with alignment colons,
    standalone images with/without alt text, blockquotes over several
    lines, fenced code (backtick and tilde, markup-literal content), and
    --- / *** thematic breaks."""
    rng = random.Random(f"sparkdoc-md:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-md-{doc_index:08d}"
    expected: list[tuple[str, str, int]] = []
    body: list[str] = []

    title = f"§{doc_index} " + _sentence(rng, rng.randint(3, 6)).rstrip(".")
    if doc_index % 2 == 0:
        body.append(f"# {title}")
    else:
        body.append(title + "\n" + "=" * rng.randint(3, 24))
    expected.append(("h1", title, 0))

    # link farm (nav analog): every word linked; n_links = sum of word chars
    farm_words = [rng.choice(_WORDS) for _ in range(rng.randint(4, 8))]
    body.append(" ".join(f"[{w}](/{w})" for w in farm_words))
    expected.append(("p", " ".join(farm_words), sum(len(w) for w in farm_words)))

    n_blocks = rng.randint(30, 60) if rng.random() < 0.10 else rng.randint(4, 9)
    for _ in range(n_blocks):
        r = rng.random()
        if r < 0.24:  # paragraph: inline markup, hard wrap, escape fodder
            text = _paragraph(rng)
            if rng.random() < 0.15:
                text += " R&D <5% naïve café."
            rendered = _md_inline_wrap(rng, text)
            if rng.random() < 0.15:
                rendered += r" \*not bold\*"
                text += " *not bold*"
            body.append(_md_hard_wrap(rng, rendered))
            expected.append(("p", text, 0))
        elif r < 0.36:  # paragraph with one link (+ the odd autolink)
            pre_s = _sentence(rng, rng.randint(4, 9))
            link_s = _sentence(rng, rng.randint(3, 6)).rstrip(".")
            post_s = _sentence(rng, rng.randint(4, 9))
            if rng.random() < 0.3:
                url = f"https://{domain}/p/{rng.randint(1, 999)}"
                body.append(f"{pre_s} [{link_s}](#ref) {post_s} <{url}>")
                expected.append(
                    ("p", f"{pre_s} {link_s} {post_s} {url}",
                     len(link_s) + len(url))
                )
            else:
                body.append(f"{pre_s} [{link_s}](#ref) {post_s}")
                expected.append(("p", f"{pre_s} {link_s} {post_s}", len(link_s)))
        elif r < 0.50:  # heading: ATX (sometimes closing #s) or setext h2
            lvl = rng.randint(2, 4)
            text = _sentence(rng, rng.randint(2, 5)).rstrip(".")
            if lvl == 2 and rng.random() < 0.4:
                body.append(text + "\n" + "-" * rng.randint(3, 20))
            elif rng.random() < 0.3:
                body.append(f"{'#' * lvl} {text} {'#' * lvl}")
            else:
                body.append(f"{'#' * lvl} {text}")
            expected.append((f"h{lvl}", text, 0))
        elif r < 0.64:  # list (marker mix, occasional continuation line)
            marker = rng.choice(["-", "*", "+", "1."])
            items = ["• " + _sentence(rng, rng.randint(3, 8))
                     for _ in range(rng.randint(2, 4))]
            lines = []
            for k, it in enumerate(items):
                mk = f"{k + 1}." if marker == "1." else marker
                if rng.random() < 0.25:
                    cont = _sentence(rng, rng.randint(3, 6))
                    lines.append(f"{mk} {it}\n  {cont}")
                    items[k] = f"{it} {cont}"
                else:
                    lines.append(f"{mk} {it}")
            body.append("\n".join(lines))
            expected.extend(("li", it, 0) for it in items)
        elif r < 0.76:  # pipe table, ragged spacing + alignment colons
            rows = [[rng.choice(_WORDS) for _ in range(3)]
                    for _ in range(rng.randint(2, 4))]
            sep = "|" + "|".join(
                rng.choice(["---", ":---", "---:", ":---:"]) for _ in range(3)
            ) + "|"
            lines = []
            for j, row in enumerate(rows):
                cells = "|".join(
                    " " * rng.randint(0, 2) + x + " " * rng.randint(0, 2)
                    for x in row
                )
                lines.append(f"|{cells}|")
                if j == 0:
                    lines.append(sep)
            body.append("\n".join(lines))
            expected.append(
                ("table", "\n".join(" | ".join(row) for row in rows), 0)
            )
        elif r < 0.86:  # standalone image (alt sometimes empty)
            alt = "" if rng.random() < 0.4 else (
                "Figure " + _sentence(rng, rng.randint(2, 5))
            )
            body.append(f"![{alt}](/img/{rng.randint(1, 999)}.png)")
            expected.append(("img", alt, 0))
        elif r < 0.94:  # blockquote or fenced code
            if rng.random() < 0.5:
                s1 = _sentence(rng, rng.randint(4, 8))
                s2 = _sentence(rng, rng.randint(3, 7))
                body.append(f"> {s1}\n> {s2}")
                expected.append(("blockquote", f"{s1} {s2}", 0))
            else:
                code = (
                    f"def f_{rng.randint(0, 99)}(x):\n"
                    f"    return  x * {rng.randint(2, 9)}  # *not emphasis*"
                )
                fence = rng.choice(["```", "~~~"])
                info = rng.choice(["", "python"])
                body.append(f"{fence}{info}\n{code}\n{fence}")
                expected.append(("pre", code, 0))
        else:  # thematic break (emits nothing)
            body.append(rng.choice(["---", "***", "-----"]))
    md = "\n\n".join(body) + "\n"
    return {"doc_id": doc_id, "markdown": md, "expected": expected}


def md_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, markdown) corpus — deterministic per index."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_md_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "markdown": r["markdown"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 256)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, markdown string"
    )


def expected_md_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the WHOLE markdown→spans pipeline —
    independent restatement of the classify rules over the authored block
    plans, never calling the parser or the engine (same rules as
    expected_html_spans: markdown has no nav tag, so only the link-density
    branch can drop a block)."""
    out: list[dict] = []
    for i in range(n_docs):
        d = synth_md_doc(i, seed)
        out.extend(_expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND))
    return out


# ---------------------------------------------------------------------------
# Deterministic PDF corpus with closed-form layout-block expectations
# (pdfparse gate fodder: REAL multi-page PDF bytes rendered by pdfgen; the
# expected plan is authored alongside — the parser only ever sees the bytes)
# ---------------------------------------------------------------------------

_PDF_BODY, _PDF_FURN = 10, 8
_PDF_HSIZES = {1: 18, 2: 15, 3: 13}
_PDF_GAP = 14  # inter-block y gap: > 1.6*leading(10)-10 so blocks never merge


def synth_pdf_doc(doc_index: int, seed: int) -> dict:
    """One real PDF document + its closed-form expected block plan.

    Returns {doc_id, pdf: bytes, expected: [(page, tag, text), ...],
    node_order: [(page, tag, text), ...]} where ``expected`` is the
    authored READING order per page (header → flow columns → footer — what
    XY-cut must recover) and ``node_order`` is the parser's deterministic
    node enumeration (column-major text blocks, then images, per page) from
    which picture media_refs derive.  Exercised: multi-page layout, bold
    heading sizes, wrapped paragraphs with TJ kern splits, bullet lists,
    per-cell positioned tables, image XObjects, two-column pages,
    repeated-header furniture, cp1252 accents/dashes/bullets."""
    from sparkdoc.pdfgen import (
        image_ops, leading_for, render_pdf, table_ops, text_block_ops,
    )

    rng = random.Random(f"sparkdoc-pdf:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-pdf-{doc_index:08d}"
    heavy = rng.random() < 0.02
    n_pages = rng.randint(6, 10) if heavy else rng.randint(1, 3)
    two_col_doc = rng.random() < 0.30

    page_streams: list[bytes] = []
    expected: list[tuple[int, str, str]] = []
    node_order: list[tuple[int, str, str]] = []

    def wrap(text: str, width_px: int, size: int) -> list[str]:
        max_chars = int(width_px / (0.6 * size))
        words = text.split(" ")
        lines, cur = [], ""
        for w in words:
            cand = (cur + " " + w) if cur else w
            if len(cand) <= max_chars or not cur:
                cur = cand
            else:
                lines.append(cur)
                cur = w
        if cur:
            lines.append(cur)
        return lines

    for page in range(1, n_pages + 1):
        ops: list[bytes] = []
        flow: list[tuple] = []   # (x, y_top, tag, text) in authored flow order
        images: list[tuple] = []  # (x, y_top, tag, text) in draw order
        header = f"{doc_id} — CONFIDENTIAL"
        footer = f"Page {page}"
        ops.append(text_block_ops(_MARGIN, 10, _PDF_FURN, False, [header], _PAGE_H))
        ops.append(text_block_ops(_MARGIN, _PAGE_H - 22, _PDF_FURN, False,
                                  [footer], _PAGE_H))

        two_col = two_col_doc and page % 2 == 0
        col_w = (_PAGE_W - 2 * _MARGIN - 24) // 2 if two_col else _PAGE_W - 2 * _MARGIN
        cols = ([(_MARGIN, 60), (_MARGIN + col_w + 24, 60)] if two_col
                else [(_MARGIN, 60)])
        ci = 0
        x, y = cols[0]

        def place(h: int) -> bool:
            """Advance to the next column when a block of height h would
            cross into the footer band; False = the page is full (a real
            writer paginates by measured height, never overflows)."""
            nonlocal x, y, ci
            while y + h > _PAGE_H - 44:
                ci += 1
                if ci >= len(cols):
                    return False
                x, y = cols[ci]
            return True

        n_blocks = rng.randint(4, 10)
        for _ in range(n_blocks):
            r = rng.random()
            if r < 0.18:  # bold heading, single line
                lvl = rng.randint(1, 3)
                size = _PDF_HSIZES[lvl]
                max_chars = int(col_w / (0.6 * size))
                text = _sentence(rng, rng.randint(2, 4)).rstrip(".")
                while len(text) > max_chars:
                    text = text.rsplit(" ", 1)[0]
                if not place(size):
                    break
                ops.append(text_block_ops(x, y, size, True, [text], _PAGE_H))
                flow.append((x, y, f"h{lvl}", text))
                y += size + _PDF_GAP
            elif r < 0.52:  # wrapped paragraph, occasional TJ kern split
                text = _paragraph(rng)
                lines = wrap(text, col_w, _PDF_BODY)
                h = 10 + (len(lines) - 1) * leading_for(_PDF_BODY)
                if not place(h):
                    break
                splits = None
                if rng.random() < 0.3:
                    splits = [
                        (rng.randint(1, max(1, len(ln) - 1))
                         if rng.random() < 0.5 and len(ln) > 2 else 0)
                        for ln in lines
                    ]
                ops.append(text_block_ops(x, y, _PDF_BODY, False, lines,
                                          _PAGE_H, kern_splits=splits))
                flow.append((x, y, "p", text))
                y += h + _PDF_GAP
            elif r < 0.66:  # bullet list: one block per item line
                items = []
                for _k in range(rng.randint(2, 4)):
                    item = "• " + _sentence(
                        rng, rng.randint(3, min(8, int(col_w / 6 / 7)))
                    )
                    while len(item) > int(col_w / 6):
                        item = item.rsplit(" ", 1)[0]
                    items.append(item)
                if not place(15 * len(items)):
                    break
                for item in items:
                    ops.append(text_block_ops(x, y, _PDF_BODY, False, [item], _PAGE_H))
                    flow.append((x, y, "li", item))
                    y += 15
                y += _PDF_GAP - 5
            elif r < 0.82:  # table: per-cell positioned text
                short = [w for w in _WORDS if len(w) <= 8]
                n_rows = rng.randint(2, 4)
                rows = [[rng.choice(short) for _ in range(3)] for _ in range(n_rows)]
                h = 10 + (n_rows - 1) * int(_PDF_BODY * 1.6)
                if not place(h):
                    break
                cw3 = col_w // 3
                col_xs = [x, x + cw3, x + 2 * cw3]
                ops.append(table_ops(x, y, _PDF_BODY, col_xs, rows, _PAGE_H))
                flow.append((x, y, "table",
                             "\n".join(" | ".join(r_) for r_ in rows)))
                y += h + _PDF_GAP
            else:  # image XObject
                w_img = rng.randint(80, min(160, col_w))
                h_img = rng.randint(50, 100)
                if not place(h_img):
                    break
                ops.append(image_ops(x, y, w_img, h_img, _PAGE_H))
                images.append((x, y, "img", ""))
                y += h_img + _PDF_GAP

        # expected reading order (XY-cut): header, flow by column then y, footer
        expected.append((page, "header", header))
        for colx, _cy in cols:
            colblocks = [b for b in flow + images if b[0] == colx]
            for _x, _y, tag, text in sorted(colblocks, key=lambda b: b[1]):
                expected.append((page, tag, text))
        expected.append((page, "footer", footer))
        # parser node enumeration: text blocks column-major (x, then y), then
        # images in draw order — media_refs derive from this
        texts = [(x0, y0, tag, t) for (x0, y0, tag, t) in flow]
        hdr_ftr = [(_MARGIN, 10, "header", header), (_MARGIN, _PAGE_H - 22, "footer", footer)]
        ordered = sorted(texts + hdr_ftr, key=lambda b: (b[0], b[1]))
        node_order.extend((page, tag, t) for (_x, _y, tag, t) in ordered)
        node_order.extend((page, tag, t) for (_x, _y, tag, t) in images)
        page_streams.append(b"\n".join(ops))

    pdf = render_pdf(page_streams, _PAGE_W, _PAGE_H)
    return {"doc_id": doc_id, "pdf": pdf, "expected": expected,
            "node_order": node_order}


def pdf_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, pdf binary) corpus — deterministic per index."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_pdf_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "pdf": r["pdf"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 128)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, pdf binary"
    )


_PDF_KIND = dict(_HTML_KIND)
_PDF_KIND.update({"header": "furniture", "footer": "furniture"})


def _expected_pdf_doc(d: dict) -> list[dict]:
    """Per-doc pdf expectation: page_break spans between pages, furniture
    kinds for header/footer, picture media_refs from the parser's
    deterministic node enumeration — restated from the authored plan."""
    # node_id per (page, tag, text) from the parser's enumeration order
    img_node_id: dict[int, list[int]] = {}
    for nid, (page, tag, _t) in enumerate(d["node_order"], start=1):
        if tag == "img":
            img_node_id.setdefault(page, []).append(nid)
    img_seen: dict[int, int] = {}
    out: list[dict] = []
    off = 0
    prev_page = None
    for page, tag, text in d["expected"]:
        if prev_page is not None and page != prev_page:
            out.append({"doc_id": d["doc_id"], "offset": off,
                        "kind": "page_break", "text": "", "media_ref": ""})
            off += 1
        prev_page = page
        if tag == "img":
            k = img_seen.get(page, 0)
            img_seen[page] = k + 1
            nid = img_node_id[page][k]
            media_ref = f"#/pictures/{nid}"
        else:
            media_ref = ""
        k = _PDF_KIND.get(tag, "text")
        out.append({
            "doc_id": d["doc_id"],
            "offset": off,
            "kind": k,
            "text": _heading_text(tag, text) if k == "heading" else text,
            "media_ref": media_ref,
        })
        off += 1
    return out


def expected_pdf_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the WHOLE pdf→spans pipeline:
    all restated from the authored plan, never calling the parser."""
    out: list[dict] = []
    for i in range(n_docs):
        out.extend(_expected_pdf_doc(synth_pdf_doc(i, seed)))
    return out


# ---------------------------------------------------------------------------
# Deterministic DOCX corpus with closed-form block expectations
# (docxparse gate fodder: real OOXML zip packages built with stdlib
# zipfile; the expected plan is authored alongside the XML)
# ---------------------------------------------------------------------------

_DOCX_NS = (
    'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" '
    'xmlns:wp="http://schemas.openxmlformats.org/drawingml/2006/wordprocessingDrawing" '
    'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
)


def _xesc(s: str) -> str:
    from xml.sax.saxutils import escape

    return escape(s)


def _docx_runs(rng: random.Random, text: str) -> str:
    """Render text as 1-3 w:r runs with random split points and random
    bold/italic formatting — flattened text must equal ``text`` exactly.
    Splits land mid-word as real editors produce (formatting history)."""
    n_cuts = rng.randint(0, 2)
    cuts = sorted(rng.sample(range(1, len(text)), min(n_cuts, max(0, len(text) - 1))))
    segs = [text[a:b] for a, b in zip([0] + cuts, cuts + [len(text)])]
    out = []
    for seg in segs:
        rpr = ""
        if rng.random() < 0.3:
            rpr = "<w:rPr>" + rng.choice(["<w:b/>", "<w:i/>", "<w:b/><w:i/>"]) + "</w:rPr>"
        out.append(
            f'<w:r>{rpr}<w:t xml:space="preserve">{_xesc(seg)}</w:t></w:r>'
        )
    return "".join(out)


def _docx_drawing(img_id: int, alt: str) -> str:
    return (
        '<w:r><w:drawing><wp:inline><wp:extent cx="914400" cy="685800"/>'
        f'<wp:docPr id="{img_id}" name="Picture {img_id}" descr="{_xesc(alt)}"/>'
        '<a:graphic><a:graphicData uri="http://schemas.openxmlformats.org/drawingml/2006/picture">'
        f'<a:blip r:embed="rId{100 + img_id}"/></a:graphicData></a:graphic>'
        "</wp:inline></w:drawing></w:r>"
    )


def synth_docx_doc(doc_index: int, seed: int) -> dict:
    """One real DOCX package + its closed-form block plan.

    Returns {doc_id, docx: bytes, expected: [(tag, text, n_links), ...]}.
    Messiness exercised: runs split mid-word with random bold/italic,
    xml:space-preserved segments, hyperlink runs (n_links accounting) and
    all-link farm paragraphs, empty paragraphs (blank-drop fodder), w:br
    as space, Heading1-3 + Title styles, numPr list paragraphs, tables
    with multi-paragraph cells, inline images with/without alt text,
    header/footer parts, XML entities (& < >) and unicode."""
    rng = random.Random(f"sparkdoc-docx:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-docx-{doc_index:08d}"
    expected: list[tuple[str, str, int]] = []
    body: list[str] = []
    img_id = 0

    header_text = f"{doc_id} — CONFIDENTIAL"
    footer_text = "Company confidential — do not distribute"
    expected.append(("header", header_text, 0))

    title = f"§{doc_index} " + _sentence(rng, rng.randint(3, 6)).rstrip(".")
    style = "Title" if doc_index % 2 == 0 else "Heading1"
    body.append(
        f'<w:p><w:pPr><w:pStyle w:val="{style}"/></w:pPr>{_docx_runs(rng, title)}</w:p>'
    )
    expected.append(("h1", title, 0))

    # link farm paragraph (nav analog): every word hyperlinked
    farm = [rng.choice(_WORDS) for _ in range(rng.randint(4, 8))]
    parts = []
    for k, w in enumerate(farm):
        if k:
            parts.append('<w:r><w:t xml:space="preserve"> </w:t></w:r>')
        parts.append(
            f'<w:hyperlink r:id="rId{900 + k}"><w:r><w:t>{_xesc(w)}</w:t></w:r></w:hyperlink>'
        )
    body.append("<w:p>" + "".join(parts) + "</w:p>")
    expected.append(("p", " ".join(farm), sum(len(w) for w in farm)))

    n_blocks = rng.randint(30, 60) if rng.random() < 0.10 else rng.randint(4, 9)
    for _ in range(n_blocks):
        if rng.random() < 0.12:  # empty paragraph (dropped downstream)
            body.append("<w:p/>")
            expected.append(("p", "", 0))
        r = rng.random()
        if r < 0.24:  # paragraph, split runs; entity/br fodder
            text = _paragraph(rng)
            if rng.random() < 0.15:
                text += " R&D <5% naïve café."
            if rng.random() < 0.2:  # w:br renders as a space
                a, b = text.rsplit(" ", 1)[0], text.rsplit(" ", 1)[-1]
                body.append(
                    f"<w:p>{_docx_runs(rng, a)}<w:r><w:br/></w:r>{_docx_runs(rng, b)}</w:p>"
                )
            else:
                body.append(f"<w:p>{_docx_runs(rng, text)}</w:p>")
            expected.append(("p", text, 0))
        elif r < 0.36:  # paragraph with one hyperlinked sentence
            pre_s = _sentence(rng, rng.randint(4, 9))
            link_s = _sentence(rng, rng.randint(3, 6)).rstrip(".")
            post_s = _sentence(rng, rng.randint(4, 9))
            body.append(
                f'<w:p><w:r><w:t xml:space="preserve">{_xesc(pre_s)} </w:t></w:r>'
                f'<w:hyperlink r:id="rId801"><w:r><w:t>{_xesc(link_s)}</w:t></w:r></w:hyperlink>'
                f'<w:r><w:t xml:space="preserve"> {_xesc(post_s)}</w:t></w:r></w:p>'
            )
            expected.append(("p", f"{pre_s} {link_s} {post_s}", len(link_s)))
        elif r < 0.50:  # heading 2-3
            lvl = rng.randint(2, 3)
            text = _sentence(rng, rng.randint(2, 5)).rstrip(".")
            body.append(
                f'<w:p><w:pPr><w:pStyle w:val="Heading{lvl}"/></w:pPr>{_docx_runs(rng, text)}</w:p>'
            )
            expected.append((f"h{lvl}", text, 0))
        elif r < 0.64:  # numbered/bulleted list
            for _k in range(rng.randint(2, 4)):
                item = _sentence(rng, rng.randint(3, 8))
                body.append(
                    '<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/>'
                    f"</w:numPr></w:pPr>{_docx_runs(rng, item)}</w:p>"
                )
                expected.append(("li", item, 0))
        elif r < 0.76:  # table, cells sometimes two paragraphs
            n_rows = rng.randint(2, 4)
            rows = []
            for _r2 in range(n_rows):
                cells = []
                for _c in range(3):
                    if rng.random() < 0.15:
                        t1, t2 = rng.choice(_WORDS), rng.choice(_WORDS)
                        cells.append((f"{t1} {t2}",
                                      f"<w:p>{_docx_runs(rng, t1)}</w:p>"
                                      f"<w:p>{_docx_runs(rng, t2)}</w:p>"))
                    else:
                        t = rng.choice(_WORDS)
                        cells.append((t, f"<w:p>{_docx_runs(rng, t)}</w:p>"))
                rows.append(cells)
            xml = ["<w:tbl><w:tblGrid/>"]
            for cells in rows:
                xml.append(
                    "<w:tr>" + "".join(f"<w:tc>{c[1]}</w:tc>" for c in cells) + "</w:tr>"
                )
            xml.append("</w:tbl>")
            body.append("".join(xml))
            expected.append(
                ("table", "\n".join(" | ".join(c[0] for c in cells) for cells in rows), 0)
            )
        elif r < 0.88:  # inline image, alt sometimes empty
            img_id += 1
            alt = "" if rng.random() < 0.4 else (
                "Figure " + _sentence(rng, rng.randint(2, 5))
            )
            body.append(f"<w:p>{_docx_drawing(img_id, alt)}</w:p>")
            expected.append(("img", alt, 0))
        else:  # paragraph ending with an image (text block, then img block)
            img_id += 1
            text = _sentence(rng, rng.randint(5, 10))
            body.append(
                f"<w:p>{_docx_runs(rng, text)}{_docx_drawing(img_id, 'chart')}</w:p>"
            )
            expected.append(("p", text, 0))
            expected.append(("img", "chart", 0))
    expected.append(("footer", footer_text, 0))

    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f"<w:document {_DOCX_NS}><w:body>"
        + "".join(body)
        + '<w:sectPr><w:headerReference w:type="default" r:id="rId10"/>'
        '<w:footerReference w:type="default" r:id="rId11"/></w:sectPr>'
        "</w:body></w:document>"
    )
    furn = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        "<w:{tag} {ns}><w:p><w:r><w:t>{text}</w:t></w:r></w:p></w:{tag}>"
    )
    import io as _io
    import zipfile as _zipfile

    buf = _io.BytesIO()
    with _zipfile.ZipFile(buf, "w", _zipfile.ZIP_DEFLATED) as zf:
        _zip_writestr(zf, 
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
            "</Types>",
        )
        _zip_writestr(zf, 
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
            "</Relationships>",
        )
        _zip_writestr(zf, "word/document.xml", document)
        _zip_writestr(zf, 
            "word/header1.xml",
            furn.format(tag="hdr", ns=_DOCX_NS, text=_xesc(header_text)),
        )
        _zip_writestr(zf, 
            "word/footer1.xml",
            furn.format(tag="ftr", ns=_DOCX_NS, text=_xesc(footer_text)),
        )
    return {"doc_id": doc_id, "docx": buf.getvalue(), "expected": expected}


def docx_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, docx binary) corpus — deterministic per index."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_docx_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "docx": r["docx"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 128)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, docx binary"
    )


def expected_docx_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the WHOLE docx→spans pipeline —
    same classify restatement as expected_html_spans, plus furniture kinds
    for the header/footer parts."""
    out: list[dict] = []
    for i in range(n_docs):
        d = synth_docx_doc(i, seed)
        out.extend(_expected_canvas_doc(d["doc_id"], d["expected"], _PDF_KIND))
    return out


# ---------------------------------------------------------------------------
# Deterministic messy-XLSX corpus with closed-form block expectations
# (xlsxparse gate fodder — same authoring pattern as the DOCX corpus: the
# expected plan is written ALONGSIDE the rendering; the parser under test
# only ever sees the zip bytes)
# ---------------------------------------------------------------------------

_XLSX_NS = (
    'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
)


def _col_letters(idx: int) -> str:
    """0-based column index → spreadsheet letters (0→A, 26→AA)."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def synth_xlsx_doc(doc_index: int, seed: int) -> dict:
    """One real XLSX package + its closed-form block plan.

    Returns {doc_id, xlsx: bytes, expected: [(tag, text, n_links), ...]}.
    Messiness exercised: shared strings (plain + rich-text runs split
    mid-word), inline strings, raw numbers / formula-string results /
    booleans / error cells, column gaps via r= cell refs, cells without
    refs, blank spacer rows (skipped), an occasional empty sheet (heading
    only), sheet part NUMBERING deliberately mismatched against workbook
    order (rels resolution is load-bearing), XML entities and unicode in
    names and values, and every ~5th doc all-inline (no sharedStrings
    part)."""
    rng = random.Random(f"sparkdoc-xlsx:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-xlsx-{doc_index:08d}"
    all_inline = doc_index % 5 == 4
    shared: list[tuple[str, bool]] = []  # (text, rich?)

    def shared_idx(text: str, rich: bool) -> int:
        shared.append((text, rich))
        return len(shared) - 1

    n_sheets = rng.randint(1, 3)
    sheet_specs: list[tuple[str, str]] = []  # (name, worksheet xml)
    expected: list[tuple[str, str, int]] = []
    name_pool = ["Summary", "Q1 Data", "naïve résumé", "R&D <plan>", "2024"]
    for s in range(n_sheets):
        name = f"{rng.choice(name_pool)} {s}"
        expected.append(("h2", name, 0))
        empty_sheet = rng.random() < 0.12
        rows_xml: list[str] = []
        row_texts: list[str] = []
        rnum = 0
        for _ in range(0 if empty_sheet else rng.randint(2, 6)):
            rnum += 1
            if rng.random() < 0.15:  # blank spacer row (parser skips it)
                rows_xml.append(f'<row r="{rnum}"/>')
                continue
            cells: list[str] = []  # authored gap-filled rendering
            cells_xml: list[str] = []
            col = 0
            for _c in range(rng.randint(2, 4)):
                gap = rng.randint(1, 2) if rng.random() < 0.25 else 0
                cells.extend([""] * gap)
                col += gap
                ref = f"{_col_letters(col)}{rnum}"
                # the r= ref is the ONLY place a column gap is encoded, so
                # it can be omitted (sequential placement) only when gap-free
                ref_attr = "" if gap == 0 and rng.random() < 0.2 else f' r="{ref}"'
                r = rng.random()
                if r < 0.35:  # shared or inline string
                    text = _sentence(rng, rng.randint(1, 4)).rstrip(".")
                    if rng.random() < 0.2:
                        text += " R&D <5%"
                    if all_inline or rng.random() < 0.3:
                        cells_xml.append(
                            f'<c{ref_attr} t="inlineStr"><is><t>{_xesc(text)}</t></is></c>'
                        )
                    else:
                        k = shared_idx(text, rng.random() < 0.4)
                        cells_xml.append(f'<c{ref_attr} t="s"><v>{k}</v></c>')
                    cells.append(text)
                elif r < 0.6:  # number, stored string verbatim
                    v = rng.choice([
                        str(rng.randint(0, 99999)),
                        f"{rng.uniform(0, 1000):.2f}",
                        f"{rng.uniform(0, 1):.0e}".replace("e-0", "e-"),
                    ])
                    cells_xml.append(f"<c{ref_attr}><v>{v}</v></c>")
                    cells.append(v)
                elif r < 0.75:  # boolean
                    b = rng.random() < 0.5
                    cells_xml.append(f'<c{ref_attr} t="b"><v>{1 if b else 0}</v></c>')
                    cells.append("TRUE" if b else "FALSE")
                elif r < 0.9:  # formula string result
                    text = rng.choice(_WORDS).upper()
                    cells_xml.append(f'<c{ref_attr} t="str"><v>{_xesc(text)}</v></c>')
                    cells.append(text)
                else:  # error cell
                    cells_xml.append(f'<c{ref_attr} t="e"><v>#DIV/0!</v></c>')
                    cells.append("#DIV/0!")
                col += 1
            rows_xml.append(f'<row r="{rnum}">' + "".join(cells_xml) + "</row>")
            row_texts.append(" | ".join(cells))
        if row_texts:
            expected.append(("table", "\n".join(row_texts), 0))
        sheet_specs.append((
            name,
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f"<worksheet {_XLSX_NS}><sheetData>" + "".join(rows_xml)
            + "</sheetData></worksheet>",
        ))

    # part numbering mismatched against workbook order: sheet s is stored
    # as sheetN.xml with N assigned in REVERSED order, so positional
    # fallback would mis-order multi-sheet books — rels must resolve
    part_of = {s: f"xl/worksheets/sheet{n_sheets - s}.xml" for s in range(n_sheets)}
    sheets_xml = "".join(
        f'<sheet name="{_xesc(nm)}" sheetId="{s + 1}" r:id="rId{s + 1}"/>'
        for s, (nm, _x) in enumerate(sheet_specs)
    )
    rels_xml = "".join(
        f'<Relationship Id="rId{s + 1}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        f'Target="{part_of[s][3:].lstrip("/")}"/>'
        for s in range(n_sheets)
    )
    sst_items = []
    for text, rich in shared:
        if rich and " " in text:
            a, b = text.split(" ", 1)
            sst_items.append(
                f'<si><r><t xml:space="preserve">{_xesc(a)} </t></r>'
                f"<r><t>{_xesc(b)}</t></r></si>"
            )
        else:
            sst_items.append(f"<si><t>{_xesc(text)}</t></si>")

    import io as _io
    import zipfile as _zipfile

    buf = _io.BytesIO()
    with _zipfile.ZipFile(buf, "w", _zipfile.ZIP_DEFLATED) as zf:
        _zip_writestr(zf, 
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            "</Types>",
        )
        _zip_writestr(zf, 
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        _zip_writestr(zf, 
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f"<workbook {_XLSX_NS}><sheets>{sheets_xml}</sheets></workbook>",
        )
        _zip_writestr(zf, 
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + rels_xml + "</Relationships>",
        )
        if sst_items:
            _zip_writestr(zf, 
                "xl/sharedStrings.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<sst {_XLSX_NS} count="{len(sst_items)}" uniqueCount="{len(sst_items)}">'
                + "".join(sst_items) + "</sst>",
            )
        for s, (_nm, ws_xml) in enumerate(sheet_specs):
            _zip_writestr(zf, part_of[s], ws_xml)
    return {"doc_id": doc_id, "xlsx": buf.getvalue(), "expected": expected}


def xlsx_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, xlsx binary) corpus — deterministic per index."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_xlsx_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "xlsx": r["xlsx"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 128)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, xlsx binary"
    )


def expected_xlsx_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the WHOLE xlsx→spans pipeline —
    same classify restatement as expected_html_spans over the authored
    sheet plans (never calls the parser)."""
    out: list[dict] = []
    for i in range(n_docs):
        d = synth_xlsx_doc(i, seed)
        out.extend(_expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND))
    return out


# ---------------------------------------------------------------------------
# Deterministic messy-PPTX corpus with closed-form expectations (pptxparse
# gate fodder). Slides carry REAL geometry: shape order in the XML is
# SHUFFLED against the authored reading order, so XY-cut must recover it
# from the EMU bounding boxes — same trick as the DoclingDocument-JSON
# corpus. The expected plan restates page_breaks, blank-drop, the kind map,
# AND the repeated-text furniture rule (decoration boxes repeated on >= 3
# slides), never calling the parser.
# ---------------------------------------------------------------------------

_PPTX_EMU = 12700  # EMU per point


def _pptx_sp_xml(ph: str | None, band: tuple | None, paras_xml: list[str], nid: int) -> str:
    ph_xml = f'<p:ph type="{ph}"/>' if ph else ""
    xfrm = ""
    if band is not None:
        x0, y0, x1, y1 = band
        xfrm = (
            f'<a:xfrm><a:off x="{x0 * _PPTX_EMU}" y="{y0 * _PPTX_EMU}"/>'
            f'<a:ext cx="{(x1 - x0) * _PPTX_EMU}" cy="{(y1 - y0) * _PPTX_EMU}"/></a:xfrm>'
        )
    return (
        f'<p:sp><p:nvSpPr><p:cNvPr id="{nid}" name="Shape {nid}"/>'
        f"<p:cNvSpPr/><p:nvPr>{ph_xml}</p:nvPr></p:nvSpPr>"
        f"<p:spPr>{xfrm}</p:spPr><p:txBody><a:bodyPr/>"
        + "".join(paras_xml) + "</p:txBody></p:sp>"
    )


def _pptx_para_xml(rng: random.Random, text: str, bullet: bool, field: bool = False) -> str:
    pr = '<a:pPr><a:buChar char="•"/></a:pPr>' if bullet else ""
    if not text:
        return f"<a:p>{pr}</a:p>"
    if field:
        return (
            f'<a:p>{pr}<a:fld id="{{12345678-1234-1234-1234-123456789012}}" '
            f'type="slidenum"><a:t>{_xesc(text)}</a:t></a:fld></a:p>'
        )
    # split into 1-3 runs, occasionally joined by a:br (renders as a space)
    words = text.split(" ")
    if len(words) >= 4 and rng.random() < 0.25:
        k = rng.randint(1, len(words) - 1)
        return (
            f"<a:p>{pr}<a:r><a:t>{_xesc(' '.join(words[:k]))}</a:t></a:r><a:br/>"
            f"<a:r><a:t>{_xesc(' '.join(words[k:]))}</a:t></a:r></a:p>"
        )
    cut = rng.randint(1, max(1, len(text) - 1)) if len(text) > 2 and rng.random() < 0.4 else None
    if cut:
        return (
            f'<a:p>{pr}<a:r><a:t xml:space="preserve">{_xesc(text[:cut])}</a:t></a:r>'
            f'<a:r><a:t xml:space="preserve">{_xesc(text[cut:])}</a:t></a:r></a:p>'
        )
    return f"<a:p>{pr}<a:r><a:t>{_xesc(text)}</a:t></a:r></a:p>"


def synth_pptx_doc(doc_index: int, seed: int) -> dict:
    """One real PPTX package + its closed-form span plan.

    Returns {doc_id, pptx: bytes, expected: [(page, tag, text, node_id),
    ...]} with ``expected`` in authored READING order, post blank-drop,
    node_id from a simulation of the parser's enumeration over the SHUFFLED
    XML shape order. Messiness exercised: shuffled shape order (geometry is
    load-bearing), ctrTitle/title placeholders, bullet vs plain body
    paragraphs, empty paragraphs (blank-drop fodder), runs split mid-word
    with xml:space, a:br as space, slide-number fields, tables with
    multi-paragraph cells, pictures with/without alt text, ftr/sldNum
    furniture placeholders, a decoration box repeated on every slide
    (repeated-text furniture when the deck has >= 3 slides), an xfrm-less
    shape routed through the parser's below-content fallback band, and
    slide part NUMBERING mismatched against presentation order (rels
    resolution is load-bearing)."""
    rng = random.Random(f"sparkdoc-pptx:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-pptx-{doc_index:08d}"
    n_slides = rng.randint(1, 4)
    deco_text = f"Draft {doc_index} — internal"

    slides: list[list[dict]] = []  # per slide: shape dicts in READING order
    for page in range(1, n_slides + 1):
        shapes: list[dict] = []
        y = 20
        title = _sentence(rng, rng.randint(3, 6)).rstrip(".")
        ph = "ctrTitle" if page == 1 and rng.random() < 0.5 else "title"
        shapes.append({
            "kind": "sp", "ph": ph, "band": (40, y, 880, y + 40),
            "paras": [{"tag": "h1" if page == 1 else "h2", "text": title,
                       "bullet": False, "field": False}],
        })
        y += 50
        for _ in range(rng.randint(1, 3)):
            r = rng.random()
            if r < 0.45:  # body shape, 2-4 paragraphs
                paras = []
                for _k in range(rng.randint(2, 4)):
                    if rng.random() < 0.15:  # empty paragraph: blank-dropped
                        paras.append({"tag": "p", "text": "", "bullet": False,
                                      "field": False})
                        continue
                    bullet = rng.random() < 0.5
                    text = _sentence(rng, rng.randint(3, 9))
                    if rng.random() < 0.15:
                        text += " R&D <5% naïve."
                    paras.append({"tag": "li" if bullet else "p", "text": text,
                                  "bullet": bullet, "field": False})
                h = 18 * len(paras)
                shapes.append({"kind": "sp", "ph": None,
                               "band": (40, y, 880, y + h), "paras": paras})
                y += h + 10
            elif r < 0.7:  # table graphicFrame
                n_rows = rng.randint(2, 3)
                rows = []
                for _r2 in range(n_rows):
                    cells = []
                    for _c in range(3):
                        if rng.random() < 0.2:  # multi-paragraph cell
                            t1, t2 = rng.choice(_WORDS), rng.choice(_WORDS)
                            cells.append((f"{t1} {t2}", [t1, t2]))
                        else:
                            t = rng.choice(_WORDS)
                            cells.append((t, [t]))
                    rows.append(cells)
                text = "\n".join(" | ".join(c[0] for c in cells) for cells in rows)
                shapes.append({"kind": "tbl", "band": (60, y, 860, y + 60),
                               "rows": rows, "text": text})
                y += 70
            else:  # picture, alt sometimes empty
                alt = "" if rng.random() < 0.4 else (
                    "Diagram " + _sentence(rng, rng.randint(2, 4)).rstrip(".")
                )
                shapes.append({"kind": "pic", "band": (300, y, 620, y + 80),
                               "alt": alt})
                y += 90
        # furniture placeholders: deck footer + slide number field
        shapes.append({
            "kind": "sp", "ph": "ftr", "band": (40, 496, 400, 512),
            "paras": [{"tag": "footer", "text": f"{domain} confidential",
                       "bullet": False, "field": False}],
        })
        shapes.append({
            "kind": "sp", "ph": "sldNum", "band": (800, 516, 920, 532),
            "paras": [{"tag": "footer", "text": str(page), "bullet": False,
                       "field": True}],
        })
        # decoration text box on EVERY slide: same text, kind 'text' → the
        # repeated-furniture rule fires iff the deck has >= 3 slides; on
        # some slides it has NO xfrm (parser fallback band below content)
        deco_band = None if rng.random() < 0.3 else (500, 536, 900, 552)
        shapes.append({
            "kind": "sp", "ph": None, "band": deco_band,
            "paras": [{"tag": "p", "text": deco_text, "bullet": False,
                       "field": False}],
        })
        slides.append(shapes)

    # simulate the parser's node enumeration over the SHUFFLED shape order
    # (at most one xfrm-less shape per slide keeps the fallback band's
    # tree-order placement deterministic in the authored reading order: the
    # fallback band sits below every real band)
    nid = 0
    shuffled: list[list[dict]] = []
    for shapes in slides:
        order = shapes[:]
        rng.shuffle(order)
        shuffled.append(order)
        for sh in order:
            if sh["kind"] == "sp":
                for p in sh["paras"]:
                    nid += 1
                    p["node_id"] = nid
            else:
                nid += 1
                sh["node_id"] = nid

    # authored reading order, post blank-drop: real bands by y, then the
    # xfrm-less decoration (fallback band below content) last
    expected: list[tuple[int, str, str, int]] = []
    for page, shapes in enumerate(slides, start=1):
        placed = [s for s in shapes if s.get("band") is not None]
        fallback = [s for s in shapes if s.get("band") is None]
        for sh in sorted(placed, key=lambda s: s["band"][1]) + fallback:
            if sh["kind"] == "sp":
                for p in sh["paras"]:
                    if p["text"].strip():
                        expected.append((page, p["tag"], p["text"], p["node_id"]))
            elif sh["kind"] == "tbl":
                expected.append((page, "table", sh["text"], sh["node_id"]))
            else:
                expected.append((page, "img", sh["alt"], sh["node_id"]))

    # render the package; slide parts numbered in REVERSED presentation
    # order so positional naming would mis-order the deck — rels resolve
    part_of = {s: f"ppt/slides/slide{n_slides - s}.xml" for s in range(n_slides)}
    ns = (
        'xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" '
        'xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"'
    )
    slide_xmls: list[str] = []
    for shapes in shuffled:
        parts = []
        for sh in shapes:
            if sh["kind"] == "sp":
                paras_xml = [
                    _pptx_para_xml(rng, p["text"], p["bullet"], p["field"])
                    for p in sh["paras"]
                ]
                parts.append(_pptx_sp_xml(sh["ph"], sh["band"], paras_xml,
                                          sh["paras"][0]["node_id"]))
            elif sh["kind"] == "tbl":
                x0, y0, x1, y1 = sh["band"]
                trs = []
                for cells in sh["rows"]:
                    tcs = []
                    for _txt, paras in cells:
                        ps = "".join(
                            f"<a:p><a:r><a:t>{_xesc(t)}</a:t></a:r></a:p>"
                            for t in paras
                        )
                        tcs.append(f"<a:tc><a:txBody><a:bodyPr/>{ps}</a:txBody></a:tc>")
                    trs.append(f'<a:tr h="370840">' + "".join(tcs) + "</a:tr>")
                parts.append(
                    f'<p:graphicFrame><p:nvGraphicFramePr><p:cNvPr id="{sh["node_id"]}" '
                    f'name="Table {sh["node_id"]}"/></p:nvGraphicFramePr>'
                    f'<p:xfrm><a:off x="{x0 * _PPTX_EMU}" y="{y0 * _PPTX_EMU}"/>'
                    f'<a:ext cx="{(x1 - x0) * _PPTX_EMU}" cy="{(y1 - y0) * _PPTX_EMU}"/></p:xfrm>'
                    '<a:graphic><a:graphicData uri="http://schemas.openxmlformats.org/drawingml/2006/table">'
                    "<a:tbl><a:tblGrid/>" + "".join(trs) + "</a:tbl>"
                    "</a:graphicData></a:graphic></p:graphicFrame>"
                )
            else:
                x0, y0, x1, y1 = sh["band"]
                alt_attr = f' descr="{_xesc(sh["alt"])}"' if sh["alt"] else ""
                parts.append(
                    f'<p:pic><p:nvPicPr><p:cNvPr id="{sh["node_id"]}" '
                    f'name="Picture {sh["node_id"]}"{alt_attr}/><p:cNvPicPr/><p:nvPr/></p:nvPicPr>'
                    '<p:blipFill><a:blip r:embed="rId99"/></p:blipFill>'
                    f'<p:spPr><a:xfrm><a:off x="{x0 * _PPTX_EMU}" y="{y0 * _PPTX_EMU}"/>'
                    f'<a:ext cx="{(x1 - x0) * _PPTX_EMU}" cy="{(y1 - y0) * _PPTX_EMU}"/></a:xfrm></p:spPr></p:pic>'
                )
        slide_xmls.append(
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f"<p:sld {ns}><p:cSld><p:spTree>" + "".join(parts)
            + "</p:spTree></p:cSld></p:sld>"
        )

    sld_ids = "".join(
        f'<p:sldId id="{256 + s}" r:id="rId{s + 2}"/>' for s in range(n_slides)
    )
    rels_xml = "".join(
        f'<Relationship Id="rId{s + 2}" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/slide" '
        f'Target="{part_of[s][4:]}"/>'
        for s in range(n_slides)
    )

    import io as _io
    import zipfile as _zipfile

    buf = _io.BytesIO()
    with _zipfile.ZipFile(buf, "w", _zipfile.ZIP_DEFLATED) as zf:
        _zip_writestr(zf, 
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
            "</Types>",
        )
        _zip_writestr(zf, 
            "_rels/.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>'
            "</Relationships>",
        )
        _zip_writestr(zf, 
            "ppt/presentation.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f"<p:presentation {ns}><p:sldIdLst>{sld_ids}</p:sldIdLst>"
            '<p:sldSz cx="12192000" cy="6858000"/></p:presentation>',
        )
        _zip_writestr(zf, 
            "ppt/_rels/presentation.xml.rels",
            '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + rels_xml + "</Relationships>",
        )
        for s, xml in enumerate(slide_xmls):
            _zip_writestr(zf, part_of[s], xml)
    return {"doc_id": doc_id, "pptx": buf.getvalue(), "expected": expected}


def _expected_pptx_doc(d: dict) -> list[dict]:
    """Per-doc pptx expectation: page_break spans between slides, kind map,
    picture media_refs from the simulated parser enumeration, AND the
    repeated-text furniture rule (kind-'text' content on >= 3 distinct
    slides) — all restated from the authored plan."""
    pages_by_text: dict[str, set] = {}
    for page, tag, text, _nid in d["expected"]:
        if _PDF_KIND.get(tag, "text") == "text":
            pages_by_text.setdefault(text, set()).add(page)
    repeated = {t for t, ps in pages_by_text.items() if len(ps) >= 3}

    out: list[dict] = []
    off = 0
    prev_page = None
    for page, tag, text, nid in d["expected"]:
        if prev_page is not None and page != prev_page:
            out.append({"doc_id": d["doc_id"], "offset": off,
                        "kind": "page_break", "text": "", "media_ref": ""})
            off += 1
        prev_page = page
        kind = _PDF_KIND.get(tag, "text")
        if kind == "text" and text in repeated:
            kind = "furniture"
        out.append({
            "doc_id": d["doc_id"],
            "offset": off,
            "kind": kind,
            "text": _heading_text(tag, text) if kind == "heading" else text,
            "media_ref": f"#/pictures/{nid}" if tag == "img" else "",
        })
        off += 1
    return out


def expected_pptx_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the WHOLE pptx→spans pipeline —
    never calls the parser."""
    out: list[dict] = []
    for i in range(n_docs):
        out.extend(_expected_pptx_doc(synth_pptx_doc(i, seed)))
    return out


def pptx_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, pptx binary) corpus — deterministic per index."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_pptx_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "pptx": r["pptx"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 128)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, pptx binary"
    )


# ---------------------------------------------------------------------------
# Deterministic MIXED-format corpus (ingest sniffer/router gate fodder):
# one (doc_id, blob) table interleaving every first-mile format plus
# non-document rejects, exactly as a real crawl dump arrives. The expected
# plan composes the per-format closed-form expectations above.
# ---------------------------------------------------------------------------


def _dclg_esc(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def synth_doclang_doc(doc_index: int, seed: int) -> dict:
    """One DocLang-serialized document + its closed-form expected spans.

    Returns {doc_id, dclg: str, expected: [(kind, text, media_ref), ...]}
    where ``expected`` INCLUDES page_break rows ('' text) exactly as the
    parse emits them (every entry consumes an offset). Exercised:
    multi-page docs, empty loc attrs, pictures with ref attrs, XML
    entities in text, every span kind."""
    rng = random.Random(f"sparkdoc-dclg:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-dclg-{doc_index:08d}"
    expected: list[tuple[str, str, str]] = []
    parts: list[str] = ["<doc>"]
    pic = 0

    def loc() -> str:
        if rng.random() < 0.2:
            return ""
        left, top = rng.randint(0, 400), rng.randint(0, 400)
        return f"{left},{top},{left + rng.randint(8, 111)},{top + rng.randint(8, 111)}"

    for page in range(1, rng.randint(1, 3) + 1):
        if page > 1:
            parts.append("<page_break/>")
            expected.append(("page_break", "", ""))
        title = _sentence(rng, rng.randint(3, 6))
        parts.append(f'<heading loc="{loc()}" page="{page}">{_dclg_esc(title)}</heading>')
        expected.append(("heading", title, ""))
        for _ in range(rng.randint(2, 5)):
            r = rng.random()
            if r < 0.45:
                text = _sentence(rng, rng.randint(6, 14))
                if rng.random() < 0.25:
                    text += " <tags & such>"
                parts.append(f'<text loc="{loc()}" page="{page}">{_dclg_esc(text)}</text>')
                expected.append(("text", text, ""))
            elif r < 0.6:
                text = "• " + _sentence(rng, rng.randint(3, 7))
                parts.append(f'<list loc="{loc()}" page="{page}">{_dclg_esc(text)}</list>')
                expected.append(("list", text, ""))
            elif r < 0.75:
                text = " | ".join(_sentence(rng, 2) for _ in range(3))
                parts.append(f'<table loc="{loc()}" page="{page}">{_dclg_esc(text)}</table>')
                expected.append(("table", text, ""))
            elif r < 0.88:
                pic += 1
                ref = f"#/pictures/{pic}"
                parts.append(f'<picture loc="{loc()}" page="{page}" ref="{ref}"></picture>')
                expected.append(("picture", "", ref))
            else:
                text = _sentence(rng, rng.randint(2, 5))
                parts.append(f'<caption loc="{loc()}" page="{page}">{_dclg_esc(text)}</caption>')
                expected.append(("caption", text, ""))
    parts.append("</doc>")
    return {"doc_id": doc_id, "dclg": "".join(parts), "expected": expected}


def synth_binary_doc(doc_index: int, seed: int) -> dict:
    """One non-document blob — mixed-ingest reject fodder. Returns
    {doc_id, blob: bytes, fmt} with fmt the sniff class: 'binary' (unknown
    magic / invalid UTF-8 / zip without word/document.xml) or 'json' (a
    graph export, which the reference refuses to convert —
    core/input/types.py:180-190)."""
    rng = random.Random(f"sparkdoc-bin:{seed}:{doc_index}")
    doc_id = f"bin-{doc_index:08d}"
    v = doc_index % 4
    if v == 0:  # unknown magic (ELF) + noise — PNG would route to 'image'
        return {"doc_id": doc_id, "fmt": "binary",
                "blob": b"\x7fELF\x02\x01\x01\x00" + bytes(rng.randrange(256) for _ in range(64))}
    if v == 1:  # a zip that is NOT a Word package
        import io as _io
        import zipfile as _zf

        buf = _io.BytesIO()
        with _zf.ZipFile(buf, "w") as z:
            _zip_writestr(z, "data.bin", bytes(rng.randrange(256) for _ in range(32)))
        return {"doc_id": doc_id, "fmt": "binary", "blob": buf.getvalue()}
    if v == 2:  # graph-export JSON: rejected as a document
        return {"doc_id": doc_id, "fmt": "json",
                "blob": b'{"nodes": [], "edges": [], "metadata": {}}'}
    # invalid UTF-8 (0xff never occurs in valid UTF-8)
    return {"doc_id": doc_id, "fmt": "binary",
            "blob": b"\xff\xfe" + bytes(rng.randrange(256) for _ in range(48))}


def synth_adoc_doc(doc_index: int, seed: int) -> dict:
    """One AsciiDoc document + its closed-form block plan.

    Returns {doc_id, adoc: str, expected: [(tag, text, n_links), ...]}.
    Messiness exercised: title + section levels, attribute entries and
    comments (skipped), hard-wrapped paragraphs, *bold*/_em_/`mono` strips,
    link macros (link:url[text] and https://url[text]) feeding n_links, an
    all-link farm paragraph (link-density drop fodder), bare URLs kept
    literal, |=== tables, image:: macros with/without alt, and literal
    fences shielding heading-looking lines verbatim."""
    rng = random.Random(f"sparkdoc-adoc:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-adoc-{doc_index:08d}"
    expected: list[tuple[str, str, int]] = []
    out: list[str] = []

    title = _sentence(rng, rng.randint(3, 6)).rstrip(".")
    out.append(f"= {title}")
    expected.append(("h1", title, 0))
    out.append(":toc: left")  # attribute entries are not content
    out.append(f":author: {rng.choice(_WORDS)}")
    out.append("")

    def render_inline(text: str) -> str:
        words = text.split(" ")
        k = rng.randrange(len(words))
        if len(words[k]) > 1 and words[k].isalpha():
            mark = rng.choice(["*", "_", "`"])
            words[k] = f"{mark}{words[k]}{mark}"
        return " ".join(words)

    # link farm (nav analog): every word a link macro — dropped downstream
    farm = [rng.choice(_WORDS) for _ in range(rng.randint(4, 8))]
    out.append(" ".join(f"https://{domain}/x{k}[{w}]" for k, w in enumerate(farm)))
    out.append("")
    expected.append(("p", " ".join(farm), sum(len(w) for w in farm)))

    n_blocks = rng.randint(4, 9)
    for _ in range(n_blocks):
        r = rng.random()
        if r < 0.22:  # hard-wrapped paragraph with inline markup
            s1 = _sentence(rng, rng.randint(4, 9))
            s2 = _sentence(rng, rng.randint(4, 9))
            out.append(render_inline(s1))
            out.append(s2)
            out.append("")
            expected.append(("p", f"{s1} {s2}", 0))
        elif r < 0.36:  # paragraph with one link macro (or a bare URL)
            pre = _sentence(rng, rng.randint(3, 7))
            post = _sentence(rng, rng.randint(3, 7))
            if rng.random() < 0.3:
                url = f"https://{domain}/bare"
                out.append(f"{pre} {url} {post}")
                out.append("")
                expected.append(("p", f"{pre} {url} {post}", 0))
            else:
                anchor = _sentence(rng, rng.randint(2, 4)).rstrip(".")
                macro = ("link:/docs/a.html" if rng.random() < 0.5
                         else f"https://{domain}/deep/page")
                out.append(f"{pre} {macro}[{anchor}] {post}")
                out.append("")
                expected.append(("p", f"{pre} {anchor} {post}", len(anchor)))
        elif r < 0.5:  # section heading, levels 2-4
            lvl = rng.randint(2, 4)
            text = _sentence(rng, rng.randint(2, 5)).rstrip(".")
            out.append(f"{'=' * lvl} {text}")
            out.append("")
            expected.append((f"h{lvl}", text, 0))
        elif r < 0.62:  # bullet / ordered list
            marker = rng.choice(["*", "-", ".", "**"])
            for _k in range(rng.randint(2, 4)):
                item = _sentence(rng, rng.randint(3, 7))
                out.append(f"{marker} {item}")
                expected.append(("li", item, 0))
            out.append("")
        elif r < 0.74:  # table
            n_rows = rng.randint(2, 4)
            out.append("|===")
            rows = []
            for _r2 in range(n_rows):
                cells = [rng.choice(_WORDS) for _ in range(3)]
                out.append("|" + "|".join(cells))
                rows.append(" | ".join(cells))
            out.append("|===")
            out.append("")
            expected.append(("table", "\n".join(rows), 0))
        elif r < 0.86:  # image macro, alt sometimes empty
            alt = "" if rng.random() < 0.4 else (
                "Figure " + _sentence(rng, rng.randint(2, 4)).rstrip(".")
            )
            out.append(f"image::img/{rng.randint(1, 99)}.png[{alt}]")
            out.append("")
            expected.append(("img", alt, 0))
        else:  # literal fence shields markup-looking lines verbatim
            fence = rng.choice(["----", "...."])
            lit = [f"== {rng.choice(_WORDS)} is not a heading",
                   f"* {rng.choice(_WORDS)} is not a bullet"]
            out.append(fence)
            out.extend(lit)
            out.append(fence)
            out.append("")
            expected.append(("p", "\n".join(lit), 0))
        if rng.random() < 0.2:
            out.append(f"// comment {rng.choice(_WORDS)}")
    return {"doc_id": doc_id, "adoc": "\n".join(out) + "\n", "expected": expected}


def expected_adoc_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the WHOLE adoc→spans pipeline —
    same classify restatement as expected_html_spans (never calls the
    parser)."""
    out: list[dict] = []
    for i in range(n_docs):
        d = synth_adoc_doc(i, seed)
        out.extend(_expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND))
    return out


def adoc_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, adoc string) corpus — deterministic per index."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_adoc_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "adoc": r["adoc"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 128)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, adoc string"
    )


def _vtt_ts(rng: random.Random, t: float) -> str:
    h, rem = divmod(int(t), 3600)
    m, s = divmod(rem, 60)
    ms = int((t - int(t)) * 1000)
    if h or rng.random() < 0.5:
        return f"{h:02d}:{m:02d}:{s:02d}.{ms:03d}"
    return f"{m:02d}:{s:02d}.{ms:03d}"


def synth_vtt_doc(doc_index: int, seed: int) -> dict:
    """One WebVTT transcript + its closed-form cue plan.

    Returns {doc_id, vtt: str, expected: [(tag, text, n_links), ...]}.
    Messiness exercised: header metadata, NOTE/STYLE blocks (skipped), cue
    identifiers present/absent, timing settings, voice tags → 'Speaker: '
    turns, <i>/<b>/<c>/timestamp tags stripped, multi-line payloads joined
    with spaces."""
    rng = random.Random(f"sparkdoc-vtt:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-vtt-{doc_index:08d}"
    out: list[str] = []
    expected: list[tuple[str, str, int]] = []
    out.append("WEBVTT" + (" - transcript" if rng.random() < 0.3 else ""))
    if rng.random() < 0.3:
        out.append("Kind: captions")
        out.append("Language: en")
    out.append("")
    if rng.random() < 0.4:
        out.append("NOTE")
        out.append("machine transcript, not reviewed")
        out.append("")
    if rng.random() < 0.2:
        out.append("STYLE")
        out.append("::cue { color: white }")
        out.append("")
    t = 0.0
    speakers = ["Ana", "Raj", "Mei"]
    for k in range(rng.randint(3, 8)):
        dur = rng.uniform(1.0, 6.0)
        if rng.random() < 0.4:
            out.append(str(k + 1))  # cue identifier
        settings = " align:start position:10%" if rng.random() < 0.25 else ""
        out.append(f"{_vtt_ts(rng, t)} --> {_vtt_ts(rng, t + dur)}{settings}")
        t += dur + rng.uniform(0.0, 1.0)
        r = rng.random()
        if r < 0.35:  # voice turn
            sp = rng.choice(speakers)
            text = _sentence(rng, rng.randint(3, 9))
            out.append(f"<v {sp}>{text}</v>")
            expected.append(("p", f"{sp}: {text}", 0))
        elif r < 0.55:  # inline tags stripped
            a = _sentence(rng, rng.randint(2, 5))
            b = _sentence(rng, rng.randint(2, 5))
            tag = rng.choice(["i", "b", "c.yellow"])
            out.append(f"<{tag}>{a}</{tag.split('.')[0]}> <00:00:0{rng.randint(1,9)}.000>{b}")
            expected.append(("p", f"{a} {b}", 0))
        elif r < 0.8:  # multi-line payload
            a = _sentence(rng, rng.randint(3, 7))
            b = _sentence(rng, rng.randint(3, 7))
            out.append(a)
            out.append(b)
            expected.append(("p", f"{a} {b}", 0))
        else:
            text = _sentence(rng, rng.randint(4, 10))
            out.append(text)
            expected.append(("p", text, 0))
        out.append("")
    return {"doc_id": doc_id, "vtt": "\n".join(out), "expected": expected}


def expected_vtt_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the WHOLE vtt→spans pipeline."""
    out: list[dict] = []
    for i in range(n_docs):
        d = synth_vtt_doc(i, seed)
        out.extend(_expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND))
    return out


def vtt_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, vtt string) corpus — deterministic per index."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_vtt_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "vtt": r["vtt"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 128)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, vtt string"
    )


def synth_jats_doc(doc_index: int, seed: int) -> dict:
    """One JATS XML article + its closed-form block plan.

    Returns {doc_id, jats: str, expected: [(tag, text, n_links), ...]}.
    Messiness exercised: prolog always, JATS doctype half the time, a
    default namespace a quarter of the time (the parser is ns-insensitive),
    journal-meta and supplementary-material junk (skipped whole), inline
    italic/bold/monospace in titles and paragraphs, ext-link anchors
    feeding n_links with a reference-farm paragraph (link-density drop
    fodder), xref citation markers kept as content, entity escapes,
    abstracts with/without titles, nested secs and nested lists, figs with
    label/caption/alt-text in all presence combinations, table-wraps with
    thead+tbody, verbatim preformat blocks, disp-quotes, XML comments, and
    a ref-list with default or explicit title."""
    rng = random.Random(f"sparkdoc-jats:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-jats-{doc_index:08d}"
    expected: list[tuple[str, str, int]] = []
    x: list[str] = ['<?xml version="1.0" encoding="UTF-8"?>']
    if rng.random() < 0.5:
        x.append(
            '<!DOCTYPE article PUBLIC "-//NLM//DTD JATS (Z39.96) Journal '
            'Archiving and Interchange DTD v1.2 20190208//EN" '
            '"JATS-archivearticle1.dtd">'
        )
    ns = ' xmlns="https://jats.nlm.nih.gov"' if rng.random() < 0.25 else ""
    x.append(
        '<article article-type="research-article" dtd-version="1.2"'
        f' xmlns:xlink="http://www.w3.org/1999/xlink"{ns}>'
    )

    def inline_mark(sentence: str) -> str:
        words = sentence.split(" ")
        k = rng.randrange(len(words))
        if len(words[k]) > 1 and words[k].isalpha():
            mark = rng.choice(["italic", "bold", "monospace"])
            words[k] = f"<{mark}>{words[k]}</{mark}>"
        return " ".join(words)

    # --- front -----------------------------------------------------------
    x.append("<front>")
    x.append(
        "<journal-meta><journal-title-group><journal-title>"
        f"{rng.choice(_WORDS).capitalize()} Journal"
        "</journal-title></journal-title-group></journal-meta>"
    )
    x.append("<article-meta>")
    title = _sentence(rng, rng.randint(4, 8)).rstrip(".")
    rendered = inline_mark(title) if rng.random() < 0.5 else title
    x.append(f"<title-group><article-title>{rendered}</article-title></title-group>")
    expected.append(("h1", title, 0))
    names: list[str] = []
    parts = ["<contrib-group>"]
    for _ in range(rng.randint(1, 3)):
        given = rng.choice(_WORDS).capitalize()
        sur = rng.choice(_WORDS).capitalize()
        parts.append(
            '<contrib contrib-type="author"><name>'
            f"<surname>{sur}</surname><given-names>{given}</given-names>"
            "</name></contrib>"
        )
        names.append(f"{given} {sur}")
    parts.append("</contrib-group>")
    x.append("".join(parts))
    expected.append(("p", "; ".join(names), 0))
    if rng.random() < 0.75:
        abs_title = "" if rng.random() < 0.5 else rng.choice(["Summary", "Overview"])
        x.append("<abstract>" + (f"<title>{abs_title}</title>" if abs_title else ""))
        expected.append(("h2", abs_title or "Abstract", 0))
        for _ in range(rng.randint(1, 2)):
            s = _sentence(rng, rng.randint(6, 12))
            x.append(f"<p>{s}</p>")
            expected.append(("p", s, 0))
        x.append("</abstract>")
    x.append("</article-meta></front>")

    # --- body ------------------------------------------------------------
    x.append("<body>")
    # reference-farm paragraph: every word an ext-link — dropped downstream
    farm = [rng.choice(_WORDS) for _ in range(rng.randint(4, 8))]
    x.append(
        "<p>"
        + " ".join(
            f'<ext-link ext-link-type="uri" xlink:href="https://{domain}/x{k}">{w}</ext-link>'
            for k, w in enumerate(farm)
        )
        + "</p>"
    )
    expected.append(("p", " ".join(farm), sum(len(w) for w in farm)))
    for s_i in range(rng.randint(2, 4)):
        sec_title = _sentence(rng, rng.randint(2, 5)).rstrip(".")
        x.append(f'<sec id="s{s_i}"><title>{sec_title}</title>')
        expected.append(("h2", sec_title, 0))
        for _ in range(rng.randint(1, 4)):
            r = rng.random()
            if r < 0.24:  # paragraph: entity escapes or inline markup
                s1 = _sentence(rng, rng.randint(5, 10))
                if rng.random() < 0.2:
                    n = rng.randint(2, 9)
                    x.append(f"<p>Fees &amp; charges apply when x &lt; {n}. {s1}</p>")
                    expected.append(("p", f"Fees & charges apply when x < {n}. {s1}", 0))
                else:
                    x.append(f"<p>{inline_mark(s1)}</p>")
                    expected.append(("p", s1, 0))
            elif r < 0.38:  # paragraph with one ext-link and an xref marker
                pre = _sentence(rng, rng.randint(3, 7))
                anchor = " ".join(rng.choice(_WORDS) for _ in range(rng.randint(1, 3)))
                post = _sentence(rng, rng.randint(3, 7))
                x.append(
                    f'<p>{pre} <ext-link ext-link-type="uri" '
                    f'xlink:href="https://{domain}/deep">{anchor}</ext-link> '
                    f'{post} <xref ref-type="bibr" rid="r1">[1]</xref></p>'
                )
                expected.append(("p", f"{pre} {anchor} {post} [1]", len(anchor)))
            elif r < 0.52:  # list, nested a fifth of the time
                lt = rng.choice(["bullet", "order"])
                x.append(f'<list list-type="{lt}">')
                n_items = rng.randint(2, 4)
                for k in range(n_items):
                    item = _sentence(rng, rng.randint(3, 7))
                    nest = k == n_items - 1 and rng.random() < 0.2
                    if nest:
                        sub = _sentence(rng, rng.randint(2, 5))
                        x.append(
                            f"<list-item><p>{item}</p>"
                            '<list list-type="bullet"><list-item>'
                            f"<p>{sub}</p></list-item></list></list-item>"
                        )
                        expected.append(("li", item, 0))
                        expected.append(("li", sub, 0))
                    else:
                        x.append(f"<list-item><p>{item}</p></list-item>")
                        expected.append(("li", item, 0))
                x.append("</list>")
            elif r < 0.66:  # fig: label/caption/alt-text combinations
                fid = rng.randint(1, 99)
                bare = rng.random() < 0.15
                alt = (
                    ""
                    if rng.random() < 0.6
                    else " ".join(rng.choice(_WORDS) for _ in range(3))
                )
                fig = [f'<fig id="f{fid}">']
                if not bare:
                    label = f"Figure {rng.randint(1, 9)}"
                    cap = "" if rng.random() < 0.3 else _sentence(rng, rng.randint(3, 6))
                    fig.append(f"<label>{label}</label>")
                    if cap:
                        fig.append(f"<caption><p>{cap}</p></caption>")
                    expected.append(
                        ("figcaption", f"{label} {cap}" if cap else label, 0)
                    )
                if alt:
                    fig.append(f"<alt-text>{alt}</alt-text>")
                fig.append(f'<graphic xlink:href="img/{fid}.jpg"/></fig>')
                x.append("".join(fig))
                expected.append(("img", alt, 0))
            elif r < 0.8:  # table-wrap with thead + tbody
                label = f"Table {rng.randint(1, 9)}"
                cap = _sentence(rng, rng.randint(2, 5))
                header = [rng.choice(_WORDS) for _ in range(3)]
                rows = [
                    [rng.choice(_WORDS) for _ in range(3)]
                    for _ in range(rng.randint(2, 4))
                ]
                tx = [
                    f'<table-wrap id="t{rng.randint(1, 99)}">',
                    f"<label>{label}</label><caption><p>{cap}</p></caption><table>",
                    "<thead><tr>" + "".join(f"<th>{h}</th>" for h in header) + "</tr></thead>",
                    "<tbody>",
                ]
                for row in rows:
                    tx.append("<tr>" + "".join(f"<td>{c}</td>" for c in row) + "</tr>")
                tx.append("</tbody></table></table-wrap>")
                x.append("".join(tx))
                expected.append(("p", f"{label} {cap}", 0))
                expected.append(
                    ("table", "\n".join(" | ".join(r) for r in [header] + rows), 0)
                )
            elif r < 0.88:  # preformat shields heading-looking lines verbatim
                lit = [
                    f"def {rng.choice(_WORDS)}(x):",
                    f"    return x + {rng.randint(1, 9)}",
                ]
                x.append("<preformat>\n" + "\n".join(lit) + "\n</preformat>")
                expected.append(("p", "\n".join(lit), 0))
            else:  # nested sec (h3) or a disp-quote at the same depth
                if rng.random() < 0.5:
                    sub_title = _sentence(rng, rng.randint(2, 4)).rstrip(".")
                    sp = _sentence(rng, rng.randint(4, 8))
                    x.append(f"<sec><title>{sub_title}</title><p>{sp}</p></sec>")
                    expected.append(("h3", sub_title, 0))
                    expected.append(("p", sp, 0))
                else:
                    q = _sentence(rng, rng.randint(4, 9))
                    x.append(f"<disp-quote><p>{q}</p></disp-quote>")
                    expected.append(("p", q, 0))
        if rng.random() < 0.2:  # junk the walk must skip whole
            x.append(
                '<supplementary-material xlink:href="s1.zip">'
                "<label>S1</label></supplementary-material>"
            )
        if rng.random() < 0.2:
            x.append(f"<!-- production note {rng.choice(_WORDS)} -->")
        x.append("</sec>")
    x.append("</body>")

    # --- back ------------------------------------------------------------
    x.append("<back>")
    if rng.random() < 0.4:
        ack = _sentence(rng, rng.randint(5, 9))
        x.append(f"<ack><title>Acknowledgments</title><p>{ack}</p></ack>")
        expected.append(("h2", "Acknowledgments", 0))
        expected.append(("p", ack, 0))
    if rng.random() < 0.8:
        rl_title = "" if rng.random() < 0.5 else "Bibliography"
        x.append("<ref-list>" + (f"<title>{rl_title}</title>" if rl_title else ""))
        expected.append(("h2", rl_title or "References", 0))
        for r_i in range(rng.randint(2, 4)):
            author = rng.choice(_WORDS).capitalize()
            year = 2000 + rng.randint(0, 25)
            cite = _sentence(rng, rng.randint(4, 8))
            x.append(
                f'<ref id="r{r_i}"><label>{r_i + 1}.</label> '
                f"<mixed-citation>{author} ({year}). {cite}</mixed-citation></ref>"
            )
            expected.append(("li", f"{r_i + 1}. {author} ({year}). {cite}", 0))
        x.append("</ref-list>")
    x.append("</back></article>")
    return {"doc_id": doc_id, "jats": "\n".join(x) + "\n", "expected": expected}


def expected_jats_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the WHOLE jats→spans pipeline —
    same classify restatement as expected_html_spans (never calls the
    parser)."""
    out: list[dict] = []
    for i in range(n_docs):
        d = synth_jats_doc(i, seed)
        out.extend(_expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND))
    return out


def jats_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, jats string) corpus — deterministic per index."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_jats_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "jats": r["jats"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 128)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, jats string"
    )


def synth_uspto_doc(doc_index: int, seed: int) -> dict:
    """One USPTO patent-XML document + its closed-form block plan.

    Returns {doc_id, uspto: str, expected: [(tag, text, n_links), ...]}.
    Messiness exercised: grant vs application roots, decisive doctype half
    the time, bibliographic junk (publication-reference numbers) the walk
    must skip, inline b/i in titles, abstracts present/absent, description
    heading+paragraph runs, CALS tables (thead+tbody rows), maths blocks
    (skipped whole), drawings figures as empty pictures, claims with
    nested claim-text sub-items and claim-ref markers kept as content, XML
    comments."""
    rng = random.Random(f"sparkdoc-uspto:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-uspto-{doc_index:08d}"
    expected: list[tuple[str, str, int]] = []
    grant = rng.random() < 0.7
    root = "us-patent-grant" if grant else "us-patent-application"
    biblio = ("us-bibliographic-data-grant" if grant
              else "us-bibliographic-data-application")
    x: list[str] = ['<?xml version="1.0" encoding="UTF-8"?>']
    if rng.random() < 0.5:
        x.append(f'<!DOCTYPE {root} SYSTEM "{root}-v45-2014-04-03.dtd">')
    x.append(f'<{root} lang="EN" dtd-version="v4.5" status="PRODUCTION">')

    def inline_mark(sentence: str) -> str:
        words = sentence.split(" ")
        k = rng.randrange(len(words))
        if len(words[k]) > 1 and words[k].isalpha():
            mark = rng.choice(["b", "i"])
            words[k] = f"<{mark}>{words[k]}</{mark}>"
        return " ".join(words)

    title = _sentence(rng, rng.randint(3, 7)).rstrip(".")
    x.append(f"<{biblio}>")
    x.append(
        "<publication-reference><document-id><country>US</country>"
        f"<doc-number>{rng.randint(7000000, 9999999)}</doc-number>"
        "<kind>B2</kind></document-id></publication-reference>"
    )
    rendered = inline_mark(title) if rng.random() < 0.4 else title
    x.append(f'<invention-title id="d0e43">{rendered}</invention-title>')
    x.append(f"</{biblio}>")
    expected.append(("h1", title, 0))

    if rng.random() < 0.85:
        x.append('<abstract id="abstract">')
        expected.append(("h2", "Abstract", 0))
        for _ in range(rng.randint(1, 2)):
            s = _sentence(rng, rng.randint(6, 12))
            x.append(f'<p id="p-a{rng.randint(1, 99)}">{s}</p>')
            expected.append(("p", s, 0))
        x.append("</abstract>")

    x.append('<description id="description">')
    for h_i in range(rng.randint(2, 4)):
        htext = _sentence(rng, rng.randint(2, 4)).rstrip(".").upper()
        x.append(f'<heading id="h-{h_i}" level="1">{htext}</heading>')
        expected.append(("h2", htext, 0))
        for _ in range(rng.randint(1, 3)):
            s = _sentence(rng, rng.randint(6, 12))
            x.append(f'<p id="p-{rng.randint(1, 999):04d}" num="{rng.randint(1, 999):04d}">{inline_mark(s)}</p>')
            expected.append(("p", s, 0))
        if rng.random() < 0.3:  # CALS table
            header = [rng.choice(_WORDS) for _ in range(3)]
            rows = [
                [rng.choice(_WORDS) for _ in range(3)]
                for _ in range(rng.randint(2, 4))
            ]
            tx = ['<tables id="TBL-1"><table colsep="0"><tgroup cols="3">',
                  "<thead><row>"
                  + "".join(f"<entry>{h}</entry>" for h in header)
                  + "</row></thead><tbody>"]
            for row in rows:
                tx.append("<row>" + "".join(f"<entry>{c}</entry>" for c in row) + "</row>")
            tx.append("</tbody></tgroup></table></tables>")
            x.append("".join(tx))
            expected.append(
                ("table", "\n".join(" | ".join(r) for r in [header] + rows), 0)
            )
        if rng.random() < 0.2:  # maths junk the walk must skip
            x.append(
                '<maths id="MATH-1"><math display="block">'
                f"<mi>x</mi><mo>+</mo><mn>{rng.randint(1, 9)}</mn></math></maths>"
            )
        if rng.random() < 0.15:
            x.append(f"<!-- examiner note {rng.choice(_WORDS)} -->")
    x.append("</description>")

    if rng.random() < 0.6:
        n_figs = rng.randint(1, 3)
        x.append('<drawings id="DRAWINGS">')
        for f_i in range(n_figs):
            x.append(
                f'<figure id="Fig-{f_i}" num="{f_i + 1:05d}">'
                f'<img id="EMI-D{f_i:05d}" file="D{f_i:05d}.TIF" alt="drawing"/></figure>'
            )
            expected.append(("img", "", 0))
        x.append("</drawings>")

    x.append('<claims id="claims">')
    expected.append(("h2", "Claims", 0))
    n_claims = rng.randint(2, 5)
    for c_i in range(n_claims):
        if c_i == 0 or rng.random() < 0.4:  # independent claim
            stem = _sentence(rng, rng.randint(5, 9)).rstrip(".")
            if rng.random() < 0.3:  # nested claim-text sub-items
                a = _sentence(rng, rng.randint(2, 4)).rstrip(".").lower()
                b = _sentence(rng, rng.randint(2, 4)).rstrip(".").lower()
                x.append(
                    f'<claim id="CLM-{c_i:05d}" num="{c_i + 1:05d}">'
                    f"<claim-text>{stem} comprising: "
                    f"<claim-text>a {a};</claim-text> "
                    f"<claim-text>a {b}.</claim-text></claim-text></claim>"
                )
                expected.append(("li", f"{stem} comprising: a {a}; a {b}.", 0))
            else:
                x.append(
                    f'<claim id="CLM-{c_i:05d}" num="{c_i + 1:05d}">'
                    f"<claim-text>{stem}.</claim-text></claim>"
                )
                expected.append(("li", f"{stem}.", 0))
        else:  # dependent claim with a claim-ref marker
            ref = rng.randint(1, c_i)
            tail = _sentence(rng, rng.randint(4, 8)).lower()
            x.append(
                f'<claim id="CLM-{c_i:05d}" num="{c_i + 1:05d}">'
                f"<claim-text>The device of "
                f'<claim-ref idref="CLM-{ref - 1:05d}">claim {ref}</claim-ref>'
                f", wherein {tail}</claim-text></claim>"
            )
            expected.append(("li", f"The device of claim {ref}, wherein {tail}", 0))
    x.append("</claims>")
    x.append(f"</{root}>")
    return {"doc_id": doc_id, "uspto": "\n".join(x) + "\n", "expected": expected}


def expected_uspto_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the WHOLE uspto→spans pipeline —
    same classify restatement as expected_html_spans (never calls the
    parser)."""
    out: list[dict] = []
    for i in range(n_docs):
        d = synth_uspto_doc(i, seed)
        out.extend(_expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND))
    return out


def uspto_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, uspto string) corpus — deterministic per index."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_uspto_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "uspto": r["uspto"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 128)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, uspto string"
    )


def synth_mets_doc(doc_index: int, seed: int) -> dict:
    """One METS/ALTO (Google-Books-style) tar.gz bundle + closed-form plan.

    Returns {doc_id, blob: bytes (deterministic tar.gz), expected:
    [(page_seq, tag, text)], node_order: [(page_seq, tag, text)]}.
    ``node_order`` is the parser's EMISSION order (ALTO file order — the
    source of node ids / picture media_refs); ``expected`` is the XY-cut
    READING order (VPOS-sorted; blocks are deliberately shuffled in the
    file so the two differ). Messiness exercised: gzip'd tar with fixed
    mtimes, ORDER-attributed page divs listed in reverse, image fptrs the
    resolver must skip past, an OCR-less page div (skipped without
    breaking the page sequence), a junk .jp2 member, running headers that
    become furniture on ≥3-page books, per-page footers that stay text,
    hyphenated line joins (HYP), XML-entity escapes, and ALTO with and
    without a namespace."""
    import gzip as _gz
    import io as _io
    import tarfile as _tarfile

    rng = random.Random(f"sparkdoc-mets:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-mets-{doc_index:08d}"
    n_pages = rng.randint(2, 4)
    skip_page = rng.randint(1, n_pages) if rng.random() < 0.25 else 0
    use_ns = rng.random() < 0.5
    use_order = rng.random() < 0.5
    ns = ' xmlns="http://www.loc.gov/standards/alto/ns-v3#"' if use_ns else ""
    header_text = f"{doc_id} — library scan"

    node_order: list[tuple[int, str, str, str]] = []
    expected: list[tuple[int, str, str, str]] = []
    altos: list[bytes] = []  # one per page div (empty bytes = image-only div)

    page_seq = 0
    for p in range(1, n_pages + 1):
        if p == skip_page:
            altos.append(b"")
            continue
        page_seq += 1
        # authored blocks in READING (VPOS) order: header, flow, footer;
        # bid is the block's stable identity across the two orders
        blocks: list[tuple[str, str, int, int, str]] = []  # (tag, text, vpos, h, bid)
        blocks.append(("p", header_text, 10, 14, f"{p}-hdr"))
        y = 80
        for b_i in range(rng.randint(2, 4)):
            bid = f"{p}-{b_i}"
            r = rng.random()
            if r < 0.2:
                blocks.append(("img", "", y, rng.randint(120, 240), bid))
            elif r < 0.35:  # hyphenated two-line paragraph
                s = _sentence(rng, rng.randint(5, 9))
                words = s.split(" ")
                k = rng.randrange(len(words))
                w = words[k]
                cut = max(1, len(w) // 2)
                words_a = words[:k] + [w[:cut]]
                words_b = [w[cut:]] + words[k + 1:]
                blocks.append(
                    ("hyp:" + " ".join(words_a) + "|" + " ".join(words_b), s, y, 40, bid)
                )
            elif r < 0.45:  # entity escape
                s = f"Pages {rng.randint(2, 9)} & onward, see notes."
                blocks.append(("p", s, y, 22, bid))
            else:
                s = _sentence(rng, rng.randint(4, 10))
                blocks.append(("p", s, y, 22, bid))
            y += blocks[-1][3] + rng.randint(20, 40)
        blocks.append(("p", f"Page {page_seq}", 1160, 12, f"{p}-ftr"))
        for tag, text, _v, _h, bid in blocks:
            t = "img" if tag == "img" else "p"
            expected.append((page_seq, t, text, bid))
        # EMISSION order: deterministic shuffle of the reading order
        emit = blocks[:]
        rng.shuffle(emit)
        for tag, text, _v, _h, bid in emit:
            t = "img" if tag == "img" else "p"
            node_order.append((page_seq, t, text, bid))
        # render ALTO
        parts = ['<?xml version="1.0" encoding="UTF-8"?>',
                 f"<alto{ns}><Layout>",
                 f'<Page ID="PAGE{p}" PHYSICAL_IMG_NR="{p}" WIDTH="800" HEIGHT="1200">',
                 '<PrintSpace HPOS="0" VPOS="0" WIDTH="800" HEIGHT="1200">']
        for bi, (tag, text, v, hh, _bid) in enumerate(emit):
            if tag == "img":
                parts.append(
                    f'<Illustration ID="IL{p}-{bi}" HPOS="120" VPOS="{v}"'
                    f' WIDTH="560" HEIGHT="{hh}"/>'
                )
                continue
            if tag.startswith("hyp:"):
                la, lb = tag[4:].split("|", 1)
                def _line(ws: str, vv: int, hyp: bool) -> str:
                    strs = "".join(
                        f'<String CONTENT="{w.replace("&", "&amp;")}"/><SP/>'
                        for w in ws.split(" ")
                    )
                    return (f'<TextLine HPOS="60" VPOS="{vv}" WIDTH="680" HEIGHT="18">'
                            + strs + ("<HYP/>" if hyp else "") + "</TextLine>")
                parts.append(
                    f'<TextBlock ID="TB{p}-{bi}" HPOS="60" VPOS="{v}" WIDTH="680" HEIGHT="{hh}">'
                    + _line(la, v, True) + _line(lb, v + 20, False) + "</TextBlock>"
                )
                continue
            strs = "".join(
                f'<String CONTENT="{w.replace("&", "&amp;")}"/><SP/>'
                for w in text.split(" ")
            )
            parts.append(
                f'<TextBlock ID="TB{p}-{bi}" HPOS="60" VPOS="{v}" WIDTH="680" HEIGHT="{hh}">'
                f'<TextLine HPOS="60" VPOS="{v}" WIDTH="680" HEIGHT="18">{strs}</TextLine>'
                "</TextBlock>"
            )
        parts.append("</PrintSpace></Page></Layout></alto>")
        altos.append("".join(parts).encode("utf-8"))

    # METS manifest: files + reverse-listed page divs
    m = ['<?xml version="1.0" encoding="UTF-8"?>',
         '<mets xmlns="http://www.loc.gov/METS/"'
         ' xmlns:xlink="http://www.w3.org/1999/xlink">',
         "<fileSec>", '<fileGrp USE="ocr">']
    for p in range(1, n_pages + 1):
        if altos[p - 1]:
            m.append(f'<file ID="OCR{p:05d}" MIMETYPE="text/xml">'
                     f'<FLocat xlink:href="alto/{p:08d}.xml"/></file>')
    m.append('</fileGrp><fileGrp USE="image">')
    for p in range(1, n_pages + 1):
        m.append(f'<file ID="IMG{p:05d}" MIMETYPE="image/jp2">'
                 f'<FLocat xlink:href="images/{p:08d}.jp2"/></file>')
    m.append('</fileGrp></fileSec><structMap TYPE="physical"><div TYPE="book">')
    pages = list(range(1, n_pages + 1))
    if use_order:
        pages = pages[::-1]  # listed reversed; ORDER attr restores sequence
    for p in pages:
        order = f' ORDER="{p}"' if use_order else ""
        fptrs = f'<fptr FILEID="IMG{p:05d}"/>'
        if altos[p - 1]:
            fptrs += f'<fptr FILEID="OCR{p:05d}"/>'
        m.append(f'<div TYPE="page"{order}>{fptrs}</div>')
    m.append("</div></structMap></mets>")
    mets_xml = "".join(m).encode("utf-8")

    # deterministic tar.gz
    tbuf = _io.BytesIO()
    with _tarfile.open(fileobj=tbuf, mode="w") as tf:
        def addf(name: str, data: bytes) -> None:
            ti = _tarfile.TarInfo(name=name)
            ti.size = len(data)
            ti.mtime = 0
            tf.addfile(ti, _io.BytesIO(data))

        addf(f"{doc_id}/{doc_id}.mets.xml", mets_xml)
        for p in range(1, n_pages + 1):
            if altos[p - 1]:
                addf(f"{doc_id}/alto/{p:08d}.xml", altos[p - 1])
        addf(f"{doc_id}/images/00000001.jp2", b"\x00\x00\x00\x0cjP  \r\n\x87\n junk")
    blob = _gz.compress(tbuf.getvalue(), mtime=0)
    return {"doc_id": doc_id, "blob": blob,
            "expected": expected, "node_order": node_order}


def _expected_mets_doc(d: dict) -> list[dict]:
    """Per-doc METS expectation: page_break spans between contributing
    pages, the repeated-text furniture rule (identical text on >= 3
    pages), picture media_refs from the parser's emission-order node ids —
    all restated from the authored plan."""
    nid_by_bid = {bid: nid for nid, (_pg, _tg, _t, bid)
                  in enumerate(d["node_order"], start=1)}
    pages_by_text: dict[str, set] = {}
    for page, tag, text, _bid in d["expected"]:
        if tag == "p":
            pages_by_text.setdefault(text, set()).add(page)
    repeated = {t for t, ps in pages_by_text.items() if len(ps) >= 3}
    out: list[dict] = []
    off = 0
    prev_page = None
    for page, tag, text, bid in d["expected"]:
        if prev_page is not None and page != prev_page:
            out.append({"doc_id": d["doc_id"], "offset": off,
                        "kind": "page_break", "text": "", "media_ref": ""})
            off += 1
        prev_page = page
        if tag == "img":
            kind, media_ref = "picture", f"#/pictures/{nid_by_bid[bid]}"
        else:
            kind = "furniture" if text in repeated else "text"
            media_ref = ""
        out.append({"doc_id": d["doc_id"], "offset": off, "kind": kind,
                    "text": text, "media_ref": media_ref})
        off += 1
    return out


def expected_mets_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the WHOLE mets→spans pipeline —
    restated from the authored plan, never calling the parser."""
    out: list[dict] = []
    for i in range(n_docs):
        out.extend(_expected_mets_doc(synth_mets_doc(i, seed)))
    return out


def mets_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, blob binary) METS/ALTO corpus — deterministic
    per index."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_mets_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "blob": r["blob"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 128)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, blob binary"
    )


_CSV_SYNTH_DELIMS = (",", ";", "\t")


def synth_csv_doc(doc_index: int, seed: int) -> dict:
    """One CSV document + its closed-form expected table text.

    Returns {doc_id, csv: str, expected_text: str} — the rendered table
    block (rows newline-joined, cells ' | '). Messiness exercised: all
    three delimiters, quoted fields with embedded OTHER-delimiter chars and
    doubled quotes, empty cells, blank spacer lines (skipped), a BOM on
    every third doc (added by the mixed wrapper). Field counts are kept
    consistent (that IS the sniffer's admission rule) and the first row
    avoids foreign delimiter characters so the declared delimiter wins the
    frequency vote."""
    rng = random.Random(f"sparkdoc-csv:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-csv-{doc_index:08d}"
    delim = _CSV_SYNTH_DELIMS[doc_index % len(_CSV_SYNTH_DELIMS)]
    n_cols = rng.randint(2, 5)
    n_rows = rng.randint(3, 8)

    header = [f"col_{c}" for c in range(n_cols)]
    lines: list[str] = [delim.join(header)]
    expected_rows: list[str] = [" | ".join(header)]
    for r in range(n_rows):
        cells: list[str] = []
        rendered: list[str] = []
        for _c in range(n_cols):
            x = rng.random()
            if x < 0.15:
                cells.append("")
                rendered.append("")
            elif x < 0.35:  # quoted: embedded foreign delim or doubled quote
                word = rng.choice(_WORDS)
                if rng.random() < 0.5:
                    other = rng.choice([d for d in _CSV_SYNTH_DELIMS if d != delim])
                    val = f"{word}{other}{rng.randint(0, 99)}"
                else:
                    val = f'{word} "q" {rng.randint(0, 99)}'
                cells.append(val)
                rendered.append('"' + val.replace('"', '""') + '"')
            elif x < 0.6:
                v = str(rng.randint(0, 99999))
                cells.append(v)
                rendered.append(v)
            else:
                v = rng.choice(_WORDS)
                cells.append(v)
                rendered.append(v)
        lines.append(delim.join(rendered))
        if any(c.strip() for c in cells):
            expected_rows.append(" | ".join(cells))
        # (an all-empty row keeps its delimiter-only line in the file but
        # the parser skips it, same as a blank spacer line)
        if rng.random() < 0.15:  # blank spacer line, skipped by the parser
            lines.append("")
    return {
        "doc_id": doc_id,
        "csv": "\n".join(lines) + ("\n" if rng.random() < 0.5 else ""),
        "expected_text": "\n".join(expected_rows),
    }


def synth_image_doc(doc_index: int, seed: int) -> dict:
    """One standalone-image blob (magic-correct header + deterministic
    noise payload — ingest never decodes, it only places the media item).
    Returns {doc_id, blob: bytes, subtype}. Cycles PNG/JPEG/GIF/TIFF/
    BMP(self-consistent header)/binary-PPM/WEBP."""
    rng = random.Random(f"sparkdoc-img:{seed}:{doc_index}")
    doc_id = f"img-{doc_index:08d}"
    noise = bytes(rng.randrange(256) for _ in range(rng.randint(24, 96)))
    v = doc_index % 7
    if v == 0:
        return {"doc_id": doc_id, "subtype": "png",
                "blob": b"\x89PNG\r\n\x1a\n" + noise}
    if v == 1:
        return {"doc_id": doc_id, "subtype": "jpeg",
                "blob": b"\xff\xd8\xff\xe0\x00\x10JFIF\x00" + noise}
    if v == 2:
        return {"doc_id": doc_id, "subtype": "gif", "blob": b"GIF89a" + noise}
    if v == 3:
        return {"doc_id": doc_id, "subtype": "tiff", "blob": b"II*\x00" + noise}
    if v == 4:
        total = 26 + len(noise)
        blob = (b"BM" + total.to_bytes(4, "little") + b"\x00\x00\x00\x00"
                + (26).to_bytes(4, "little") + (40).to_bytes(4, "little") + noise)
        return {"doc_id": doc_id, "subtype": "bmp", "blob": blob}
    if v == 5:
        return {"doc_id": doc_id, "subtype": "ppm",
                "blob": b"P6\n2 2\n255\n" + noise[:12]}
    return {"doc_id": doc_id, "subtype": "webp",
            "blob": b"RIFF" + len(noise).to_bytes(4, "little") + b"WEBP" + noise}


_MIXED_FORMATS = (
    "html", "markdown", "pdf", "docx", "xlsx", "pptx", "csv", "image",
    "asciidoc", "vtt", "jats", "uspto", "mets", "doclang", "docling_json",
    "binary"
)


def synth_mixed_doc(doc_index: int, seed: int) -> dict:
    """Mixed-corpus row: format cycles with index; the per-format generator
    sees sub-index doc_index // len(_MIXED_FORMATS), so the mixed corpus
    reuses the SAME authored documents the per-format gates pin. Returns
    {doc_id, blob: bytes, fmt}. Every third markdown doc gets a UTF-8 BOM
    and every fourth html doc arrives gzip-compressed (sniffer fodder —
    real dumps carry both)."""
    import gzip as _gz

    f = _MIXED_FORMATS[doc_index % len(_MIXED_FORMATS)]
    j = doc_index // len(_MIXED_FORMATS)
    if f == "html":
        d = synth_html_doc(j, seed)
        blob = d["html"].encode("utf-8")
        if j % 4 == 1:
            blob = _gz.compress(blob, mtime=0)  # deterministic member
        return {"doc_id": d["doc_id"], "blob": blob, "fmt": "html"}
    if f == "markdown":
        d = synth_md_doc(j, seed)
        blob = d["markdown"].encode("utf-8")
        if j % 3 == 0:
            blob = b"\xef\xbb\xbf" + blob
        return {"doc_id": d["doc_id"], "blob": blob, "fmt": "markdown"}
    if f == "pdf":
        d = synth_pdf_doc(j, seed)
        return {"doc_id": d["doc_id"], "blob": d["pdf"], "fmt": "pdf"}
    if f == "docx":
        d = synth_docx_doc(j, seed)
        return {"doc_id": d["doc_id"], "blob": d["docx"], "fmt": "docx"}
    if f == "xlsx":
        d = synth_xlsx_doc(j, seed)
        return {"doc_id": d["doc_id"], "blob": d["xlsx"], "fmt": "xlsx"}
    if f == "pptx":
        d = synth_pptx_doc(j, seed)
        return {"doc_id": d["doc_id"], "blob": d["pptx"], "fmt": "pptx"}
    if f == "csv":
        d = synth_csv_doc(j, seed)
        blob = d["csv"].encode("utf-8")
        if j % 3 == 1:
            blob = b"\xef\xbb\xbf" + blob
        return {"doc_id": d["doc_id"], "blob": blob, "fmt": "csv"}
    if f == "image":
        d = synth_image_doc(j, seed)
        blob = d["blob"]
        if j % 4 == 2:
            import gzip as _gz

            blob = _gz.compress(blob, mtime=0)  # transport-compressed media
        return {"doc_id": d["doc_id"], "blob": blob, "fmt": "image"}
    if f == "asciidoc":
        d = synth_adoc_doc(j, seed)
        blob = d["adoc"].encode("utf-8")
        if j % 4 == 3:
            import bz2 as _bz2

            blob = _bz2.compress(blob)  # bzip2 transport layer
        return {"doc_id": d["doc_id"], "blob": blob, "fmt": "asciidoc"}
    if f == "vtt":
        d = synth_vtt_doc(j, seed)
        blob = d["vtt"].encode("utf-8")
        if j % 3 == 2:
            blob = b"\xef\xbb\xbf" + blob
        return {"doc_id": d["doc_id"], "blob": blob, "fmt": "vtt"}
    if f == "jats":
        d = synth_jats_doc(j, seed)
        blob = d["jats"].encode("utf-8")
        if j % 4 == 1:
            blob = _gz.compress(blob, mtime=0)  # compressed XML dumps
        return {"doc_id": d["doc_id"], "blob": blob, "fmt": "jats"}
    if f == "uspto":
        d = synth_uspto_doc(j, seed)
        blob = d["uspto"].encode("utf-8")
        if j % 4 == 3:
            blob = _gz.compress(blob, mtime=0)  # bulk dumps ship gzipped
        return {"doc_id": d["doc_id"], "blob": blob, "fmt": "uspto"}
    if f == "mets":
        d = synth_mets_doc(j, seed)
        # blob is already a tar.gz; the sniffer strips the transport layer
        # and routes the inner tar by its ustar magic + METS member
        return {"doc_id": d["doc_id"], "blob": d["blob"], "fmt": "mets"}
    if f == "doclang":
        d = synth_doclang_doc(j, seed)
        return {"doc_id": d["doc_id"], "blob": d["dclg"].encode("utf-8"), "fmt": "doclang"}
    if f == "docling_json":
        d = synth_docling_json_doc(j, seed)
        return {"doc_id": d["doc_id"], "blob": d["blob"], "fmt": "docling_json"}
    return synth_binary_doc(j, seed)


def mixed_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, blob binary) mixed-format corpus."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_mixed_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "blob": r["blob"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 128)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, blob binary"
    )


def expected_mixed_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form expectation for the WHOLE mixed-ingest pipeline: rows
    (doc_id, fmt, offset, kind, text, media_ref), composed from the SAME
    per-format restatements the per-format gates use (binary/json docs
    yield no span rows — see expected_mixed_formats for their accounting)."""
    out: list[dict] = []
    for i in range(n_docs):
        f = _MIXED_FORMATS[i % len(_MIXED_FORMATS)]
        j = i // len(_MIXED_FORMATS)
        if f == "html":
            d = synth_html_doc(j, seed)
            rows = _expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND)
        elif f == "markdown":
            d = synth_md_doc(j, seed)
            rows = _expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND)
        elif f == "pdf":
            rows = _expected_pdf_doc(synth_pdf_doc(j, seed))
        elif f == "docx":
            d = synth_docx_doc(j, seed)
            rows = _expected_canvas_doc(d["doc_id"], d["expected"], _PDF_KIND)
        elif f == "xlsx":
            d = synth_xlsx_doc(j, seed)
            rows = _expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND)
        elif f == "pptx":
            rows = _expected_pptx_doc(synth_pptx_doc(j, seed))
        elif f == "csv":
            d = synth_csv_doc(j, seed)
            rows = [{"doc_id": d["doc_id"], "offset": 0, "kind": "table",
                     "text": d["expected_text"], "media_ref": ""}]
        elif f == "image":
            d = synth_image_doc(j, seed)
            rows = [{"doc_id": d["doc_id"], "offset": 0, "kind": "picture",
                     "text": "", "media_ref": "#/pictures/1"}]
        elif f == "asciidoc":
            d = synth_adoc_doc(j, seed)
            rows = _expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND)
        elif f == "vtt":
            d = synth_vtt_doc(j, seed)
            rows = _expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND)
        elif f == "jats":
            d = synth_jats_doc(j, seed)
            rows = _expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND)
        elif f == "uspto":
            d = synth_uspto_doc(j, seed)
            rows = _expected_canvas_doc(d["doc_id"], d["expected"], _HTML_KIND)
        elif f == "mets":
            rows = _expected_mets_doc(synth_mets_doc(j, seed))
        elif f == "doclang":
            d = synth_doclang_doc(j, seed)
            rows = [
                {"doc_id": d["doc_id"], "offset": off, "kind": k,
                 "text": t, "media_ref": m}
                for off, (k, t, m) in enumerate(d["expected"])
            ]
        elif f == "docling_json":
            d = synth_docling_json_doc(j, seed)
            rows = [
                {"doc_id": d["doc_id"], "offset": off, "kind": k,
                 "text": t, "media_ref": m}
                for off, (k, t, m) in enumerate(d["expected"])
            ]
        else:
            continue
        for r in rows:
            out.append({**r, "fmt": f})
    return out


def expected_mixed_formats(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form per-doc accounting: (doc_id, fmt, n_spans) for EVERY row
    of the mixed corpus including binary/json rejects."""
    span_counts: dict[str, int] = {}
    for r in expected_mixed_spans(n_docs, seed):
        span_counts[r["doc_id"]] = span_counts.get(r["doc_id"], 0) + 1
    out: list[dict] = []
    for i in range(n_docs):
        d = synth_mixed_doc(i, seed)
        out.append({"doc_id": d["doc_id"], "fmt": d["fmt"],
                    "n_spans": span_counts.get(d["doc_id"], 0)})
    return out


# ---------------------------------------------------------------------------
# Deterministic DoclingDocument-JSON corpus with closed-form expectations
# (dljson gate fodder: real schema_name="DoclingDocument" dumps with
# body.children $ref walks, groups, prov geometry in both origins; the
# expected plan is authored alongside — the parser only sees the bytes)
# ---------------------------------------------------------------------------

_DLJ_PAGE_W, _DLJ_PAGE_H = 612, 792


def synth_docling_json_doc(doc_index: int, seed: int) -> dict:
    """One DoclingDocument JSON dump + its closed-form expected spans.

    Returns {doc_id, blob: bytes, expected: [(kind, text, media_ref), ...]}
    (page_break rows included). Emission order in body.children is SHUFFLED
    against the authored reading order — XY-cut must recover it from the
    prov geometry. Variants by index: %4==0 geometry-less (docling md/html
    conversions: emission order IS reading order, single canvas), %4==1
    TOPLEFT prov, %4==2 BOTTOMLEFT prov (the docling PDF default — flip
    required), %4==3 mixed (some items lack prov → dropped, reference
    document_processor.py:87-94). Exercised: groups (list items nest under
    a group ref), section_header levels, tables with offset-indexed cells,
    pictures, page_header/footer furniture, blank texts (classify drop),
    XML-hostile characters."""
    rng = random.Random(f"sparkdoc-dlj:{seed}:{doc_index}")
    domain = _pick_domain(rng)
    doc_id = f"{domain}-dlj-{doc_index:08d}"
    variant = doc_index % 4
    n_pages = 1 if variant == 0 else rng.randint(1, 3)

    # ---- author the reading-order plan: per page, (tag, text) stacked ----
    uniq = 0

    def sent(n: int) -> str:
        nonlocal uniq
        uniq += 1
        return f"[{uniq}] " + _sentence(rng, n)

    pages: list[list[tuple[str, str]]] = []
    for p in range(n_pages):
        items: list[tuple[str, str]] = []
        items.append(("h1" if p == 0 else "h2", sent(rng.randint(3, 6))))
        for _ in range(rng.randint(2, 5)):
            r = rng.random()
            if r < 0.40:
                t = sent(rng.randint(6, 14))
                if rng.random() < 0.2:
                    t += " & <angles> \"quoted\""
                items.append(("p", t))
            elif r < 0.55:
                items.append(("li", "item " + sent(rng.randint(3, 6))))
            elif r < 0.68:
                rows = ["c1 " + sent(2) + " | c2 " + sent(2) for _ in range(2)]
                items.append(("table", "\n".join(rows)))
            elif r < 0.78:
                items.append(("img", ""))
            elif r < 0.86:
                items.append(("h3", sent(rng.randint(2, 4))))
            elif r < 0.93:
                items.append(("header", f"{doc_id} p{p + 1}"))
            else:
                items.append(("p", "   "))  # blank: classify drops it
        pages.append(items)

    # ---- flatten to emission entries with authored geometry --------------
    entries = []  # dicts: tag, text, page_no, y, h
    for p, items in enumerate(pages, start=1):
        y = 40
        for tag, text in items:
            h = 20 * (1 + text.count("\n"))
            entries.append({"tag": tag, "text": text, "page_no": p, "y": y, "h": h})
            y += h + 12
    order = list(range(len(entries)))
    if variant != 0:
        rng.shuffle(order)  # emission ≠ reading order; XY-cut recovers

    # variant 3: a third of items lose prov (and are dropped)
    dropped: set[int] = set()
    if variant == 3:
        dropped = {i for i in order if rng.random() < 0.33}
        if len(dropped) == len(entries):
            dropped.discard(order[0])

    # ---- render the JSON shape ------------------------------------------
    texts, tables, pictures, groups = [], [], [], []
    children: list[dict] = []
    emit_nid: dict[int, int] = {}  # entry index -> 1-based emission position
    li_run: list[dict] = []

    def flush_li_run() -> None:
        nonlocal li_run
        if li_run:
            groups.append({"self_ref": f"#/groups/{len(groups)}",
                           "name": "list", "children": li_run})
            children.append({"$ref": f"#/groups/{len(groups) - 1}"})
            li_run = []

    for pos, ei in enumerate(order, start=1):
        e = entries[ei]
        emit_nid[ei] = pos
        prov = None
        if variant != 0 and ei not in dropped:
            l = 60 + (pos % 7)
            r_ = _DLJ_PAGE_W - 60
            if variant == 2:  # BOTTOMLEFT: t measured from page bottom
                bbox = {"l": l, "t": _DLJ_PAGE_H - e["y"], "r": r_,
                        "b": _DLJ_PAGE_H - (e["y"] + e["h"]),
                        "coord_origin": "BOTTOMLEFT"}
            else:
                bbox = {"l": l, "t": e["y"], "r": r_, "b": e["y"] + e["h"],
                        "coord_origin": "TOPLEFT"}
            prov = [{"page_no": e["page_no"], "bbox": bbox,
                     "charspan": [0, len(e["text"])]}]
        elif variant == 3 and ei in dropped:
            prov = []
        tag = e["tag"]
        if tag == "table":
            cells = []
            for ri, row in enumerate(e["text"].split("\n")):
                for ci, cell in enumerate(row.split(" | ")):
                    cells.append({"text": cell, "start_row_offset_idx": ri,
                                  "start_col_offset_idx": ci,
                                  "end_row_offset_idx": ri + 1,
                                  "end_col_offset_idx": ci + 1})
            rng.shuffle(cells)  # parser must re-sort by offsets
            ref = f"#/tables/{len(tables)}"
            tables.append({"self_ref": ref, "prov": prov or [],
                           "data": {"num_rows": 2, "num_cols": 2,
                                    "table_cells": cells}})
            flush_li_run()
            children.append({"$ref": ref})
        elif tag == "img":
            ref = f"#/pictures/{len(pictures)}"
            pictures.append({"self_ref": ref, "prov": prov or [], "captions": []})
            flush_li_run()
            children.append({"$ref": ref})
        else:
            label = {"h1": "title", "h2": "section_header", "h3": "section_header",
                     "li": "list_item", "header": "page_header",
                     "footer": "page_footer"}.get(tag, "text")
            item = {"self_ref": f"#/texts/{len(texts)}", "label": label,
                    "text": e["text"], "orig": e["text"], "prov": prov or []}
            if label == "section_header":
                item["level"] = 1 if tag == "h2" else 2
            texts.append(item)
            ref = item["self_ref"]
            if tag == "li":
                li_run.append({"$ref": ref})
            else:
                flush_li_run()
                children.append({"$ref": ref})
    flush_li_run()

    doc = {
        "schema_name": "DoclingDocument",
        "version": "2.8.0",
        "name": doc_id,
        "body": {"self_ref": "#/body", "children": children},
        "texts": texts,
        "tables": tables,
        "pictures": pictures,
        "groups": groups,
        "pages": {str(p): {"page_no": p,
                           "size": {"width": float(_DLJ_PAGE_W),
                                    "height": float(_DLJ_PAGE_H)}}
                  for p in range(1, n_pages + 1)},
    }

    # ---- closed-form expected spans --------------------------------------
    # reading order = authored page/y order; dropped and blank entries
    # never produce spans (classify removes them before page grouping) but
    # still consume an emission nid — picture media_refs number from the
    # emission enumeration, exactly as the parser assigns node_ids.
    kind_map = dict(_PDF_KIND)
    expected: list[tuple[str, str, str]] = []
    live_pages: list[int] = []
    for p in range(1, n_pages + 1):
        page_entries = [
            (i, e) for i, e in enumerate(entries)
            if e["page_no"] == p and i not in dropped
            and (e["tag"] == "img" or e["text"].strip())
        ]
        if not page_entries:
            continue
        live_pages.append(p)
        if len(live_pages) > 1:
            expected.append(("page_break", "", ""))
        for i, e in sorted(page_entries, key=lambda t: t[1]["y"]):
            if e["tag"] == "img":
                expected.append(("picture", "", f"#/pictures/{emit_nid[i]}"))
            else:
                k = kind_map.get(e["tag"], "text")
                t = _heading_text(e["tag"], e["text"]) if k == "heading" else e["text"]
                expected.append((k, t, ""))

    return {"doc_id": doc_id,
            "blob": json.dumps(doc, ensure_ascii=False).encode("utf-8"),
            "expected": expected}


def docling_json_corpus_df(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (doc_id, blob binary) DoclingDocument-JSON corpus."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_docling_json_doc(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"doc_id": r["doc_id"], "blob": r["blob"]} for r in rows]
                )

    parts = partitions or max(4, n_docs // 128)
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        gen, schema="doc_id string, blob binary"
    )


def expected_docling_json_spans(n_docs: int, seed: int = 42) -> list[dict]:
    """Closed-form span expectation for the dljson→spans pipeline."""
    out: list[dict] = []
    for i in range(n_docs):
        d = synth_docling_json_doc(i, seed)
        for off, (k, t, m) in enumerate(d["expected"]):
            out.append({"doc_id": d["doc_id"], "offset": off, "kind": k,
                        "text": t, "media_ref": m})
    return out


# ---------------------------------------------------------------------------
# Deterministic WARC corpus (container-ingest gate fodder): real ISO-28500
# records wrapping the mixed-format blobs above — plain files AND
# per-record-gzip members (the Common Crawl layout), HTTP responses plain
# and chunked, resource records, plus warcinfo/request noise records.
# ---------------------------------------------------------------------------

_WARC_DOCS_PER_FILE = 7


def synth_warc_file(file_index: int, seed: int) -> dict:
    """One WARC file + its closed-form record plan.

    Returns {warc_name, content: bytes, expected: [(out_doc_id,
    inner_doc_id), ...]} where out_doc_id is the id warc_to_blobs derives
    (``<name>#<record_idx>:<target-uri>``) and inner_doc_id keys the
    wrapped mixed doc's closed-form spans. Odd files are per-record-gzip
    (.warc.gz); payload styles cycle plain-HTTP / chunked-HTTP / resource."""
    import gzip as _gz

    name = f"crawl-{file_index:05d}.warc" + (".gz" if file_index % 2 else "")
    records: list[bytes] = []
    expected: list[tuple[str, str]] = []

    def rec(wtype: str, uri: str | None, rec_id: str, ctype: str, block: bytes) -> bytes:
        head = (
            "WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
            + f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
            + f"Content-Type: {ctype}\r\n"
            + f"Content-Length: {len(block)}\r\n\r\n"
        ).encode("latin-1")
        return head + block + b"\r\n\r\n"

    records.append(rec("warcinfo", None, f"info-{file_index}",
                       "application/warc-fields", b"software: sparkdoc-synth\r\n"))
    for j in range(_WARC_DOCS_PER_FILE):
        d = synth_mixed_doc(file_index * _WARC_DOCS_PER_FILE + j, seed)
        uri = f"http://crawl.example/{d['doc_id']}"
        style = (file_index + j) % 3
        if style == 0:  # request noise + plain HTTP response
            records.append(rec("request", uri, f"req-{file_index}-{j}",
                               "application/http; msgtype=request",
                               b"GET / HTTP/1.1\r\nHost: crawl.example\r\n\r\n"))
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n"
                    b"Content-Length: " + str(len(d["blob"])).encode() + b"\r\n\r\n"
                    + d["blob"])
            expected.append((f"{name}#{len(records):06d}:{uri}", d["doc_id"]))
            records.append(rec("response", uri, f"resp-{file_index}-{j}",
                               "application/http; msgtype=response", http))
        elif style == 1:  # chunked HTTP response
            body, pos, chunks = d["blob"], 0, []
            while pos < len(body):
                k = min(len(body) - pos, 900 + 37 * ((pos // 997) % 7))
                chunks.append(f"{k:x}".encode() + b"\r\n" + body[pos:pos + k] + b"\r\n")
                pos += k
            http = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
                    + b"".join(chunks) + b"0\r\n\r\n")
            expected.append((f"{name}#{len(records):06d}:{uri}", d["doc_id"]))
            records.append(rec("response", uri, f"resp-{file_index}-{j}",
                               "application/http; msgtype=response", http))
        else:  # resource record: the document verbatim
            expected.append((f"{name}#{len(records):06d}:{uri}", d["doc_id"]))
            records.append(rec("resource", uri, f"res-{file_index}-{j}",
                               "application/octet-stream", d["blob"]))

    if file_index % 2:
        content = b"".join(_gz.compress(r, mtime=0) for r in records)
    else:
        content = b"".join(records)
    return {"warc_name": name, "content": content, "expected": expected}


def warc_corpus_df(
    spark: SparkSession, n_files: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed (warc_name, content binary) corpus."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [synth_warc_file(int(i), seed) for i in pdf["id"]]
            if rows:
                yield pd.DataFrame(
                    [{"warc_name": r["warc_name"], "content": r["content"]} for r in rows]
                )

    parts = partitions or max(2, n_files // 4)
    return spark.range(0, n_files, 1, parts).mapInPandas(
        gen, schema="warc_name string, content binary"
    )


def expected_warc_spans(n_files: int, seed: int = 42) -> list[dict]:
    """Closed-form expectation for container → sniff → route: the mixed
    per-doc restatements re-keyed to the WARC-derived doc_ids."""
    inner = expected_mixed_spans(n_files * _WARC_DOCS_PER_FILE, seed)
    by_inner: dict[str, list[dict]] = {}
    for r in inner:
        by_inner.setdefault(r["doc_id"], []).append(r)
    out: list[dict] = []
    for i in range(n_files):
        f = synth_warc_file(i, seed)
        for out_id, inner_id in f["expected"]:
            for r in by_inner.get(inner_id, []):
                out.append({**r, "doc_id": out_id})
    return out


# ---------------------------------------------------------------------------
# URL admission truth table (SSRF gate fodder): authored (url, resolved_ips,
# verdict, reason) cases — the gate kernel under test never reads the
# verdicts. Verdict parity target: the reference's URLValidator ladder
# (validators.py:162-340) over the same stdlib ipaddress semantics.
# ---------------------------------------------------------------------------

URL_ADMISSION_CASES: list[tuple[str, list | None, int, str | None]] = [
    ("http://example.com/x", None, 1, None),
    ("https://example.com:8443/x", None, 1, None),
    ("https://sub.host.example.co.uk/a?b=c#d", None, 1, None),
    ("http://user:pw@example.com/x", None, 1, None),
    ("http://100.64.0.1/x", None, 1, None),  # CGNAT: stdlib is_private=False
    ("http://[2606:4700::1111]/x", None, 1, None),
    ("ftp://example.com/x", None, 0, "bad_scheme"),
    ("file:///etc/passwd", None, 0, "bad_scheme"),
    ("", None, 0, "bad_scheme"),
    ("not a url at all", None, 0, "bad_scheme"),
    ("http:///nohost", None, 0, "no_host"),
    ("http://", None, 0, "no_host"),
    ("http://127.0.0.1/x", None, 0, "loopback"),
    ("http://127.8.9.10/x", None, 0, "loopback"),
    ("http://[::1]/x", None, 0, "loopback"),
    ("http://169.254.169.254/latest/meta-data/", None, 0, "metadata_endpoint"),
    ("http://169.254.1.1/x", None, 0, "link_local"),
    ("http://[fe80::1]/x", None, 0, "link_local"),
    ("http://224.0.0.1/x", None, 0, "multicast"),
    ("http://[ff02::2]/x", None, 0, "multicast"),
    ("http://240.0.0.1/x", None, 0, "reserved"),
    ("http://10.0.0.5/x", None, 0, "private"),
    ("http://192.168.1.1/x", None, 0, "private"),
    ("http://172.16.0.1/x", None, 0, "private"),
    ("http://[2001:db8::1]/x", None, 0, "private"),
    ("http://0.0.0.0/x", None, 0, "private"),
    ("http://example.com:99999/x", None, 0, "bad_url"),
    ("http://[v1.fe]/x", None, 0, "bad_url"),
    # inet_aton spellings resolve WITHOUT DNS — the ladder must see them
    ("http://0177.0.0.1/x", None, 0, "loopback"),
    ("http://2130706433/x", None, 0, "loopback"),
    ("http://127.1/x", None, 0, "loopback"),
    ("http://0x7f.0.0.1/x", None, 0, "loopback"),
    ("http://0xA9FEA9FE/x", None, 0, "metadata_endpoint"),  # = 169.254.169.254
    ("http://192.168.1/x", None, 0, "private"),
    ("http://01.02.03.04/x", None, 1, None),  # octal 1.2.3.4: public
    ("http://example.com/x", ["93.184.216.34"], 1, None),
    ("http://example.com/x", ["93.184.216.34", "2606:4700::1111"], 1, None),
    ("http://example.com/x", ["93.184.216.34", "10.0.0.1"], 0, "private"),
    ("http://example.com/x", ["169.254.169.254"], 0, "metadata_endpoint"),
    ("http://example.com/x", ["127.0.0.1"], 0, "loopback"),
    ("http://example.com/x", ["fe80::1"], 0, "link_local"),
    ("http://example.com/x", ["not-an-ip"], 0, "bad_url"),
    ("http://safe.example/x", ["240.1.2.3"], 0, "reserved"),
]


def url_admission_cases_df(spark: SparkSession) -> DataFrame:
    """(case_id, url, resolved_ips) — verdict columns deliberately absent."""
    rows = [
        (i, u, ips) for i, (u, ips, _a, _r) in enumerate(URL_ADMISSION_CASES)
    ]
    return spark.createDataFrame(
        rows, "case_id int, url string, resolved_ips array<string>"
    ).repartition(4)
