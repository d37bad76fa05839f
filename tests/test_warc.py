"""WARC container ingest: record split, payload extraction, mixed routing.

The reference ingests one document at a time (handlers.py); crawl corpora
arrive as WARC containers, so this first mile is beyond-reference scope —
ISO 28500 semantics restated from the public spec, Common Crawl's
per-record-gzip member layout included.
"""

from __future__ import annotations

import gzip

from sparkdoc.ingest import mixed_spans_doc
from sparkdoc.synth import expected_warc_spans, synth_warc_file, warc_corpus_df
from sparkdoc.warc import (
    _dechunk,
    _http_payload,
    warc_doc_blobs,
    warc_extract,
    warc_records,
    warc_to_blobs,
)

SEED = 42


def _rec(wtype: str, block: bytes, uri: str = "http://x/y", extra: str = "") -> bytes:
    return (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {uri}\r\n"
        f"WARC-Record-ID: <urn:uuid:t>\r\n{extra}"
        f"Content-Type: application/octet-stream\r\nContent-Length: {len(block)}\r\n\r\n"
    ).encode() + block + b"\r\n\r\n"


def test_warc_records_plain_and_gzip_members():
    recs = _rec("resource", b"AAA") + _rec("resource", b"BBBB")
    got = list(warc_records(recs))
    assert [r["block"] for r in got] == [b"AAA", b"BBBB"]
    gz = gzip.compress(_rec("resource", b"AAA"), mtime=0) + gzip.compress(
        _rec("resource", b"BBBB"), mtime=0
    )
    got = list(warc_records(gz))
    assert [r["block"] for r in got] == [b"AAA", b"BBBB"]


def test_warc_payload_can_contain_record_markers():
    """Content-Length discipline: a block containing 'WARC/1.0' bytes must
    not split the record."""
    evil = b"x\r\n\r\nWARC/1.0\r\nWARC-Type: resource\r\n\r\nmore"
    recs = _rec("resource", evil) + _rec("resource", b"tail")
    got = list(warc_records(recs))
    assert len(got) == 2 and got[0]["block"] == evil and got[1]["block"] == b"tail"


def test_warc_corrupt_record_stops_file_not_process():
    ok = _rec("resource", b"GOOD")
    bad = b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: NaN\r\n\r\nxx"
    got = list(warc_records(ok + bad + _rec("resource", b"NEVER")))
    assert [r["block"] for r in got] == [b"GOOD"]
    # truncated block: declared length exceeds data
    trunc = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 999\r\n\r\nshort"
    )
    assert list(warc_records(ok + trunc)) == list(warc_records(ok))
    assert list(warc_records(b"")) == []
    assert list(warc_records(b"\x1f\x8bcorrupt gzip")) == []


def test_http_payload_plain_and_chunked():
    body = b"<!DOCTYPE html><p>hi</p>"
    plain = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    assert _http_payload(plain) == body
    chunked = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
               b"5\r\n<!DOC\r\n13\r\nTYPE html><p>hi</p>\r\n0\r\n\r\n")
    assert _http_payload(chunked) == body
    # broken chunk framing degrades to the raw body, never raises
    broken = b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZZ\r\nx"
    assert isinstance(_http_payload(broken), bytes)
    assert _dechunk(b"not chunked at all") == b"not chunked at all"


def test_warc_doc_blobs_skips_non_documents():
    data = (
        _rec("warcinfo", b"software: x\r\n")
        + _rec("request", b"GET / HTTP/1.1\r\n\r\n")
        + _rec("resource", b"# markdown doc")
        + _rec("metadata", b"k: v\r\n")
    )
    blobs = warc_doc_blobs(data)
    assert len(blobs) == 1
    rid, blob = blobs[0]
    assert blob == b"# markdown doc" and rid.endswith(":http://x/y")


def test_synth_warc_routes_to_expected_spans():
    """Every wrapped mixed doc (all 7 formats, plain/chunked/resource
    payloads, plain/gzip files) routes to its closed-form spans."""
    n = 6
    exp = expected_warc_spans(n, SEED)
    by_doc: dict[str, list] = {}
    for r in exp:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i in range(n):
        f = synth_warc_file(i, SEED)
        blobs = warc_doc_blobs(f["content"])
        assert len(blobs) == len(f["expected"])
        for (rid, blob), (out_id, _inner) in zip(blobs, f["expected"]):
            full_id = f"{f['warc_name']}#{rid}"
            assert full_id == out_id
            _fmt, spans = mixed_spans_doc(full_id, blob)
            assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans] == [
                (e["kind"], e["text"], e["media_ref"], e["offset"])
                for e in by_doc.get(full_id, [])
            ], full_id


def test_warc_extract_e2e_and_plan(spark):
    n = 4
    df = warc_extract(warc_corpus_df(spark, n, SEED))
    rows = df.collect()
    exp = expected_warc_spans(n, SEED)
    n_exp_docs = sum(len(synth_warc_file(i, SEED)["expected"]) for i in range(n))
    assert len(rows) == n_exp_docs
    assert sum(len(r.spans) for r in rows) == len(exp)
    # container → documents stays a single python stage: zero Exchange
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
