"""The ``warc`` Python Data Source: container FILES on disk →
(warc_name, doc_id, blob) rows, byte-identical to the blob-table kernel
(warc.warc_to_blobs) over the same containers, one input partition per
file, corruption-tolerant."""

from __future__ import annotations

import os

import pytest

from sparkdoc.synth import synth_warc_file, warc_corpus_df
from sparkdoc.warc import warc_to_blobs
from sparkdoc.warcsource import (
    WarcFilePartition,
    _WarcReader,
    _list_warc_files,
    register_warc_source,
)

N_FILES = 6


@pytest.fixture()
def warc_dir(tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    for i in range(N_FILES):
        f = synth_warc_file(i, 42)
        (d / f["warc_name"]).write_bytes(f["content"])
    return str(d)


def test_source_matches_blob_kernel(spark, warc_dir):
    """Every (doc_id, blob) the source emits must be byte-identical to
    warc_to_blobs over the same containers as a parquet blob table —
    plain AND per-record-gzip files (synth alternates)."""
    register_warc_source(spark)
    got = {
        r["doc_id"]: bytes(r["blob"])
        for r in spark.read.format("warc").load(warc_dir).collect()
    }
    want = {
        r["doc_id"]: bytes(r["blob"])
        for r in warc_to_blobs(warc_corpus_df(spark, N_FILES, 42)).collect()
    }
    assert got == want and len(got) > 0


def test_one_partition_per_file(spark, warc_dir):
    register_warc_source(spark)
    df = spark.read.format("warc").load(warc_dir)
    assert df.rdd.getNumPartitions() == N_FILES
    # warc_name is the container basename — per-file lineage
    names = {r["warc_name"] for r in df.select("warc_name").distinct().collect()}
    assert names == {synth_warc_file(i, 42)["warc_name"] for i in range(N_FILES)}


def test_corrupt_tail_keeps_valid_prefix(tmp_path):
    """A container whose tail is garbage yields its valid-prefix records
    (stop-at-corruption, never a crash) — checked on the reader kernel
    directly, plain and gzip variants."""
    plain = synth_warc_file(0, 42)  # even index → plain .warc
    gz = synth_warc_file(1, 42)  # odd index → per-record gzip
    for f, cut in ((plain, 200), (gz, 120)):
        p = tmp_path / ("cut_" + f["warc_name"])
        p.write_bytes(f["content"][: len(f["content"]) - cut] + b"\x00garbage")
        rows = list(
            _WarcReader({"path": str(p)}).read(WarcFilePartition(str(p)))
        )
        full = tmp_path / ("full_" + f["warc_name"])
        full.write_bytes(f["content"])
        all_rows = list(
            _WarcReader({"path": str(full)}).read(WarcFilePartition(str(full)))
        )
        assert len(rows) <= len(all_rows)
        # whatever survived is a prefix with identical payloads
        for got, want in zip(rows, all_rows):
            assert got[1].split("#", 1)[1] == want[1].split("#", 1)[1]
            assert got[2] == want[2]


def test_listing_rules(tmp_path):
    d = tmp_path / "c"
    (d / "sub").mkdir(parents=True)
    (d / "a.warc").write_bytes(b"")
    (d / "sub" / "b.warc.gz").write_bytes(b"")
    (d / "notes.txt").write_bytes(b"")
    got = _list_warc_files(str(d))
    assert [os.path.basename(p) for p in got] == ["a.warc", "b.warc.gz"]
    # explicit single file is trusted regardless of extension
    assert _list_warc_files(str(d / "notes.txt")) == [str(d / "notes.txt")]
    with pytest.raises(FileNotFoundError):
        _list_warc_files(str(tmp_path / "nope"))


def test_warcdir_feeds_documents(spark, warc_dir):
    """source → mixed_to_documents produces the same documents table as the
    blob-table route (the extract job's warcdir: spec)."""
    from pyspark.sql import functions as F

    from sparkdoc.ingest import mixed_to_documents
    from sparkdoc.warc import warc_extract

    register_warc_source(spark)
    via_source = mixed_to_documents(
        spark.read.format("warc").load(warc_dir).select("doc_id", "blob")
    )
    via_blobs = warc_extract(warc_corpus_df(spark, N_FILES, 42))
    a = {(r["doc_id"], str(r["spans"]), r["fmt"]) for r in via_source.collect()}
    b = {(r["doc_id"], str(r["spans"]), r["fmt"]) for r in via_blobs.collect()}
    assert a == b and len(a) > 0


def test_stream_warc_extract_incremental(spark, tmp_path):
    """Streaming crawl ingestion: containers dropped into a watched dir are
    ingested exactly once across query restarts (offset = last file name in
    the checkpoint); a restart with no new files emits nothing."""
    import glob as _glob

    from sparkdoc.streaming import stream_warc_extract
    from sparkdoc.warc import warc_extract

    drop = tmp_path / "drop"
    drop.mkdir()
    out = str(tmp_path / "sout")

    def _write(i: int) -> None:
        f = synth_warc_file(i, 42)
        (drop / f["warc_name"]).write_bytes(f["content"])

    def _docs() -> dict[str, int]:
        paths = _glob.glob(os.path.join(out, "documents", "batch_id=*"))
        if not paths:
            return {}
        df = spark.read.parquet(*paths)
        return {r["doc_id"]: 1 for r in df.select("doc_id").collect()}

    # expectation = the batch route over the same four containers
    exp_ids = {
        r["doc_id"]
        for r in warc_extract(warc_corpus_df(spark, 4, 42)).select("doc_id").collect()
    }

    _write(0)
    _write(1)
    q = stream_warc_extract(spark, str(drop), out, chunk=False)
    q.awaitTermination(120)
    got1 = _docs()
    assert got1 and set(got1) < exp_ids

    # restart with two NEW containers (names sort after the first two):
    # only their documents are added, nothing is re-ingested
    _write(2)
    _write(3)
    q2 = stream_warc_extract(spark, str(drop), out, chunk=False)
    q2.awaitTermination(120)
    got2 = _docs()
    assert set(got2) == exp_ids
    # exactly once: no doc_id appears in two batch partitions
    df = spark.read.parquet(*_glob.glob(os.path.join(out, "documents", "batch_id=*")))
    assert df.count() == df.select("doc_id").distinct().count() == len(exp_ids)

    # restart with nothing new: no additional batch dirs with rows
    q3 = stream_warc_extract(spark, str(drop), out, chunk=False)
    q3.awaitTermination(120)
    df3 = spark.read.parquet(*_glob.glob(os.path.join(out, "documents", "batch_id=*")))
    assert df3.count() == len(exp_ids)


def test_stream_parser_equals_bytes_parser_property():
    """Property: over arbitrary byte soup AND structured near-WARC inputs,
    the streaming record parser (_stream_records over a file-like) yields
    EXACTLY the records of the bytes kernel (warc._records_from_plain) —
    same headers, same blocks, same stop-at-malformed point."""
    import io

    from hypothesis import given, settings, strategies as st

    from sparkdoc.warc import _records_from_plain
    from sparkdoc.warcsource import _stream_records

    header_name = st.sampled_from(
        ["WARC-Type", "WARC-Target-URI", "Content-Length", "Content-Type", "X-Odd"]
    )
    header_val = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20
    )

    @st.composite
    def near_warc(draw):
        out = bytearray()
        for _ in range(draw(st.integers(0, 4))):
            out += draw(st.sampled_from([b"", b"\r\n", b"\n", b"\r"]))
            version = draw(st.sampled_from([b"WARC/1.0", b"WARC/0.9", b"HTTP/1.1", b"WARC"]))
            out += version + b"\r\n"
            body = draw(st.binary(max_size=40))
            declared = draw(st.one_of(st.just(len(body)), st.integers(-5, 60)))
            headers = draw(st.lists(st.tuples(header_name, header_val), max_size=3))
            for k, v in headers:
                out += f"{k}: {v}\r\n".encode()
            if draw(st.booleans()):
                out += f"Content-Length: {declared}\r\n".encode()
            # blank-line variants include CR-runs (b"\r\r\n") — both parsers
            # must agree that any run of CRs before the LF is still blank
            out += draw(st.sampled_from([b"", b"\r\n", b"\n", b"\r\r\n"]))
            out += body
        out += draw(st.binary(max_size=30))
        return bytes(out)

    @settings(max_examples=300, deadline=None)
    @given(st.one_of(st.binary(max_size=200), near_warc()))
    def check(data: bytes) -> None:
        want = list(_records_from_plain(data))
        got = list(_stream_records(io.BufferedReader(io.BytesIO(data))))
        assert got == want

    check()


def _rec(body: bytes, declared: int | None = None) -> bytes:
    ln = len(body) if declared is None else declared
    return (
        f"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Target-URI: u\r\n"
        f"Content-Length: {ln}\r\n\r\n"
    ).encode() + body


def test_gzip_member_isolation(tmp_path):
    """Per-member independence parity with the bytes kernel: a record that
    overruns its gzip member is dropped WITHOUT bleeding into the next
    member, and a malformed record inside one member doesn't halt later
    members — both of which a naive concatenated-GzipFile read gets wrong."""
    import gzip

    from sparkdoc.warc import warc_records
    from sparkdoc.warcsource import _file_records

    # member 1 declares 10 body bytes but holds 3 → dropped; member 2 intact
    data = gzip.compress(_rec(b"hel", declared=10), mtime=0) + gzip.compress(
        _rec(b"next-record"), mtime=0
    )
    p = tmp_path / "a.warc.gz"
    p.write_bytes(data)
    want = [r["block"] for r in warc_records(data)]
    got = [r["block"] for r in _file_records(str(p))]
    assert got == want == [b"next-record"]

    # malformed member in the middle: only ITS records are lost
    data2 = (
        gzip.compress(_rec(b"aaa"), mtime=0)
        + gzip.compress(b"NOTWARC\r\n\r\n", mtime=0)
        + gzip.compress(_rec(b"bbb"), mtime=0)
    )
    p2 = tmp_path / "b.warc.gz"
    p2.write_bytes(data2)
    want2 = [r["block"] for r in warc_records(data2)]
    got2 = [r["block"] for r in _file_records(str(p2))]
    assert got2 == want2 == [b"aaa", b"bbb"]

    # truncated FINAL member: its decompressed prefix still parses
    full = gzip.compress(_rec(b"tail-rec"), mtime=0)
    data3 = gzip.compress(_rec(b"head"), mtime=0) + full[:-6]
    p3 = tmp_path / "c.warc.gz"
    p3.write_bytes(data3)
    assert [r["block"] for r in _file_records(str(p3))] == [
        r["block"] for r in warc_records(data3)
    ]


def test_cr_run_parity():
    """CR-runs (b'\\r\\r\\n') as blank-line terminator and inter-record
    separator parse identically in both kernels — the bytes parser strips
    any run of CRs, and the streaming parser must too."""
    import io

    from sparkdoc.warc import _records_from_plain
    from sparkdoc.warcsource import _stream_records

    blank_cr = (
        b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 3\r\n\r\r\nabc"
    )
    sep_cr = _rec(b"one") + b"\r\r\n" + _rec(b"two")
    for data in (blank_cr, sep_cr, b"\r\r" + _rec(b"x")):
        want = list(_records_from_plain(data))
        got = list(_stream_records(io.BufferedReader(io.BytesIO(data))))
        assert got == want and len(want) >= 1


def test_nested_same_basename_no_collision(spark, tmp_path):
    """Containers with equal basenames in different segment dirs must not
    collide: warc_name/doc_id carry the load-root-relative path."""
    d = tmp_path / "crawl"
    (d / "seg1").mkdir(parents=True)
    (d / "seg2").mkdir()
    content = synth_warc_file(0, 42)["content"]
    (d / "seg1" / "part-0.warc").write_bytes(content)
    (d / "seg2" / "part-0.warc").write_bytes(content)
    register_warc_source(spark)
    df = spark.read.format("warc").load(str(d))
    rows = df.collect()
    names = {r["warc_name"] for r in rows}
    assert names == {"seg1/part-0.warc", "seg2/part-0.warc"}
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids)) and len(ids) > 0


def test_glob_root_names_do_not_collide(tmp_path):
    """A recursive glob over segment dirs names containers relative to the
    glob's static prefix — same-basename files must not collide."""
    from sparkdoc.warcsource import _list_warc_files, _name_of

    d = tmp_path / "crawl"
    (d / "seg1").mkdir(parents=True)
    (d / "seg2").mkdir()
    (d / "seg1" / "part-0.warc").write_bytes(b"")
    (d / "seg2" / "part-0.warc").write_bytes(b"")
    pat = str(d / "**" / "*.warc")
    files = _list_warc_files(pat)
    names = [_name_of(p, pat) for p in files]
    assert names == ["seg1/part-0.warc", "seg2/part-0.warc"]


def test_stream_offset_detects_below_offset_arrivals(tmp_path):
    """Append-only-contract guard, two tiers: a container landing below the
    PREVIOUS batch's bound (can never be ingested by any batch) hard-fails;
    one landing within the just-committed range (the ingestion race — the
    committed batch's live plan-time listing may have taken it) only
    warns, naming the reconciliation path."""
    import warnings as _warnings

    from sparkdoc.warcsource import _WarcStreamReader

    d = tmp_path / "drop"
    d.mkdir()
    (d / "seg5-a.warc").write_bytes(b"")
    r = _WarcStreamReader({"path": str(d)})
    o1 = r.latestOffset()
    assert o1["n_below"] == 1
    assert len(r.partitions(r.initialOffset(), o1)) == 1
    # batch 2: a properly-named successor
    (d / "seg5-b.warc").write_bytes(b"")
    o2 = r.latestOffset()
    assert o2["prev"] == o1["upto"] and o2["prev_n"] == 1
    assert len(r.partitions(o1, o2)) == 1
    # AMBIGUOUS tier: an unpadded name that sorts within the committed
    # range ("seg10..." < "seg5..." is false — use one inside ("", o1])
    # → warn, don't wedge the stream
    (d / "seg4-z.warc").write_bytes(b"")  # < seg5-a = within batch-1 range? no: below o1
    # seg4-z sorts below o1.upto (seg5-a) AND below o2.prev (seg5-a) →
    # that is the HARD tier at partitions(o2, ·): it can never be ingested
    o3 = r.latestOffset()
    with pytest.raises(RuntimeError, match="NAMED BELOW the already-planned"):
        r.partitions(o2, o3)

    # ambiguous tier for real: fresh stream, straggler inside the FIRST
    # committed range (prev="" so nothing is hard-below), must only warn
    d2 = tmp_path / "drop2"
    d2.mkdir()
    (d2 / "seg9-part.warc").write_bytes(b"")
    r2 = _WarcStreamReader({"path": str(d2)})
    e1 = r2.latestOffset()
    assert len(r2.partitions(r2.initialOffset(), e1)) == 1
    (d2 / "seg10-part.warc").write_bytes(b"")  # "seg10..." < "seg9..."
    e2 = r2.latestOffset()
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        r2.partitions(e1, e2)
    assert any("at-or-below the committed offset" in str(x.message) for x in w)


def test_stream_offset_never_regresses(tmp_path):
    """An empty or regressed listing (retention sweep, transient
    FileNotFoundError) must NOT move the offset backwards: latestOffset
    re-returns the cached offset, so Spark plans no batch and the committed
    position survives; when files reappear, already-ingested names are not
    re-planned. A checkpoint that DID regress (pre-fix) fails loudly at
    partitions instead of planning a silent empty batch."""
    from sparkdoc.warcsource import _WarcStreamReader

    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.warc").write_bytes(b"")
    (d / "b.warc").write_bytes(b"")
    r = _WarcStreamReader({"path": str(d)})
    o1 = r.latestOffset()
    assert o1["upto"].endswith("b.warc")
    # retention sweep empties the dir → offset holds, does not regress
    (d / "a.warc").unlink()
    (d / "b.warc").unlink()
    assert r.latestOffset() == o1
    # dir vanishes entirely (transient) → still holds
    d.rmdir()
    assert r.latestOffset() == o1
    # files reappear partially (a only): tail regressed → still holds
    d.mkdir()
    (d / "a.warc").write_bytes(b"")
    assert r.latestOffset() == o1
    # a corrupt/pre-fix regressed range with a NON-initial end is refused
    # loudly (the end=="" shape is the recoverable restart case, tested in
    # test_stream_restart_transient_empty_recovers)
    with pytest.raises(RuntimeError, match="offset log regressed"):
        r.partitions(o1, {"upto": str(d / "0.warc"), "n_below": 1})


def test_stream_restart_transient_empty_recovers(tmp_path):
    """The one regression shape a transient empty listing can still mint —
    the FIRST latestOffset after a restart, before the fresh instance has
    learned the checkpointed position — must not wedge the stream OR
    re-ingest: partitions plans an empty batch with a warning, seeds the
    monotonicity cache from the checkpointed start, and clamps the NEXT
    batch (whose start is the regressed initial offset) back to the real
    position."""
    import warnings as _warnings

    from sparkdoc.warcsource import _WarcStreamReader

    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.warc").write_bytes(b"")
    (d / "b.warc").write_bytes(b"")
    r1 = _WarcStreamReader({"path": str(d)})
    o1 = r1.latestOffset()
    assert len(r1.partitions(r1.initialOffset(), o1)) == 2
    r1.commit(o1)

    # restart: fresh instance, and the drop-point is transiently invisible
    (d / "a.warc").unlink()
    (d / "b.warc").unlink()
    r2 = _WarcStreamReader({"path": str(d)})
    init = r2.latestOffset()  # the instance-local cache is empty → initial
    assert init["upto"] == ""
    # Spark already wrote that offset; it plans batch (o1, ""] → empty + warn
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        assert r2.partitions(o1, init) == []
    assert any("transiently empty" in str(x.message) for x in w)
    # the cache is now seeded: a second transient empty holds at o1
    assert r2.latestOffset() == o1
    # files reappear plus one genuinely new container
    (d / "a.warc").write_bytes(b"")
    (d / "b.warc").write_bytes(b"")
    (d / "c.warc").write_bytes(b"")
    o3 = r2.latestOffset()
    assert o3["upto"].endswith("c.warc")
    # next batch starts at the regressed "" offset — the clamp must keep
    # the already-ingested a/b out and plan exactly c
    parts = r2.partitions(init, o3)
    assert [p.name for p in parts] == ["c.warc"]


def test_file_bucket_planning_filter_partitions_exactly_once(warc_dir):
    """The buckets/bucketGroup options prune the PLANNED partitions (no
    excluded file is ever opened): groups partition the file set — disjoint,
    and their union is every container exactly once. The crc32 bucket is
    reproducible from the name alone (the Spark-side F.crc32 twin)."""
    from sparkdoc.warcsource import file_bucket

    nb = 4
    all_parts = _WarcReader({"path": warc_dir}).partitions()
    seen: dict[str, int] = {}
    for g in ([0, 1], [2], [3]):
        r = _WarcReader(
            {"path": warc_dir, "buckets": str(nb), "bucketgroup": ",".join(map(str, g))}
        )
        for p in r.partitions():
            assert file_bucket(p.name, nb) in g
            assert p.name not in seen
            seen[p.name] = 1
    assert set(seen) == {p.name for p in all_parts} and len(seen) == N_FILES
    with pytest.raises(ValueError, match="together"):
        _WarcReader({"path": warc_dir, "buckets": "4"})


def test_warcdir_file_bucketed_resumable_run(spark, warc_dir, tmp_path):
    """End-to-end: the extract job's container-bucketed warcdir path (each
    file listed+read once per run, bucket = file_bucket(warc_name)) produces
    the SAME documents and chunks as the doc-hash route, commits per group,
    and resumes: a second invocation processes nothing."""
    import glob as _glob

    from pyspark.sql import functions as F

    from sparkdoc.checkpoint import run_resumable
    from sparkdoc.jobs.extract import resolve_input
    from sparkdoc.warc import warc_extract
    from sparkdoc.warcsource import file_bucket

    nb = 4
    raw, documents_fn, raw_for_group = resolve_input(
        spark, f"warcdir:{warc_dir}", 42, n_buckets=nb
    )
    assert raw_for_group is not None
    out = str(tmp_path / "out")
    s1 = run_resumable(
        spark, raw, out, n_buckets=nb, group_size=2,
        documents_fn=documents_fn, raw_for_group=raw_for_group,
    )
    assert s1["buckets_processed"] == list(range(nb))
    docs = spark.read.parquet(os.path.join(out, "documents"))
    want = {
        (r["doc_id"], str(r["spans"]))
        for r in warc_extract(warc_corpus_df(spark, N_FILES, 42)).collect()
    }
    got = {(r["doc_id"], str(r["spans"])) for r in docs.collect()}
    assert got == want and len(got) > 0
    # the committed bucket of every doc is its CONTAINER's file_bucket, and
    # chunks landed in the same partitions as their documents
    for r in docs.select("doc_id", "bucket").collect():
        assert r["bucket"] == file_bucket(r["doc_id"].split("#", 1)[0], nb)
    chunks = spark.read.parquet(os.path.join(out, "chunks"))
    cb = {r["doc_id"]: r["bucket"] for r in chunks.select("doc_id", "bucket").collect()}
    db = {r["doc_id"]: r["bucket"] for r in docs.collect()}
    assert all(db[d] == b for d, b in cb.items())
    # resume: nothing left to do, outputs unchanged
    s2 = run_resumable(
        spark, raw, out, n_buckets=nb, group_size=2,
        documents_fn=documents_fn, raw_for_group=raw_for_group,
    )
    assert s2["buckets_processed"] == [] and sorted(s2["buckets_skipped"]) == list(range(nb))
    assert docs.count() == spark.read.parquet(os.path.join(out, "documents")).count()
