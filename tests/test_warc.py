"""WARC/WET source (sources/warc.py): framing round-trips, gzip
members, record-type filtering, strict-vs-lenient malformed handling,
multi-segment distribution."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from letsearch_spark.sources.warc import (
    build_wet_bytes,
    parse_warc_bytes,
    read_wet,
)


def test_wet_roundtrip_plain_and_gz(spark, tmp_path, sf_dir):
    """Text with blank lines, CRLFs, unicode, and empty bodies
    round-trips byte-exactly through build -> write -> distributed
    read, for plain and gzipped segments alike."""
    rows = [
        ("http://a.test/1", "plain text"),
        ("http://a.test/2", "two\n\nparagraphs\r\nwith CRLF"),
        ("http://a.test/3", "unicode: 中文 \U0001f600 א"),
        ("http://a.test/4", ""),
    ]
    (tmp_path / "seg-0.warc.wet").write_bytes(build_wet_bytes(rows[:2]))
    (tmp_path / "seg-1.warc.wet.gz").write_bytes(
        build_wet_bytes(rows[2:], gz=True)
    )
    out = read_wet(spark, str(tmp_path)).collect()
    got = sorted((r["target_uri"], r["text"]) for r in out)
    assert got == sorted(rows)
    # per-file record numbering + provenance
    by_file = {}
    for r in out:
        by_file.setdefault(os.path.basename(r["source_path"]), []).append(
            r["record_idx"]
        )
    assert sorted(by_file) == ["seg-0.warc.wet", "seg-1.warc.wet.gz"]
    assert all(sorted(v) == list(range(len(v))) for v in by_file.values())
    assert all(r["warc_type"] == "conversion" for r in out)


def test_warc_record_type_filter_and_parse():
    """A warcinfo record ahead of the conversions is skipped by the
    default filter, kept with record_types=None; the raw parser sees
    every record with exact Content-Length bodies."""
    info = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Length: 9\r\n"
        b"\r\n"
        b"info body\r\n\r\n"
    )
    data = info + build_wet_bytes([("http://x/1", "hello\r\n\r\nworld")])
    recs = list(parse_warc_bytes(data))
    assert [h["warc-type"] for _, h, _ in recs] == ["warcinfo", "conversion"]
    assert recs[0][2] == b"info body"
    assert recs[1][2].decode() == "hello\r\n\r\nworld"


def test_warc_strict_vs_lenient_malformed():
    """Truncated body / garbage framing: lenient parsing stops at the
    damage and keeps what it has; strict raises."""
    good = build_wet_bytes([("http://x/1", "intact")])
    truncated = good + (
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"Content-Length: 100\r\n\r\nshort"
    )
    recs = list(parse_warc_bytes(truncated))
    assert len(recs) == 1 and recs[0][2] == b"intact"
    with pytest.raises(ValueError, match="truncated"):
        list(parse_warc_bytes(truncated, strict=True))

    garbage = good + b"NOT-A-RECORD\r\n"
    assert len(list(parse_warc_bytes(garbage))) == 1
    with pytest.raises(ValueError, match="version line"):
        list(parse_warc_bytes(garbage, strict=True))

    missing_len = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\nbody"
    assert list(parse_warc_bytes(missing_len)) == []
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc_bytes(missing_len, strict=True))


def test_collection_import_wet(spark, tmp_path, sf_dir):
    """Collection.import_wet: conversion records become keyed doc rows
    with provenance columns; append continues keys; embed+search work
    over the ingested text."""
    from letsearch_spark.collection import Collection

    seg = tmp_path / "segs"
    seg.mkdir()
    (seg / "a.warc.wet").write_bytes(
        build_wet_bytes(
            [("http://t/1", "spark join window"), ("http://t/2", "dedup band")]
        )
    )
    c = Collection.create(
        spark, str(tmp_path / "coll"), name="wet", model_name="stub://16"
    )
    assert c.import_wet(str(seg)) == 2
    docs = c.docs().orderBy("_key").collect()
    assert [r["_key"] for r in docs] == [1, 2]
    assert {r["target_uri"] for r in docs} == {"http://t/1", "http://t/2"}
    # import_wet REPLACES (re-running `index` must not duplicate the
    # corpus -- review catch r8); append_wet continues keys
    assert c.import_wet(str(seg)) == 2
    assert c.count() == 2
    seg2 = tmp_path / "segs2"
    seg2.mkdir()
    (seg2 / "b.warc.wet.gz").write_bytes(
        build_wet_bytes([("http://t/3", "stream state")], gz=True)
    )
    assert c.append_wet(str(seg2)) == 1
    assert c.docs().agg(F.max("_key")).first()[0] == 3
    assert c.count() == 3
    c.embed_all()
    hit = c.search("text", "spark join window", limit=1).first()
    assert hit["content"] == "spark join window"


def test_wet_ingest_from_documents_table(spark, tmp_path, sf_dir):
    """The staged-contract shape: the documents table shipped out as
    WET segments and read back distributed must reproduce every text
    exactly (md5 + length per doc)."""
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .collect()
    )
    rows = [
        (f"http://corpus.test/{r['doc_id']}", r["text"] or "") for r in docs
    ]
    from letsearch_spark.sources.warc import write_wet_segments

    paths = write_wet_segments(rows, str(tmp_path), max(1, len(rows) // 4))
    assert len(paths) >= 4 and any(p.endswith(".gz") for p in paths)

    out = (
        read_wet(spark, str(tmp_path))
        .select(
            F.regexp_extract("target_uri", r"(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            F.md5("text").alias("text_md5"),
        )
        .collect()
    )
    got = {r["doc_id"]: r["text_md5"] for r in out}
    import hashlib

    want = {
        r["doc_id"]: hashlib.md5((r["text"] or "").encode()).hexdigest()
        for r in docs
    }
    assert got == want


def test_stream_wet_ingest(spark, tmp_path):
    """Streaming WET ingest (r8): segments dropped into a directory
    stream into the collection via stream_append_collection
    (source_format='wet'); the result equals a bulk import_wet of the
    same segments (keys dense, provenance kept), and a replay over the
    same checkpoint appends nothing (file-source exactly-once)."""
    from letsearch_spark.collection import Collection
    from letsearch_spark.streaming.incremental import (
        stream_append_collection,
    )

    seg = tmp_path / "drop"
    seg.mkdir()
    (seg / "s0.warc.wet").write_bytes(
        build_wet_bytes([("http://t/1", "spark join"), ("http://t/2", "agg")])
    )
    (seg / "s1.warc.wet.gz").write_bytes(
        build_wet_bytes([("http://t/3", "window rank")], gz=True)
    )
    c = Collection.create(
        spark, str(tmp_path / "coll"), name="sw", model_name="stub://16"
    )
    ckpt = str(tmp_path / "ckpt")
    q = stream_append_collection(
        spark, c, str(seg), schema=None, checkpoint_dir=ckpt,
        source_format="wet",
    )
    q.awaitTermination(120)
    docs = c.docs().orderBy("_key").collect()
    assert sorted(r["target_uri"] for r in docs) == [
        "http://t/1", "http://t/2", "http://t/3",
    ]
    assert [r["_key"] for r in docs] == [1, 2, 3]
    assert c.embeddings("text").count() == 3
    # replay: nothing new
    q2 = stream_append_collection(
        spark, c, str(seg), schema=None, checkpoint_dir=ckpt,
        source_format="wet",
    )
    q2.awaitTermination(120)
    assert c.count() == 3
    # a new segment arrives: only it is ingested
    (seg / "s2.warc.wet").write_bytes(
        build_wet_bytes([("http://t/4", "late arrival")])
    )
    q3 = stream_append_collection(
        spark, c, str(seg), schema=None, checkpoint_dir=ckpt,
        source_format="wet",
    )
    q3.awaitTermination(120)
    assert c.count() == 4
    assert c.docs().agg(F.max("_key")).first()[0] == 4


def test_stream_prep_wet_source(spark, tmp_path):
    """The streaming PREP pipeline over WET segments (r8,
    source_format='wet'): a low-quality record is filtered, a
    cross-segment near-duplicate is dropped against the persisted
    signature store, survivors land keyed + embedded with their crawl
    provenance."""
    from letsearch_spark.collection import Collection
    from letsearch_spark.streaming.incremental import stream_prep_collection

    base = (
        "the alpha signal and the beta channel of gamma systems carry "
        "delta payloads for epsilon consumers that zeta brokers route "
        "through eta queues in theta clusters with iota replicas and "
        "kappa shards holding lambda segments of steady traffic flows"
    )
    near = base.replace("kappa", "sigma")
    uniq = (
        "completely different prose about streams windows states and "
        "checkpoints carrying enough words to clear the gopher length "
        "gate with room to spare for the minimum word count threshold "
        "plus some extra filler tokens near the end of this document"
    )
    seg = tmp_path / "drop"
    seg.mkdir()
    (seg / "s0.warc.wet").write_bytes(
        build_wet_bytes([("http://t/base", base), ("http://t/low", "tiny")])
    )
    (seg / "s1.warc.wet.gz").write_bytes(
        build_wet_bytes([("http://t/near", near), ("http://t/uniq", uniq)],
                        gz=True)
    )
    coll = Collection.create(
        spark, str(tmp_path / "root"), name="pwet",
        index_columns=["text"], model_name="stub://8",
    )
    q = stream_prep_collection(
        spark,
        coll,
        str(seg),
        schema=None,
        checkpoint_dir=str(tmp_path / "ckpt"),
        state_dir=str(tmp_path / "state"),
        quality={"min_words": 10},
        dedup={"threshold": 0.5},
        max_files_per_trigger=1,
        source_format="wet",
    )
    assert q.awaitTermination(300)
    rows = coll.docs().select("text", "target_uri").collect()
    texts = [r["text"] for r in rows]
    # low-quality gone; exactly ONE of the near-dup pair survives
    # (first-seen-wins -- the streaming file order is not contractual);
    # uniq survives
    assert len(texts) == 2 and uniq in texts
    assert sum(t in (base, near) for t in texts) == 1
    uris = {r["target_uri"] for r in rows}
    assert "http://t/uniq" in uris
    assert uris & {"http://t/base", "http://t/near"}
    assert coll.embeddings("text").count() == 2


def test_warc_parse_property_fuzz():
    """Property fuzz (hypothesis): ANY list of (uri, text) records --
    arbitrary unicode, embedded CRLFs/blank lines, empty bodies --
    round-trips byte-exactly through build -> parse, in both plain and
    gzip framing; and appending arbitrary garbage bytes never makes the
    LENIENT parser raise or corrupt the records before the damage."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    text = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),  # no lone surrogates (not UTF-8)
        ),
        max_size=200,
    )
    uri = st.text(
        alphabet=st.characters(
            whitelist_categories=("Ll", "Lu", "Nd"),
            whitelist_characters="/:.-_",
        ),
        min_size=1,
        max_size=40,
    )
    records = st.lists(st.tuples(uri, text), min_size=0, max_size=5)

    @settings(max_examples=60, deadline=None)
    @given(records=records, gz=st.booleans(), tail=st.binary(max_size=30))
    def check(records, gz, tail):
        data = build_wet_bytes(records, gz=gz)
        got = [
            (h.get("warc-target-uri"), b.decode("utf-8"))
            for _, h, b in parse_warc_bytes(
                gzip.decompress(data) if gz else data, strict=True
            )
        ]
        assert got == records
        # lenient parse of damaged tail: never raises, prefix intact
        damaged = (gzip.decompress(data) if gz else data) + tail
        recs = list(parse_warc_bytes(damaged))
        assert [
            (h.get("warc-target-uri"), b.decode("utf-8"))
            for _, h, b in recs[: len(records)]
        ] == records

    check()


def test_warc_lenient_resync_recovers_tail():
    """ADVICE r8: a mid-segment corruption must cost the damaged
    record, not the whole tail -- lenient parse resyncs to the next
    line-start WARC/ version line and reports what it skipped via
    ``stats``."""
    a = build_wet_bytes([("http://x/a", "first")])
    c = build_wet_bytes([("http://x/c", "third")])
    corrupt = b"GARBAGE-NOT-A-RECORD\r\nmore junk\r\n"
    stats: dict = {}
    recs = list(parse_warc_bytes(a + corrupt + c, stats=stats))
    assert [(h.get("warc-target-uri"), b.decode()) for _, h, b in recs] == [
        ("http://x/a", "first"),
        ("http://x/c", "third"),
    ]
    assert stats["skipped"] == 1

    # missing Content-Length mid-stream: same recovery
    no_len = b"WARC/1.0\r\nWARC-Type: conversion\r\n\r\n"
    stats2: dict = {}
    recs2 = list(parse_warc_bytes(a + no_len + c, stats=stats2))
    assert [b.decode() for _, _, b in recs2] == ["first", "third"]
    assert stats2["skipped"] == 1

    # strict still raises on the same inputs
    with pytest.raises(ValueError):
        list(parse_warc_bytes(a + corrupt + c, strict=True))


def test_warc_response_roundtrip_and_http_strip():
    """r9 raw-crawl path: build_warc_response_bytes emits response
    records whose body is a full HTTP message; parse + HTTP envelope
    strip recover the HTML payload byte-for-byte (plain and gz),
    incl. payloads containing blank lines and CRLFs that a separator
    scan would misframe."""
    import gzip as _gzip

    from letsearch_spark.sources.warc import (
        build_warc_response_bytes,
        strip_http_envelope,
    )

    pages = [
        ("http://x/1", "<html><body><p>hello</p></body></html>"),
        ("http://x/2", "<p>blank\r\n\r\nlines &amp; unicode 中文</p>"),
        ("http://x/3", ""),
    ]
    for gz in (False, True):
        data = build_warc_response_bytes(pages, gz=gz)
        raw = _gzip.decompress(data) if gz else data
        recs = list(parse_warc_bytes(raw, strict=True))
        assert len(recs) == 3
        for (uri, html), (_, h, body) in zip(pages, recs):
            assert h["warc-target-uri"] == uri
            assert h["warc-type"] == "response"
            assert "application/http" in h["content-type"]
            assert body.startswith(b"HTTP/1.1 200 OK")
            assert strip_http_envelope(body).decode("utf-8") == html
    # non-HTTP bodies pass through the stripper untouched
    assert strip_http_envelope(b"plain text") == b"plain text"


def test_collection_import_warc(spark, tmp_path):
    """Collection.import_warc (r9): the full raw-crawl chain --
    response records -> HTTP strip -> html_to_text -> rows; the
    url_filter kwarg drops blocked hosts BEFORE extraction (stage 0a
    at the ingest boundary); append_warc continues keys."""
    from letsearch_spark.collection import Collection
    from letsearch_spark.sources.warc import build_warc_response_bytes

    seg = tmp_path / "segs"
    seg.mkdir()
    (seg / "a.warc").write_bytes(
        build_warc_response_bytes(
            [
                ("http://good.test/1",
                 "<html><script>x</script><body><p>spark join "
                 "window</p></body></html>"),
                ("http://spam.test/2",
                 "<html><body><p>casino pills</p></body></html>"),
            ]
        )
    )
    c = Collection.create(
        spark, str(tmp_path / "coll"), name="warc", model_name="stub://16"
    )
    n = c.import_warc(
        str(seg), url_filter={"blocked_hosts": ["spam.test"]}
    )
    assert n == 1
    row = c.docs().first()
    assert row["text"] == "spark join window"  # tags + script gone
    assert row["target_uri"] == "http://good.test/1"
    # append with key continuation, gz segment, no filter
    seg2 = tmp_path / "segs2"
    seg2.mkdir()
    (seg2 / "b.warc.gz").write_bytes(
        build_warc_response_bytes(
            [("http://good.test/3", "<p>dedup &amp; bands</p>")], gz=True
        )
    )
    assert c.append_warc(str(seg2)) == 1
    docs = c.docs().orderBy("_key").collect()
    assert [r["_key"] for r in docs] == [1, 2]
    assert docs[1]["text"] == "dedup & bands"


def test_cli_warc_dispatch(spark, tmp_path, capsys):
    """CLI index dispatches bare .warc/.warc.gz through import_warc
    (raw crawl), while .wet keeps routing to import_wet."""
    from letsearch_spark.cli import build_parser, cmd_index
    from letsearch_spark.sources.warc import build_warc_response_bytes

    home = str(tmp_path / "home")
    seg = tmp_path / "seg.warc"
    seg.write_bytes(
        build_warc_response_bytes(
            [("http://t/1", "<p>spark join window</p>")]
        )
    )
    p = build_parser()
    a = p.parse_args(
        ["--home", home, "--master", "local[4]",
         "index", "--collection", "rw", "--files", str(seg)]
    )
    assert cmd_index(a) == 0
    out = capsys.readouterr().out
    assert "1 rows total" in out and "1 vectors" in out

    from letsearch_spark.collection import Collection
    c = Collection.load(spark, home, "rw")
    assert c.docs().first()["text"] == "spark join window"


def test_strip_http_envelope_lf_headers_with_crlf_payload():
    """r9 review catch: LF-only HTTP headers whose PAYLOAD contains a
    later CRLFCRLF must split at the earliest terminator -- the LF
    pair -- not the in-payload CRLFCRLF."""
    from letsearch_spark.sources.warc import strip_http_envelope

    payload = b"<html>a\r\n\r\nb</html>"
    lf_headers = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n" + payload
    assert strip_http_envelope(lf_headers) == payload
    crlf = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
    assert strip_http_envelope(crlf) == payload
    # no terminator at all: nothing to split, body unchanged
    assert strip_http_envelope(b"HTTP/1.1 200 OK") == b"HTTP/1.1 200 OK"


def test_stream_warc_ingest(spark, tmp_path):
    """Streaming raw-crawl ingest (r9): .warc response segments stream
    into the collection via source_format='warc' -- the import_warc
    composition (HTTP strip + html_to_text) on a stream, with the
    file-source exactly-once ledger."""
    from letsearch_spark.collection import Collection
    from letsearch_spark.sources.warc import build_warc_response_bytes
    from letsearch_spark.streaming.incremental import (
        stream_append_collection,
    )

    seg = tmp_path / "drop"
    seg.mkdir()
    (seg / "s0.warc").write_bytes(
        build_warc_response_bytes(
            [("http://t/1", "<html><script>x</script><p>spark join</p></html>")]
        )
    )
    (seg / "s1.warc.gz").write_bytes(
        build_warc_response_bytes(
            [("http://t/2", "<p>window &amp; rank</p>")], gz=True
        )
    )
    c = Collection.create(
        spark, str(tmp_path / "coll"), name="rwst", model_name="stub://16"
    )
    ckpt = str(tmp_path / "ckpt")
    q = stream_append_collection(
        spark, c, str(seg), schema=None, checkpoint_dir=ckpt,
        source_format="warc",
    )
    q.awaitTermination(120)
    docs = {r["target_uri"]: r["text"] for r in c.docs().collect()}
    assert docs == {
        "http://t/1": "spark join",
        "http://t/2": "window & rank",
    }
    # replay over the same checkpoint: exactly-once
    q2 = stream_append_collection(
        spark, c, str(seg), schema=None, checkpoint_dir=ckpt,
        source_format="warc",
    )
    q2.awaitTermination(120)
    assert c.count() == 2
    # unknown format still rejected
    import pytest as _pytest
    with _pytest.raises(ValueError, match="source_format"):
        stream_append_collection(
            spark, c, str(seg), schema=None,
            checkpoint_dir=str(tmp_path / "ck2"), source_format="bogus",
        )
