"""WARC / WET source: the Common Crawl ingest format.

Web-scale training corpora start life as WARC archives (ISO 28500) or
their text-extraction siblings, WET files ("conversion" records holding
the page's plain text). A 100 TB crawl snapshot is tens of thousands of
~150 MB ``.warc.wet.gz`` segment files -- which is exactly the right
distribution grain: this reader maps one Spark ``binaryFile`` row to one
segment, parses records STREAMING inside an Arrow-batched
``mapInPandas`` pass, and emits one row per conversion record. No
external WARC library: the framing (version line, CRLF header block,
``Content-Length``-delimited body, CRLF CRLF record separator) is ~40
lines of stdlib parsing, and gzip members concatenate (the per-record
gzip framing Common Crawl uses) so ``gzip.decompress`` handles ``.gz``
segments whole.

Scale shape: parallelism = segment-file count (the crawl's natural
unit); text leaves the scan already shredded into rows, so the only
shuffle anything downstream pays is whatever the pipeline does next.
``binaryFile`` loads a whole segment per task -- at the standard
WET segment size (~150 MB compressed / ~400 MB raw) that is the same
memory class Spark's parquet reader uses per task; for adversarial
multi-GB single files, split upstream (Common Crawl never ships them).

Record-framing reference: the WARC 1.0/1.1 specification (public ISO
28500 drafts) and Common Crawl's published WET layout; no reference
repo analog (SURVEY.md §2.7 north-star ingest family).
"""

from __future__ import annotations

import gzip
import io
import sys

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WET_SCHEMA = (
    "source_path string, record_idx long, warc_type string, "
    "target_uri string, warc_date string, text string"
)


def _resync(data: bytes, pos: int) -> int:
    """Scan forward from ``pos`` for the next line-start ``WARC/``
    version line; -1 if none. Best-effort lenient-mode recovery -- a
    body whose text happens to hold a line starting 'WARC/' can false-
    resync, which is the documented price of re-framing a corrupt
    stream without Content-Length."""
    i = data.find(b"WARC/", pos)
    while i != -1:
        if i == 0 or data[i - 1 : i] == b"\n":
            return i
        i = data.find(b"WARC/", i + 1)
    return -1


def parse_warc_bytes(data: bytes, strict: bool = False, stats: dict | None = None):
    """Yield (record_idx, headers: dict, body: bytes) for each record in
    a raw (uncompressed) WARC byte stream. Bodies are delimited by
    ``Content-Length`` (mandatory per spec), never by scanning for
    separators -- page text containing blank lines round-trips exactly.

    Malformed framing: ``strict=True`` raises. The default (r9,
    ADVICE r8) RESYNCS -- scans forward to the next line-start
    ``WARC/`` version line and keeps parsing, so a mid-segment
    corruption in a 150 MB file costs the damaged record, not the
    whole tail -- and counts what it dropped: pass ``stats`` (a dict)
    to read back ``stats['skipped']`` (resync events) after the
    generator is exhausted. A truncated final body still ends the
    stream (there is nothing after it)."""
    buf = io.BytesIO(data)
    idx = 0
    skipped = 0
    if stats is not None:
        stats["skipped"] = 0
    while True:
        # skip inter-record CRLFs
        line = buf.readline()
        while line in (b"\r\n", b"\n"):
            line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            if strict:
                raise ValueError(
                    f"record {idx}: expected WARC/ version line, got "
                    f"{line[:40]!r}"
                )
            nxt = _resync(data, buf.tell())
            skipped += 1
            if stats is not None:
                stats["skipped"] = skipped
            if nxt == -1:
                return
            buf.seek(nxt)
            continue
        headers: dict[str, str] = {}
        while True:
            line = buf.readline()
            if line in (b"\r\n", b"\n", b""):
                break
            try:
                k, _, v = line.decode("utf-8", "replace").partition(":")
            except Exception:
                continue
            headers[k.strip().lower()] = v.strip()
        try:
            n = int(headers["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError(f"record {idx}: missing Content-Length")
            nxt = _resync(data, buf.tell())
            skipped += 1
            if stats is not None:
                stats["skipped"] = skipped
            if nxt == -1:
                return
            buf.seek(nxt)
            continue
        body = buf.read(n)
        if len(body) != n:
            if strict:
                raise ValueError(
                    f"record {idx}: truncated body ({len(body)} < {n})"
                )
            skipped += 1
            if stats is not None:
                stats["skipped"] = skipped
            return
        yield idx, headers, body
        idx += 1


def _maybe_gunzip(path: str, data: bytes) -> bytes:
    if path.endswith(".gz") or data[:2] == b"\x1f\x8b":
        # WARC gzip = concatenated members (one per record); the stdlib
        # decompressor consumes multi-member streams whole
        return gzip.decompress(data)
    return data


def read_wet(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("conversion",),
    strict: bool = False,
) -> DataFrame:
    """Distributed WET/WARC ingest: ``path`` is a file/dir/glob of
    ``.warc`` / ``.wet`` / ``.gz`` segments; returns one row per record
    of the requested ``warc_type``s (default: WET ``conversion`` text
    records) with columns (source_path, record_idx, warc_type,
    target_uri, warc_date, text).

    One binaryFile row = one segment = one task; record parsing is
    stdlib-only inside the Arrow pass. ``record_types=None`` keeps
    every record (responses, metadata, warcinfo...)."""
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(
        _wet_map_gen(record_types=record_types, strict=strict), WET_SCHEMA
    )


def _wet_map_gen(
    record_types: tuple[str, ...] | None = ("conversion",),
    strict: bool = False,
):
    """The (path, content) -> WET_SCHEMA Arrow-pass generator shared by
    :func:`read_wet` and the streaming ingest
    (streaming/incremental.py stream_append_collection
    source_format='wet') -- one parser, two execution modes."""
    types = None if record_types is None else {t.lower() for t in record_types}
    strict_ = bool(strict)

    def gen(batches):
        for pdf in batches:
            out: dict[str, list] = {
                "source_path": [],
                "record_idx": [],
                "warc_type": [],
                "target_uri": [],
                "warc_date": [],
                "text": [],
            }
            for p, raw in zip(pdf["path"], pdf["content"]):
                data = _maybe_gunzip(str(p), bytes(raw))
                stats: dict = {}
                for idx, headers, body in parse_warc_bytes(
                    data, strict=strict_, stats=stats
                ):
                    wtype = headers.get("warc-type", "")
                    if types is not None and wtype.lower() not in types:
                        continue
                    # raw-crawl response records hold a full HTTP
                    # message (ISO 28500: Content-Type
                    # application/http) -- the payload the pipeline
                    # wants starts after the HTTP header block
                    if "application/http" in headers.get("content-type", ""):
                        body = strip_http_envelope(body)
                    out["source_path"].append(str(p))
                    out["record_idx"].append(idx)
                    out["warc_type"].append(wtype)
                    out["target_uri"].append(
                        headers.get("warc-target-uri")
                    )
                    out["warc_date"].append(headers.get("warc-date"))
                    out["text"].append(body.decode("utf-8", "replace"))
                if stats.get("skipped"):
                    # executor-log observability for lenient-mode
                    # damage (ADVICE r8): truncation is never silent
                    print(
                        f"letsearch_spark.warc: {p}: skipped "
                        f"{stats['skipped']} malformed record(s) "
                        "(lenient resync)",
                        file=sys.stderr,
                    )
            yield pd.DataFrame(out)

    return gen


def strip_http_envelope(body: bytes) -> bytes:
    """Payload of an HTTP message body (a WARC ``response`` record's
    content per ISO 28500): everything after the first CRLFCRLF header
    terminator. Bodies that do not start with an HTTP status line pass
    through untouched (defensive -- a record mislabeled
    application/http loses nothing)."""
    if not body.startswith(b"HTTP/"):
        return body
    # cut at the EARLIEST header terminator (r9 review catch): LF-only
    # headers whose PAYLOAD contains a later CRLFCRLF must split at the
    # LF pair, or the page leaks into the discarded header block
    i_crlf = body.find(b"\r\n\r\n")
    i_lf = body.find(b"\n\n")
    if i_crlf == -1 and i_lf == -1:
        return body
    if i_lf == -1 or (i_crlf != -1 and i_crlf < i_lf):
        return body[i_crlf + 4 :]
    return body[i_lf + 2 :]


def _write_segments(
    records: list,
    root: str,
    per_file: int,
    alternate_gz: bool,
    build,
    suffix: str,
) -> list[str]:
    """The one sharding loop behind :func:`write_wet_segments` and
    :func:`write_warc_segments`."""
    import os

    per_file = max(1, per_file)
    paths = []
    for i in range(0, len(records), per_file):
        part = i // per_file
        gz = alternate_gz and part % 2 == 1
        name = f"part-{part}.{suffix}" + (".gz" if gz else "")
        p = os.path.join(root, name)
        with open(p, "wb") as f:
            f.write(build(records[i : i + per_file], gz=gz))
        paths.append(p)
    return paths


def write_wet_segments(
    records: list[tuple[str, str]],
    root: str,
    per_file: int,
    alternate_gz: bool = True,
) -> list[str]:
    """Shard (uri, text) records into ``per_file``-record WET segment
    files under ``root`` (``part-N.warc.wet[.gz]``, alternate files
    gzipped when ``alternate_gz``) -- the one copy of the sharding loop
    the contract query, the scale probe, and the tests all share.
    Returns the written paths."""
    return _write_segments(
        records, root, per_file, alternate_gz, build_wet_bytes, "warc.wet"
    )


def write_warc_segments(
    records: list[tuple[str, str]],
    root: str,
    per_file: int,
    alternate_gz: bool = True,
) -> list[str]:
    """Shard (uri, html) records into raw-crawl WARC segment files
    (``part-N.warc[.gz]``) of ``response`` records -- the test/oracle
    twin of the :func:`read_wet` ``record_types=('response',)`` raw
    path, as :func:`write_wet_segments` is of the WET path."""
    return _write_segments(
        records,
        root,
        per_file,
        alternate_gz,
        build_warc_response_bytes,
        "warc",
    )


def build_wet_bytes(
    records: list[tuple[str, str]], gz: bool = False
) -> bytes:
    """Deterministic WET segment builder: ``records`` is a list of
    (target_uri, text). The test/oracle twin of :func:`read_wet` --
    and the egress shape for shipping a cleaned corpus back out as
    WET. Bodies are UTF-8; Content-Length is exact, so any text
    (blank lines included) round-trips byte-for-byte."""
    out = io.BytesIO()
    for uri, text in records:
        body = (text or "").encode("utf-8")
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n"
            "Content-Type: text/plain\r\n"
            "\r\n"
        ).encode("utf-8")
        out.write(head)
        out.write(body)
        out.write(b"\r\n\r\n")
    data = out.getvalue()
    if gz:
        # mtime pinned: deterministic bytes for checksum-based tests
        z = io.BytesIO()
        with gzip.GzipFile(fileobj=z, mode="wb", mtime=0) as f:
            f.write(data)
        return z.getvalue()
    return data


def build_warc_response_bytes(
    records: list[tuple[str, str]], gz: bool = False
) -> bytes:
    """Deterministic raw-crawl WARC segment builder: ``records`` is a
    list of (target_uri, html). Each record is a WARC ``response``
    whose body is a full HTTP message (status line + headers + CRLFCRLF
    + the HTML payload, Content-Type ``application/http;
    msgtype=response`` -- the actual Common Crawl .warc shape, of which
    WET conversion records are the pre-extracted sibling). The parse
    side strips the HTTP envelope (:func:`strip_http_envelope`), so the
    HTML round-trips byte-for-byte."""
    out = io.BytesIO()
    for uri, html in records:
        payload = (html or "").encode("utf-8")
        http = (
            "HTTP/1.1 200 OK\r\n"
            "Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode("utf-8") + payload
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2026-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            "\r\n"
        ).encode("utf-8")
        out.write(head)
        out.write(http)
        out.write(b"\r\n\r\n")
    data = out.getvalue()
    if gz:
        z = io.BytesIO()
        with gzip.GzipFile(fileobj=z, mode="wb", mtime=0) as f:
            f.write(data)
        return z.getvalue()
    return data
