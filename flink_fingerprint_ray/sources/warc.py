"""WARC source: read Common-Crawl-style web archives into page tables.

Real web corpora arrive as WARC files (ISO 28500), usually with each
record compressed as its own concatenated gzip member so readers can
split without decompressing the whole file.  This module implements the
format from the public spec with stdlib zlib only:

- ``parse_warc(data)`` — bytes of one WARC(.gz) file → Arrow table
  ``(url, warc_ts, html, http_status, content_type)`` matching the
  engine's page schema (SURVEY.md input hint).  Handles multi-member
  gzip, Content-Length record framing (never regex over the payload),
  response/request/warcinfo/metadata record types, and HTTP envelopes
  with Content-Length or chunked transfer coding.
- ``read_warc(paths)`` — Ray Data scan: one task per WARC file
  (``read_binary_files`` → ``map_batches(parse)``), the natural 100-TB
  sharding since crawls ship ~1 GB per file.  Downstream column pruning
  applies from the first map.
- ``build_warc(records)`` / ``write_warc(...)`` — the fixture side:
  spec-shaped response records with a genuine HTTP/1.1 envelope, each
  record its own gzip member (the Common Crawl layout), so the parser
  is proven on REAL framing, not on its own in-memory structures.

Reference-semantics citation: the reference consumes Kafka
(``src/flink_job/kafka_config.py:24-31``); WARC is the bounded-corpus
ingest analog for the webtext mapping (SURVEY.md §2.1 S1 note) — the
same page rows, sourced from the archive format crawls actually ship.
"""

from __future__ import annotations

import datetime
import hashlib
import os
import zlib

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("ms")),
        ("html", pa.binary()),
        ("http_status", pa.int32()),
        ("content_type", pa.string()),
    ]
)


# ---------------------------------------------------------------------------
# Build (fixture side)
# ---------------------------------------------------------------------------

def _gzip_member(payload: bytes) -> bytes:
    """One complete gzip member (RFC 1952) for per-record compression."""
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(payload) + co.flush()


def _http_response(body: bytes, content_type: str = "text/html; charset=utf-8",
                   chunked: bool = False, status: int = 200) -> bytes:
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(status, "OK")
    head = (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n").encode("ascii")
    if chunked:
        head += b"Transfer-Encoding: chunked\r\n\r\n"
        out = bytearray(head)
        for i in range(0, len(body), 1000):
            chunk = body[i:i + 1000]
            out += f"{len(chunk):x}".encode("ascii") + _CRLF + chunk + _CRLF
        out += b"0\r\n\r\n"
        return bytes(out)
    head += f"Content-Length: {len(body)}\r\n\r\n".encode("ascii")
    return head + body


def build_warc(records: list[dict], gzip_members: bool = True,
               chunked_every: int = 0) -> bytes:
    """Records ``{url, ts_ms, html[, status]}`` → WARC/1.0 file bytes.

    ``gzip_members=True`` compresses each record as its own gzip member
    (the Common Crawl convention); ``chunked_every=k > 0`` gives every
    k-th record a chunked HTTP envelope so readers prove de-chunking."""
    out = bytearray()
    for i, rec in enumerate(records):
        ts = datetime.datetime.fromtimestamp(rec["ts_ms"] / 1000.0,
                                             tz=datetime.timezone.utc)
        # WARC/1.0 dates are second-precision; sub-second inputs get the
        # WARC/1.1 fractional form (the parser accepts both)
        date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if rec["ts_ms"] % 1000 == 0
                else ts.strftime("%Y-%m-%dT%H:%M:%S.") + f"{rec['ts_ms'] % 1000:03d}Z")
        chunked = chunked_every > 0 and i % chunked_every == chunked_every - 1
        http = _http_response(rec["html"], chunked=chunked,
                              status=int(rec.get("status", 200)))
        rid = hashlib.md5(rec["url"].encode()).hexdigest()
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}"
            f"-{rid[16:20]}-{rid[20:32]}>\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode("utf-8")
        record = head + http + _CRLF + _CRLF
        out += _gzip_member(record) if gzip_members else record
    return bytes(out)


def write_warc(records: list[dict], path: str, **kwargs) -> str:
    with open(path, "wb") as f:
        f.write(build_warc(records, **kwargs))
    return path


def build_wet(records: list[dict], gzip_members: bool = True) -> bytes:
    """Records ``{url, ts_ms, text}`` → WET file bytes (the WARC
    *conversion*-record form — extracted plain text, no HTTP envelope —
    that LLM text pipelines actually consume from crawls)."""
    out = bytearray()
    for rec in records:
        ts = datetime.datetime.fromtimestamp(rec["ts_ms"] / 1000.0,
                                             tz=datetime.timezone.utc)
        date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ") if rec["ts_ms"] % 1000 == 0
                else ts.strftime("%Y-%m-%dT%H:%M:%S.") + f"{rec['ts_ms'] % 1000:03d}Z")
        body = rec["text"].encode("utf-8")
        rid = hashlib.md5(rec["url"].encode()).hexdigest()
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Record-ID: <urn:uuid:{rid[:8]}-{rid[8:12]}-{rid[12:16]}"
            f"-{rid[16:20]}-{rid[20:32]}>\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n"
            "\r\n"
        ).encode("utf-8")
        record = head + body + _CRLF + _CRLF
        out += _gzip_member(record) if gzip_members else record
    return bytes(out)


def write_wet(records: list[dict], path: str, **kwargs) -> str:
    with open(path, "wb") as f:
        f.write(build_wet(records, **kwargs))
    return path


# ---------------------------------------------------------------------------
# Parse
# ---------------------------------------------------------------------------

def _iter_gunzip_members(data: bytes):
    """Yield concatenated gzip members (the CC per-record layout) one
    decompressed member at a time — the whole archive is never resident
    decompressed at once."""
    while data:
        do = zlib.decompressobj(47)
        yield do.decompress(data) + do.flush()
        data = do.unused_data


def _parse_headers(block: bytes) -> dict[str, str]:
    """Parse CRLF header lines (after the leading version/status line has
    been split off) into a lower-cased dict."""
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
    return headers


def _dechunk(body: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while True:
        eol = body.index(_CRLF, pos)
        size = int(body[pos:eol].split(b";")[0], 16)
        pos = eol + 2
        if size == 0:
            return bytes(out)
        out += body[pos:pos + size]
        pos += size + 2     # trailing CRLF after each chunk


def _parse_http(payload: bytes) -> tuple[int, str, bytes]:
    """HTTP response bytes → (status, content_type, body)."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return 0, "", payload      # bare payload (non-HTTP record content)
    status_line, _, header_block = payload[:sep].partition(_CRLF)
    parts = status_line.split(b" ", 2)
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else 0
    headers = _parse_headers(header_block)
    body = payload[sep + 4:]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    elif "content-length" in headers:
        body = body[: int(headers["content-length"])]
    return status, headers.get("content-type", ""), body


def _parse_warc_date(s: str) -> int:
    """ISO-8601 WARC-Date (second or fractional precision) → epoch ms."""
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    dt = datetime.datetime.strptime(s, fmt).replace(tzinfo=datetime.timezone.utc)
    return int(dt.timestamp() * 1000)


class _RecordAccum:
    """Column accumulators for parsed records, drained as Arrow chunks."""

    def __init__(self) -> None:
        self.urls: list[str] = []
        self.ts: list[int] = []
        self.htmls: list[bytes] = []
        self.statuses: list[int] = []
        self.ctypes: list[str] = []

    def __len__(self) -> int:
        return len(self.urls)

    def add(self, headers: dict[str, str], payload: bytes) -> None:
        status, ctype, body = _parse_http(payload)
        self.urls.append(headers.get("warc-target-uri", ""))
        self.ts.append(_parse_warc_date(headers["warc-date"]))
        self.htmls.append(body)
        self.statuses.append(status)
        self.ctypes.append(ctype)

    def drain(self) -> pa.Table:
        t = pa.table(
            {
                "url": pa.array(self.urls, pa.string()),
                "warc_ts": pa.array(np.array(self.ts, np.int64)).cast(pa.timestamp("ms")),
                "html": pa.array(self.htmls, pa.binary()),
                "http_status": pa.array(self.statuses, pa.int32()),
                "content_type": pa.array(self.ctypes, pa.string()),
            }
        )
        self.__init__()
        return t


def iter_warc_tables(data: bytes, keep_types: tuple[str, ...] = ("response",),
                     chunk_rows: int = 2048):
    """Incrementally parse one WARC(.gz) file's bytes, yielding Arrow
    chunks of ≤ ``chunk_rows`` records.  Peak memory is bounded by one
    gzip member (CC layout: one record) plus one chunk — the whole
    archive is never resident decompressed, which is what lets a ~1 GB
    crawl file ride a single read task.

    Records are framed by their declared Content-Length (the spec's
    contract) — malformed framing raises rather than resyncing, matching
    the fail-fast retry story of ``sources/retry.py``."""
    members = (_iter_gunzip_members(data) if data[:2] == _GZIP_MAGIC
               else iter((data,)))
    acc = _RecordAccum()
    buf = bytearray()
    pos = 0
    done_members = False
    while True:
        # parse complete records off the buffer front
        progressed = True
        while progressed:
            progressed = False
            if pos + 2 <= len(buf) and buf[pos:pos + 2] == _CRLF:
                pos += 2        # inter-record blank lines
                progressed = True
                continue
            if pos + 5 <= len(buf) and not buf.startswith(b"WARC/", pos):
                raise ValueError(f"WARC framing lost at offset {pos}")
            hdr_end = buf.find(_CRLF + _CRLF, pos)
            if hdr_end < 0:
                break           # need more bytes for the header
            version_line, _, header_block = bytes(buf[pos:hdr_end]).partition(_CRLF)
            if not version_line.startswith(b"WARC/1."):
                raise ValueError(f"unsupported WARC version {version_line!r}")
            headers = _parse_headers(header_block)
            length = int(headers["content-length"])
            if hdr_end + 4 + length > len(buf):
                break           # need more bytes for the payload
            if headers.get("warc-type") in keep_types:
                acc.add(headers, bytes(buf[hdr_end + 4: hdr_end + 4 + length]))
                if len(acc) >= chunk_rows:
                    yield acc.drain()
            pos = hdr_end + 4 + length
            progressed = True
        del buf[:pos]           # drop consumed prefix, keep partial tail
        pos = 0
        if done_members:
            break
        member = next(members, None)
        if member is None:
            done_members = True
        else:
            buf += member
    if len(buf.strip(b"\r\n")):
        raise ValueError("WARC file ends with a truncated record")
    if len(acc):
        yield acc.drain()


def parse_warc(data: bytes, keep_types: tuple[str, ...] = ("response",)) -> pa.Table:
    """One WARC(.gz) file's bytes → one Arrow table of page rows (the
    convenience form of ``iter_warc_tables``; use the iterator inside
    read tasks so big archives stream)."""
    chunks = list(iter_warc_tables(data, keep_types=keep_types))
    return pa.concat_tables(chunks) if chunks else PAGE_SCHEMA.empty_table()


def _raw_binary_datasource_cls():
    """Binary file datasource that NEVER decompresses by extension: the
    engine's WARC readers need the exact on-disk bytes (the member-at-a-
    time gunzip keeps memory bounded; the CDX index addresses COMPRESSED
    byte ranges), but Ray's stock reader gunzips ``*.gz`` whole-file."""
    from ray.data._internal.datasource.binary_datasource import BinaryDatasource

    class _RawBinary(BinaryDatasource):
        def _open_input_source(self, filesystem, path, **open_args):
            buffer_size = open_args.pop("buffer_size", None)
            if buffer_size is None:
                buffer_size = self._data_context.streaming_read_buffer_size
            return filesystem.open_input_stream(
                path, buffer_size=buffer_size, compression=None)

    return _RawBinary


def _RawBinaryDatasource(paths, **kwargs):
    return _raw_binary_datasource_cls()(paths, **kwargs)


def read_warc(paths: str | list[str], keep_types: tuple[str, ...] = ("response",),
              **read_kwargs):
    """Ray Data scan over WARC files: one read task per file (the format
    ships ~1 GB/file, the natural block size), records parsed inside
    ``map_batches`` so the driver never touches payload bytes."""
    import ray.data

    ds = ray.data.read_datasource(
        _RawBinaryDatasource(paths, **read_kwargs))

    def _parse_batch(batch: pa.Table):
        got = False
        for b in batch["bytes"]:
            for chunk in iter_warc_tables(b.as_py(), keep_types=keep_types):
                got = True
                yield chunk     # generator: records stream out in bounded
                # chunks while the archive is still being decompressed
        if not got:
            yield PAGE_SCHEMA.empty_table()

    # one archive per parse task: crawls ship ~1 GB files, so a batch
    # must never hold several payloads at once
    return ds.map_batches(_parse_batch, batch_format="pyarrow", batch_size=1)


CDX_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("ms")),
        ("warc_type", pa.string()),
        ("file", pa.string()),
        ("offset", pa.int64()),
        ("length", pa.int64()),
    ]
)


def build_cdx_index(data: bytes, filename: str = "") -> pa.Table:
    """Capture index over a per-record-gzipped WARC file: one row per
    record with its (offset, length) byte range in the COMPRESSED file —
    the Common-Crawl cc-index pattern that makes a 100-TB crawl randomly
    addressable.  Only record HEADERS are parsed (payload bytes are
    skipped), so indexing is cheap relative to a full read.

    Requires the one-record-per-gzip-member layout (``build_warc``'s
    default and the CC convention); a member holding several records or
    a record spanning members raises."""
    if data[:2] != _GZIP_MAGIC:
        raise ValueError("CDX indexing requires per-record gzip members")
    urls: list[str] = []
    ts: list[int] = []
    types: list[str] = []
    offsets: list[int] = []
    lengths: list[int] = []
    pos = 0
    n = len(data)
    while pos < n:
        do = zlib.decompressobj(47)
        member = do.decompress(data[pos:]) + do.flush()
        consumed = (n - pos) - len(do.unused_data)
        body = member.lstrip(b"\r\n")
        if not body.startswith(b"WARC/1."):
            raise ValueError(f"gzip member at {pos} is not a WARC record")
        hdr_end = body.index(_CRLF + _CRLF)
        _, _, header_block = body[:hdr_end].partition(_CRLF)
        headers = _parse_headers(header_block)
        rec_end = hdr_end + 4 + int(headers["content-length"])
        if len(body[rec_end:].strip(b"\r\n")):
            raise ValueError(
                f"gzip member at {pos} holds more than one WARC record")
        urls.append(headers.get("warc-target-uri", ""))
        ts.append(_parse_warc_date(headers["warc-date"]))
        types.append(headers.get("warc-type", ""))
        offsets.append(pos)
        lengths.append(consumed)
        pos += consumed
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(np.array(ts, np.int64)).cast(pa.timestamp("ms")),
            "warc_type": pa.array(types, pa.string()),
            "file": pa.array([filename] * len(urls), pa.string()),
            "offset": pa.array(offsets, pa.int64()),
            "length": pa.array(lengths, pa.int64()),
        }
    )


def index_warc_files(paths: list[str]):
    """Ray Data scan building the capture index over many archives —
    one index task per file, header-only parse."""
    import ray.data

    ds = ray.data.read_datasource(
        _RawBinaryDatasource(paths, include_paths=True))

    def _index(batch: pa.Table):
        for p, b in zip(batch["path"].to_pylist(), batch["bytes"]):
            yield build_cdx_index(b.as_py(), filename=p)

    return ds.map_batches(_index, batch_format="pyarrow", batch_size=1)


def fetch_warc_records(index: pa.Table) -> pa.Table:
    """Random-access fetch: read ONLY the indexed byte ranges (seek +
    bounded read per record, grouped per file) and parse them — the
    0.1%-of-the-crawl access path that never scans the archive."""
    chunks = []
    df_files = index["file"].to_pylist()
    offs = index["offset"].to_pylist()
    lens = index["length"].to_pylist()
    by_file: dict[str, list[tuple[int, int]]] = {}
    for f, o, ln in zip(df_files, offs, lens):
        by_file.setdefault(f, []).append((o, ln))
    for f, ranges in by_file.items():
        with open(f, "rb") as fh:
            for o, ln in sorted(ranges):
                fh.seek(o)
                chunks.append(parse_warc(fh.read(ln),
                                         keep_types=("response", "conversion",
                                                     "warcinfo", "request",
                                                     "metadata")))
    return pa.concat_tables(chunks) if chunks else PAGE_SCHEMA.empty_table()


def read_wet(paths: str | list[str], **read_kwargs):
    """Ray Data scan over WET files (conversion records): same streaming
    reader, text decoded from the record body → ``(url, warc_ts, text)``."""
    ds = read_warc(paths, keep_types=("conversion",), **read_kwargs)

    def _to_text(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"],
                "text": batch["html"].cast(pa.string()),
            }
        )

    return ds.map_batches(_to_text, batch_format="pyarrow")


class _WarcPagePrep:
    """Actor-pool stage turning raw WARC rows into the engine's page
    schema: text extracted with the shared Arrow kernel, language
    predicted by the n-gram marker model (compiled once per actor) —
    the columns the flagship pipeline reads (``url, warc_ts, html,
    text, lang``)."""

    def __init__(self, extractor: str = "strict") -> None:
        from ..functions.textstats import LangIdModel

        self.model = LangIdModel()      # once per actor
        self.extractor = extractor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.extractor == "general":
            from ..functions.html import extract_text_general as _extract
        else:
            from ..functions.fingerprint import extract_text as _extract

        text = _extract(batch["html"])
        lang = pa.array(self.model.predict(text), pa.string())
        return pa.table(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"],
                "html": batch["html"],
                "text": text.cast(pa.string()),
                "lang": lang,
            }
        )


def warc_to_epochs(paths: list[str], out_root: str, prefix: str = "pages",
                   files_per_epoch: int = 1,
                   extractor: str = "strict") -> list[str]:
    """Bridge crawl archives into the engine's epoched-parquet stream:
    each group of ``files_per_epoch`` WARC files becomes one sealed
    ``{out_root}/{prefix}/epoch=K/`` directory (arrival order = file
    order, the Kafka-offset analog), with language predicted and text
    extracted en route.  Epochs are written behind the ``_INPROGRESS``
    marker and sealed only after the parquet lands, so a concurrently
    tailing pipeline (``run(follow=True)``) never sees a half-written
    epoch.  Returns the epoch directory paths."""
    import ray.data  # noqa: F401  (read_warc needs an initialized context)

    dirs = []
    groups = [paths[i:i + files_per_epoch]
              for i in range(0, len(paths), files_per_epoch)]
    for k, group in enumerate(groups):
        d = os.path.join(out_root, prefix, f"epoch={k:05d}")
        os.makedirs(d, exist_ok=True)
        marker = os.path.join(d, "_INPROGRESS")
        with open(marker, "w"):
            pass
        ds = read_warc(group).map_batches(
            _WarcPagePrep, fn_constructor_kwargs={"extractor": extractor},
            concurrency=(1, 4), batch_format="pyarrow")
        ds.write_parquet(d)
        os.remove(marker)       # seal: now visible to the epoch cursor
        dirs.append(d)
    return dirs
