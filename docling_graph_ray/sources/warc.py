"""WARC / WET crawl-container datasource for Ray Data.

Common-Crawl ships its corpus as WARC files (ISO 28500: length-prefixed
records, usually one gzip member per record) and WET files (the same
container holding ``conversion`` records of pre-extracted text).  The
north rule's input table (url, warc_ts, html, text, lang) is exactly
one WARC/WET pass away from the raw crawl, so the engine should be able
to START from the container — not only from Parquet someone else made.

Design (Ray-Data-first):

- ``WarcDatasource`` extends ``FileBasedDatasource``: Ray schedules one
  read task per file (WARC files are ~1 GB by convention — a natural
  block), and ``_read_stream`` yields bounded Arrow batches as records
  are parsed, so a worker never holds a whole decompressed file: the
  buffer high-water mark is one record + one read chunk.
- Multi-member gzip (``.warc.gz``: one member per record) decodes
  incrementally via ``zlib.decompressobj(wbits=47)``, re-armed on each
  member boundary from ``unused_data`` — the stdlib ``gzip`` module
  would need the whole stream seekable.
- ``response``/``resource`` records land their HTTP payload in ``html``
  (bytes, untouched — downstream sniff/extract owns charset + gzip
  handling, fixtures/pages.py flavor logic); ``conversion`` records
  (WET) land their body in ``text``.  Everything else (warcinfo,
  request, metadata) is skipped.  ``lang`` is null at read time — it is
  a *derived* column (stages/text_analysis.detect_language).

The writer half (``write_warc``) exists for fixtures and for exporting
an extraction run back into the interchange container; it is
deterministic (fixed mtime, sorted headers) so goldens can byte-compare.

Reference semantics: the reference ingests documents through per-format
input handlers (docling_graph/core/io/input_handlers.py) — a crawl
container is the web-scale analogue of its file-type dispatch.
"""

from __future__ import annotations

import io
import zlib
from datetime import datetime, timezone
from typing import TYPE_CHECKING, Iterator

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:
    import pyarrow.fs

WARC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_CRLF2 = b"\r\n\r\n"
# Records a crawl consumer cares about; request/metadata/warcinfo skip.
_CONTENT_TYPES = {"response", "resource", "conversion"}


def _parse_warc_date(value: str):
    """ISO-8601 WARC-Date → epoch microseconds (int) or None."""
    try:
        dt = datetime.fromisoformat(value.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1_000_000)
    except ValueError:
        return None


def _split_http_payload(body: bytes) -> bytes:
    """``response`` record body = HTTP headers + CRLFCRLF + payload.
    A body that does not look like an HTTP message passes through whole
    (``resource`` records carry the bare payload)."""
    if body[:5] in (b"HTTP/", b"http/"):
        cut = body.find(_CRLF2)
        if cut >= 0:
            return body[cut + 4 :]
    return body


class _MemberGzipReader:
    """Incremental reader over plain or multi-member-gzip byte streams.

    ``read(n)`` returns up to n decompressed bytes; multi-member gzip
    (the WARC convention: one member per record) re-arms the
    decompressor at each member boundary."""

    def __init__(self, raw, chunk_size: int = 1 << 20) -> None:
        self._raw = raw
        self._chunk = chunk_size
        head = raw.read(2)
        self._gzip = head == b"\x1f\x8b"
        self._pending = head  # compressed bytes not yet decompressed
        self._dec = zlib.decompressobj(wbits=47) if self._gzip else None
        self._eof = False

    def read(self, n: int) -> bytes:
        if not self._gzip:
            out = self._pending + self._raw.read(max(n - len(self._pending), 0))
            self._pending = b""
            return out
        out = bytearray()
        while len(out) < n:
            if not self._pending and not self._eof:
                chunk = self._raw.read(self._chunk)
                if not chunk:
                    self._eof = True
                self._pending = chunk
            if not self._pending:
                # flush any tail held by the decompressor
                out += self._dec.flush()
                break
            out += self._dec.decompress(self._pending, n - len(out))
            if self._dec.eof:  # member boundary → re-arm
                # At eof zlib reports the next member's bytes in BOTH
                # unconsumed_tail AND unused_data — unused_data is the
                # authoritative remainder.  Concatenating the two (the
                # pre-r5 code) duplicated every record whose member
                # ended inside a chunk: the dup records were silently
                # absorbed by the url dedup downstream (equal counts,
                # double decode work) and could corrupt the stream
                # outright under small read sizes ("invalid distance
                # too far back").
                self._pending = self._dec.unused_data
                self._dec = zlib.decompressobj(wbits=47)
            else:
                self._pending = self._dec.unconsumed_tail
        return bytes(out)


def iter_warc_records(stream) -> Iterator[dict]:
    """Parse WARC records from a binary stream (plain or .gz).

    Yields dicts ``{url, warc_ts, html, text}`` for response/resource/
    conversion records; skips the rest.  Tolerates leading noise between
    records (some writers pad) by scanning to the next ``WARC/`` magic.
    """
    rd = _MemberGzipReader(stream)
    buf = bytearray()

    def fill(target: int) -> bool:
        while len(buf) < target:
            chunk = rd.read(1 << 20)
            if not chunk:
                return False
            buf.extend(chunk)
        return True

    while True:
        # locate header block (read until CRLFCRLF appears or true EOF)
        while buf.find(_CRLF2) < 0:
            chunk = rd.read(1 << 20)
            if not chunk:
                return  # no complete header remains
            buf.extend(chunk)
        cut = buf.find(_CRLF2)
        start = buf.find(b"WARC/")
        if start < 0 or start > cut:
            del buf[: cut + 4]
            continue
        header_lines = bytes(buf[start:cut]).decode("utf-8", "replace").split("\r\n")
        headers: dict[str, str] = {}
        for line in header_lines[1:]:
            k, sep, v = line.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = 0
        body_start = cut + 4
        if not fill(body_start + length):
            return  # truncated record: drop
        body = bytes(buf[body_start : body_start + length])
        del buf[: body_start + length]

        rtype = headers.get("warc-type", "")
        if rtype in _CONTENT_TYPES:
            url = headers.get("warc-target-uri")
            ts = _parse_warc_date(headers.get("warc-date", ""))
            if rtype == "conversion":
                yield {
                    "url": url,
                    "warc_ts": ts,
                    "html": None,
                    "text": body.decode("utf-8", "replace"),
                }
            else:
                yield {
                    "url": url,
                    "warc_ts": ts,
                    "html": _split_http_payload(body),
                    "text": None,
                }


def _records_to_table(records: list[dict]) -> pa.Table:
    return pa.table(
        {
            "url": pa.array([r["url"] for r in records], pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in records], pa.timestamp("us")
            ),
            "html": pa.array([r["html"] for r in records], pa.binary()),
            "text": pa.array([r["text"] for r in records], pa.string()),
            "lang": pa.nulls(len(records), pa.string()),
        },
        schema=WARC_SCHEMA,
    )


def read_warc(paths, *, batch_rows: int = 1024, batch_bytes: int = 32 << 20,
              **read_kwargs):
    """``ray.data.Dataset`` over WARC/WET files in the north-rule shape
    ``(url, warc_ts, html, text, lang)``.

    One read task per file (Ray splits the file list, not the records —
    a WARC member stream has no random access); batches yield every
    ``batch_rows`` records or ``batch_bytes`` payload bytes, whichever
    first, so giant-page skew cannot balloon a single block.  1024 rows
    (~17 MB on the bench profile, still under the 32 MB byte cap) keeps
    read-output blocks comparable to the parquet lane's — 256-row
    blocks cost the downstream shuffle 4x the per-block overhead
    (r5 A/B in BASELINE.md)."""
    import ray.data

    return ray.data.read_datasource(
        WarcDatasource(paths, batch_rows=batch_rows, batch_bytes=batch_bytes),
        **read_kwargs,
    )


def _make_datasource_class():
    # Deferred import: ray.data is heavyweight and this module is also
    # used driver-free (the writer half) in tests/tools.
    from ray.data.datasource import FileBasedDatasource

    class _WarcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc", "warc.gz", "wet", "wet.gz"]

        def __init__(self, paths, *, batch_rows: int = 1024,
                     batch_bytes: int = 32 << 20, **kwargs) -> None:
            super().__init__(paths, file_extensions=self._FILE_EXTENSIONS,
                             **kwargs)
            self._batch_rows = batch_rows
            self._batch_bytes = batch_bytes

        def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
            pend: list[dict] = []
            nbytes = 0
            for rec in iter_warc_records(f):
                pend.append(rec)
                nbytes += len(rec["html"] or b"") + len(rec["text"] or "")
                if len(pend) >= self._batch_rows or nbytes >= self._batch_bytes:
                    yield _records_to_table(pend)
                    pend, nbytes = [], 0
            if pend:
                yield _records_to_table(pend)

    return _WarcDatasource


class WarcDatasource:
    """Constructor facade so ``WarcDatasource(paths, ...)`` works without
    importing ray.data at module import time."""

    def __new__(cls, paths, **kwargs):
        return _make_datasource_class()(paths, **kwargs)


# ---------------------------------------------------------------------------
# Writer half: fixtures + interchange export.


def _gzip_member(payload: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits 31 → gzip, mtime 0
    return co.compress(payload) + co.flush()


def _format_warc_ts(us) -> str:
    dt = datetime.fromtimestamp(int(us) / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def warc_record_bytes(url: str, warc_ts_us: int, payload: bytes,
                      rtype: str = "response") -> bytes:
    """One deterministic WARC/1.0 record.  ``response`` records wrap the
    payload in a minimal HTTP/1.1 200 message (what crawlers store);
    ``conversion`` records carry the payload bare (WET)."""
    if rtype == "response":
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Content-Length: " + str(len(payload)).encode() + _CRLF2
            + payload
        )
        ctype = 'application/http; msgtype=response'
    else:
        body = payload
        ctype = "text/plain"
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {_format_warc_ts(warc_ts_us)}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return headers + body + _CRLF2


def write_warc(path: str, table: pa.Table, *, gzip_members: bool = True,
               rtype: str = "response") -> int:
    """Write rows of a (url, warc_ts, html|text, …) table as a WARC/WET
    file (one gzip member per record when ``gzip_members``).  Returns the
    record count.  Deterministic bytes for fixed input."""
    ts = table.column("warc_ts").cast(pa.int64()).to_pylist()
    urls = table.column("url").to_pylist()
    if rtype == "conversion":
        payloads = [
            (t or "").encode("utf-8") for t in table.column("text").to_pylist()
        ]
    else:
        payloads = [bytes(h or b"") for h in table.column("html").to_pylist()]
    n = 0
    with open(path, "wb") as out:
        for url, t, payload in zip(urls, ts, payloads):
            rec = warc_record_bytes(url, t or 0, payload, rtype=rtype)
            out.write(_gzip_member(rec) if gzip_members else rec)
            n += 1
    return n


def warc_fixture_dir(n: int, seed: int = 42, profile: str = "t1",
                     files: int = 4, gzip_members: bool = True) -> str:
    """Materialize n synthetic pages as a directory of .warc.gz files
    under /tmp ONCE and reuse (cache key covers generator + this module's
    source), mirroring fixtures.pages.pages_parquet_dir."""
    import hashlib
    import os
    from pathlib import Path

    from docling_graph_ray.fixtures import pages as pages_mod
    from docling_graph_ray.fixtures.pages import make_pages_table

    src = Path(pages_mod.__file__).read_bytes() + Path(__file__).read_bytes()
    key = hashlib.sha256(
        src + f"{n}:{seed}:{profile}:{files}:{gzip_members}".encode()
    ).hexdigest()[:16]
    out_dir = f"/tmp/docling_graph_ray_warc_{key}"
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    bounds = np.linspace(0, n, files + 1).astype(int)
    ext = "warc.gz" if gzip_members else "warc"
    for i in range(files):
        idx = np.arange(bounds[i], bounds[i + 1])
        tbl = make_pages_table(idx, seed, profile)
        write_warc(os.path.join(out_dir, f"part-{i:04d}.{ext}"), tbl,
                   gzip_members=gzip_members)
    with open(done, "w") as fh:
        fh.write("ok")
    return out_dir
