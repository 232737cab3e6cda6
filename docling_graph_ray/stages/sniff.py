"""Content-kind detection: the multi-format ingestion router.

The reference classifies sources by extension + content sniffing — JSON
peek for a DoclingDocument ``schema_name``, ``<doclang`` XML root sniff,
PDF/graph-export detection with early error (docling_graph/core/input/
types.py:44-233 ``InputTypeDetector.detect``).  At web scale the input is
one binary column, so detection becomes a vectorized projection over
magic bytes + a bounded head-peek per row — a ``content_kind`` column the
pipeline routes on (SURVEY.md §2.1 mapping).

Kinds: pdf | gzip | doc_json | doclang_xml | xml | html | markdown | text
| empty.  ``gzip`` is reported pre-decompression (the extract stage
decompresses and re-routes); unknown binary defaults to ``text`` — the
salvage-ladder stance that no row is unroutable."""

from __future__ import annotations

import re

import pyarrow as pa

PDF_MAGIC = b"%PDF-"
GZIP_MAGIC = b"\x1f\x8b"

_HTML_RE = re.compile(rb"<!doctype\s+html|<html[\s>]", re.IGNORECASE)
_XML_DECL = b"<?xml"
_DOCLANG_RE = re.compile(rb"<doclang[\s>]", re.IGNORECASE)
_SCHEMA_NAME_RE = re.compile(rb'"schema_name"\s*:')
_MD_RE = re.compile(rb"^(#{1,6}\s|\*\s|-\s|\d+\.\s|```)", re.MULTILINE)

HEAD_BYTES = 2048


def detect_kind(raw: bytes | None) -> str:
    if not raw:
        return "empty"
    head = raw[:HEAD_BYTES]
    if head.startswith(PDF_MAGIC):
        return "pdf"
    if head.startswith(GZIP_MAGIC):
        return "gzip"
    stripped = head.lstrip()
    if stripped.startswith(b"{"):
        return "doc_json" if _SCHEMA_NAME_RE.search(head) else "text"
    if _DOCLANG_RE.search(head):
        return "doclang_xml"
    if _HTML_RE.search(head):
        return "html"
    if stripped.startswith(_XML_DECL) or stripped.startswith(b"<"):
        # XML declaration or a leading tag that is not html/doclang
        return "xml" if not _HTML_RE.search(head) else "html"
    if _MD_RE.search(head):
        return "markdown"
    return "text"


def detect_content_kind(col_name: str = "html", out_col: str = "content_kind"):
    """``map_batches`` UDF factory: append a ``content_kind`` column."""

    def fn(batch: pa.Table) -> pa.Table:
        kinds = [detect_kind(v) for v in batch.column(col_name).to_pylist()]
        return batch.append_column(out_col, pa.array(kinds, pa.string()))

    return fn
