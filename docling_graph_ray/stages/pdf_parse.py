"""Stateful binary/PDF parse lane — the canonical actor-pool stage.

Analogue of the reference's ``DocumentProcessor`` (reference:
docling_graph/core/extractors/document_processor.py:127-327): warm parser
state is built ONCE per actor in ``__init__`` and reused across batches;
batches of binary documents stream through ``__call__``.

The decode step is a REAL dependency-free PDF parser
(stages/pdf_codec.py): object scan, FlateDecode via zlib, BT…ET text
operators, per-page MediaBox geometry — emitting true per-line spans with
``page_no`` and top-left-origin ``bbox`` (the BOTTOMLEFT→TOPLEFT
normalization of document_processor.py:59-118).  The OCR/VLM model stack
of the reference remains out of scope in this container; scanned-image
PDFs therefore parse to no text and fall through the salvage ladder.

Salvage ladder (mirrors the HTML lane's never-throw discipline and the
reference's parse-failure handling, llm_backend.py:774-855 analogue):

1. real PDF parse → ``ok`` (or ``salvaged`` when some object/stream
   failed to decode but text was still recovered),
2. legacy inline-payload scan (the pre-round-2 synthetic shape: text
   between the last ``endobj`` and ``%%EOF``) → ``salvaged``,
3. nothing recovered but the document draws images → ``image_only``
   with empty text — the scanned-PDF signal surfaced as its own
   lineage counter (``n_image_only``) so a 100 TB run can quantify
   the OCR gap instead of folding it into ``failed``,
4. nothing recovered at all → ``failed`` with empty text — the row is
   kept.
"""

from __future__ import annotations

import re

import pyarrow as pa

from docling_graph_ray.functions.hashing import sha256_hex
from docling_graph_ray.stages.html_extract import EXTRACT_SCHEMA, SPAN_TYPE
from docling_graph_ray.stages.pdf_codec import parse_pdf

PDF_MAGIC = b"%PDF-"

_TEXT_PAYLOAD_RE = re.compile(rb"endobj\n(.*?)\n%%EOF", re.DOTALL)


def assemble_pdf_text(parsed: dict) -> tuple[str, list[dict]]:
    """Parsed pages → (full text, span rows).

    Lines join with ``\\n`` inside a page; pages join with ``\\n\\n``.
    One span per text line with char offsets into the full text, real
    ``page_no`` and top-left ``bbox`` — the ChunkRecord/SourceAnchor
    analogue (core/provenance/models.py:126-172)."""
    parts: list[str] = []
    spans: list[dict] = []
    pos = 0
    sid = 0
    for p in parsed["pages"]:
        if parts and p["lines"]:
            parts.append("\n\n")
            pos += 2
        for j, line in enumerate(p["lines"]):
            if j > 0:
                parts.append("\n")
                pos += 1
            t = line["text"]
            spans.append({
                "span_id": sid, "start": pos, "end": pos + len(t),
                "kind": "pdf_line", "path": f"p{p['page_no']}",
                "block_class": "pdf",
                "page_no": p["page_no"], "bbox": line["bbox"],
            })
            parts.append(t)
            pos += len(t)
            sid += 1
    return "".join(parts), spans


class PdfParseActor:
    """Callable class for ``map_batches(PdfParseActor, concurrency=(m,n))``.

    ``__init__`` is the warm-state hook: in a full deployment this is
    where the OCR/layout model stack loads (expensive, once per actor).
    The dependency-free parser needs only its compiled patterns — still
    built once per actor and shared across batches.
    """

    def __init__(self) -> None:
        self._payload_re = _TEXT_PAYLOAD_RE

    def _parse_one(self, raw: bytes) -> tuple[str, str, list[dict]]:
        """bytes → (extracted_text, parse_status, spans)."""
        if not raw.startswith(PDF_MAGIC):
            return "", "failed", []
        parsed = parse_pdf(raw)
        if parsed["status"] not in ("failed", "image_only"):
            text, spans = assemble_pdf_text(parsed)
            if text:
                return text, parsed["status"], spans
        # salvage rung: legacy inline payload between endobj and %%EOF.
        # Only for NON-structural payloads (no page tree found) — on a
        # real but textless PDF the pattern would otherwise swallow the
        # xref/trailer tail as "text"
        m = None if parsed["pages"] else self._payload_re.search(raw)
        if m:
            text = " ".join(
                m.group(1).decode("utf-8", errors="replace").split()
            )
            if text:
                spans = [{
                    "span_id": 0, "start": 0, "end": len(text),
                    "kind": "pdf_text", "path": "pdf", "block_class": "pdf",
                    "page_no": 0, "bbox": [0, 0, 612, 792],
                }]
                return text, "salvaged", spans
        if parsed["status"] == "image_only":
            return "", "image_only", []
        return "", "failed", []

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        htmls = batch.column("html").to_pylist()
        texts, shas, spans, kept, dropped, status, b_in, b_out = (
            [], [], [], [], [], [], [], []
        )
        for raw in htmls:
            raw = raw or b""
            t, st, sp = self._parse_one(raw)
            texts.append(t)
            shas.append(sha256_hex(t))
            spans.append(sp)
            kept.append(len(sp))
            dropped.append(0)
            status.append(st)
            b_in.append(len(raw))
            b_out.append(len(t.encode("utf-8")))
        return pa.Table.from_arrays(
            [
                urls,
                batch.column("warc_ts"),
                batch.column("lang"),
                pa.array(texts, pa.large_string()),
                pa.array(shas, pa.string()),
                pa.array(spans, pa.list_(SPAN_TYPE)),
                pa.array(kept, pa.int32()),
                pa.array(dropped, pa.int32()),
                pa.array(status, pa.string()),
                pa.array(b_in, pa.int64()),
                pa.array(b_out, pa.int64()),
            ],
            schema=EXTRACT_SCHEMA,
        )
