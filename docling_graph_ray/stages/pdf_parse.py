"""Stateful binary/PDF parse lane — the canonical actor-pool stage.

Analogue of the reference's ``DocumentProcessor`` (reference:
docling_graph/core/extractors/document_processor.py:127-230): a warm
parser/model stack is built ONCE per actor in ``__init__`` and reused
across batches; batches of binary documents stream through ``__call__``.

The real layout/OCR model stack is NOT available in this container
(docling / OCR libs are not installed), so the *decode* step is a
clearly-marked deterministic stub — but the Ray-side plumbing (actor
signature, batch schema in/out, spans layout, lineage columns) is real and
tested, so swapping in a real parser is a one-function change.
"""

from __future__ import annotations

import re

import pyarrow as pa

from docling_graph_ray.functions.hashing import sha256_hex
from docling_graph_ray.stages.html_extract import EXTRACT_SCHEMA, SPAN_TYPE

PDF_MAGIC = b"%PDF-"

_TEXT_PAYLOAD_RE = re.compile(rb"endobj\n(.*?)\n%%EOF", re.DOTALL)


class PdfParseActor:
    """Callable class for ``map_batches(PdfParseActor, concurrency=(m,n))``.

    ``__init__`` is the warm-state hook: in production this is where the
    layout model / OCR stack loads (expensive, once per actor).  Here it
    compiles the extraction patterns — deterministic stand-in state.
    """

    def __init__(self) -> None:
        # STUB: stands in for loading a layout-parser model stack.
        # Deterministic by construction; replace with a real PDF parser
        # (same signature) when the dependency is available.
        self._payload_re = _TEXT_PAYLOAD_RE

    def _parse_one(self, raw: bytes) -> tuple[str, str]:
        """bytes → (extracted_text, parse_status)."""
        if not raw.startswith(PDF_MAGIC):
            return "", "failed"
        m = self._payload_re.search(raw)
        if not m:
            return "", "failed"
        try:
            text = m.group(1).decode("utf-8", errors="strict")
        except UnicodeDecodeError:
            text = m.group(1).decode("utf-8", errors="replace")
            return " ".join(text.split()), "salvaged"
        return " ".join(text.split()), "ok"

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        htmls = batch.column("html").to_pylist()
        texts, shas, spans, kept, dropped, status, b_in, b_out = (
            [], [], [], [], [], [], [], []
        )
        for raw in htmls:
            raw = raw or b""
            t, st = self._parse_one(raw)
            texts.append(t)
            shas.append(sha256_hex(t))
            spans.append(
                [
                    {"span_id": 0, "start": 0, "end": len(t),
                     "kind": "pdf_text", "path": "pdf", "block_class": "pdf",
                     # geometry from the (stubbed) layout parse: page 0,
                     # full US-letter box in top-left-origin points
                     "page_no": 0, "bbox": [0, 0, 612, 792]}
                ]
                if t
                else []
            )
            kept.append(1 if t else 0)
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
