"""Verbatim anchor scanning: bind extracted values back to source text.

The reference upgrades provenance anchors to ``verbatim`` by scanning
final extracted values against the chunk texts they came from, recording
char spans; values that cannot be found stay ``derived``
(docling_graph/core/provenance/anchor_scan.py:55-134; anchor kinds
observed/verbatim/derived/reconciled in provenance/models.py:157-243).

Ray shape: a per-batch string scan over chunk rows with the value list
per document broadcast alongside (values-per-doc is small; the scan is
``str.find`` per (chunk, value) pair within one document — never a
cross-document product)."""

from __future__ import annotations

import pyarrow as pa

ANCHOR_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("value_id", pa.int32()),
        ("chunk_id", pa.int32()),
        ("kind", pa.string()),       # verbatim | verbatim_ci | derived
        ("start", pa.int64()),       # -1 when derived
        ("end", pa.int64()),
    ]
)


def scan_values(chunk_text: str, values: list[str]) -> list[dict]:
    """One chunk × its document's values → anchor fragments.

    Exact match first; casefolded fallback is recorded as
    ``verbatim_ci`` (the reference's case-tolerant rung)."""
    out = []
    lowered = None
    for vid, val in enumerate(values):
        if not val:
            continue
        pos = chunk_text.find(val)
        if pos >= 0:
            out.append({"value_id": vid, "kind": "verbatim",
                        "start": pos, "end": pos + len(val)})
            continue
        if lowered is None:
            lowered = chunk_text.casefold()
        pos = lowered.find(val.casefold())
        if pos >= 0:
            out.append({"value_id": vid, "kind": "verbatim_ci",
                        "start": pos, "end": pos + len(val)})
    return out


def anchor_scan_batch(values_by_url: dict[str, list[str]],
                      url_col: str = "url",
                      chunk_id_col: str = "chunk_id",
                      text_col: str = "chunk_text"):
    """``map_batches`` UDF factory over CHUNK rows: emits one anchor row
    per (value, chunk) hit, plus one ``derived`` row per value that no
    chunk of its document matched (resolved in a second tiny pass by the
    caller when exact bookkeeping is needed; here the per-batch scan
    emits hits only and ``derive_unanchored`` computes the remainder)."""

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        cids = batch.column(chunk_id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        rows = []
        for url, cid, text in zip(urls, cids, texts):
            vals = values_by_url.get(url)
            if not vals:
                continue
            for hit in scan_values(text or "", vals):
                rows.append({"url": url, "chunk_id": int(cid), **hit})
        return pa.Table.from_pylist(rows, schema=ANCHOR_SCHEMA)

    return fn


def derive_unanchored(anchors: list[dict],
                      values_by_url: dict[str, list[str]]) -> list[dict]:
    """Values with no verbatim hit anywhere → ``derived`` anchor rows
    (kind=derived, span -1..-1), so every value has exactly-one-or-more
    anchor rows — the ledger's completeness invariant."""
    seen = {(a["url"], a["value_id"]) for a in anchors}
    out = []
    for url, vals in values_by_url.items():
        for vid, val in enumerate(vals):
            if val and (url, vid) not in seen:
                out.append({"url": url, "value_id": vid, "chunk_id": -1,
                            "kind": "derived", "start": -1, "end": -1})
    return sorted(out, key=lambda r: (r["url"], r["value_id"]))
