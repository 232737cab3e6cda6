"""Structure-aware chunking with token budgets and a re-split ladder.

The reference's ``DocumentChunker`` / ``extract_chunks_with_metadata``
(docling_graph/core/extractors/document_chunker.py:130-334,
document_processor.py:375-458) re-expressed as a flat-map batch operator:
one extracted page row in → N chunk rows out, each with ``chunk_id``,
``token_count``, ``text_hash``, ``char_length``, ``resplit_of`` and the
span ids it covers (the ChunkRecord fields,
docling_graph/core/provenance/models.py:126-154).

Chunk formation:
1. pack whole spans (blocks) greedily into chunks of ≤ ``max_tokens``
   (structure preserved: a block never straddles a chunk boundary unless
   it alone exceeds the budget) — the HybridChunker peer-merge analogue;
2. an oversized single block is re-split: sentence/newline boundaries
   first, then word-level, then hard char-level halving — the reference's
   monster-segment ladder (document_chunker.py:201-334), with
   ``resplit_of`` recording the parent chunk index;
3. token counting is a deterministic whitespace+punctuation estimator
   (stateless, so the stage needs no warm tokenizer actor; swap in an HF
   tokenizer via an actor class with the same ``__call__`` if needed).

Everything is a pure function of the input text — chunk ids are stable
across reruns (chunk_id = position index; text_hash = blake2b-8 of the
chunk text, matching the reference's 8-byte chunk hash,
provenance/models.py:30-32)."""

from __future__ import annotations

import re

import pyarrow as pa

from docling_graph_ray.functions.hashing import blake2b_hex

_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
_SENT_RE = re.compile(r"(?<=[.!?])\s+|\n+")

CHUNK_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("chunk_id", pa.int32()),
        ("chunk_text", pa.large_string()),
        ("token_count", pa.int32()),
        ("char_length", pa.int32()),
        ("text_hash", pa.string()),
        ("resplit_of", pa.int32()),       # -1 = not a re-split
        ("span_ids", pa.list_(pa.int32())),
        # chunk geometry: page + union bbox of the covered spans on that
        # page (the reference's per-chunk ItemGeometry,
        # document_chunker.py _chunk_item_geometry; provenance/models.py
        # ItemGeometry).  Null when the source carries no geometry (plain
        # text / HTML without layout).
        ("page_no", pa.int32()),
        ("bbox", pa.list_(pa.int32())),
    ]
)


def _chunk_geometry(
    covered: list[dict],
) -> tuple[int | None, list[int] | None]:
    """Geometry of one chunk from its covered span dicts: the first
    span's page, and the union bbox of every covered span on that page
    (whole top-left pixels — same units the extraction lanes emit)."""
    page_no = None
    for s in covered:
        p = s.get("page_no")
        if p is not None:
            page_no = int(p)
            break
    if page_no is None:
        return None, None
    boxes = [
        s["bbox"] for s in covered
        if s.get("page_no") == page_no
        and isinstance(s.get("bbox"), list) and len(s["bbox"]) == 4
    ]
    if not boxes:
        return page_no, None
    return page_no, [
        min(int(b[0]) for b in boxes), min(int(b[1]) for b in boxes),
        max(int(b[2]) for b in boxes), max(int(b[3]) for b in boxes),
    ]


def count_tokens(text: str) -> int:
    """Deterministic token estimator: word + punctuation tokens."""
    return len(_TOKEN_RE.findall(text))


# ceiling on chars per chunk relative to the token budget: an unbroken
# 500-char "word" is 1 token but still a monster segment (the reference's
# char-level binary-search rung exists exactly for this,
# document_chunker.py:301-334)
CHARS_PER_TOKEN_CAP = 32


def _hard_split(text: str, max_tokens: int) -> list[str]:
    """Char-level binary halving until every piece fits (the last rung,
    document_chunker.py:301-334)."""
    max_chars = max_tokens * CHARS_PER_TOKEN_CAP
    if (count_tokens(text) <= max_tokens and len(text) <= max_chars) or len(text) <= 1:
        return [text]
    mid = len(text) // 2
    # prefer the nearest space to the midpoint so words survive when possible
    window = text[max(0, mid - 40):mid + 40]
    off = window.rfind(" ")
    cut = max(0, mid - 40) + off if off > 0 else mid
    left, right = text[:cut], text[cut:]
    if not left or not right:
        left, right = text[:mid], text[mid:]
    return _hard_split(left, max_tokens) + _hard_split(right, max_tokens)


def split_oversized(text: str, max_tokens: int) -> list[str]:
    """Sentence/newline split with greedy repack; word-level then
    char-level fallback for monster segments."""
    pieces: list[str] = []
    cur: list[str] = []
    cur_tokens = 0
    max_chars = max_tokens * CHARS_PER_TOKEN_CAP
    for seg in _SENT_RE.split(text):
        seg = seg.strip()
        if not seg:
            continue
        t = count_tokens(seg)
        if t > max_tokens or len(seg) > max_chars:
            if cur:
                pieces.append(" ".join(cur))
                cur, cur_tokens = [], 0
            pieces.extend(_hard_split(seg, max_tokens))
            continue
        if cur_tokens + t > max_tokens and cur:
            pieces.append(" ".join(cur))
            cur, cur_tokens = [], 0
        cur.append(seg)
        cur_tokens += t
    if cur:
        pieces.append(" ".join(cur))
    return pieces or [text]


def chunk_document(url: str, text: str, spans: list[dict] | None,
                   max_tokens: int = 512) -> list[dict]:
    """One document → chunk rows.  Spans (char ranges into ``text``) are
    packed whole; a span bigger than the budget is re-split with
    ``resplit_of`` set to its original chunk index."""
    if not text:
        return []
    if spans:
        blocks = [
            (int(s["span_id"]), text[int(s["start"]):int(s["end"])]) for s in spans
        ]
        by_id = {int(s["span_id"]): s for s in spans}
    else:
        blocks = [(-1, text)]
        by_id = {}

    chunks: list[dict] = []

    def emit(chunk_text: str, span_ids: list[int], resplit_of: int) -> None:
        page_no, bbox = _chunk_geometry(
            [by_id[i] for i in span_ids if i in by_id]
        )
        chunks.append({
            "url": url,
            "chunk_id": len(chunks),
            "chunk_text": chunk_text,
            "token_count": count_tokens(chunk_text),
            "char_length": len(chunk_text),
            "text_hash": blake2b_hex(chunk_text, digest_size=8),
            "resplit_of": resplit_of,
            "span_ids": span_ids,
            "page_no": page_no,
            "bbox": bbox,
        })

    cur_texts: list[str] = []
    cur_ids: list[int] = []
    cur_tokens = 0
    for span_id, btext in blocks:
        if not btext:
            continue
        t = count_tokens(btext)
        if t > max_tokens or len(btext) > max_tokens * CHARS_PER_TOKEN_CAP:
            if cur_texts:
                emit("\n\n".join(cur_texts), cur_ids, -1)
                cur_texts, cur_ids, cur_tokens = [], [], 0
            parent = len(chunks)
            for i, piece in enumerate(split_oversized(btext, max_tokens)):
                emit(piece, [span_id], parent if i > 0 else -1)
            continue
        if cur_tokens + t > max_tokens and cur_texts:
            emit("\n\n".join(cur_texts), cur_ids, -1)
            cur_texts, cur_ids, cur_tokens = [], [], 0
        cur_texts.append(btext)
        cur_ids.append(span_id)
        cur_tokens += t
    if cur_texts:
        emit("\n\n".join(cur_texts), cur_ids, -1)
    return chunks


def chunk_batch(max_tokens: int = 512, text_col: str = "extracted_text",
                url_col: str = "url", spans_col: str | None = "spans"):
    """flat-map ``map_batches`` UDF factory: extracted rows → chunk rows."""

    def fn(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        spans = (
            batch.column(spans_col).to_pylist()
            if spans_col and spans_col in batch.schema.names
            else [None] * len(urls)
        )
        rows: list[dict] = []
        for u, t, s in zip(urls, texts, spans):
            rows.extend(chunk_document(str(u), t or "", s, max_tokens))
        return pa.Table.from_pylist(rows, schema=CHUNK_SCHEMA)

    return fn
