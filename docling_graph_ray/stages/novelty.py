"""Cross-document n-gram novelty scoring — how much of a document is
boilerplate the rest of the corpus already contains?

WIMBD-style corpus analysis (Elazar et al. 2024, arXiv:2310.20707
"What's In My Big Data?" counts duplicated n-grams across web corpora;
the memorization literature uses the same signal to find templated /
boilerplate text).  Per document: the fraction of its DISTINCT
n-grams that occur in at least ``min_docs`` distinct documents.  A
novelty ratio near 0 marks mirrored/templated pages that exact and
near-dup passes miss because the duplication is partial.

Ray-Data-first, nothing text-sized ever shuffles:

1. **GRAM** pass — one ``map_batches`` emits the distinct hashed
   n-grams of each document as narrow ``(doc_id, h)`` int64 rows
   (crc32 of the space-joined gram — the oracle-expressible hash
   family every dedup stage here uses).
2. **DOC-FREQUENCY** — ``groupby(h).count()``: how many documents
   carry each gram (inputs are per-doc distinct, so count = doc
   frequency).
3. **ATTACH** — the df column rides back onto the gram rows via
   ``lookup_join_auto`` (hash co-group at scale; the df table is
   vocabulary-sized and can NEVER broadcast at corpus scale —
   ``probe_rows`` stays None so the shuffle path is the default).
4. **FOLD** — a C-path grouped aggregate per doc_id counts grams and
   common grams; the ratio is computed vectorized at the end.

Skew: a white-hot gram ("the quick brown fox" on every page) is ONE
row in the df table and never concentrates work; per-doc groups are
bounded by the doc's own gram count.

The gram table is consumed twice (df count + join probe), so it
materializes once into the object store — 16 B/gram, spillable; the
alternative (re-tokenize the corpus for the second pass) trades one
narrow cached table for a second full text scan and loses on both
I/O and CPU at every scale we measured.

Determinism / oracle notes: crc32 hashing is the recursive-CTE-
expressible family; per-doc distinctness happens at the HASH level on
both sides (a collision merges two grams identically in engine and
SQL); the ratio rounds to ``round_digits``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from docling_graph_ray.stages.joins import lookup_join_auto

__all__ = ["ngram_novelty"]


def _doc_gram_hashes(text: str | None, n: int) -> np.ndarray:
    """Distinct (sorted) crc32 hashes of the doc's word n-grams."""
    words = (text or "").split()
    if len(words) < n:
        return np.empty(0, np.int64)
    hs = {
        zlib.crc32(" ".join(words[i: i + n]).encode())
        for i in range(len(words) - n + 1)
    }
    return np.fromiter(sorted(hs), np.int64, count=len(hs))


def ngram_novelty(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_docs: int = 2,
    round_digits: int = 6,
):
    """Score every document's n-gram novelty against the whole corpus.

    Returns ``(id, n_grams, n_common, novelty_ratio)`` rows:
    ``n_grams`` distinct n-grams, ``n_common`` of them occurring in
    ≥ ``min_docs`` documents, ``novelty_ratio = 1 − n_common/n_grams``
    (documents with < n words score 1.0 — nothing to be common)."""

    def grams(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        out_id, out_h = [], []
        for i, t in enumerate(texts):
            hs = _doc_gram_hashes(t, n)
            out_id.append(np.full(len(hs), ids[i], np.int64))
            out_h.append(hs)
        return pa.table({
            id_col: pa.array(
                np.concatenate(out_id) if out_id else [], pa.int64()),
            "h": pa.array(
                np.concatenate(out_h) if out_h else [], pa.int64()),
        })

    # docs with < n words emit no gram rows and vanish from the
    # groupby — they re-attach at the end with the defined
    # (1.0, 0, 0) score so the operator is total over its input
    def shorts(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        mask = [len((t or "").split()) < n for t in texts]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[
            np.asarray(mask, bool)]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "n_grams": pa.array(np.zeros(len(ids), np.int64)),
            "n_common": pa.array(np.zeros(len(ids), np.int64)),
            "novelty_ratio": pa.array(np.ones(len(ids), np.float64)),
        })

    gram_rows = ds.map_batches(grams, batch_format="pyarrow").materialize()
    if gram_rows.count() == 0:  # degenerate: every doc is < n words
        return ds.map_batches(shorts, batch_format="pyarrow")
    # per-doc-distinct rows ⇒ count() per hash IS document frequency
    df = gram_rows.groupby("h").count()
    attached = lookup_join_auto(
        gram_rows, df, on="h", value_cols=["count()"],
    )

    def fold(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        cnt = b.column("count()").to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: b.column(id_col),
            "n_grams": pa.array(np.ones(b.num_rows, np.int64)),
            "n_common": pa.array((cnt >= min_docs).astype(np.int64)),
        })

    per_doc = (
        attached.map_batches(fold, batch_format="pyarrow")
        .groupby(id_col)
        .sum(["n_grams", "n_common"])
    )

    def finish(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        g = b.column("sum(n_grams)").to_numpy(zero_copy_only=False)
        c = b.column("sum(n_common)").to_numpy(zero_copy_only=False)
        ratio = np.round(1.0 - c / np.maximum(g, 1), round_digits)
        return pa.table({
            id_col: b.column(id_col),
            "n_grams": pa.array(g.astype(np.int64)),
            "n_common": pa.array(c.astype(np.int64)),
            "novelty_ratio": pa.array(ratio, pa.float64()),
        })

    scored = per_doc.map_batches(finish, batch_format="pyarrow")
    return scored.union(ds.map_batches(shorts, batch_format="pyarrow"))
