"""Benchmark decontamination: flag corpus documents that overlap an
evaluation/benchmark set by word n-gram containment.

The standard training-data hygiene step (popularized by GPT-3/PaLM data
cards and open reproductions): any document sharing >= 1 word n-gram
(n ~ 8..13) with a held-out benchmark is contaminated and must be
down-weighted or dropped before training, otherwise eval numbers leak.

Scale shape (the 100 TB skeleton):

- The benchmark side is SMALL by definition (eval suites are thousands
  of documents, not billions).  Its distinct n-gram set is reduced
  batch-locally (each batch emits its distinct grams only), collected
  once, and broadcast with ``ray.put`` — every scoring task reads it
  zero-copy from the object store; it is never re-shipped per batch.
- The corpus side streams: one narrow ``map_batches`` pass computing
  per-document distinct-gram counts and the intersection size against
  the broadcast set.  No shuffle at all — the only wide-ish step is the
  tiny benchmark-gram union.
- Tokenization matches the repo-wide oracle convention
  (``doc_token_counts`` / ``doc_top_tokens``): whitespace split of
  trimmed text, i.e. DuckDB ``regexp_split_to_array(TRIM(text),
  '\\s+')`` == Python ``str.split()``.

Documents with fewer than ``n`` tokens yield no n-grams and emit no
score row (mirroring the SQL GROUP BY over the gram relation).
"""

from __future__ import annotations

import pyarrow as pa


def _doc_ngrams(text: str | None, n: int) -> set[str]:
    toks = (text or "").split()
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def benchmark_ngram_set(bench, *, n: int = 8, text_col: str = "text") -> set[str]:
    """Distinct word n-grams of the benchmark dataset.

    Batch-local reduction first (each batch contributes its DISTINCT
    grams, not one row per occurrence), then a driver-side union —
    bounded by the benchmark's vocabulary, which is small by the
    operator's contract (assert-documented, not load-bearing: a 10^5-doc
    eval suite yields ~10^7 grams, comfortably driver-side)."""

    def partial(b: pa.Table) -> pa.Table:
        grams: set[str] = set()
        for t in b.column(text_col).to_pylist():
            grams |= _doc_ngrams(t, n)
        return pa.table({"g": pa.array(sorted(grams), pa.string())})

    out = set()
    for b in bench.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        out.update(b.column("g").to_pylist())
    return out


def decontaminate(docs, bench_grams: set[str], *, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text",
                  emit: str = "scores", max_frac: float = 0.0):
    """Score (or filter) a corpus against a benchmark n-gram set.

    ``emit="scores"`` returns one row per document with >= 1 n-gram:
    ``(id_col, n_grams, n_contaminated)`` where both counts are over
    DISTINCT grams.  ``emit="clean"`` instead returns the input rows
    whose contaminated fraction is <= ``max_frac`` (documents too short
    to form an n-gram are kept — they cannot leak an n-gram).

    ``bench_grams`` is broadcast once via ``ray.put``; scoring tasks
    read it zero-copy (the same pattern as ``similarity.brute_force_topk``
    queries)."""
    if emit not in ("scores", "clean"):
        raise ValueError(f"unknown emit mode: {emit!r}")
    import ray

    g_ref = ray.put(bench_grams)

    def score(batch: pa.Table) -> pa.Table:
        bench: set[str] = ray.get(g_ref)
        texts = batch.column(text_col).to_pylist()
        n_grams, n_cont = [], []
        for t in texts:
            grams = _doc_ngrams(t, n)
            n_grams.append(len(grams))
            n_cont.append(len(grams & bench) if grams else 0)
        if emit == "clean":
            keep = [
                (ng == 0) or (nc / ng <= max_frac)
                for ng, nc in zip(n_grams, n_cont)
            ]
            return batch.filter(pa.array(keep, pa.bool_()))
        t = pa.table({
            id_col: batch.column(id_col),
            "n_grams": pa.array(n_grams, pa.int64()),
            "n_contaminated": pa.array(n_cont, pa.int64()),
        })
        return t.filter(pa.compute.greater(t.column("n_grams"), 0))

    return docs.map_batches(score, batch_format="pyarrow")
