"""DSIR importance weighting over hashed n-gram features.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw document by the log-likelihood
ratio between a *target* distribution and the *raw* distribution,
both modeled as bag-of-hashed-n-grams multinomials, and keep the
documents the target model prefers.  This is a beyond-reference
training-data operator (no docling-graph analogue; SURVEY §7.9
family) — the deterministic small-scale twin of the fastText/CCNet
"does this look like the target domain" selection step.

Ray-Data-first, two passes over the corpus:

1. **FIT** — ``map_batches`` accumulates the hashed unigram+bigram
   counts of every block into two dense ``n_buckets`` vectors (one for
   rows matching the target predicate, one for all rows) and emits the
   nonzero buckets as partial ``(bucket, tgt_n, raw_n)`` rows; a C-path
   grouped sum folds them to ≤ ``n_buckets`` rows.  The fitted model is
   O(n_buckets) — like the CCNet bigram LM in
   ``stages/text_analysis.py``, it is tiny by contract and safe to
   collect on the driver.
2. **SCORE** — the per-bucket log-ratio vector (a few tens of KB)
   rides into a stateless ``map_batches`` closure; each document's
   weight is the occurrence-weighted sum of its features' ratios.
   Selection is a pure threshold (``weight > 0`` ⇔ the target model
   assigns the document higher likelihood), so the pass streams — no
   global sort, no shuffle anywhere in the operator.

Determinism / oracle notes: features are hashed with ``zlib.crc32``
(exactly expressible in DuckDB via the 256-entry recursive-CTE table),
the smoothed log terms are composed as separate ``log`` calls in the
same association the SQL twin uses, and weights are rounded to
``round_digits`` on both sides so summation-order drift (~1e-14)
cannot flip a comparison.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

__all__ = ["dsir_fit", "dsir_score", "dsir_select"]


def _feature_buckets(text: str | None, n_buckets: int) -> np.ndarray:
    """Hashed unigram + bigram buckets of one document (occurrence-
    weighted: repeated features repeat in the output)."""
    words = (text or "").split()
    if not words:
        return np.empty(0, np.int64)
    feats = [zlib.crc32(w.encode()) % n_buckets for w in words]
    feats += [
        zlib.crc32((words[i] + " " + words[i + 1]).encode()) % n_buckets
        for i in range(len(words) - 1)
    ]
    return np.asarray(feats, np.int64)


def dsir_fit(
    ds,
    *,
    text_col: str = "text",
    target_col: str,
    target_value,
    n_buckets: int = 4096,
):
    """Fit the target/raw hashed-n-gram models; return the per-bucket
    log-likelihood-ratio vector (float64, length ``n_buckets``).

    The target distribution is the subset of rows with
    ``row[target_col] == target_value`` — a deterministic, (SQL-
    expressible) predicate by contract; the raw distribution is every
    row.  Add-1 smoothing on both so unseen buckets are finite.
    """

    def partial_counts(batch: pa.Table) -> pa.Table:
        tgt = np.zeros(n_buckets, np.int64)
        raw = np.zeros(n_buckets, np.int64)
        texts = batch.column(text_col).to_pylist()
        is_tgt = [v == target_value for v in batch.column(target_col).to_pylist()]
        for text, t in zip(texts, is_tgt):
            b = _feature_buckets(text, n_buckets)
            if not len(b):
                continue
            np.add.at(raw, b, 1)
            if t:
                np.add.at(tgt, b, 1)
        nz = np.nonzero(raw)[0]
        return pa.table({
            "bucket": pa.array(nz, pa.int64()),
            "tgt_n": pa.array(tgt[nz], pa.int64()),
            "raw_n": pa.array(raw[nz], pa.int64()),
        })

    counts = (
        ds.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("bucket")
        .sum(["tgt_n", "raw_n"])
        .take_all()  # ≤ n_buckets rows — the model, tiny by contract
    )
    tgt = np.zeros(n_buckets, np.float64)
    raw = np.zeros(n_buckets, np.float64)
    for row in counts:
        tgt[row["bucket"]] = row["sum(tgt_n)"]
        raw[row["bucket"]] = row["sum(raw_n)"]
    t_total, r_total = float(tgt.sum()), float(raw.sum())
    # identical association to the SQL twin: four separate log terms
    lam = (
        np.log(tgt + 1.0)
        - np.log(t_total + n_buckets)
        - np.log(raw + 1.0)
        + np.log(r_total + n_buckets)
    )
    return lam


def dsir_score(
    ds,
    lam: np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
):
    """Score every document against a fitted log-ratio vector; returns
    ``(id, n_features, dsir_weight, selected)`` rows.

    ``selected`` is the streaming-safe threshold rule (weight > 0 after
    rounding); callers wanting a fixed budget sort the narrow output by
    ``(dsir_weight DESC, id)`` and take k — the output carries only two
    scalar columns, so even that sort moves no text.
    """
    n_buckets = len(lam)

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        texts = batch.column(text_col).to_pylist()
        nf = np.empty(len(texts), np.int64)
        w = np.empty(len(texts), np.float64)
        for i, text in enumerate(texts):
            b = _feature_buckets(text, n_buckets)
            nf[i] = len(b)
            w[i] = np.round(lam[b].sum(), round_digits) if len(b) else 0.0
        return pa.table({
            id_col: ids,
            "n_features": pa.array(nf),
            "dsir_weight": pa.array(w),
            "selected": pa.array(w > 0.0),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_select(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_col: str,
    target_value,
    n_buckets: int = 4096,
    round_digits: int = 6,
):
    """Composite fit → score.  Two streaming passes over the corpus;
    the only materialized intermediate is the O(n_buckets) model."""
    lam = dsir_fit(
        ds,
        text_col=text_col,
        target_col=target_col,
        target_value=target_value,
        n_buckets=n_buckets,
    )
    return dsir_score(
        ds, lam, id_col=id_col, text_col=text_col, round_digits=round_digits
    )
