"""Hashed linear quality classifier (stages/classifier.py) vs a
sequential dense-numpy reference — distributed full-batch GD must
reproduce the reference trajectory up to float summation order, and
the score pass must match a brute-force recompute exactly."""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray.data

from docling_graph_ray.stages.classifier import (
    _doc_buckets,
    logreg_fit,
    logreg_score,
    quality_classifier,
)

# Disjoint vocabularies (unlike the shared-vocab sf corpus) so the
# model has real signal: presence features perfectly separate classes.
DOCS = [
    (1, "table query merge sort filter window batch", "en"),
    (2, "merge table sort sort query window", "en"),
    (3, "fenster tabelle sortieren mischen abfrage", "de"),
    (4, "tabelle abfrage fenster mischen", "de"),
    (5, "query filter batch table merge window sort", "en"),
    (6, "", "en"),          # wordless → bias-only score
    (7, "   ", "de"),       # whitespace-only → same
    (8, "sortieren fenster tabelle abfrage mischen", "de"),
]
B = 256  # small bucket count → real collisions in the test


def _ds(docs=DOCS):
    ids, texts, langs = zip(*docs)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": list(texts),
        "lang": list(langs),
    }))


def _dense_X(docs, n_buckets):
    X = np.zeros((len(docs), n_buckets), np.float64)
    for i, (_, text, _) in enumerate(docs):
        for b in _doc_buckets(text, n_buckets):
            X[i, b] = 1.0
    return X


def _numpy_fit(docs, n_buckets, iters, lr):
    """Sequential dense full-batch GD — the trajectory the distributed
    partial-gradient fold must reproduce."""
    X = _dense_X(docs, n_buckets)
    y = np.array([1.0 if g == "en" else 0.0 for _, _, g in docs])
    n = len(docs)
    w = np.zeros(n_buckets, np.float64)
    b = 0.0
    for _ in range(iters):
        z = b + X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        resid = p - y
        w = w - lr * (X.T @ resid) / n
        b = b - lr * resid.sum() / n
    return w, b


def test_doc_buckets_distinct_sorted():
    b = _doc_buckets("a b a b c", 4096)
    assert list(b) == sorted(set(b)) and len(b) == 3  # presence, not counts
    assert _doc_buckets("", 4096).size == 0
    assert _doc_buckets(None, 4096).size == 0
    # collisions collapse: with 1 bucket everything is bucket 0
    assert list(_doc_buckets("x y z", 1)) == [0]


def test_fit_matches_numpy_reference(ray_session):
    w, b = logreg_fit(_ds(), target_col="lang", target_value="en",
                      n_buckets=B, iters=15, lr=2.0)
    wr, br = _numpy_fit(DOCS, B, iters=15, lr=2.0)
    assert np.allclose(w, wr, rtol=1e-9, atol=1e-12)
    assert abs(b - br) < 1e-12


def test_separates_disjoint_vocabularies(ray_session):
    out = {r["doc_id"]: r for r in quality_classifier(
        _ds(), target_col="lang", target_value="en",
        n_buckets=B, iters=40, lr=5.0,
    ).take_all()}
    assert all(out[i]["predicted"] for i in (1, 2, 5))
    assert not any(out[i]["predicted"] for i in (3, 4, 8))
    assert min(out[i]["clf_score"] for i in (1, 2, 5)) \
        > max(out[i]["clf_score"] for i in (3, 4, 8))


def test_score_empty_doc_is_bias_only(ray_session):
    w = np.zeros(B)
    bias = -1.25
    out = {r["doc_id"]: r for r in logreg_score(
        _ds(), w, bias).take_all()}
    for i in (6, 7):
        assert out[i]["n_feat_buckets"] == 0
        assert out[i]["clf_score"] == round(
            float(1.0 / (1.0 + np.exp(1.25))), 6)
        assert not out[i]["predicted"]


def test_score_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    w = rng.normal(size=B)
    bias = 0.3
    out = {r["doc_id"]: r for r in logreg_score(
        _ds(), w, bias).take_all()}
    for doc_id, text, _ in DOCS:
        bk = sorted({zlib.crc32(t.encode()) % B for t in text.split()})
        z = bias + sum(w[j] for j in bk)
        assert out[doc_id]["n_feat_buckets"] == len(bk)
        assert abs(out[doc_id]["clf_score"]
                   - round(1.0 / (1.0 + np.exp(-z)), 6)) < 1e-12
        assert out[doc_id]["predicted"] == (round(z, 6) >= 0.0)


def test_weights_out_dense_table(ray_session, tmp_path):
    import pyarrow.parquet as pq

    path = str(tmp_path / "w.parquet")
    quality_classifier(
        _ds(), target_col="lang", target_value="en",
        n_buckets=B, iters=5, lr=1.0, weights_out=path,
    ).take_all()
    t = pq.read_table(path)
    assert t.num_rows == B + 1
    buckets = t.column("bucket").to_pylist()
    assert buckets[-1] == -1 and buckets[:B] == list(range(B))
    assert t.column("weight").type == pa.float64()


def test_score_deterministic(ray_session):
    w, b = logreg_fit(_ds(), target_col="lang", target_value="en",
                      n_buckets=B, iters=8, lr=2.0)
    a = sorted((r["doc_id"], r["clf_score"])
               for r in logreg_score(_ds(), w, b).take_all())
    c = sorted((r["doc_id"], r["clf_score"])
               for r in logreg_score(_ds(), w, b).take_all())
    assert a == c
