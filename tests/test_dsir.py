"""DSIR importance weighting (stages/dsir.py) vs a pure-Python brute
force — independent recompute of the hashed-n-gram fit and the per-doc
log-ratio scores."""

from __future__ import annotations

import math
import zlib

import numpy as np
import pyarrow as pa

import ray.data

from docling_graph_ray.stages.dsir import (
    _feature_buckets,
    dsir_fit,
    dsir_score,
    dsir_select,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en"),
    (2, "the slow brown dog naps under the old tree", "en"),
    (3, "der schnelle braune fuchs springt hoch", "de"),
    (4, "le renard brun rapide saute haut", "fr"),
    (5, "the quick brown fox jumps again and again today", "en"),
    (6, "", "en"),          # wordless → weight 0.0, not selected
    (7, "   ", "de"),       # whitespace-only → same
    (8, "der braune hund schlaeft unter dem baum", "de"),
]
B = 512  # small bucket count → real collisions in the test


def _brute(docs, n_buckets):
    """Reference fit+score: plain dict counting + math.log."""
    tgt: dict[int, int] = {}
    raw: dict[int, int] = {}

    def feats(text):
        ws = text.split()
        out = [zlib.crc32(w.encode()) % n_buckets for w in ws]
        out += [zlib.crc32((ws[i] + " " + ws[i + 1]).encode()) % n_buckets
                for i in range(len(ws) - 1)]
        return out

    for _, text, lang in docs:
        for b in feats(text):
            raw[b] = raw.get(b, 0) + 1
            if lang == "en":
                tgt[b] = tgt.get(b, 0) + 1
    t_total, r_total = sum(tgt.values()), sum(raw.values())
    res = {}
    for doc_id, text, _ in docs:
        fs = feats(text)
        w = sum(
            math.log(tgt.get(b, 0) + 1.0) - math.log(t_total + n_buckets)
            - math.log(raw.get(b, 0) + 1.0) + math.log(r_total + n_buckets)
            for b in fs
        )
        w = round(w, 6) if fs else 0.0
        res[doc_id] = (len(fs), w, w > 0.0)
    return res


def _ds():
    ids, texts, langs = zip(*DOCS)
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": list(texts),
        "lang": list(langs),
    }))


def test_feature_buckets_unigrams_plus_bigrams():
    b = _feature_buckets("a b c", 4096)
    assert len(b) == 5  # 3 unigrams + 2 bigrams
    assert _feature_buckets("", 4096).size == 0
    assert _feature_buckets(None, 4096).size == 0
    assert _feature_buckets("solo", 4096).size == 1


def test_dsir_fit_model_shape(ray_session):
    lam = dsir_fit(_ds(), target_col="lang", target_value="en", n_buckets=B)
    assert lam.shape == (B,) and lam.dtype == np.float64
    assert np.isfinite(lam).all()


def test_dsir_select_matches_bruteforce(ray_session):
    out = dsir_select(
        _ds(), target_col="lang", target_value="en", n_buckets=B
    ).take_all()
    ref = _brute(DOCS, B)
    assert len(out) == len(DOCS)
    for r in out:
        nf, w, sel = ref[r["doc_id"]]
        assert r["n_features"] == nf, r
        assert abs(r["dsir_weight"] - w) < 1e-9, (r, w)
        assert r["selected"] == sel, (r, sel)


def test_dsir_target_docs_score_higher(ray_session):
    """English docs must dominate the selection — the operator's whole
    point: the target model prefers documents that look like it."""
    out = {r["doc_id"]: r for r in dsir_select(
        _ds(), target_col="lang", target_value="en", n_buckets=B
    ).take_all()}
    en_scores = [out[i]["dsir_weight"] for i in (1, 2, 5)]
    de_fr_scores = [out[i]["dsir_weight"] for i in (3, 4, 8)]
    assert min(en_scores) > max(de_fr_scores)
    assert all(out[i]["selected"] for i in (1, 2, 5))
    assert not out[6]["selected"] and not out[7]["selected"]


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "ein", "zwei", "drei", "the", "of"]
)
_doc = st.lists(_word, max_size=12).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(_doc, st.sampled_from(["en", "de"])),
                min_size=1, max_size=12))
def test_dsir_property_matches_bruteforce(ray_session, rows):
    docs = [(i, t, g) for i, (t, g) in enumerate(rows)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": [d[1] for d in docs],
        "lang": [d[2] for d in docs],
    }))
    out = dsir_select(ds, target_col="lang", target_value="en",
                      n_buckets=64).take_all()
    ref = _brute(docs, 64)
    for r in out:
        nf, w, sel = ref[r["doc_id"]]
        assert r["n_features"] == nf
        assert abs(r["dsir_weight"] - w) < 1e-9
        assert r["selected"] == sel


def test_dsir_score_deterministic(ray_session):
    lam = dsir_fit(_ds(), target_col="lang", target_value="en", n_buckets=B)
    a = sorted((r["doc_id"], r["dsir_weight"])
               for r in dsir_score(_ds(), lam).take_all())
    b = sorted((r["doc_id"], r["dsir_weight"])
               for r in dsir_score(_ds(), lam).take_all())
    assert a == b
