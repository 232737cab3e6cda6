"""Cross-document n-gram novelty (stages/novelty.py) vs a pure-Python
brute force, plus the boilerplate-detection property."""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

import ray.data

from docling_graph_ray.stages.novelty import _doc_gram_hashes, ngram_novelty

BOILER = "all rights reserved contact us terms of service"
DOCS = [
    (1, "the quick brown fox jumps over the lazy dog " + BOILER),
    (2, "completely different words about distributed dataflow " + BOILER),
    (3, BOILER),                                  # pure boilerplate
    (4, "unique content nothing shared anywhere here today"),
    (5, "the quick brown fox jumps over the lazy dog"),  # dup of 1's head
    (6, "two words"),                             # < n → novelty 1.0
    (7, ""),                                      # empty → novelty 1.0
]


def _brute(docs, n=3, min_docs=2):
    grams = {i: set(
        zlib.crc32(" ".join(t.split()[j: j + n]).encode())
        for j in range(max(len(t.split()) - n + 1, 0))
    ) for i, t in docs}
    from collections import Counter
    df = Counter(h for s in grams.values() for h in s)
    out = {}
    for i, _ in docs:
        g = grams[i]
        common = sum(1 for h in g if df[h] >= min_docs)
        ratio = round(1.0 - common / len(g), 6) if g else 1.0
        out[i] = (len(g), common, ratio)
    return out


def _ds(docs=DOCS):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": [d[1] for d in docs],
    }))


def test_gram_hashes():
    assert _doc_gram_hashes("a b c d", 3).size == 2
    assert _doc_gram_hashes("a b", 3).size == 0
    assert _doc_gram_hashes(None, 3).size == 0
    h = _doc_gram_hashes("x y z x y z", 3)
    assert h.size == 3  # 4 positions, but "x y z" repeats → 3 distinct
    assert list(h) == sorted(set(h))


def test_matches_bruteforce(ray_session):
    out = {r["doc_id"]: r for r in ngram_novelty(_ds()).take_all()}
    ref = _brute(DOCS)
    assert len(out) == len(DOCS)
    for i, (g, c, ratio) in ref.items():
        assert out[i]["n_grams"] == g, i
        assert out[i]["n_common"] == c, i
        assert abs(out[i]["novelty_ratio"] - ratio) < 1e-12, i


def test_boilerplate_scores_low_unique_scores_high(ray_session):
    out = {r["doc_id"]: r for r in ngram_novelty(_ds()).take_all()}
    assert out[3]["novelty_ratio"] == 0.0       # pure shared boilerplate
    assert out[4]["novelty_ratio"] == 1.0       # fully unique
    assert out[6]["novelty_ratio"] == 1.0       # too short: defined 1.0
    assert out[7]["novelty_ratio"] == 1.0
    # partially-boilerplate docs land strictly between
    assert 0.0 < out[1]["novelty_ratio"] < 1.0
    assert out[1]["novelty_ratio"] < out[4]["novelty_ratio"]


def test_min_docs_threshold(ray_session):
    # with min_docs=4 nothing is common in this corpus except nothing
    out = {r["doc_id"]: r for r in ngram_novelty(
        _ds(), min_docs=4).take_all()}
    assert all(r["n_common"] == 0 for r in out.values())


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from(["a", "b", "c", "d", "boiler", "plate"])
_doc = st.lists(_word, max_size=10).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=10))
def test_property_matches_bruteforce(ray_session, texts):
    docs = list(enumerate(texts))
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": [d[1] for d in docs],
    }))
    out = {r["doc_id"]: r for r in ngram_novelty(ds).take_all()}
    ref = _brute(docs)
    for i, (g, c, ratio) in ref.items():
        assert out[i]["n_grams"] == g
        assert out[i]["n_common"] == c
        assert abs(out[i]["novelty_ratio"] - ratio) < 1e-12
