"""BM25 ranked retrieval (stages/retrieval.py)."""

import math

import numpy as np
import pyarrow as pa

import ray

from docling_graph_ray.stages.retrieval import bm25_topk


def _bm25_brute(texts, queries, k=10, k1=1.2, b=0.75):
    docs = {i: t.split() for i, t in enumerate(texts) if t.split()}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    out = {}
    for qid, terms in queries.items():
        scores = {}
        for d, toks in docs.items():
            s = 0
            for t in sorted(set(terms)):
                tf = toks.count(t)
                if not tf:
                    continue
                df = sum(1 for v in docs.values() if t in v)
                idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
                c = idf * ((tf * (k1 + 1.0))
                           / (tf + k1 * (1.0 - b + b * (len(toks)
                                                        / avgdl))))
                s += int(np.round(np.float64(c) * np.float64(1e9)))
            if s:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[qid] = ranked[:k]
    return out


def test_bm25_matches_brute_force(ray_session):
    rng = np.random.default_rng(21)
    vocab = ["scan", "column", "join", "sort", "merge", "noise",
             "filler", "pad"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 30)))
             for _ in range(120)]
    queries = {"a": ["scan", "column"], "b": ["join", "merge"]}
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts)})).repartition(6)
    got = bm25_topk(ds, queries, k=10).to_pandas()
    want = _bm25_brute(texts, queries, k=10)
    for qid in queries:
        rows = got[got["query_id"] == qid]
        assert (list(zip(rows["doc_id"], rows["score_e9"]))
                == want[qid]), qid


def test_bm25_rare_term_outranks_common(ray_session):
    # doc 0 has the rare term; docs 1..9 share only the common one —
    # idf must put doc 0 first for a query of both terms
    texts = ["rare common"] + ["common filler"] * 9
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(10), pa.int64()),
        "text": pa.array(texts)}))
    got = bm25_topk(ds, {"q": ["rare", "common"]}, k=3).to_pandas()
    assert got.iloc[0]["doc_id"] == 0


def test_bm25_empty_corpus(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["   "])}))
    got = bm25_topk(ds, {"q": ["anything"]}, k=5)
    assert got.num_rows == 0
