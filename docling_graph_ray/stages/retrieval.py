"""BM25 ranked retrieval over a document dataset.

Okapi BM25 (Robertson et al., TREC-3; public) as a two-pass dataset
pipeline — the scoring complement to the chunked inverted index
(stages/postings.py):

- pass 1 (stats): one combiner-style scan emits per-batch partials of
  document count, token count, and per-QUERY-TERM document frequency;
  the folded result is a handful of scalars (query vocabularies are
  tiny by contract, so the term set is broadcast as a plain python
  set, never shuffled);
- pass 2 (score): per batch, term frequencies for query terms only,
  per-document BM25 contributions, and a deterministic per-block
  partial top-k per query; the global top-k folds the tiny
  blocks×queries×k candidate set.

Determinism: per-term contributions are QUANTIZED to integer
nano-units (``round(x * 1e9)``) before summation, so the per-document
score is an exact int64 sum — float addition order can't perturb
ranking, and a SQL engine computing the same per-term expression
reproduces scores bit-exactly (the repo's integer-cents convention).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SCORE_SCHEMA = pa.schema([
    ("query_id", pa.string()),
    ("doc_id", pa.int64()),
    ("score_e9", pa.int64()),
])


def bm25_topk(docs, queries: dict[str, list[str]], *, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text"):
    """Top-k documents per query by BM25.

    ``queries``: {query_id: [term, ...]} — a dimension by contract
    (user queries, not data).  Returns ``(query_id, doc_id, score_e9)``
    rows, ``score_e9`` the nano-quantized integer score, top-k per
    query with (score desc, doc_id asc) tie-break."""
    from docling_graph_ray.stages.text_analysis import term_freq_batch

    term_list = sorted({t for ts in queries.values() for t in ts})
    term_set = set(term_list)

    stats_schema = pa.schema([("term", pa.string()), ("df", pa.int64()),
                              ("n_docs", pa.int64()),
                              ("n_tokens", pa.int64())])

    def stats_partial(batch: pa.Table) -> pa.Table:
        tf = term_freq_batch(batch, text_col=text_col, id_col=id_col)
        toks = tf.column("token")
        n_tokens = int(pc.sum(tf.column("tf")).as_py() or 0)
        trimmed = pc.utf8_trim_whitespace(
            pc.fill_null(batch.column(text_col), ""))
        n_docs = int(pc.sum(pc.not_equal(trimmed, "")
                            .cast(pa.int64())).as_py() or 0)
        hit = tf.filter(pc.is_in(toks, value_set=pa.array(term_list)))
        g = hit.group_by("token").aggregate([([], "count_all")])
        return pa.table({
            "term": pa.concat_arrays(
                [g.column("token").combine_chunks(),
                 pa.array([""], pa.string())]),
            "df": pa.concat_arrays(
                [g.column("count_all").cast(pa.int64()).combine_chunks(),
                 pa.array([0], pa.int64())]),
            "n_docs": pa.array([0] * g.num_rows + [n_docs], pa.int64()),
            "n_tokens": pa.array([0] * g.num_rows + [n_tokens],
                                 pa.int64()),
        }).cast(stats_schema)

    parts = docs.map_batches(stats_partial,
                             batch_format="pyarrow").take_all()
    n_docs = sum(p["n_docs"] for p in parts)
    n_tokens = sum(p["n_tokens"] for p in parts)
    df = {t: 0 for t in term_list}
    for p in parts:
        if p["term"]:
            df[p["term"]] += p["df"]
    if n_docs == 0:
        return SCORE_SCHEMA.empty_table()

    avgdl = np.float64(n_tokens) / np.float64(n_docs)
    fk1, fb = np.float64(k1), np.float64(b)
    idf = {t: np.log(np.float64(1.0)
                     + (np.float64(n_docs) - np.float64(d)
                        + np.float64(0.5))
                     / (np.float64(d) + np.float64(0.5)))
           for t, d in df.items()}

    def score_partial(batch: pa.Table) -> pa.Table:
        tf = term_freq_batch(batch, text_col=text_col, id_col=id_col)
        if tf.num_rows == 0:
            return SCORE_SCHEMA.empty_table()
        # per-doc length: tf explode is complete per batch (one doc =
        # one source row), so a batch-local sum is the exact dl
        dl_tbl = tf.group_by("doc_id").aggregate([("tf", "sum")])
        dl_map = dict(zip(dl_tbl.column("doc_id").to_pylist(),
                          dl_tbl.column("tf_sum").to_pylist()))
        hit = tf.filter(pc.is_in(tf.column("token"),
                                 value_set=pa.array(term_list)))
        if hit.num_rows == 0:
            return SCORE_SCHEMA.empty_table()
        ids = hit.column("doc_id").to_numpy(zero_copy_only=False)
        tfs = hit.column("tf").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        toks = hit.column("token").to_pylist()
        dls = np.array([dl_map[i] for i in ids], np.float64)
        idfs = np.array([idf[t] for t in toks], np.float64)
        contrib = idfs * ((tfs * (fk1 + np.float64(1.0)))
                          / (tfs + fk1 * (np.float64(1.0) - fb
                                          + fb * (dls / avgdl))))
        scaled = contrib * np.float64(1e9)
        # ROUND half-away-from-zero to match DuckDB ROUND (np.round
        # ties to even; the repo's _cents makes the same choice)
        e9 = (np.sign(scaled)
              * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
        out = {"query_id": [], "doc_id": [], "score_e9": []}
        tok_arr = np.array(toks)
        for qid, terms in queries.items():
            m = np.isin(tok_arr, list(set(terms) & term_set))
            if not m.any():
                continue
            q_ids = ids[m]
            q_e9 = e9[m]
            uniq, inv = np.unique(q_ids, return_inverse=True)
            sums = np.zeros(len(uniq), np.int64)
            np.add.at(sums, inv, q_e9)
            top = np.lexsort((uniq, -sums))[:k]
            out["query_id"].extend([qid] * len(top))
            out["doc_id"].extend(uniq[top].tolist())
            out["score_e9"].extend(sums[top].tolist())
        return pa.table({
            "query_id": pa.array(out["query_id"], pa.string()),
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "score_e9": pa.array(out["score_e9"], pa.int64()),
        })

    cands = docs.map_batches(score_partial, batch_format="pyarrow")

    def final_topk(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "doc_id" not in g.schema.names:
            return SCORE_SCHEMA.empty_table()
        idx = pc.sort_indices(g, sort_keys=[
            ("score_e9", "descending"), ("doc_id", "ascending")])
        return g.take(idx).select(
            ["query_id", "doc_id", "score_e9"]).slice(0, k)

    return (cands.groupby("query_id")
            .map_groups(final_topk, batch_format="pyarrow"))
