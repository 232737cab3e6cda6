"""Approximate-nearest-neighbor similarity search over an embedding column.

Two paths (task brief "Similarity search"):

- ``brute_force_topk``: the exact baseline — the query matrix is put in
  the object store ONCE (``ray.put``) and every ``map_batches`` task reads
  it zero-copy (broadcast, never re-shipped per batch); each batch does
  one numpy matmul and emits only its per-batch top-k partials, so the
  driver-side final reduce sees ``O(num_blocks × k)`` rows, not the corpus.
- ``lsh_bucket_topk``: the scale path — random-hyperplane bucketing
  prunes the candidate set before the same matmul; only rows whose bucket
  matches a query bucket are scored.

Results are cosine similarities rounded to 6 decimals (stable across
numpy/DuckDB for value-hash comparison).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_matrix(col, dtype=np.float32) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=dtype)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def brute_force_topk(
    ds,
    queries: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_ids: list[int] | None = None,
    dtype=np.float32,
):
    """Exact cosine top-k of every query against the dataset.

    Returns a Dataset ``(query_id, vec_id, cos)`` with k rows per query.
    ``dtype=np.float32`` is the scale default; pass ``np.float64`` for
    oracle-matched precision (DuckDB computes DOUBLE[] cosines in f64)."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=dtype))
    qids = query_ids if query_ids is not None else list(range(qn.shape[0]))
    q_ref = ray.put(qn)  # broadcast once

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        embs = _normalize(_as_matrix(batch.column(emb_col), dtype))
        sims = embs @ q.T  # (n, nq)
        kk = min(k, len(ids))
        out_q, out_v, out_c = [], [], []
        for j in range(q.shape[0]):
            top = np.argpartition(-sims[:, j], kk - 1)[:kk]
            for t in top:
                out_q.append(qids[j])
                out_v.append(int(ids[t]))
                out_c.append(round(float(sims[t, j]), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")

    def final_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("cos", "descending"), (id_col, "ascending")]
        )
        return group.take(idx[:k])

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")


def lsh_bucket_topk(
    ds,
    queries: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_ids: list[int] | None = None,
    n_planes: int = 8,
    seed: int = 42,
):
    """Approximate top-k: score only rows whose hyperplane bucket matches a
    query bucket (with all 1-bit-flip neighbor buckets for recall)."""
    import ray

    qn = _normalize(np.asarray(queries, dtype=np.float32))
    dim = qn.shape[1]
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.standard_normal((dim, n_planes)).astype(np.float32)
    qids = query_ids if query_ids is not None else list(range(qn.shape[0]))

    def bucket_of(m: np.ndarray) -> np.ndarray:
        bits = (m @ planes) >= 0
        return (bits * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)

    q_buckets = set(int(b) for b in bucket_of(qn))
    # 1-bit-flip neighborhood for recall
    expanded = set(q_buckets)
    for b in q_buckets:
        for j in range(n_planes):
            expanded.add(b ^ (1 << j))
    q_ref = ray.put(qn)
    allowed = np.array(sorted(expanded), dtype=np.int64)

    def partial_topk(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = np.asarray(batch.column(id_col).to_pylist())
        embs = _normalize(_as_matrix(batch.column(emb_col)))
        buckets = bucket_of(embs)
        mask = np.isin(buckets, allowed)
        ids, embs = ids[mask], embs[mask]
        out_q, out_v, out_c = [], [], []
        if len(ids):
            sims = embs @ q.T
            kk = min(k, len(ids))
            for j in range(q.shape[0]):
                top = np.argpartition(-sims[:, j], kk - 1)[:kk]
                for t in top:
                    out_q.append(qids[j])
                    out_v.append(int(ids[t]))
                    out_c.append(round(float(sims[t, j]), 6))
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_v, pa.int64()),
                "cos": pa.array(out_c, pa.float64()),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")

    def final_topk(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("cos", "descending"), (id_col, "ascending")]
        )
        return group.take(idx[:k])

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pyarrow")
