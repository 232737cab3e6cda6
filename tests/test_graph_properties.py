"""Randomized property tests for the round-5 graph-analytics batch:
triangle census, k-core, SSSP and local clustering against dense
numpy references across many seeds (complementing the fixed-seed unit
tests in test_graphalgo.py)."""

import numpy as np
import pyarrow as pa
import pytest

import ray

from docling_graph_ray.stages.graphalgo import (
    k_core,
    local_clustering,
    sssp,
    triangle_count,
)


def _rand_graph(seed, n=25, m=70):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    A = np.zeros((n, n), bool)
    for a, b in zip(src, dst):
        if a != b:
            A[a, b] = A[b, a] = True
    return src, dst, A


def _ds(src, dst):
    return ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64())}))


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_triangle_census_property(ray_session, seed):
    src, dst, A = _rand_graph(seed)
    got = triangle_count(_ds(src, dst), num_partitions=4).to_pydict()
    Ai = A.astype(np.int64)
    assert got["n_triangles"][0] == int(
        np.trace(Ai @ Ai @ Ai) // 6)
    assert got["n_edges"][0] == int(A.sum() // 2)


@pytest.mark.parametrize("seed", [111, 222])
def test_clustering_coefficient_property(ray_session, seed):
    src, dst, A = _rand_graph(seed)
    got = local_clustering(_ds(src, dst), num_partitions=4) \
        .to_pandas().set_index("vertex")
    Ai = A.astype(np.int64)
    tri = np.diag(Ai @ Ai @ Ai) // 2
    deg = Ai.sum(axis=1)
    for v in np.flatnonzero(deg >= 2):
        assert got.loc[v, "n_tri"] == tri[v]
        assert got.loc[v, "deg"] == deg[v]


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_k_core_property(ray_session, seed):
    src, dst, A = _rand_graph(seed)
    n = A.shape[0]
    for k in (2, 3):
        got = {r["vertex"]: r["deg"] for r in
               k_core(_ds(src, dst), k=k, num_partitions=4).take_all()}
        # brute peel
        M = A.copy()
        while True:
            deg = M.sum(axis=1)
            drop = (deg > 0) & (deg < k)
            if not drop.any():
                break
            M[drop, :] = False
            M[:, drop] = False
        deg = M.sum(axis=1)
        want = {v: int(deg[v]) for v in range(n) if deg[v] >= k}
        assert got == want, (seed, k)
        # fixpoint property: every member's in-core degree >= k
        assert all(d >= k for d in got.values())


@pytest.mark.parametrize("seed", [7, 77])
def test_sssp_property(ray_session, seed):
    src, dst, A = _rand_graph(seed)
    n = A.shape[0]
    got = {r["node"]: r["dist"] for r in
           sssp(_ds(src, dst), source=0).take_all()}
    # brute BFS
    INF = 1 << 40
    d = np.full(n, INF)
    d[0] = 0
    frontier = [0]
    while frontier:
        nxt = []
        for u in frontier:
            for v in np.flatnonzero(A[u]):
                if d[v] > d[u] + 1:
                    d[v] = d[u] + 1
                    nxt.append(int(v))
        frontier = nxt
    assert got == {v: int(d[v]) for v in range(n) if d[v] < INF}
    # triangle inequality over edges within the reached set
    for u, v in zip(src, dst):
        if u in got and v in got:
            assert abs(got[u] - got[v]) <= 1
