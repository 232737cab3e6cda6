"""Connected components (stages/graphalgo.py): min-label propagation +
pointer jumping over edge datasets."""

import pyarrow as pa
import ray

from docling_graph_ray.stages.graphalgo import connected_components


def _cc(edges):
    ds = ray.data.from_arrow(pa.table({
        "src": [a for a, _ in edges], "dst": [b for _, b in edges]}))
    rows = connected_components(ds).take_all()
    return {r["node"]: r["component"] for r in rows}


def test_two_components(ray_session):
    got = _cc([(1, 2), (2, 3), (10, 11), (12, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges_in_log_rounds(ray_session):
    # a 64-node path: naive propagation needs ~64 rounds; pointer
    # jumping must finish well inside max_rounds=25
    edges = [(i, i + 1) for i in range(64)]
    got = _cc(edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_bridge_merges_components(ray_session):
    got = _cc([(1, 2), (3, 4), (2, 3)])
    assert set(got.values()) == {1}


def test_self_loop_and_duplicate_edges(ray_session):
    got = _cc([(5, 5), (5, 6), (5, 6), (6, 5)])
    assert got == {5: 5, 6: 5}
