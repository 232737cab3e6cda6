"""Distributed rank + Pareto deciles (stages/ranking.py)."""

import numpy as np
import pyarrow as pa

import ray

from docling_graph_ray.stages.ranking import pareto_deciles


def _brute(keys, vals, n_tiles):
    order = sorted(range(len(keys)), key=lambda i: (-vals[i], keys[i]))
    total = len(keys)
    agg = {}
    for rk, i in enumerate(order):
        d = (rk * n_tiles) // total
        nk, vs = agg.get(d, (0, 0))
        agg[d] = (nk + 1, vs + vals[i])
    out, cum = [], 0
    for d in sorted(agg):
        nk, vs = agg[d]
        cum += vs
        out.append((d, nk, vs, cum))
    return out


def test_pareto_matches_brute_force_across_blocks(ray_session):
    rng = np.random.default_rng(23)
    n = 2000
    keys = np.arange(n, dtype=np.int64)
    vals = rng.integers(1, 1_000_000, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(keys), "v": pa.array(vals)})).repartition(13)
    got = pareto_deciles(ds, val_col="v", key_col="k",
                         n_tiles=10).to_pydict()
    want = _brute(list(keys), list(vals), 10)
    assert list(zip(got["decile"], got["n_keys"], got["value_sum"],
                    got["cum_value_sum"])) == want
    # every decile holds n/10 keys; the cumulative total is the sum
    assert got["n_keys"] == [200] * 10
    assert got["cum_value_sum"][-1] == int(vals.sum())


def test_pareto_ties_break_by_key(ray_session):
    # all values equal: ranks (and deciles) determined purely by key
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(list(range(20)), pa.int64()),
        "v": pa.array([7] * 20, pa.int64())})).repartition(4)
    got = pareto_deciles(ds, val_col="v", key_col="k",
                         n_tiles=10).to_pydict()
    assert got["n_keys"] == [2] * 10
    assert got["value_sum"] == [14] * 10


def test_pareto_empty(ray_session):
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}))
    assert pareto_deciles(ds, val_col="v", key_col="k").num_rows == 0
