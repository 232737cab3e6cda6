"""bucketed_aggregate vs Ray's native groupby aggregates (exactness)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from docling_graph_ray.stages.bucketing import bucketed_aggregate


def _rand_table(n=5000, keys=700, seed=7):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, keys, n), pa.int64()),
        "v": pa.array(rng.integers(-100, 100, n), pa.int64()),
        "w": pa.array(rng.random(n), pa.float64()),
    })


@pytest.mark.parametrize("combine", [False, True])
def test_min_sum_count_match_pandas(ray_session, combine):
    import ray.data

    t = _rand_table()
    aggs = [("v", "min"), ("w", "sum")]
    if not combine:
        aggs.append(("", "count_all"))
    out = bucketed_aggregate(
        ray.data.from_arrow(t).repartition(6), ["k"], aggs,
        num_partitions=8, combine=combine,
    ).to_pandas().sort_values("k").reset_index(drop=True)

    df = t.to_pandas()
    want = df.groupby("k").agg(v_min=("v", "min"), w_sum=("w", "sum"),
                               n=("v", "size")).reset_index()
    assert (out["k"] == want["k"]).all()
    assert (out["v_min"] == want["v_min"]).all()
    assert np.allclose(out["w_sum"], want["w_sum"])
    if not combine:
        assert (out["count_all"] == want["n"]).all()


def test_combine_count_all(ray_session):
    import ray.data

    t = _rand_table(3000, 50)
    out = bucketed_aggregate(
        ray.data.from_arrow(t).repartition(5), ["k"],
        [("", "count_all"), ("v", "max")], combine=True,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    df = t.to_pandas()
    want = df.groupby("k").agg(n=("v", "size"), v_max=("v", "max")).reset_index()
    assert (out["count_all"] == want["n"]).all()
    assert (out["v_max"] == want["v_max"]).all()


def test_rename_and_string_keys(ray_session):
    import ray.data

    t = pa.table({
        "s": pa.array(["a", "b", "a", None, "b", None]),
        "v": pa.array([5, 2, 3, 9, 1, 4], pa.int64()),
    })
    out = bucketed_aggregate(
        ray.data.from_arrow(t).repartition(3), ["s"], [("v", "min")],
        rename=["key", "lowest"],
    ).to_pandas()
    got = {r["key"]: r["lowest"] for _, r in out.iterrows()}
    assert got == {"a": 3, "b": 1, None: 4}


def test_empty_input(ray_session):
    import ray.data

    t = pa.table({"k": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    out = bucketed_aggregate(
        ray.data.from_arrow(t), ["k"], [("v", "sum")], combine=True,
    ).to_pandas()
    assert len(out) == 0
