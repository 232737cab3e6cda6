"""stages.rangejoin — non-equi interval join via bucket replication."""

import pyarrow as pa
import pytest

import ray.data

from docling_graph_ray.stages.rangejoin import range_join


def _orders(rows):
    return ray.data.from_arrow(pa.table({
        "oid": pa.array([r[0] for r in rows], pa.int64()),
        "k": pa.array([r[1] for r in rows], pa.int64()),
        "t0": pa.array([r[2] for r in rows], pa.int64()),
    }))


def _events(rows):
    return ray.data.from_arrow(pa.table({
        "eid": pa.array([r[0] for r in rows], pa.int64()),
        "rk": pa.array([r[1] for r in rows], pa.int64()),
        "rt": pa.array([r[2] for r in rows], pa.int64()),
    }))


def _run(left, right, horizon=10):
    ds = range_join(
        left, right,
        left_key="k", right_key="rk", left_time="t0", right_time="rt",
        horizon=horizon, left_cols=["oid"], right_cols=["eid"],
    )
    df = ds.to_pandas().sort_values(["oid", "eid"]).reset_index(drop=True)
    return list(map(tuple, df[["oid", "eid"]].values))


def test_range_join_inclusive_bounds(ray_session):
    left = _orders([(1, 7, 100)])
    right = _events([(50, 7, 100), (51, 7, 110), (52, 7, 99), (53, 7, 111)])
    # [100, 110] inclusive: 50 and 51 in, 52 (before) and 53 (after) out
    assert _run(left, right) == [(1, 50), (1, 51)]


def test_range_join_no_duplicate_pairs_across_buckets(ray_session):
    # interval straddles a bucket boundary: pair must appear exactly once
    left = _orders([(1, 7, 95)])
    right = _events([(60, 7, 95), (61, 7, 100), (62, 7, 105)])
    assert _run(left, right, horizon=10) == [(1, 60), (1, 61), (1, 62)]


def test_range_join_keys_isolated(ray_session):
    left = _orders([(1, 7, 0), (2, 8, 0)])
    right = _events([(70, 7, 5), (80, 8, 5)])
    assert _run(left, right) == [(1, 70), (2, 80)]


def test_range_join_many_to_many(ray_session):
    left = _orders([(1, 7, 0), (2, 7, 5)])
    right = _events([(90, 7, 5)])
    # event at t=5 falls in both [0,10] and [5,15]
    assert _run(left, right) == [(1, 90), (2, 90)]


def test_range_join_validates_args(ray_session):
    left = _orders([(1, 7, 0)])
    right = _events([(90, 7, 5)])
    with pytest.raises(ValueError, match="horizon"):
        range_join(left, right, left_key="k", right_key="rk",
                   left_time="t0", right_time="rt", horizon=0,
                   left_cols=["oid"], right_cols=["eid"])
