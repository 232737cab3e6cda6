"""Broadcast vs shuffle join equivalence (stages/joins.py).

The broadcast fast path (``broadcast_semi_join`` / ``broadcast_lookup_join``)
must be bit-identical to the partition-bucketed shuffle path on every
semantics corner: duplicate keys on the key side, unmatched left rows,
anti mode, empty key side, string and integer keys, and the min-fold of
multi-valued lookups.  ``*_auto`` must route by ``probe_rows`` vs the
threshold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from docling_graph_ray.stages.joins import (
    broadcast_lookup_join,
    broadcast_semi_join,
    lookup_join,
    lookup_join_auto,
    semi_join,
    semi_join_auto,
)


def _left(n=4000, keys=600, seed=11):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, keys, n), pa.int64()),
        "x": pa.array(rng.integers(-50, 50, n), pa.int64()),
    })


def _keyside(keys=600, frac=0.6, dups=3, seed=13):
    rng = np.random.default_rng(seed)
    ks = rng.choice(keys, size=int(keys * frac), replace=False)
    ks = np.repeat(ks, dups)  # duplicates must not multiply left rows
    return pa.table({
        "kk": pa.array(ks, pa.int64()),
        "val": pa.array(rng.integers(0, 1000, len(ks)), pa.int64()),
        "tag": pa.array([f"t{v % 7}" for v in ks], pa.string()),
    })


def _sorted_pandas(ds):
    df = ds.to_pandas()
    return (df.sort_values(list(df.columns)).reset_index(drop=True)
            .sort_index(axis=1))


@pytest.mark.parametrize("anti", [False, True])
def test_semi_broadcast_matches_shuffle(ray_session, anti):
    import ray.data

    left = ray.data.from_arrow(_left()).repartition(5)
    keys = ray.data.from_arrow(_keyside()).repartition(3)
    a = _sorted_pandas(semi_join(left, keys, on="k", key_col="kk",
                                 anti=anti, num_partitions=8))
    b = _sorted_pandas(broadcast_semi_join(left, keys, on="k",
                                           key_col="kk", anti=anti))
    assert a.equals(b)
    assert len(a) > 0


def test_semi_empty_keyside(ray_session):
    import ray.data

    left = ray.data.from_arrow(_left(n=200))
    empty = ray.data.from_arrow(
        pa.table({"kk": pa.array([], pa.int64())}))
    kept = broadcast_semi_join(left, empty, on="k", key_col="kk")
    assert kept.count() == 0
    anti = broadcast_semi_join(left, empty, on="k", key_col="kk", anti=True)
    assert anti.count() == 200


def test_lookup_broadcast_matches_shuffle(ray_session):
    import ray.data

    left = ray.data.from_arrow(_left()).repartition(5)
    lk = ray.data.from_arrow(_keyside()).repartition(3)
    a = _sorted_pandas(lookup_join(left, lk, on="k", key_col="kk",
                                   value_cols=["val", "tag"],
                                   num_partitions=8))
    b = _sorted_pandas(broadcast_lookup_join(left, lk, on="k", key_col="kk",
                                             value_cols=["val", "tag"]))
    assert a.equals(b)
    # unmatched left rows keep nulls (frac=0.6 leaves misses)
    assert a["val"].isna().any()


def test_lookup_empty_value_cols_refused(ray_session):
    import ray.data

    left = ray.data.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    lk = ray.data.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="value_cols"):
        broadcast_lookup_join(left, lk, on="k", value_cols=[])


def test_lookup_string_keys(ray_session):
    import ray.data

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([f"u{i % 40}" for i in range(500)], pa.string()),
        "x": pa.array(range(500), pa.int64()),
    }))
    lk = ray.data.from_arrow(pa.table({
        "k": pa.array([f"u{i}" for i in range(25)] * 2, pa.string()),
        "val": pa.array(list(range(25)) + [99] * 25, pa.int64()),
    }))
    a = _sorted_pandas(lookup_join(left, lk, on="k", value_cols=["val"],
                                   num_partitions=4))
    b = _sorted_pandas(broadcast_lookup_join(left, lk, on="k",
                                             value_cols=["val"]))
    assert a.equals(b)


def test_lookup_nested_value_type(ray_session):
    """list<int64> value columns take the first-per-key sorted-run branch
    (hash aggregation does not cover nested types) — both paths must
    agree, including null attach for unmatched keys."""
    import ray.data

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 2, 1], pa.int64()),
        "x": pa.array(range(6), pa.int64()),
    })).repartition(3)
    lk = ray.data.from_arrow(pa.table({
        "k": pa.array([2, 1, 2], pa.int64()),
        "vals": pa.array([[20, 21], [10], [99]],
                         pa.list_(pa.int64())),
    })).repartition(2)
    def norm(ds):
        # arrow-level compare: Ray's to_pandas mangles ragged list cols
        t = pa.concat_tables(
            [b for b in ds.iter_batches(batch_format="pyarrow")]
        ).combine_chunks()
        t = t.take(pc.sort_indices(
            t, sort_keys=[("k", "ascending"), ("x", "ascending")]))
        return [(r["k"], r["x"],
                 "null" if r["vals"] is None else str(list(r["vals"])))
                for r in t.to_pylist()]

    a = norm(lookup_join(left, lk, on="k", value_cols=["vals"],
                         num_partitions=4))
    b = norm(broadcast_lookup_join(left, lk, on="k", value_cols=["vals"]))
    assert a == b
    assert sum(1 for r in b if r[2] == "null") == 2  # k=3,4 unmatched


def test_lookup_nested_duplicate_keys_deterministic(ray_session):
    """Duplicate keys carrying DIFFERENT nested values must resolve to
    the same winner on both paths regardless of input block order — the
    fold sorts by (key, repr(value)), not arrival order."""
    import ray.data

    left = ray.data.from_arrow(pa.table({
        "k": pa.array([7, 7, 8], pa.int64()),
        "x": pa.array([0, 1, 2], pa.int64()),
    }))
    # two orderings of the same lookup rows
    rows_a = pa.table({
        "k": pa.array([7, 7], pa.int64()),
        "vals": pa.array([[5, 5], [1, 2]], pa.list_(pa.int64())),
    })
    rows_b = rows_a.take(pa.array([1, 0], pa.int64()))
    want = "[1, 2]"  # repr-min of the two candidates

    def got(lk_tbl, fn, **kw):
        ds = fn(left, ray.data.from_arrow(lk_tbl).repartition(2),
                on="k", value_cols=["vals"], **kw)
        t = pa.concat_tables(
            [b for b in ds.iter_batches(batch_format="pyarrow")])
        return sorted((r["k"], "null" if r["vals"] is None
                       else str(list(r["vals"]))) for r in t.to_pylist())

    for tbl in (rows_a, rows_b):
        assert got(tbl, lookup_join, num_partitions=3) == \
            [(7, want), (7, want), (8, "null")]
        assert got(tbl, broadcast_lookup_join) == \
            [(7, want), (7, want), (8, "null")]


def test_auto_dispatches_expected_path(ray_session, monkeypatch):
    """probe_rows vs threshold must actually select the path, not just
    produce equal results (both paths are equivalence-tested, so a
    routing bug would otherwise be invisible)."""
    import ray.data

    from docling_graph_ray.stages import joins as J

    calls = []

    real_bsemi, real_semi = J.broadcast_semi_join, J.semi_join
    monkeypatch.setattr(J, "broadcast_semi_join",
                        lambda *a, **k: calls.append("broadcast")
                        or real_bsemi(*a, **k))
    monkeypatch.setattr(J, "semi_join",
                        lambda *a, **k: calls.append("shuffle")
                        or real_semi(*a, **k))

    left = ray.data.from_arrow(_left(n=100, keys=20))
    keys = ray.data.from_arrow(_keyside(keys=20))
    J.semi_join_auto(left, keys, on="k", key_col="kk",
                     probe_rows=30, threshold=100).count()
    assert calls == ["broadcast"]
    calls.clear()
    J.semi_join_auto(left, keys, on="k", key_col="kk",
                     probe_rows=300, threshold=100).count()
    assert calls == ["shuffle"]
    calls.clear()
    J.semi_join_auto(left, keys, on="k", key_col="kk",
                     probe_rows=None).count()
    assert calls == ["shuffle"]


def test_broadcast_byte_cap_falls_back_to_shuffle(ray_session):
    """A key/lookup side whose collected bytes exceed max_bytes must run
    the shuffle path (and still produce identical results)."""
    import ray.data

    left = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "b", "c", "a"], pa.string()),
        "x": pa.array([1, 2, 3, 4], pa.int64()),
    }))
    lk = ray.data.from_arrow(pa.table({
        "k": pa.array(["a", "b"], pa.string()),
        "val": pa.array(["V" * 4096, "W" * 4096], pa.string()),
    }))
    capped = _sorted_pandas(broadcast_lookup_join(
        left, lk, on="k", value_cols=["val"], max_bytes=64))
    normal = _sorted_pandas(broadcast_lookup_join(
        left, lk, on="k", value_cols=["val"]))
    assert capped.equals(normal)
    scapped = _sorted_pandas(broadcast_semi_join(
        left, lk, on="k", key_col="k", max_bytes=2))
    snormal = _sorted_pandas(broadcast_semi_join(
        left, lk, on="k", key_col="k"))
    assert scapped.equals(snormal)
    assert len(scapped) == 3


def test_auto_routes_by_probe_rows(ray_session):
    import ray.data

    left = ray.data.from_arrow(_left(n=300, keys=50))
    keys = ray.data.from_arrow(_keyside(keys=50))
    # tiny threshold forces the shuffle path; generous one the broadcast —
    # results must agree with each other regardless of route
    small = _sorted_pandas(semi_join_auto(left, keys, on="k", key_col="kk",
                                          probe_rows=90, threshold=10**6))
    big = _sorted_pandas(semi_join_auto(left, keys, on="k", key_col="kk",
                                        probe_rows=90, threshold=1))
    none = _sorted_pandas(semi_join_auto(left, keys, on="k", key_col="kk",
                                         probe_rows=None))
    assert small.equals(big) and big.equals(none)

    la = _sorted_pandas(lookup_join_auto(left, keys, on="k", key_col="kk",
                                         value_cols=["val"],
                                         probe_rows=90, threshold=10**6))
    lb = _sorted_pandas(lookup_join_auto(left, keys, on="k", key_col="kk",
                                         value_cols=["val"],
                                         probe_rows=90, threshold=1))
    assert la.equals(lb)
