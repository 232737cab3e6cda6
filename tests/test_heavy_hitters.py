"""Two-pass exact heavy hitters (stages/sketch.py:heavy_hitters) vs a
Counter brute force, including the exact-threshold boundary."""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa

import ray.data

from docling_graph_ray.stages.sketch import heavy_hitters


def _brute(texts, phi):
    c = Counter()
    for t in texts:
        c.update((t or "").split())
    n = sum(c.values())
    thr = math.ceil(phi * n)
    return {tok: cnt for tok, cnt in c.items() if cnt >= thr}


def _run(texts, phi, n_blocks=4):
    ds = ray.data.from_arrow(pa.table({"text": list(texts)})) \
        .repartition(n_blocks)
    return {r["token"]: r["n"]
            for r in heavy_hitters(ds, phi=phi).take_all()}


def test_heavy_hitters_matches_bruteforce(ray_session):
    texts = (
        ["hot hot hot warm cold"] * 5
        + ["warm tepid mild cool " + f"rare{i}" for i in range(20)]
        + ["", "   ", None]
    )
    for phi in (0.01, 0.05, 0.2):
        assert _run(texts, phi) == _brute(texts, phi), phi


def test_heavy_hitters_threshold_boundary(ray_session):
    # 100 tokens total; phi=0.05 → threshold 5: 'edge' at exactly 5
    # must be IN, 'below' at 4 must be OUT
    texts = (["edge"] * 5 + ["below"] * 4 + ["filler"] * 91)
    out = _run(texts, 0.05)
    assert "edge" in out and out["edge"] == 5
    assert "below" not in out
    assert out["filler"] == 91


def test_heavy_hitters_skewed_blocks(ray_session):
    """A heavy hitter concentrated in ONE block must still surface
    (the pigeonhole candidate rule), and a token spread thinly across
    every block below phi must not."""
    # totals: dense 40, spread 30, base 150 → N=220; phi=0.15 → thr 33:
    # dense (one block, 0.18) in; spread (every block, 0.136) out
    texts = ["dense " * 40] + ["spread base base base base base"] * 30
    out = _run(texts, 0.15, n_blocks=8)
    ref = _brute(texts, 0.15)
    assert out == ref
    assert "dense" in out and "spread" not in out


def test_heavy_hitters_empty_corpus(ray_session):
    assert _run(["", None, "   "], 0.01) == {}


# ---------------------------------------------------------------------------
# KMV distinct sketch


def test_kmv_matches_brute_and_is_accurate(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from docling_graph_ray.stages.sampling import mix32
    from docling_graph_ray.stages.sketch import kmv_distinct

    rng = np.random.default_rng(17)
    true_n = 5000
    ids = rng.choice(np.arange(true_n, dtype=np.int64) * 7 + 3,
                     size=40_000)  # heavy repeats
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array(ids, pa.int64())})).repartition(9)
    k = 256
    got = kmv_distinct(ds, col="user_id", k=k).to_pydict()

    mins = np.unique(mix32(np.unique(ids)))[:k]
    kth = int(mins[k - 1])
    assert got["kth_hash"][0] == kth
    assert got["n_mins"][0] == k
    want_est = float((np.float64(k - 1) * np.float64(4294967296.0))
                     / np.float64(kth))
    assert got["estimate"][0] == want_est
    # accuracy: relative error ~ 1/sqrt(k) ≈ 6%; allow 4 sigma
    assert abs(want_est - true_n) / true_n < 0.25


def test_kmv_small_domain_returns_exact(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from docling_graph_ray.stages.sketch import kmv_distinct

    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 2, 3, 2, 1], pa.int64())}))
    got = kmv_distinct(ds, col="user_id", k=256).to_pydict()
    assert got["n_mins"][0] == 3
    assert got["kth_hash"][0] == -1
    assert got["estimate"][0] == 3.0
