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
