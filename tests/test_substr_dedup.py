"""Exact-substring dedup (stages/substr_dedup.py) vs a brute-force
reference implementation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from docling_graph_ray.stages.substr_dedup import substring_exact_dedup


def brute_force(texts: dict[int, str], window: int) -> dict[int, str]:
    """Reference: count every W-token window corpus-wide; remove all
    tokens covered by any window occurring ≥2 times."""
    from collections import Counter

    counts = Counter()
    for t in texts.values():
        words = t.split(" ")
        for i in range(len(words) - window + 1):
            counts[tuple(words[i:i + window])] += 1
    out = {}
    for d, t in texts.items():
        words = t.split(" ")
        covered = np.zeros(len(words), dtype=bool)
        for i in range(len(words) - window + 1):
            if counts[tuple(words[i:i + window])] >= 2:
                covered[i:i + window] = True
        out[d] = " ".join(w for w, c in zip(words, covered) if not c)
    return out


def _run(texts: dict[int, str], window: int, ray_mod):
    t = pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
    })
    out = substring_exact_dedup(
        ray_mod.data.from_arrow(t).repartition(4), window=window,
        num_partitions=8,
    ).to_pandas().set_index("doc_id").sort_index()
    return out


def test_shared_passage_removed_everywhere(ray_session):
    import ray

    passage = " ".join(f"p{i}" for i in range(12))
    texts = {
        0: "alpha beta " + passage + " gamma delta",
        1: "one two three " + passage + " four",
        2: "totally unique words here nothing shared",
    }
    out = _run(texts, 8, ray)
    want = brute_force(texts, 8)
    for d in texts:
        assert out.loc[d, "text"] == want[d]
    # the shared 12-token passage is fully removed from BOTH docs
    assert "p0" not in out.loc[0, "text"] and "p11" not in out.loc[1, "text"]
    assert out.loc[2, "text"] == texts[2]
    assert out.loc[2, "n_removed"] == 0
    assert int(out.loc[0, "n_removed"]) == 12


def test_matches_brute_force_random(ray_session):
    import ray

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    for d in range(40):
        n = int(rng.integers(5, 60))
        texts[d] = " ".join(vocab[i] for i in rng.integers(0, 30, n))
    # inject cross-doc duplicate passages
    chunk = texts[0].split(" ")[:20]
    texts[7] = texts[7] + " " + " ".join(chunk)
    texts[9] = " ".join(chunk) + " " + texts[9]
    window = 10
    out = _run(texts, window, ray)
    want = brute_force(texts, window)
    for d in texts:
        assert out.loc[d, "text"] == want[d], d
        assert out.loc[d, "n_tokens"] == len(texts[d].split(" "))


def test_short_docs_pass_through(ray_session):
    import ray

    texts = {0: "a b c", 1: "a b c", 2: ""}
    out = _run(texts, 5, ray)
    for d in texts:
        assert out.loc[d, "text"] == texts[d]
        assert out.loc[d, "n_removed"] == 0


def test_intra_doc_repetition_counts(ray_session):
    import ray

    # the same 6-token run twice INSIDE one doc → both occurrences dup
    run = "x1 x2 x3 x4 x5 x6"
    texts = {0: f"start {run} middle {run} end", 1: "unrelated other words"}
    out = _run(texts, 6, ray)
    want = brute_force(texts, 6)
    assert out.loc[0, "text"] == want[0]
    assert out.loc[0, "n_removed"] == 12
