"""Volume smoke for the iterative graph algorithms (CC + PageRank) at
1e7 edges — the round-2 verdict's acceptance test #9: "chain + hub
graphs at 1e7 edges ... recording per-round wall ... documented
rounds×wall curve with no geometric growth".

Graphs (deterministic, int64 node ids):

- ``chain``: node i → i+1 — worst case for label propagation diameter;
  the pointer-jump halves the effective distance per round so rounds
  stay O(log n), and per-round wall must stay FLAT (each round moves
  the same |V| label rows and |E| edge rows).
- ``hub``: star graph, every node → node 0 — worst-case key skew: ALL
  redirect traffic lands on one key's hash bucket; per-member cost must
  stay O(1) vectorized.

Usage: python tools/graph_volume.py [n_edges] [num_cpus] [algo]
  algo: cc | pagerank | both (default both)
Prints one JSON line with per-round walls.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("RAY_worker_niceness", "0")

import numpy as np
import pyarrow as pa


def chain_edges(n: int) -> pa.Table:
    src = np.arange(n, dtype=np.int64)
    return pa.table({"src": pa.array(src), "dst": pa.array(src + 1)})


def hub_edges(n: int) -> pa.Table:
    src = np.arange(1, n + 1, dtype=np.int64)
    return pa.table({"src": pa.array(src),
                     "dst": pa.array(np.zeros(n, np.int64))})


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    algo = sys.argv[3] if len(sys.argv) > 3 else "both"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)

    import ray.data

    from docling_graph_ray.stages.graphalgo import (
        connected_components, pagerank)

    out: dict[str, object] = {
        "metric": "graph_volume", "n_edges": n_edges, "num_cpus": num_cpus,
    }
    label_blocks = max(8, num_cpus)

    for shape, maker in (("chain", chain_edges), ("hub", hub_edges)):
        edges = ray.data.from_arrow(maker(n_edges)).repartition(
            num_cpus).materialize()
        rounds: list[float] = []

        def note(tag):
            def fn(i, s, total):
                rounds.append(round(s, 2))
                print(f"# {tag} round {i}: {s:.1f}s", file=sys.stderr,
                      flush=True)
            return fn

        if algo in ("cc", "both"):
            rounds = []
            t0 = time.monotonic()
            cc = connected_components(
                edges, max_rounds=40, label_blocks=label_blocks,
                on_round=note(f"cc_{shape}"))
            n_nodes = cc.count()
            out[f"cc_{shape}_total_s"] = round(time.monotonic() - t0, 2)
            out[f"cc_{shape}_rounds"] = rounds
            out[f"cc_{shape}_nodes"] = n_nodes
        if algo in ("pagerank", "both"):
            rounds = []
            t0 = time.monotonic()
            pr = pagerank(
                edges, iters=5, label_blocks=label_blocks,
                on_round=note(f"pr_{shape}"))
            n_nodes = pr.count()
            out[f"pr_{shape}_total_s"] = round(time.monotonic() - t0, 2)
            out[f"pr_{shape}_rounds"] = rounds
            out[f"pr_{shape}_nodes"] = n_nodes

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
