"""Volume smoke for the degree-oriented triangle family
(stages/graphalgo.py:triangle_count / local_clustering / k_core).

Claims under test:
- degree orientation bounds wedge work at O(m^1.5) even with a huge
  hub: a star center generates ZERO wedges, so adding a 100k-degree
  hub to a random graph must not blow up wall or memory;
- per-edge wall is flat-to-falling as the edge count grows (fixed
  pass costs amortize);
- k_core peel rounds scale with peel depth, not graph size.

Usage: python tools/triangle_volume.py [num_cpus]
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


def edge_table(n_nodes: int, n_edges: int, hub_deg: int,
               seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    if hub_deg:
        hub = n_nodes  # a fresh vertex with hub_deg spokes
        src = np.r_[src, np.full(hub_deg, hub)]
        dst = np.r_[dst, rng.integers(0, n_nodes, hub_deg)]
    return pa.table({"src": pa.array(src, pa.int64()),
                     "dst": pa.array(dst, pa.int64())})


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    import ray.data

    from docling_graph_ray.stages.graphalgo import k_core, triangle_count

    results = []
    for n_nodes, n_edges, hub in [
        (100_000, 1_000_000, 0),
        (100_000, 1_000_000, 100_000),   # same graph + one huge hub
        (400_000, 4_000_000, 0),
        (400_000, 4_000_000, 100_000),
    ]:
        t = edge_table(n_nodes, n_edges, hub, seed=5)
        ds = ray.data.from_arrow(t).repartition(64).materialize()
        t0 = time.monotonic()
        out = triangle_count(ds, num_partitions=64).to_pydict()
        dt = time.monotonic() - t0
        rate = n_edges / dt
        results.append({
            "op": "triangle_count", "n_edges": n_edges, "hub": hub,
            "n_triangles": out["n_triangles"][0], "sec": round(dt, 2),
            "edges_per_sec": int(rate),
        })
        print(json.dumps(results[-1]), flush=True)

    # k-core on the 4M mean-degree-20 graph: k=12 sits below the
    # random-graph core-emergence threshold (real multi-round peel to
    # a big core), k=16 above it (cascades to empty — exercises the
    # peeled-to-nothing path)
    t = edge_table(400_000, 4_000_000, 0, seed=5)
    ds = ray.data.from_arrow(t).repartition(64).materialize()
    for kk in (12, 16):
        t0 = time.monotonic()
        n_core = k_core(ds, k=kk, num_partitions=64).count()
        dt = time.monotonic() - t0
        results.append({"op": "k_core", "k": kk, "n_edges": 4_000_000,
                        "core_vertices": n_core, "sec": round(dt, 2)})
        print(json.dumps(results[-1]), flush=True)

    # SSSP hop distances from node 0 on the 4M graph (diameter ~5)
    from docling_graph_ray.stages.graphalgo import hits, sssp

    t0 = time.monotonic()
    n_reach = sssp(ds, source=0, num_partitions=64).count()
    results.append({"op": "sssp", "n_edges": 4_000_000,
                    "reachable": n_reach,
                    "sec": round(time.monotonic() - t0, 2)})
    print(json.dumps(results[-1]), flush=True)

    # HITS on a 4M-edge bipartite graph (100k hubs x 50k authorities)
    rngb = np.random.default_rng(6)
    tb = pa.table({
        "src": pa.array(rngb.integers(0, 100_000, 4_000_000), pa.int64()),
        "dst": pa.array(rngb.integers(1_000_000, 1_050_000, 4_000_000),
                        pa.int64())})
    dsb = ray.data.from_arrow(tb).repartition(64).materialize()
    t0 = time.monotonic()
    n_scores = hits(dsb, iters=3, num_partitions=64).count()
    results.append({"op": "hits", "n_edges": 4_000_000, "iters": 3,
                    "rows": n_scores,
                    "sec": round(time.monotonic() - t0, 2)})
    print(json.dumps(results[-1]), flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
