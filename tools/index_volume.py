"""Volume smoke for the sharded incremental-dedup index
(stages/hash_index.py) — round-2 verdict task #8: "add a volume smoke
for the sharded index (shard count vs throughput) ... flat per-row cost
to 10×".

Synthesizes word-soup docs (5% cross-duplicates), streams them through
``IncrementalDedup`` at each (rows, shards) point, reports docs/s.

Usage: python tools/index_volume.py [base_rows] [num_cpus]
Prints one JSON line: throughput at 1× and 10× volume for shard counts
4 / 8 / 16, plus marker-pool size.
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

VOCAB = [f"w{i:03d}" for i in range(500)]


def docs_table(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    lens = rng.integers(30, 120, size=n)
    words = rng.integers(0, len(VOCAB), size=int(lens.sum()))
    texts, pos = [], 0
    for ln in lens:
        texts.append(" ".join(VOCAB[w] for w in words[pos:pos + ln]))
        pos += ln
    dup = rng.random(n) < 0.05
    for i in np.flatnonzero(dup):
        if i:
            texts[i] = texts[i - 1]
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
    })


def main() -> None:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)

    import ray.data

    from docling_graph_ray.stages.hash_index import (
        IncrementalDedup, create_index)

    marker_pool = max(2, num_cpus // 8)
    out: dict[str, object] = {
        "metric": "index_volume", "base_rows": base, "num_cpus": num_cpus,
        "marker_pool": marker_pool,
    }

    for mult in (1, 10):
        n = base * mult
        ds = ray.data.from_arrow(docs_table(n, seed=mult)).repartition(
            max(8, num_cpus)).materialize()
        for n_shards in (4, 8, 16):
            shards = create_index(n_shards, mode="exact")
            try:
                t0 = time.monotonic()
                marked = ds.map_batches(
                    IncrementalDedup,
                    fn_constructor_kwargs={"shards": shards},
                    batch_format="pyarrow",
                    batch_size=1024,
                    concurrency=marker_pool,
                )
                n_seen = int(marked.sum("seen") or 0)
                dt = time.monotonic() - t0
                out[f"x{mult}_s{n_shards}_docs_per_s"] = round(n / dt)
                out[f"x{mult}_s{n_shards}_dups"] = n_seen
            finally:
                for s in shards:
                    ray.kill(s)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
