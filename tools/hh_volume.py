"""Volume smoke for ``heavy_hitters`` (stages/sketch.py).

Scale shape under test: two streaming Arrow-value_counts passes; the
pass-1 candidate collect is bounded by batches × 1/phi rows and the
pass-2 grouped sum by the candidate domain — never the vocabulary.
Throughput should be flat-to-rising with corpus size; the candidate
count must stay ~1/phi even when the long tail has millions of
distinct tokens.

Usage: python tools/hh_volume.py [n] [num_cpus]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("RAY_worker_niceness", "0")

import numpy as np
import pyarrow as pa

HEAD = [f"hh{i}" for i in range(30)]  # the genuine heavy hitters


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    from docling_graph_ray.stages.sketch import heavy_hitters

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        def gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(int(ids[0]) + 41)
            texts = []
            for i in ids:
                # 20 head tokens + 10 unique-tail tokens per doc:
                # millions of distinct tokens overall, 30 true HH
                head = rng.choice(HEAD, size=20)
                tail = [f"t{int(i)}x{j}" for j in range(10)]
                texts.append(" ".join(head) + " " + " ".join(tail))
            return pa.table({"text": texts})

        src = ray.data.range(n, override_num_blocks=max(cpus * 4, 64)) \
            .map_batches(gen, batch_format="pyarrow").materialize()

        t0 = time.perf_counter()
        out = heavy_hitters(src, phi=0.01).take_all()
        wall = time.perf_counter() - t0
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        print(json.dumps({
            "metric": "heavy_hitters volume smoke",
            "rows": n, "num_cpus": cpus,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n / wall, 0),
            "n_heavy": len(out),
            "driver_rss_mb": rss_mb,
        }))
        assert len(out) == len(HEAD), (len(out), len(HEAD))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
