"""Hot-component volume smoke for ``minhash_cc_dedup`` (stages/dedup.py).

Pathological shape: ONE giant duplicate cluster (a fraction of the
corpus shares identical text) plus unique remainder.  Scale safety
under test: the edge list stays linear (bands × hot members, two int64
cols — never text), the bucket-min pair pass never lands a whole
bucket's Python objects on one worker (C-path group_by inside the
partition groups), and the component fold converges in O(1) rounds
because every hot edge already points at the cluster min.

Usage: python tools/minhash_cc_volume.py [n] [hot_fraction] [num_cpus]
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

WORDS = [f"w{i}" for i in range(200)]
HOT_TEXT = " ".join(f"hot{i % 37}" for i in range(60))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray
    import ray.data

    from docling_graph_ray.stages.dedup import minhash_cc_dedup

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        def gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(int(ids[0]) + 29)
            texts = []
            for i in ids:
                if (i % 1000) < hot_frac * 1000:
                    texts.append(HOT_TEXT)  # the giant dup cluster
                else:
                    texts.append(" ".join(rng.choice(WORDS, size=30)))
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": texts,
            })

        src = ray.data.range(n, override_num_blocks=max(cpus * 4, 64)) \
            .map_batches(gen, batch_format="pyarrow").materialize()

        t0 = time.perf_counter()
        out = minhash_cc_dedup(src)
        n_dup = out.filter(lambda r: r["is_dup"]).count()
        wall = time.perf_counter() - t0
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        print(json.dumps({
            "metric": "minhash_cc_dedup hot-component volume smoke",
            "rows": n, "hot_fraction": hot_frac, "num_cpus": cpus,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n / wall, 0),
            "n_dup": n_dup,
            "driver_rss_mb": rss_mb,
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
