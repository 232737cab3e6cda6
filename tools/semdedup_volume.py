"""Hot-cluster volume smoke for ``semantic_dedup`` (SemDeDup).

The within-cluster pairwise verify is quadratic BY DESIGN (that is the
method — k scales with corpus size in the paper); scale safety comes
from (a) blocked upper-triangle matmuls bounding peak memory at
``block × scanned`` floats, and (b) ``max_cluster_verify`` bounding the
quadratic work on a pathological hot cluster: members beyond the cap
pass through linearly as their own survivors with the audit count.
This smoke drives EVERYTHING into effectively one cluster (all vectors
share a dominant direction) and checks wall time grows ~linearly with
n once the cap is hit, not quadratically.

Usage: python tools/semdedup_volume.py [n] [num_cpus] [cap]
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


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 8_192
    dim = 16

    import ray
    import ray.data

    from docling_graph_ray.stages.dedup import semantic_dedup

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        base = np.ones(dim) / np.sqrt(dim)

        def gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            local = np.random.default_rng(int(ids[0]) + 7)
            # dominant shared direction + small noise: every vector
            # lands in the same centroid's cluster, cosines ~0.99+
            noise = local.standard_normal((len(ids), dim)) * 0.02
            embs = base[None, :] + noise
            return pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(embs.tolist(),
                                      pa.list_(pa.float64())),
            })

        src = ray.data.range(n, override_num_blocks=max(cpus * 4, 64)) \
            .map_batches(gen, batch_format="pyarrow").materialize()

        t0 = time.perf_counter()
        out = semantic_dedup(src, dim=dim, k=4, iters=2,
                             cosine_threshold=0.98,
                             max_cluster_verify=cap)
        n_out = out.count()
        n_dup = out.filter(lambda r: r["is_dup"]).count()
        wall = time.perf_counter() - t0
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        print(json.dumps({
            "metric": "semantic_dedup hot-cluster volume smoke",
            "rows": n, "num_cpus": cpus, "max_cluster_verify": cap,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n / wall, 0),
            "rows_out": n_out, "n_dup": n_dup,
            "driver_rss_mb": rss_mb,
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
