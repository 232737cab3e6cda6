"""Hot-class volume smoke for ``cardinality_bound`` (VERDICT r3
next-step #1 "Done=" criterion): ONE class holding n nodes (the 1e9
"WebPage" scenario scaled to the box) plus three small classes; the
per-class top-K demotion must complete with bounded group memory and a
wall that is flat per row vs class size — never a single-worker
whole-class sort.

Usage: python tools/cardbound_volume.py [n_hot] [num_cpus]
Run at two volumes for the flatness check, e.g. 2500000 then 10000000.
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


def main() -> None:
    n_hot = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    from docling_graph_ray.stages.graph import cardinality_bound

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        rng = np.random.default_rng(5)

        def gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            local = np.random.default_rng(int(ids[0]) + 5)
            # 97% of rows land in the one hot class
            hot = local.random(len(ids)) < 0.97
            cls = np.where(hot, "WebPage",
                           np.take(np.array(["Org", "Person", "Place"]),
                                   ids % 3))
            return pa.table({
                "cls": pa.array(cls.astype(object), pa.string()),
                "node_id": pa.array(ids, pa.int64()),
                "score": pa.array(local.random(len(ids))),
            })

        total = int(n_hot / 0.97)
        src = ray.data.range(total, override_num_blocks=max(cpus * 4, 64)) \
            .map_batches(gen, batch_format="pyarrow").materialize()

        t0 = time.perf_counter()
        out = cardinality_bound(src, class_col="cls", max_per_class=5,
                                rank_keys=[("score", "descending"),
                                           ("node_id", "ascending")])
        agg = out.sum("demoted")
        wall = time.perf_counter() - t0
        print(json.dumps({
            "metric": "cardinality_bound hot-class volume smoke",
            "rows": total, "hot_class_rows_approx": n_hot,
            "num_cpus": cpus, "k": 5,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(total / wall, 0),
            "demoted": int(agg),
        }))
        _ = rng
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
