"""Single-class volume smoke for ``alias_reconcile`` (VERDICT r4
next-step #8 "Done=" criterion): ONE class of n entity names must
complete with bounded worker memory — above ``max_group_rows`` only the
top-richness-K head pays the exact (pylist) path; the rest passes
through at Arrow level with the unreconciled count audited.

Usage: python tools/alias_volume.py [n] [num_cpus] [max_group_rows]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else 200_000

    import ray
    import ray.data

    from docling_graph_ray.stages.alias import alias_reconcile

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        words = np.array(["acme", "corp", "intl", "group", "beta", "nova",
                          "labs", "north", "south", "unit"])

        def gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            local = np.random.default_rng(int(ids[0]) + 13)
            w1 = words[local.integers(0, 10, len(ids))]
            w2 = words[local.integers(0, 10, len(ids))]
            # distinct trailing id => distinct digit signature => no
            # merges: the worst case for survivor-structure growth
            names = np.char.add(np.char.add(np.char.add(w1, " "), w2),
                                np.char.add(" ", ids.astype(str)))
            return pa.table({
                "cls": pa.array(np.repeat("Entity", len(ids))),
                "name": pa.array(names.astype(object), pa.string()),
                "n": pa.array(np.ones(len(ids), dtype=np.int64)),
            })

        src = ray.data.range(n, override_num_blocks=max(cpus * 4, 64)) \
            .map_batches(gen, batch_format="pyarrow").materialize()

        t0 = time.perf_counter()
        out = alias_reconcile(src, class_col="cls", name_col="name",
                              count_col="n", audit_col="n_unreconciled",
                              max_group_rows=cap)
        total = out.sum("n")
        wall = time.perf_counter() - t0
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        print(json.dumps({
            "metric": "alias_reconcile single-class volume smoke",
            "rows": n, "num_cpus": cpus, "max_group_rows": cap,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n / wall, 0),
            "count_conserved": int(total) == n,
            "driver_rss_mb": rss_mb,
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
