"""Hot-label volume smoke for ``edge_fanout`` (VERDICT r4 next-step #2
"Done=" criterion): ONE label holding n edges (the 1e9 "MENTIONS"
scenario scaled to the box) plus two small labels; the per-label fanout
stats must complete with bounded group memory and a wall that is flat
per row vs label size — never a single-worker whole-label group.

Usage: python tools/fanout_volume.py [n_hot] [num_cpus]
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

    from docling_graph_ray.stages.evaluate import edge_fanout

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        def gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            local = np.random.default_rng(int(ids[0]) + 11)
            # 97% of edges carry the one hot label; sources are zipf-ish
            # skewed over 100k ids so the per-pair partial still has a
            # hot (label, src) pair to chew on
            hot = local.random(len(ids)) < 0.97
            label = np.where(hot, "MENTIONS",
                             np.take(np.array(["CITES", "LINKS"]), ids % 2))
            src = (local.zipf(1.3, len(ids)) % 100_000).astype(np.int64)
            return pa.table({
                "label": pa.array(label.astype(object), pa.string()),
                "src": pa.array(
                    np.char.add("n", src.astype(str)).astype(object),
                    pa.string()),
            })

        total = int(n_hot / 0.97)
        src = ray.data.range(total, override_num_blocks=max(cpus * 4, 64)) \
            .map_batches(gen, batch_format="pyarrow").materialize()

        t0 = time.perf_counter()
        out = edge_fanout(src).to_pandas()
        wall = time.perf_counter() - t0
        hot_row = out.set_index("label").loc["MENTIONS"]
        print(json.dumps({
            "metric": "edge_fanout hot-label volume smoke",
            "rows": total, "hot_label_rows_approx": n_hot,
            "num_cpus": cpus,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(total / wall, 0),
            "hot_total": int(hot_row["total"]),
            "hot_sources": int(hot_row["sources"]),
            "hot_top_source_edges": int(hot_row["top_source_edges"]),
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
