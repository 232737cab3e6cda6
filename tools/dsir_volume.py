"""Volume smoke for ``dsir_select`` (stages/dsir.py).

Scale shape under test: the operator is TWO streaming map passes with a
single O(n_buckets) fitted model between them — no shuffle, no driver
materialization beyond the ≤ n_buckets count rows.  Throughput should
therefore be flat-to-rising with corpus size, and driver RSS flat.

Usage: python tools/dsir_volume.py [n] [num_cpus]
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

VOCAB_TGT = [f"tok{i}" for i in range(60)]
VOCAB_OTH = [f"tok{i}" for i in range(30, 90)]  # half-overlapping


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    from docling_graph_ray.stages.dsir import dsir_select

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        def gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(int(ids[0]) + 13)
            langs, texts = [], []
            for i in ids:
                tgt = (i % 2) == 0
                vocab = VOCAB_TGT if tgt else VOCAB_OTH
                words = rng.choice(vocab, size=40)
                texts.append(" ".join(words))
                langs.append("en" if tgt else "xx")
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": texts,
                "lang": langs,
            })

        src = ray.data.range(n, override_num_blocks=max(cpus * 4, 64)) \
            .map_batches(gen, batch_format="pyarrow").materialize()

        t0 = time.perf_counter()
        out = dsir_select(src, target_col="lang", target_value="en")
        n_sel = out.filter(lambda r: r["selected"]).count()
        wall = time.perf_counter() - t0
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        print(json.dumps({
            "metric": "dsir_select volume smoke",
            "rows": n, "num_cpus": cpus,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n / wall, 0),
            "n_selected": n_sel,
            "driver_rss_mb": rss_mb,
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
