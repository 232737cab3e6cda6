"""Volume smoke for the hashed linear quality classifier
(stages/classifier.py).

Scale shape under test: ONE featurize pass collapses text to the
narrow materialized working set; each of the ``iters`` GD steps is a
streaming pass over that working set whose only driver materialization
is the ≤ n_buckets+1 gradient rows; scoring is one more streaming
pass.  Per-row cost should therefore be flat with corpus size and
driver RSS flat.

Usage: python tools/clf_volume.py [n] [num_cpus]
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

    from docling_graph_ray.stages.classifier import quality_classifier

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        def gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(int(ids[0]) + 29)
            langs, texts = [], []
            for i in ids:
                tgt = (i % 2) == 0
                vocab = VOCAB_TGT if tgt else VOCAB_OTH
                texts.append(" ".join(rng.choice(vocab, size=40)))
                langs.append("en" if tgt else "xx")
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "text": texts,
                "lang": langs,
            })

        src = ray.data.range(n, override_num_blocks=max(cpus * 4, 64)) \
            .map_batches(gen, batch_format="pyarrow").materialize()

        t0 = time.perf_counter()
        out = quality_classifier(
            src, target_col="lang", target_value="en",
            n_buckets=1024, iters=10, lr=2.0,
        )
        n_pred = out.filter(lambda r: r["predicted"]).count()
        wall = time.perf_counter() - t0
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        print(json.dumps({
            "metric": "quality_classifier volume smoke (10 GD iters)",
            "rows": n, "num_cpus": cpus,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(n / wall, 0),
            "n_predicted": n_pred,
            "driver_rss_mb": rss_mb,
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
