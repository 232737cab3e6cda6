"""Volume smoke for product quantization (``pq_train_codebooks`` +
``pq_adc_topk``).

Scale claims under test: (a) one streaming pass per Lloyd iteration
whose reduce payload is ``m × n_codes × (sub+1)`` floats per batch —
independent of corpus size; (b) the encode+ADC pass is a per-batch
numpy kernel emitting only per-block top-k partials, so throughput
should be flat-to-rising with volume and driver RSS flat; (c) the code
representation is m bytes/vector (64-dim f32 → 8 bytes, 32x).

Usage: python tools/pq_volume.py [n] [num_cpus]
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
os.environ.setdefault("RAY_DATA_DISABLE_PROGRESS_BARS", "1")

import numpy as np
import pyarrow as pa


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    dim, m, codes = 64, 8, 16

    import ray
    import ray.data

    from docling_graph_ray.stages.similarity import (
        pq_adc_topk,
        pq_train_codebooks,
    )

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        def gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            local = np.random.default_rng(int(ids[0]) + 3)
            embs = local.standard_normal((len(ids), dim)).astype(np.float32)
            return pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(embs.tolist(), pa.list_(pa.float32())),
            })

        ds = ray.data.range(n).map_batches(
            lambda b: pa.table({"id": b.column("id")}),
            batch_format="pyarrow",
        ).map_batches(gen, batch_format="pyarrow").materialize()

        t0 = time.time()
        cb = pq_train_codebooks(ds, m=m, n_codes=codes, iters=3)
        t_train = time.time() - t0

        q = np.random.default_rng(1).standard_normal((4, dim))
        t0 = time.time()
        out = pq_adc_topk(ds, q, cb, k=10, query_ids=[0, 1, 2, 3])
        rows = out.count()
        t_adc = time.time() - t0

        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        print(json.dumps({
            "n": n, "num_cpus": cpus,
            "train_sec": round(t_train, 2),
            "train_vecs_per_sec": int(3 * n / t_train),
            "adc_sec": round(t_adc, 2),
            "adc_vecs_per_sec": int(n / t_adc),
            "topk_rows": rows,
            "code_bytes_per_vec": m,
            "f32_bytes_per_vec": 4 * dim,
            "compression_x": 4 * dim // m,
            "driver_rss_mb": rss,
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
