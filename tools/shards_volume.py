"""Volume smoke for the binary token-shard sink
(stages/token_shards.py).

Scale shape under test: the shard — not the bucket — is the unit of
work, so no group ever exceeds seqs_per_shard × seq_len real tokens
regardless of bucket heat; the two data shuffles (placement attach,
shard co-location) should keep tokens/sec flat-to-rising with corpus
size.  A deliberately small num_buckets makes buckets hot to prove the
bound.

Usage: python tools/shards_volume.py [n_docs] [num_cpus]
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("RAY_worker_niceness", "0")

import numpy as np
import pyarrow as pa

TOKS_PER_DOC = 100


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    from docling_graph_ray.stages.token_shards import write_token_shards

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    out_dir = "/tmp/graft_shards_volume"
    shutil.rmtree(out_dir, ignore_errors=True)
    try:
        def gen(batch: pa.Table) -> pa.Table:
            ids = batch.column("id").to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(int(ids[0]) + 41)
            toks = rng.integers(0, 65536, size=(len(ids), TOKS_PER_DOC))
            return pa.table({
                "doc_id": pa.array(ids, pa.int64()),
                "toks": pa.array(toks.tolist(), pa.list_(pa.int64())),
                "n_tokens": pa.array(
                    np.full(len(ids), TOKS_PER_DOC), pa.int64()),
            })

        src = ray.data.range(n, override_num_blocks=max(cpus * 4, 64)) \
            .map_batches(gen, batch_format="pyarrow").materialize()

        t0 = time.perf_counter()
        man = write_token_shards(
            src, out_dir, seq_len=2048, seqs_per_shard=16,
            num_buckets=4,  # deliberately hot buckets
            rows_hint=n,
        ).take_all()
        wall = time.perf_counter() - t0
        total_tokens = sum(m["n_tokens"] for m in man)
        assert total_tokens == n * TOKS_PER_DOC, (total_tokens, n)
        max_group = max(m["n_tokens"] for m in man)
        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        print(json.dumps({
            "metric": "token-shard sink volume smoke (hot 4-bucket)",
            "docs": n, "tokens": total_tokens, "num_cpus": cpus,
            "wall_sec": round(wall, 2),
            "tokens_per_sec": round(total_tokens / wall, 0),
            "n_shards": len(man),
            "max_shard_tokens": max_group,  # bound: 16 x 2048 = 32768
            "driver_rss_mb": rss_mb,
        }))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        ray.shutdown()


if __name__ == "__main__":
    main()
