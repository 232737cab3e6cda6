"""Volume smoke for the IR family (stages/postings.py, retrieval.py).

Claims under test:
- the chunked inverted index keeps EVERY posting row bounded by
  chunk_span even when a stop word appears in 100% of documents
  (max df_chunk == chunk_span, never a whole-token group);
- postings build and BM25 throughput rise (or hold) at 4× volume —
  fixed pass costs amortize, no quadratic term hides anywhere.

Usage: python tools/ir_volume.py [num_cpus]
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

VOCAB = ["the"] + [f"w{i}" for i in range(5000)]


def docs_table(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    # zipf-ish: low ids much more likely; "the" (id 0) in every doc
    ids = rng.zipf(1.3, size=(n, 12)) % len(VOCAB)
    texts = [" ".join(["the"] + [VOCAB[j] for j in row])
             for row in ids]
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    import ray

    ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    import ray.data

    from docling_graph_ray.stages.postings import build_postings
    from docling_graph_ray.stages.retrieval import bm25_topk

    for n in (250_000, 1_000_000):
        t = docs_table(n, seed=3)
        ds = ray.data.from_arrow(t).repartition(64).materialize()

        t0 = time.monotonic()
        posts = build_postings(ds, chunk_span=4096,
                               num_partitions=64).materialize()
        dt = time.monotonic() - t0
        max_chunk = int(posts.max("df_chunk"))
        print(json.dumps({
            "op": "build_postings", "n_docs": n,
            "posting_rows": posts.count(), "max_df_chunk": max_chunk,
            "chunk_span": 4096, "sec": round(dt, 2),
            "docs_per_sec": int(n / dt)}), flush=True)
        assert max_chunk <= 4096

        t0 = time.monotonic()
        top = bm25_topk(ds, {"q1": ["the", "w17"],
                             "q2": ["w3", "w111"]}, k=10)
        n_rows = top.num_rows if hasattr(top, "num_rows") else \
            top.count()
        dt = time.monotonic() - t0
        print(json.dumps({
            "op": "bm25_topk", "n_docs": n, "rows": int(n_rows),
            "sec": round(dt, 2), "docs_per_sec": int(n / dt)}),
            flush=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
