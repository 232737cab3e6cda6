"""Volume smoke for exact-substring dedup (stages/substr_dedup.py) — the
heaviest shuffle in the repo by design: the window-row intermediate is
~one 24-byte row per corpus TOKEN (VERDICT r3 next-step #9).

Synthesizes a deterministic corpus of ``tokens`` total tokens (docs of
~200 words from a 1000-word vocabulary), with two duplication modes so
both shuffle paths have real work:

- a fixed 120-token boilerplate passage inserted into 5% of docs — every
  insertion shares the SAME 71 window hashes, so those buckets are HOT
  (thousands of occurrences per hash: the O(1)/row vectorized-count
  claim under test);
- 2% of docs are exact copies of their predecessor (cold duplicated
  windows spread across hashes).

Prints one JSON line with wall, tokens/s, window-row count and the
shuffle payload bytes they represent.  Run at two volumes to check the
flat-wall claim, e.g.:

    python tools/substr_volume.py 25000000 32
    python tools/substr_volume.py 100000000 32
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
import pyarrow.parquet as pq

VOCAB = [f"tok{i:04d}" for i in range(1000)]
DOC_TOKENS = 200
BOILER_TOKENS = 120
WINDOW = 50


def corpus_parquet(tokens: int) -> tuple[str, int]:
    n_docs = tokens // DOC_TOKENS
    out = f"/tmp/graft_substr_{tokens}"
    if Path(out, "_DONE").exists():
        return out, n_docs
    Path(out).mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    boiler = " ".join(VOCAB[i] for i in
                      rng.integers(0, len(VOCAB), BOILER_TOKENS))
    writer = pq.ParquetWriter(
        f"{out}/documents.parquet",
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]))
    chunk = 50_000
    prev_last: str | None = None
    for lo in range(0, n_docs, chunk):
        hi = min(lo + chunk, n_docs)
        m = hi - lo
        words = rng.integers(0, len(VOCAB), size=(m, DOC_TOKENS))
        texts = [" ".join(VOCAB[w] for w in row) for row in words]
        with_boiler = rng.random(m) < 0.05
        for i in np.flatnonzero(with_boiler):
            cut = DOC_TOKENS // 2
            head = " ".join(texts[i].split(" ")[:cut])
            tail = " ".join(texts[i].split(" ")[cut:])
            texts[i] = f"{head} {boiler} {tail}"
        copy_prev = rng.random(m) < 0.02
        for i in np.flatnonzero(copy_prev):
            texts[i] = texts[i - 1] if i else (prev_last or texts[i])
        prev_last = texts[-1]
        writer.write_table(pa.table({
            "doc_id": pa.array(np.arange(lo, hi), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }), row_group_size=4096)
    writer.close()
    Path(out, "_DONE").touch()
    return out, n_docs


def main() -> None:
    tokens = int(sys.argv[1]) if len(sys.argv) > 1 else 25_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    src, n_docs = corpus_parquet(tokens)

    import ray
    import ray.data

    from docling_graph_ray.stages.substr_dedup import substring_exact_dedup

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        t0 = time.perf_counter()
        out = substring_exact_dedup(
            ray.data.read_parquet(f"{src}/documents.parquet",
                                  columns=["doc_id", "text"]),
            window=WINDOW,
        )
        agg = out.sum(["n_tokens", "n_removed"])
        n_out = agg["sum(n_tokens)"]
        n_removed = agg["sum(n_removed)"]
        wall = time.perf_counter() - t0
        # every doc longer than WINDOW emits (len − WINDOW + 1) window rows
        n_win_rows = int(n_out) - (WINDOW - 1) * n_docs
        print(json.dumps({
            "metric": "exact-substring dedup volume smoke",
            "tokens": tokens, "docs": n_docs, "num_cpus": cpus,
            "wall_sec": round(wall, 2),
            "tokens_per_sec": round(tokens / wall, 0),
            "window_rows": n_win_rows,
            "window_shuffle_mb": round(n_win_rows * 24 / 1e6, 1),
            "removed_tokens": int(n_removed),
            "removed_pct": round(100.0 * n_removed / max(1, n_out), 2),
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
