"""Volume smoke for the curation composite (quality gate -> exact dedup
-> temperature mix -> split): synthesize a deterministic multilingual
documents table at N rows, run ``curate_documents`` end to end in this
process's Ray session, print one JSON line.

Usage: python tools/curation_volume.py [rows] [num_cpus]

The corpus is word-soup (seeded PCG64), language-skewed (en half the
corpus, zh 5%), with 5% exact duplicates — so every stage has real work:
the gate drops short docs, dedup collapses the copies, the mix
downsamples en, the split buckets survivors.  Parquet row groups are
bounded (the 96k-fixture lesson: one group per file throttles read
parallelism as n grows).
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
import pyarrow.compute as pc
import pyarrow.parquet as pq

LANGS = ["en", "es", "de", "fr", "zh"]
LANG_P = [0.50, 0.20, 0.15, 0.10, 0.05]
VOCAB = [f"w{i:03d}" for i in range(200)]


def docs_parquet(n: int) -> str:
    out = f"/tmp/graft_curation_docs_{n}"
    if Path(out, "_DONE").exists():
        return out
    Path(out).mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    lens = rng.integers(10, 400, size=n)  # some below the 30-word gate
    words = rng.integers(0, len(VOCAB), size=int(lens.sum()))
    texts: list[str] = []
    pos = 0
    for ln in lens:
        texts.append(" ".join(VOCAB[w] for w in words[pos:pos + ln]))
        pos += ln
    dup = rng.random(n) < 0.05
    for i in np.flatnonzero(dup):
        if i:
            texts[i] = texts[i - 1]
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[i] for i in langs]),
    })
    pq.write_table(t, f"{out}/documents.parquet", row_group_size=2048)
    Path(out, "_DONE").touch()
    return out


def min_words_mask(batch: pa.Table):
    nw = pc.list_value_length(pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch.column("text")), r"\s+"))
    return pc.greater_equal(nw, 30)


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import ray
    import ray.data

    from docling_graph_ray.pipelines.textops import curate_documents

    src = docs_parquet(rows)
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        t0 = time.perf_counter()
        out = curate_documents(
            ray.data.read_parquet(f"{src}/documents.parquet",
                                  columns=["doc_id", "text", "lang"]),
            quality_mask=min_words_mask,
        )
        n_kept = out.count()
        wall = time.perf_counter() - t0
        print(json.dumps({
            "metric": "curation composite volume smoke",
            "rows": rows, "kept": n_kept, "num_cpus": cpus,
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(rows / wall, 1),
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
