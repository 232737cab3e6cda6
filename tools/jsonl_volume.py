"""Volume smoke for the JSONL ingestion lane (sources/jsonl.py) vs the
Parquet lane on the SAME synthetic corpus — the warc_volume.py protocol:
both lanes run the full flagship shape (extract actor pool → url-hash
dedup) in their own timing window inside one Ray session, so the
lane-vs-lane RATIO is weather-controlled even when absolute throughput
is not.  Prints one JSON line.

    python tools/jsonl_volume.py [rows] [num_cpus] [files]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("RAY_worker_niceness", "0")


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 96_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    files = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    import ray

    from docling_graph_ray.fixtures.pages import pages_parquet_dir
    from docling_graph_ray.pipelines.extract import (
        dedup_extracted,
        extract_pages_dataset,
        read_pages_parquet,
    )
    from docling_graph_ray.sources.jsonl import (
        jsonl_fixture_dir,
        read_jsonl_pages,
    )

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        jl_dir = jsonl_fixture_dir(rows, profile="t1", files=files)
        pq_dir = pages_parquet_dir(rows, profile="t1")
        jl_bytes = sum(
            p.stat().st_size for p in Path(jl_dir).glob("*.jsonl.gz"))

        def run(ds) -> tuple[int, float]:
            t0 = time.perf_counter()
            n = dedup_extracted(
                extract_pages_dataset(ds, num_partitions=128)
            ).count()
            return n, time.perf_counter() - t0

        run(read_pages_parquet(pages_parquet_dir(256, profile="t1")))

        n_pq, wall_pq = run(read_pages_parquet(pq_dir))
        n_jl, wall_jl = run(read_jsonl_pages(jl_dir))

        print(json.dumps({
            "metric": "jsonl-lane volume smoke",
            "rows": rows, "files": files, "num_cpus": cpus,
            "jsonl_gz_mb": round(jl_bytes / 1e6, 1),
            "jsonl": {"deduped": n_jl, "wall_sec": round(wall_jl, 2),
                      "docs_per_sec": round(rows / wall_jl, 1)},
            "parquet": {"deduped": n_pq, "wall_sec": round(wall_pq, 2),
                        "docs_per_sec": round(rows / wall_pq, 1)},
            "jsonl_vs_parquet": round(wall_pq / wall_jl, 3),
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
