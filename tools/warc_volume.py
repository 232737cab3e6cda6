"""Volume smoke for the WARC ingestion lane (sources/warc.py) vs the
Parquet lane on the SAME synthetic corpus (VERDICT r3 next-step #8): the
streaming gzip-member reader's claim — flat docs/s at multi-GB volume —
verified, not just sf-scale parity-tested.

Both lanes run the full flagship shape (extract actor pool → url-hash
dedup) in their own fresh timing window inside one Ray session; fixture
generation is cached under /tmp.  Prints one JSON line.

    python tools/warc_volume.py [rows] [num_cpus] [files]
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
    import ray.data

    from docling_graph_ray.fixtures.pages import pages_parquet_dir
    from docling_graph_ray.pipelines.extract import (
        dedup_extracted,
        extract_pages_dataset,
        read_pages_parquet,
    )
    from docling_graph_ray.sources.warc import read_warc, warc_fixture_dir

    # init BEFORE fixture generation: pages_parquet_dir writes via
    # ray.data and would otherwise auto-init a default-sized session
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    try:
        # materialize both fixture forms BEFORE timing (cached across runs)
        warc_dir = warc_fixture_dir(rows, profile="t1", files=files)
        pq_dir = pages_parquet_dir(rows, profile="t1")
        warc_bytes = sum(
            p.stat().st_size for p in Path(warc_dir).glob("*.warc.gz"))

        def run(ds) -> tuple[int, float]:
            t0 = time.perf_counter()
            n = dedup_extracted(
                extract_pages_dataset(ds, num_partitions=128)
            ).count()
            return n, time.perf_counter() - t0

        # untimed pilot warms the actor pool (bench protocol, BASELINE.md)
        run(read_pages_parquet(pages_parquet_dir(256, profile="t1")))

        n_pq, wall_pq = run(read_pages_parquet(pq_dir))
        n_warc, wall_warc = run(read_warc(warc_dir))

        print(json.dumps({
            "metric": "warc-lane volume smoke",
            "rows": rows, "files": files, "num_cpus": cpus,
            "warc_gz_mb": round(warc_bytes / 1e6, 1),
            "warc": {"deduped": n_warc, "wall_sec": round(wall_warc, 2),
                     "docs_per_sec": round(rows / wall_warc, 1)},
            "parquet": {"deduped": n_pq, "wall_sec": round(wall_pq, 2),
                        "docs_per_sec": round(rows / wall_pq, 1)},
            "warc_vs_parquet": round(wall_pq / wall_warc, 3),
        }))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
