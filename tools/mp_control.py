"""Raw-multiprocessing scaling control: the host's ceiling for the
flagship's per-row work, with zero Ray overhead.

Runs the SAME per-row extraction (decode + fast-scan + block scoring)
over the same bench parquet rows with plain ``multiprocessing.Pool`` at
4 and 16 processes, in fresh pools, interleaved.  If this control's
4→16 efficiency is X, no engine on this box can exceed ~X during the
same host weather — it bounds what `bench.py --scaling` can measure.

Usage: python tools/mp_control.py [rows]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("RAY_worker_niceness", "0")


def _work(chunk: list[bytes]) -> int:
    from docling_graph_ray.stages.html_extract import extract_html_doc
    from docling_graph_ray.stages.pdf_parse import PdfParseActor

    actor = PdfParseActor()
    n = 0
    for raw in chunk:
        if raw.startswith(b"%PDF-"):
            actor._parse_one(raw)
        else:
            extract_html_doc(raw, None)
        n += 1
    return n


def _level(htmls: list[bytes], procs: int) -> float:
    shards = [htmls[i::procs] for i in range(procs)]
    t0 = time.perf_counter()
    with mp.Pool(procs) as pool:
        total = sum(pool.map(_work, shards))
    wall = time.perf_counter() - t0
    return total / wall


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8000

    import pyarrow.parquet as pq

    from docling_graph_ray.fixtures.pages import pages_parquet_dir

    src = pages_parquet_dir(rows, profile="bench")
    tbl = pq.read_table(src, columns=["html"])
    htmls = [h or b"" for h in tbl.column("html").to_pylist()]

    obs: dict[int, list[float]] = {4: [], 16: []}
    for _ in range(3):
        for procs in (4, 16):
            obs[procs].append(round(_level(htmls, procs), 1))
    med = {p: sorted(v)[len(v) // 2] for p, v in obs.items()}
    print(json.dumps({
        "metric": "raw multiprocessing control (same per-row work, no Ray)",
        "rows": rows,
        "docs_per_sec_4": med[4],
        "docs_per_sec_16": med[16],
        "efficiency": round(med[16] / (4 * med[4]), 3),
        "all_observed": obs,
    }))


if __name__ == "__main__":
    main()
