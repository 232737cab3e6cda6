"""Volume smoke for the partition-bucketed co-group joins at corpus-scale
distinct-key counts — the round-2 verdict's acceptance test for the
stages/joins.py rewrite ("a volume smoke (1M+ distinct keys) showing the
join stage's remote wall collapsing the way the curation keeper did").

Synthesizes a deterministic left table (rows over ``n_keys`` distinct
int64 keys, ~1.6M by default — right at the measured SURVEY §7.4
per-group-Python crossover) and a lookup/key table, then times:

- ``lookup_join``  (left-outer value attach, 1 row per key on the right)
- ``semi_join``    (membership filter, half the keys present)
- ``bucketed_first`` (grouped-first / distinct over all keys)

The round-2 implementations ran one Python ``map_groups`` call per
distinct key (measured 324 s at 1.6M groups for the equivalent keeper);
the partition-bucketed rewrite runs 64 vectorized calls.  Pass/fail is
by inspection against BASELINE.md's recorded numbers.

Usage: python tools/join_volume.py [n_rows] [n_keys] [num_cpus]
Prints one JSON line.
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


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 3_200_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_600_000
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False)

    import ray.data

    from docling_graph_ray.stages.bucketing import bucketed_first
    from docling_graph_ray.stages.joins import lookup_join, semi_join

    rng = np.random.default_rng(7)
    left_tbl = pa.table({
        "k": pa.array(rng.integers(0, n_keys, size=n_rows), pa.int64()),
        "payload": pa.array(rng.integers(0, 1 << 30, size=n_rows),
                            pa.int64()),
    })
    lookup_tbl = pa.table({
        "k": pa.array(np.arange(n_keys), pa.int64()),
        "v": pa.array(np.arange(n_keys) * 3, pa.int64()),
    })
    # half the keys for the semi side
    keys_tbl = pa.table({
        "k": pa.array(np.arange(0, n_keys, 2), pa.int64()),
    })

    results: dict[str, float] = {}

    def bench(name: str, fn) -> None:
        t0 = time.monotonic()
        n = fn()
        results[name] = round(time.monotonic() - t0, 2)
        results[name + "_rows"] = n

    left = ray.data.from_arrow(left_tbl).repartition(num_cpus).materialize()
    lookup = ray.data.from_arrow(lookup_tbl).repartition(8).materialize()
    keys = ray.data.from_arrow(keys_tbl).repartition(8).materialize()

    bench("lookup_join", lambda: lookup_join(
        left, lookup, on="k", value_cols=["v"]).count())
    bench("semi_join", lambda: semi_join(
        left, keys, on="k").count())
    bench("bucketed_first", lambda: bucketed_first(
        left, ["k"], [("payload", "ascending")]).count())

    print(json.dumps({
        "metric": "join_volume",
        "n_rows": n_rows,
        "n_keys": n_keys,
        "num_cpus": num_cpus,
        **results,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
