"""Global ranking over a sorted dataset + Pareto (ABC) decile rollup.

The distributed-rank pattern: ``sort`` → materialize (pins the block
layout) → ONE metadata pass collecting per-block ``(first-row key,
row-count)`` → driver prefix-fold of that tiny list → broadcast of the
block-offset map → ONE assignment pass adding ``offset + arange`` per
block.  Rank assignment therefore costs two linear passes over the
sorted data and never ships per-row state through a shuffle; the only
driver-side object is one row per BLOCK.

The materialize between the passes is load-bearing: both passes must
see the identical block layout (``batch_size=None`` maps whole
blocks), and a lazy sort could legally re-execute with different block
boundaries.

``pareto_deciles`` uses the rank for the classic concentration report
("the top 10% of customers carry X% of revenue"): decile =
``rank·n_tiles // total`` (integer math), per-decile exact int64 sums,
cumulative over the tiny tile table on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TILE_SCHEMA = pa.schema([
    ("decile", pa.int64()),
    ("n_keys", pa.int64()),
    ("value_sum", pa.int64()),
    ("cum_value_sum", pa.int64()),
])


def pareto_deciles(ds, *, val_col: str, key_col: str,
                   n_tiles: int = 10):
    """(key, value) dataset → ``n_tiles`` rows of the concentration
    report, ordered by (value desc, key asc) rank.  Values must be
    exact integers (the repo's minor-units convention) so every sum is
    order-free."""
    import ray

    srt = ds.sort([val_col, key_col],
                  descending=[True, False]).materialize()
    total = srt.count()
    if total == 0:
        return TILE_SCHEMA.empty_table()

    meta_schema = pa.schema([("v0", pa.int64()), ("k0", pa.int64()),
                             ("n", pa.int64())])

    def block_meta(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return meta_schema.empty_table()
        return pa.table({
            "v0": b.column(val_col).slice(0, 1).cast(pa.int64()),
            "k0": b.column(key_col).slice(0, 1).cast(pa.int64()),
            "n": pa.array([b.num_rows], pa.int64()),
        })

    meta = srt.map_batches(block_meta, batch_format="pyarrow",
                           batch_size=None).take_all()
    # driver fold: one row per block — sort by the global order and
    # prefix the counts into start offsets
    meta.sort(key=lambda r: (-r["v0"], r["k0"]))
    offsets = {}
    start = 0
    for r in meta:
        offsets[(r["v0"], r["k0"])] = start
        start += r["n"]
    off_ref = ray.put(offsets)

    tile_partial = pa.schema([("decile", pa.int64()),
                              ("n_keys", pa.int64()),
                              ("value_sum", pa.int64())])

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return tile_partial.empty_table()
        off = ray.get(off_ref)[(
            b.column(val_col)[0].as_py(), b.column(key_col)[0].as_py())]
        rk = off + np.arange(b.num_rows, dtype=np.int64)
        tile = (rk * n_tiles) // total
        t = pa.table({
            "decile": pa.array(tile, pa.int64()),
            "v": b.column(val_col).cast(pa.int64()),
        })
        g = t.group_by("decile").aggregate([("v", "sum"),
                                            ([], "count_all")])
        return pa.table({
            "decile": g.column("decile"),
            "n_keys": g.column("count_all").cast(pa.int64()),
            "value_sum": g.column("v_sum").cast(pa.int64()),
        })

    parts = srt.map_batches(assign, batch_format="pyarrow",
                            batch_size=None).take_all()
    agg: dict[int, list[int]] = {}
    for r in parts:
        cur = agg.setdefault(r["decile"], [0, 0])
        cur[0] += r["n_keys"]
        cur[1] += r["value_sum"]
    rows = sorted(agg.items())
    cum = 0
    out = {"decile": [], "n_keys": [], "value_sum": [],
           "cum_value_sum": []}
    for d, (nk, vs) in rows:
        cum += vs
        out["decile"].append(d)
        out["n_keys"].append(nk)
        out["value_sum"].append(vs)
        out["cum_value_sum"].append(cum)
    return pa.table({
        "decile": pa.array(out["decile"], pa.int64()),
        "n_keys": pa.array(out["n_keys"], pa.int64()),
        "value_sum": pa.array(out["value_sum"], pa.int64()),
        "cum_value_sum": pa.array(out["cum_value_sum"], pa.int64()),
    })
