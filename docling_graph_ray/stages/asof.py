"""As-of (backward) join — a custom wide operator Ray Data lacks.

``asof_join(left, right)`` attaches, to every left row, the right row
with the greatest time ≤ the left row's time within the same key — the
classic event→latest-state join (events to the order that preceded
them, ticks to quotes, telemetry to config pushes).

Architecture (the scale-safe union-shuffle shape):

1. both sides are projected to a COMMON schema and unioned — left
   payload columns ride with nulls on right rows and vice versa;
2. ONE hash shuffle co-locates each key's rows
   (``groupby(key).map_groups``) — there is no per-row lookup table, no
   driver-side index, and the right side is never broadcast (it scales
   with the input);
3. inside each group the match is fully vectorized: sort once, split
   sides, one ``np.searchsorted`` of left times into right times.

Partitioning assumption (documented per the north rule): one key's rows
fit in one group.  Keys here are users/customers — bounded fan-in.  For
a pathological hot key, pre-split by time range and stitch the boundary
(the last right row of range N seeds range N+1).

Determinism: ties among right rows with equal time are broken by the
ascending ``right_tiebreak`` column (the LAST in sort order wins, i.e.
the max tiebreak value) — so reruns and the SQL oracle agree exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SIDE_RIGHT = 0
_SIDE_LEFT = 1


def asof_join(
    left,
    right,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tiebreak: str | None = None,
    inner: bool = True,
):
    """Backward as-of join of two Datasets.

    ``left_cols`` / ``right_cols`` are the payload columns each side
    contributes to the output (key and time columns included only if
    listed).  Returns left rows with the matched right payload; with
    ``inner=True`` unmatched left rows are dropped, else their right
    payload is null.
    """
    if right_tiebreak is not None and right_tiebreak not in right_cols:
        right_cols = [*right_cols, right_tiebreak]

    left_schema = dict(zip(left_cols, [None] * len(left_cols)))
    right_schema = dict(zip(right_cols, [None] * len(right_cols)))
    if overlap := set(left_schema) & set(right_schema):
        raise ValueError(f"left/right output columns collide: {sorted(overlap)}")

    def prep_left(b: pa.Table) -> pa.Table:
        cols = {
            "_key": b.column(left_key),
            "_time": b.column(left_time).cast(pa.int64()),
            "_side": pa.array([_SIDE_LEFT] * b.num_rows, pa.int8()),
        }
        for c in left_cols:
            cols[c] = b.column(c)
        for c in right_cols:
            cols[c] = pa.nulls(b.num_rows, _right_types[c])
        return pa.table(cols)

    def prep_right(b: pa.Table) -> pa.Table:
        cols = {
            "_key": b.column(right_key),
            "_time": b.column(right_time).cast(pa.int64()),
            "_side": pa.array([_SIDE_RIGHT] * b.num_rows, pa.int8()),
        }
        for c in left_cols:
            cols[c] = pa.nulls(b.num_rows, _left_types[c])
        for c in right_cols:
            cols[c] = b.column(c)
        return pa.table(cols)

    # resolve payload types once, driver-side, from the (cheap) schemas
    ls, rs = left.schema(), right.schema()
    _left_types = {c: ls.base_schema.field(c).type for c in left_cols}
    _right_types = {c: rs.base_schema.field(c).type for c in right_cols}

    unioned = left.map_batches(prep_left, batch_format="pyarrow").union(
        right.map_batches(prep_right, batch_format="pyarrow")
    )

    def match_group(g: pa.Table) -> pa.Table:
        sort_keys = [("_time", "ascending")]
        if right_tiebreak is not None:
            sort_keys.append((right_tiebreak, "ascending"))
        g = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        side = g.column("_side").to_numpy(zero_copy_only=False)
        times = g.column("_time").to_numpy(zero_copy_only=False)
        is_left = side == _SIDE_LEFT
        lt = times[is_left]
        rt = times[~is_left]
        lefts = g.filter(pa.array(is_left))
        rights = g.filter(pa.array(~is_left))
        # greatest right time <= left time; among equal right times the
        # sort put the max tiebreak LAST, which searchsorted('right')
        # lands on
        idx = np.searchsorted(rt, lt, side="right") - 1
        matched = idx >= 0
        take_idx = pa.array(np.where(matched, idx, 0), pa.int64())
        cols: dict[str, pa.Array] = {}
        for c in left_cols:
            cols[c] = lefts.column(c)
        null_mask = pa.array(~matched)
        for c in right_cols:
            taken = rights.column(c).take(take_idx) if rights.num_rows else \
                pa.nulls(lefts.num_rows, _right_types[c])
            cols[c] = pc.if_else(null_mask, pa.nulls(1, taken.type)[0], taken)
        out = pa.table(cols)
        if inner:
            out = out.filter(pa.array(matched))
        return out

    return unioned.groupby("_key").map_groups(match_group, batch_format="pyarrow")
