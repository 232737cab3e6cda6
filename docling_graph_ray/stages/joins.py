"""Hash-shuffle semi/anti/lookup joins that tolerate empty blocks.

Ray's ``Dataset.join`` is the right tool for a SINGLE join over clean
sources (see ``pipelines.relational.orderpriority_lineitem_counts``), but
its hash-join aggregator builds a zero-column left partition whenever its
input contains the empty pass-through blocks that ``map_groups`` and
``join`` themselves emit — so a join downstream of another wide op crashes
with ``pa.Table.join: No match … for FieldRef`` (the round-1
``graph_content_dedup`` pathology).  These helpers express the same joins
as a union + ``groupby(key).map_groups`` co-group: identical shuffle
payload (left rows + key rows move once), but groupby's shuffle unifies
heterogeneous empty blocks instead of choking on them.

Scale notes (SURVEY.md §7.4): the key side rides the shuffle as
``(_key,)`` rows only — never a driver-side set, so the "small" side may
be O(corpus) (the round-1 scale-killer was collecting every ``o_custkey``
into a driver set, VERDICT.md What's-wrong #2).  Skew: one group per
distinct key value; a pathologically hot key makes a giant group, exactly
as a hash join would.

Reference semantics: the one semi-join in the reference's system is the
orphan-edge drop (docling_graph/core/converters/graph_cleaner.py:319-364).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def as_arrow_schema(schema) -> pa.Schema:
    """ray.data.Schema → pyarrow.Schema (already-arrow passes through)."""
    base = getattr(schema, "base_schema", schema)
    if not isinstance(base, pa.Schema):
        base = pa.schema([(n, t) for n, t in zip(schema.names, schema.types)])
    return base


def _left_rows(b: pa.Table, on: str, names: list[str],
               out_schema: pa.Schema, extra: dict) -> pa.Table:
    """Tag a left-side batch with its join key; schema-guarded so empty
    pass-through blocks (no columns) become empty tagged tables."""
    if b.num_rows == 0 or on not in b.schema.names:
        n = 0
        key = pa.array([], pa.string())
    else:
        n = b.num_rows
        key = b.column(on).cast(pa.string())
    cols = {"_key": key}
    for nm in names:
        cols[nm] = b.column(nm) if n else pa.nulls(0, out_schema.field(nm).type)
    for nm, (typ, fill) in extra.items():
        cols[nm] = pa.array([fill] * n, typ)
    return pa.table(cols)


def semi_join(left, keys, *, on: str, key_col: str | None = None,
              anti: bool = False, out_schema: pa.Schema | None = None):
    """left ⋉ keys (or ▷ when ``anti=True``) on ``left[on] == keys[key_col]``.

    ``keys`` may contain duplicates; output rows are the left rows (never
    multiplied).  Both sides hash-shuffle by the key — nothing touches the
    driver."""
    key_col = key_col or on
    out_schema = out_schema or as_arrow_schema(left.schema())
    names = list(out_schema.names)

    def left_side(b: pa.Table) -> pa.Table:
        return _left_rows(b, on, names, out_schema,
                          {"_is_key": (pa.bool_(), False)})

    def key_side(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or key_col not in b.schema.names:
            n = 0
            key = pa.array([], pa.string())
        else:
            n = b.num_rows
            key = b.column(key_col).cast(pa.string())
        cols = {"_key": key}
        for nm in names:
            cols[nm] = pa.nulls(n, out_schema.field(nm).type)
        cols["_is_key"] = pa.array([True] * n, pa.bool_())
        return pa.table(cols)

    tagged = left.map_batches(left_side, batch_format="pyarrow").union(
        keys.map_batches(key_side, batch_format="pyarrow")
    )

    def regroup(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "_is_key" not in g.schema.names:
            return out_schema.empty_table()
        is_key = g.column("_is_key")
        has_key = pc.any(is_key).as_py()
        if has_key == anti:
            return out_schema.empty_table()
        e = g.filter(pc.invert(is_key))
        if e.num_rows == 0:
            return out_schema.empty_table()
        return pa.table({nm: e.column(nm) for nm in names}).cast(out_schema)

    return tagged.groupby("_key").map_groups(regroup, batch_format="pyarrow")


def lookup_join(left, lookup, *, on: str, key_col: str | None = None,
                value_cols: list[str],
                out_schema: pa.Schema | None = None):
    """Left-outer lookup: attach ``value_cols`` from ``lookup`` to every
    left row matching on ``left[on] == lookup[key_col]``; unmatched rows
    keep nulls.  If a key has several lookup rows the per-column MINIMUM
    value wins (deterministic, order-free).

    The scale-safe replacement for a broadcast dict whose size scales
    with the input (keep ``ray.put`` broadcasts only for true dims)."""
    key_col = key_col or on
    left_schema = out_schema or as_arrow_schema(left.schema())
    names = list(left_schema.names)
    lookup_schema = as_arrow_schema(lookup.schema())
    val_fields = [(c, lookup_schema.field(c).type) for c in value_cols]
    full_schema = pa.schema(list(left_schema) + [pa.field(c, t) for c, t in val_fields])

    def left_side(b: pa.Table) -> pa.Table:
        t = _left_rows(b, on, names, left_schema,
                       {"_is_lk": (pa.bool_(), False)})
        for c, typ in val_fields:
            t = t.append_column("_v_" + c, pa.nulls(t.num_rows, typ))
        return t

    def lookup_side(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or key_col not in b.schema.names:
            n = 0
            key = pa.array([], pa.string())
        else:
            n = b.num_rows
            key = b.column(key_col).cast(pa.string())
        cols = {"_key": key}
        for nm in names:
            cols[nm] = pa.nulls(n, left_schema.field(nm).type)
        cols["_is_lk"] = pa.array([True] * n, pa.bool_())
        for c, typ in val_fields:
            cols["_v_" + c] = (b.column(c).cast(typ) if n else pa.nulls(0, typ))
        return pa.table(cols)

    tagged = left.map_batches(left_side, batch_format="pyarrow").union(
        lookup.map_batches(lookup_side, batch_format="pyarrow")
    )

    def regroup(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "_is_lk" not in g.schema.names:
            return full_schema.empty_table()
        is_lk = g.column("_is_lk")
        e = g.filter(pc.invert(is_lk))
        if e.num_rows == 0:
            return full_schema.empty_table()
        lk = g.filter(is_lk)
        cols = {nm: e.column(nm) for nm in names}
        for c, typ in val_fields:
            if lk.num_rows == 0:
                cols[c] = pa.nulls(e.num_rows, typ)
                continue
            if lk.num_rows == 1:
                v = lk.column("_v_" + c)[0]
            else:
                try:
                    v = pc.min(lk.column("_v_" + c))
                except pa.lib.ArrowNotImplementedError:
                    v = lk.column("_v_" + c)[0]  # non-orderable (list/struct)
            cols[c] = pa.array([v.as_py()] * e.num_rows, typ)
        return pa.table(cols).cast(full_schema)

    return tagged.groupby("_key").map_groups(regroup, batch_format="pyarrow")


def join_partitions(cap: int = 32) -> int:
    """Partition count for native ``Dataset.join``: half the cluster's
    CPUs, capped — small sessions must still be able to schedule the
    hash-join aggregator actors (a 4-cpu test session deadlocks at 32)."""
    import ray

    return max(2, min(cap, int(ray.cluster_resources().get("CPU", 8)) // 2))
