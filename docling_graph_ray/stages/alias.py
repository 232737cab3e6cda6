"""LLM-free alias reconciliation within class partitions.

The reference proposes same-class containment-alias candidates — one
entity's name tokens a subset of another's, with equal digit signatures —
then merges them (optionally LLM-confirmed; vetoed when the pair co-occur
as siblings).  Reference: docling_graph/core/utils/alias_reconciler.py:
54-330.  Here only the deterministic fuzzy rung is ported (SURVEY.md
§2.6 checklist: "optional LLM-free fuzzy rung only"), as a
``groupby(class).map_groups`` operator — candidate proposal is quadratic
per class partition, so the partitioning assumption is: one class's
entities fit one worker (bound classes with ``cardinality_bound`` first
when they don't).

Merge direction: the SHORTER name (token-subset) is the alias; it folds
into the richer entity with first-non-empty-wins enrichment and its
mention count accumulates."""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from docling_graph_ray.functions.normalize import normalize_entity_name

_DIGIT_RE = re.compile(r"\d+")


def digit_signature(name: str) -> tuple[str, ...]:
    """Sorted digit-run signature: '4 Main St Apt 4' → ('4', '4')."""
    return tuple(sorted(_DIGIT_RE.findall(name)))


def is_containment_alias(short: str, long: str) -> bool:
    """True when ``short``'s canonical tokens are a strict subset of
    ``long``'s and the digit signatures match (alias_reconciler.py:54-120
    candidate rule)."""
    st = set(normalize_entity_name(short).split("_"))
    lt = set(normalize_entity_name(long).split("_"))
    st.discard("")
    lt.discard("")
    if not st or st == lt:
        return False
    return st < lt and digit_signature(short) == digit_signature(long)


def reconcile_group(group: pa.Table, *, name_col: str,
                    count_col: str | None = None) -> pa.Table:
    """Merge containment aliases inside one class partition.

    Deterministic: rows ordered by (token count desc, name asc) so richer
    names absorb shorter ones; each alias folds into the FIRST (richest)
    matching survivor."""
    idx = pc.sort_indices(group, sort_keys=[(name_col, "ascending")])
    rows = group.take(idx).to_pylist()
    rows.sort(key=lambda r: (-len(normalize_entity_name(r[name_col]).split("_")),
                             r[name_col]))
    survivors: list[dict] = []
    for row in rows:
        target = None
        for s in survivors:
            if is_containment_alias(row[name_col], s[name_col]):
                target = s
                break
        if target is None:
            row = dict(row)
            row["aliases"] = []
            if count_col is None:
                row["n_merged"] = 1
            survivors.append(row)
        else:
            target["aliases"] = sorted([*target["aliases"], row[name_col]])
            if count_col is not None:
                target[count_col] = (target.get(count_col) or 0) + (
                    row.get(count_col) or 0
                )
            else:
                target["n_merged"] += 1
            for k, v in row.items():
                if k in (name_col, "aliases"):
                    continue
                if (target.get(k) in (None, "", [], {})) and v not in (None, "", [], {}):
                    target[k] = v
    survivors.sort(key=lambda r: r[name_col])
    return pa.Table.from_pylist(survivors)


def alias_reconcile(nodes, *, class_col: str, name_col: str,
                    count_col: str | None = None):
    """Dataset-level operator: ``groupby(class).map_groups(reconcile)``."""

    def fn(group: pa.Table) -> pa.Table:
        return reconcile_group(group, name_col=name_col, count_col=count_col)

    return nodes.groupby(class_col).map_groups(fn, batch_format="pyarrow")
