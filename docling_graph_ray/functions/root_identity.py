"""Root-identity repair: class-name-echo clearing, mislabeled-numeric-id
stripping, and source-stem fallback — batch-vectorized.

Ports the reference's two deterministic root-only repairs (reference:
docling_graph/core/utils/root_identity.py:42-100 ``repair_root_identity``
and docling_graph/core/extractors/contracts/dense/orchestrator.py:147-183
``strip_mislabeled_root_ids``) as pure functions plus a ``map_batches``
projection over root-record rows.  Rules kept exactly:

- an identity value whose [a-z0-9] canonicalization equals the template
  class name is a schema echo, cleared (root_identity.py:46-51);
- a field whose NAME promises a number (``number|no|num|ref|reference``
  token) holding multi-word, digit-free prose is a mis-capture, cleared
  (orchestrator.py:106,173-182);
- when EVERY identity field is empty after clearing, the FIRST identity
  field receives the document stem (<= 80 chars) — root singletons only;
  a partially-filled identity is document data and is never touched
  (root_identity.py:79-100).
"""

from __future__ import annotations

import re

import pyarrow as pa

_ALNUM = re.compile(r"[^a-z0-9]+")
NUMERIC_ID_FIELD = re.compile(r"(^|_)(number|no|num|ref|reference)(_|$)",
                              re.IGNORECASE)
MAX_STEM_CHARS = 80


def _canonical(text: str) -> str:
    return _ALNUM.sub("", text.casefold())


def is_class_name_echo(value: object, class_name: str) -> bool:
    """True when a string identity value just echoes the template class
    name (order-insensitive [a-z0-9] comparison)."""
    if not isinstance(value, str) or not value.strip():
        return False
    canon = _canonical(value)
    return bool(canon) and canon == _canonical(class_name)


def is_mislabeled_numeric_id(field_name: str, value: object) -> bool:
    """A numeric-named id field holding multi-word digit-free prose."""
    if not isinstance(value, str) or not NUMERIC_ID_FIELD.search(field_name):
        return False
    text = value.strip()
    return bool(text) and not any(c.isdigit() for c in text) \
        and len(text.split()) >= 2


def _is_empty(value: object) -> bool:
    if value is None:
        return True
    if isinstance(value, str):
        return not value.strip()
    return False


def repair_root_identity_row(
    ids: dict[str, object],
    *,
    class_name: str,
    id_fields: list[str],
    document_stem: str | None = None,
) -> tuple[dict[str, object], list[str]]:
    """Repair one root record's identity dict; returns (ids, actions)."""
    ids = dict(ids)
    actions: list[str] = []
    for field in id_fields:
        value = ids.get(field)
        if is_class_name_echo(value, class_name):
            ids[field] = ""
            actions.append(f"cleared_echo:{field}")
        elif is_mislabeled_numeric_id(field, value):
            ids[field] = ""
            actions.append(f"cleared_mislabeled:{field}")
    if id_fields and all(_is_empty(ids.get(f)) for f in id_fields):
        stem = (document_stem or "").strip()
        if stem and len(stem) <= MAX_STEM_CHARS:
            ids[id_fields[0]] = stem
            actions.append(f"stem_fallback:{id_fields[0]}")
    return ids, actions


def repair_root_identity_batch(
    batch: pa.Table,
    *,
    class_name: str,
    id_cols: list[str],
    stem_col: str | None = None,
) -> pa.Table:
    """``map_batches`` projection: apply the repair ladder to each row's
    identity columns; appends a ``root_repairs`` audit column
    (comma-joined actions, "" when untouched)."""
    cols = {c: batch.column(c).to_pylist() for c in id_cols}
    stems = (batch.column(stem_col).to_pylist() if stem_col
             else [None] * batch.num_rows)
    repaired: dict[str, list] = {c: [] for c in id_cols}
    audits: list[str] = []
    for i in range(batch.num_rows):
        ids = {c: cols[c][i] for c in id_cols}
        fixed, actions = repair_root_identity_row(
            ids, class_name=class_name, id_fields=id_cols,
            document_stem=stems[i],
        )
        for c in id_cols:
            repaired[c].append(fixed[c])
        audits.append(",".join(actions))
    out = batch
    for c in id_cols:
        out = out.set_column(
            out.schema.get_field_index(c), c,
            pa.array(repaired[c], pa.string()),
        )
    return out.append_column("root_repairs", pa.array(audits, pa.string()))
