"""Canonical identity normalization — the key function feeding every
dedup / groupby in the engine.

Reimplements the reference's semantics (reference:
docling_graph/core/utils/entity_name_normalizer.py:16-74):

- ``normalize_entity_name``: NFKD + strip combining marks, leading-article
  strip, split on whitespace/underscore/hyphen, possessive strip,
  UPPER_SNAKE join;
- ``canonicalize_identity_for_dedup``: name-like fields go through
  ``normalize_entity_name``; other identity fields are casefolded with
  non-alphanumerics stripped.

Node ids are pure deterministic content hashes
(``ClassName_<blake2b16hex>`` over the canonicalized identity fields,
reference: docling_graph/core/converters/node_id_registry.py:58-157) —
hash-equality replaces the reference's shared registry dict, so any
worker computes the same id independently (SURVEY.md §2.3).
"""

from __future__ import annotations

import re
import unicodedata

from docling_graph_ray.functions.hashing import blake2b_hex

_ARTICLES = frozenset(
    "the a an le la les l un une der die das ein eine el los las".split()
)
_SPLIT_RE = re.compile(r"[\s_\-]+")
_NON_ALNUM_RE = re.compile(r"[^a-z0-9]+")
_NAME_FIELDS = frozenset(("name", "title", "nom"))


def _strip_accents(value: str) -> str:
    decomposed = unicodedata.normalize("NFKD", value)
    return "".join(c for c in decomposed if not unicodedata.combining(c))


def normalize_entity_name(value: str) -> str:
    """'électroménager' → 'ELECTROMENAGER'; 'Run-1' / 'run_1' → 'RUN_1'."""
    if not value:
        return ""
    text = _strip_accents(value).strip()
    words = [w for w in _SPLIT_RE.split(text) if w]
    cleaned = []
    for w in words:
        # possessive strip
        if w.lower().endswith("'s"):
            w = w[:-2]
        elif w.endswith("'"):
            w = w[:-1]
        w = re.sub(r"[^0-9A-Za-z]", "", w)
        if w:
            cleaned.append(w.upper())
    # article strip AFTER cleanup, so the decision is made on the token
    # that actually survives — makes normalization idempotent (a leading
    # ':a' cleans to 'A', which a second pass would otherwise drop)
    if cleaned and cleaned[0].lower() in _ARTICLES and len(cleaned) > 1:
        cleaned = cleaned[1:]
    return "_".join(cleaned)


def canonicalize_identity_for_dedup(field_name: str, value: object) -> str:
    """Field-aware canonical key: name/title/nom → normalized entity name;
    anything else → casefold + non-alphanumeric strip."""
    if value is None:
        return ""
    text = str(value)
    if field_name.lower() in _NAME_FIELDS:
        return normalize_entity_name(text)
    return _NON_ALNUM_RE.sub("", _strip_accents(text).casefold())


def canonical_identity_key(class_name: str, id_fields: dict[str, object]) -> str:
    """Deterministic identity key over (class, canonicalized id fields);
    list values become sorted deduped canonical tuples (reference:
    node_id_registry.py:79-99)."""
    parts = [class_name]
    for field in sorted(id_fields):
        v = id_fields[field]
        if isinstance(v, (list, tuple, set)):
            canon = sorted({canonicalize_identity_for_dedup(field, x) for x in v})
            parts.append(f"{field}=[{','.join(canon)}]")
        else:
            parts.append(f"{field}={canonicalize_identity_for_dedup(field, v)}")
    return "|".join(parts)


def node_id(class_name: str, id_fields: dict[str, object]) -> str:
    """``ClassName_<blake2b-16hex>`` — content-addressed node id; equal
    canonical identity ⇒ equal id on any worker, no shared state."""
    key = canonical_identity_key(class_name, id_fields)
    return f"{class_name}_{blake2b_hex(key, digest_size=8)}"
