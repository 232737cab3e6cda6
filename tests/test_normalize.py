"""Identity canonicalization vectors (FIXTURES.md §5, reference semantics
from entity_name_normalizer.py / node_id_registry.py)."""

from docling_graph_ray.functions.normalize import (
    canonical_identity_key,
    canonicalize_identity_for_dedup,
    node_id,
    normalize_entity_name,
)


def test_accent_fold():
    assert normalize_entity_name("électroménager") == normalize_entity_name(
        "Électroménager"
    )


def test_separator_fold():
    ks = {normalize_entity_name(x) for x in ("Run-1", "run_1", "run 1")}
    assert len(ks) == 1


def test_distinct_numbers_stay_distinct():
    assert normalize_entity_name("Article 5") != normalize_entity_name("Article 6")


def test_article_strip():
    assert normalize_entity_name("The Company") == normalize_entity_name("Company")


def test_possessive_strip():
    assert normalize_entity_name("Alice's Lab") == normalize_entity_name("Alice Lab")


def test_canonicalize_field_aware():
    assert canonicalize_identity_for_dedup("name", "Électro-Ménager") == "ELECTRO_MENAGER"
    assert canonicalize_identity_for_dedup("sku", "AB-12.3") == "ab123"
    assert canonicalize_identity_for_dedup("sku", None) == ""


def test_node_id_deterministic_and_list_order_invariant():
    a = node_id("Person", {"name": "Ada Lovelace", "tags": ["x", "y"]})
    b = node_id("Person", {"tags": ["y", "x"], "name": "ada-lovelace"})
    assert a == b
    assert a.startswith("Person_") and len(a) == len("Person_") + 16
    assert node_id("Person", {"name": "Other"}) != a


def test_identity_key_stable():
    k = canonical_identity_key("C", {"name": "The Fast Runner's"})
    assert k == canonical_identity_key("C", {"name": "fast runner"})
