"""Root-identity repair ladder (reference: root_identity.py:42-100,
orchestrator.py:147-183): echo clearing, mislabeled numeric-id strip,
stem fallback — scalar rules and the batch projection."""

import pyarrow as pa

from docling_graph_ray.functions.root_identity import (
    is_class_name_echo,
    is_mislabeled_numeric_id,
    repair_root_identity_batch,
    repair_root_identity_row,
)


def test_is_class_name_echo():
    assert is_class_name_echo("AssuranceMRH", "AssuranceMRH")
    assert is_class_name_echo("assurance mrh", "AssuranceMRH")  # canonical
    assert not is_class_name_echo("Policy 123", "AssuranceMRH")
    assert not is_class_name_echo("", "AssuranceMRH")
    assert not is_class_name_echo(None, "AssuranceMRH")


def test_is_mislabeled_numeric_id():
    assert is_mislabeled_numeric_id("document_number", "Zylker PC Builds")
    assert is_mislabeled_numeric_id("ref", "two words")
    assert not is_mislabeled_numeric_id("document_number", "A-123")  # digit
    assert not is_mislabeled_numeric_id("document_number", "Single")
    assert not is_mislabeled_numeric_id("name", "two words")  # not numeric-named
    assert not is_mislabeled_numeric_id("reference_code", None)


def test_repair_row_echo_then_stem():
    ids, actions = repair_root_identity_row(
        {"doc_ref": "Invoice"}, class_name="Invoice",
        id_fields=["doc_ref"], document_stem="invoice_2024",
    )
    assert ids["doc_ref"] == "invoice_2024"
    assert actions == ["cleared_echo:doc_ref", "stem_fallback:doc_ref"]


def test_repair_row_partial_identity_untouched():
    # one filled field means the identity is document data: no fallback
    ids, actions = repair_root_identity_row(
        {"a": "", "b": "real"}, class_name="C",
        id_fields=["a", "b"], document_stem="stem",
    )
    assert ids == {"a": "", "b": "real"} and actions == []


def test_repair_row_stem_length_gate():
    ids, actions = repair_root_identity_row(
        {"a": ""}, class_name="C", id_fields=["a"],
        document_stem="x" * 81,
    )
    assert ids["a"] == "" and actions == []


def test_repair_batch_audit_column():
    batch = pa.table({
        "ref": ["Part", "two words", "", "P-9"],
        "stem": ["d0", "d1", "d2", "d3"],
    })
    out = repair_root_identity_batch(
        batch, class_name="Part", id_cols=["ref"], stem_col="stem",
    )
    assert out.column("ref").to_pylist() == ["d0", "d1", "d2", "P-9"]
    assert out.column("root_repairs").to_pylist() == [
        "cleared_echo:ref,stem_fallback:ref",
        "cleared_mislabeled:ref,stem_fallback:ref",
        "stem_fallback:ref",
        "",
    ]
