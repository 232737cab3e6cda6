"""Template induction: distributed field profiling, spec induction,
lint/repair, deterministic render + exec-verify gate (reference:
docling_graph/templategen/ — spec.py, linter.py, renderer.py, verify.py)."""

import json

import pyarrow as pa
import pytest

import ray
import ray.data

from docling_graph_ray.templategen import (
    field_distinct_counts,
    induce_spec,
    lint_spec,
    profile_columns,
    profile_json_records,
    render_template,
    repair_spec,
    sanitize_identifier,
    verify_template_source,
)

ROWS = [
    {"doc_id": 1, "lang": "en", "score": 1.5, "tags": ["a"], "when": "2024-01-02"},
    {"doc_id": 2, "lang": "en", "score": 2, "tags": [], "when": "2024-01-03"},
    {"doc_id": 3, "lang": "fr", "score": None, "tags": ["b", "c"], "when": "2024-02-01"},
    {"doc_id": 4, "lang": "en", "score": 4.0, "tags": ["a"], "when": None},
    {"doc_id": 5, "lang": "fr", "score": 5.5, "tags": None, "when": "2024-03-05"},
    {"doc_id": 6, "lang": "fr", "score": 6.0, "tags": ["d"], "when": "2024-03-06"},
]


def _ds(rows, blocks=3):
    return ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(blocks)


@pytest.fixture()
def profile(ray_session):
    out = profile_columns(
        _ds(ROWS), cls="Doc",
        columns=["doc_id", "lang", "score", "tags", "when"],
    ).to_pandas().set_index("field")
    return out


def test_profile_counts(profile):
    assert int(profile.loc["doc_id", "n"]) == 6
    assert int(profile.loc["doc_id", "n_filled"]) == 6
    assert int(profile.loc["doc_id", "n_int"]) == 6
    # score: one null -> 5 filled; Arrow already promoted the column to
    # double, so every filled value votes float (typed-column votes are
    # degenerate by design — JSON records exercise real mixes)
    assert int(profile.loc["score", "n_filled"]) == 5
    assert int(profile.loc["score", "n_float"]) == 5
    assert int(profile.loc["score", "n_int"]) == 0
    # tags: empty list and None are unfilled
    assert int(profile.loc["tags", "n_filled"]) == 4
    assert int(profile.loc["tags", "n_list"]) == 4
    # when: all filled values are ISO-date-like strings
    assert int(profile.loc["when", "n_datelike"]) == 5
    # distinct merged across 3 blocks
    assert json.loads(profile.loc["lang", "distinct"]) == ['"en"', '"fr"']
    assert int(profile.loc["lang", "distinct_saturated"]) == 0


def test_profile_json_records(ray_session):
    recs = [{"j": json.dumps(d)} for d in
            ({"a": 1, "b": True}, {"a": 2.5}, {"b": False, "c": "x"})]
    out = profile_json_records(
        _ds(recs, blocks=2), json_col="j", cls="E"
    ).to_pandas().set_index("field")
    assert int(out.loc["a", "n_int"]) == 1 and int(out.loc["a", "n_float"]) == 1
    assert int(out.loc["b", "n_bool"]) == 2
    assert int(out.loc["c", "n_filled"]) == 1
    # n counts every record that the field was observed against in its batch


def test_field_distinct_counts_exact(ray_session):
    out = field_distinct_counts(
        _ds(ROWS), columns=["doc_id", "lang"]
    ).to_pandas().set_index("field")
    assert int(out.loc["doc_id", "n_distinct"]) == 6
    assert int(out.loc["lang", "n_distinct"]) == 2


@pytest.fixture()
def spec(profile):
    return induce_spec(profile.reset_index(), root="Doc",
                       enum_max=4, enum_min_uses=3)


def test_induce_spec(spec):
    model = spec["models"][0]
    assert model["kind"] == "root"
    # doc_id: *_id rank wins identity
    assert model["identity"] == ["doc_id"]
    fields = {f["name"]: f for f in model["fields"]}
    assert fields["doc_id"]["role"] == "identity"
    assert fields["score"]["type"] == "float"       # numeric promotion
    assert fields["score"]["optional"] is True
    assert fields["doc_id"]["optional"] is False
    assert fields["tags"]["is_list"] is True
    assert fields["when"]["type"] == "date"
    # lang: 2 distinct values over 6 uses -> enum
    assert fields["lang"]["type"] == "DocLang"
    assert spec["enums"][0]["members"] == ["en", "fr"]


def test_lint_clean_spec(spec):
    assert lint_spec(spec) == []


def test_lint_findings():
    bad = {
        "name": "t", "root": "Missing", "enums": [{"name": "class",
                                                   "members": []}],
        "models": [
            {"name": "A", "kind": "entity", "identity": [], "fields": [
                {"name": "import", "type": "str", "is_list": False,
                 "role": "property", "edge_label": "X"},
                {"name": "x", "type": "Nope", "is_list": False,
                 "role": "property", "edge_label": None},
            ]},
            {"name": "A", "kind": "component",
             "identity": ["ghost"], "fields": [
                 {"name": "y", "type": "str", "is_list": True,
                  "role": "edge", "edge_label": None}]},
        ],
    }
    codes = sorted({f["code"] for f in lint_spec(bad)})
    assert codes == ["E01", "E04", "E05", "E06", "E07", "E08", "E09",
                     "E10", "W01"]


def test_repair_spec_renames_follow():
    spec = {
        "name": "t", "root": "2bad class", "enums": [],
        "models": [
            {"name": "2bad class", "kind": "entity",
             "identity": ["for"], "fields": [
                 {"name": "for", "type": "str", "is_list": False,
                  "optional": False, "role": "identity",
                  "edge_label": None, "reference": False},
                 {"name": "child", "type": "sub item", "is_list": False,
                  "optional": True, "role": "property",
                  "edge_label": None, "reference": False}]},
            {"name": "sub item", "kind": "entity", "identity": [],
             "fields": [{"name": "v", "type": "str", "is_list": False,
                         "optional": True, "role": "property",
                         "edge_label": None, "reference": False}]},
        ],
    }
    fixed, actions = repair_spec(spec)
    assert fixed["root"] == "F2badClass"
    assert fixed["models"][0]["identity"] == ["for_"]
    assert fixed["models"][0]["fields"][1]["type"] == "SubItem"
    assert fixed["models"][1]["kind"] == "component"   # demoted
    assert lint_spec(fixed) == []
    assert len(actions) == 4


def test_render_verify_roundtrip(spec):
    src = render_template(spec)
    assert src == render_template(spec)  # byte-identical re-render
    classes = verify_template_source(src)
    doc = classes["Doc"]
    assert doc.model_config["graph_id_fields"] == ["doc_id"]
    assert doc.model_config["is_entity"] is True
    inst = doc(doc_id=7, lang="en", score=1.0, tags=["t"])
    assert inst.doc_id == 7 and inst.lang == "en"
    assert classes["DocLang"]("en").name == "EN"
    assert classes["DocLang"]("OTHER").name == "OTHER"


def test_render_edges_and_nesting():
    spec = {
        "name": "t", "docstring": "d", "root": "Root", "enums": [],
        "models": [
            {"name": "Root", "kind": "root", "identity": ["name"],
             "docstring": "", "fields": [
                 {"name": "name", "type": "str", "is_list": False,
                  "optional": False, "role": "identity",
                  "edge_label": None, "reference": False},
                 {"name": "parts", "type": "Part", "is_list": True,
                  "optional": True, "role": "edge",
                  "edge_label": "HAS_PART", "reference": False},
                 {"name": "owner", "type": "str", "is_list": False,
                  "optional": True, "role": "edge",
                  "edge_label": "OWNED_BY", "reference": True}]},
            {"name": "Part", "kind": "component", "identity": [],
             "docstring": "", "fields": [
                 {"name": "label", "type": "str", "is_list": False,
                  "optional": True, "role": "property",
                  "edge_label": None, "reference": False}]},
        ],
    }
    src = render_template(spec)
    # dependency-first: Part must be defined before Root
    assert src.index("class Part") < src.index("class Root")
    classes = verify_template_source(src)
    root = classes["Root"](name="r", parts=[classes["Part"](label="p")])
    assert root.parts[0].label == "p"
    extra = root.model_fields["parts"].json_schema_extra
    assert extra["edge_label"] == "HAS_PART"
    assert root.model_fields["owner"].json_schema_extra["graph_reference"]


def test_render_refuses_unsafe_names():
    spec = {"name": "t", "root": "A", "enums": [], "models": [
        {"name": "A; import os", "kind": "root", "identity": [],
         "fields": []}]}
    with pytest.raises(ValueError, match="unrenderable"):
        render_template(spec)


def test_sanitize_identifier():
    assert sanitize_identifier("2bad name!") == "f_2bad_name"
    assert sanitize_identifier("class") == "class_"
    assert sanitize_identifier("__dunder__") == "dunder"
    assert sanitize_identifier("sub item", pascal=True) == "SubItem"


def test_end_to_end_induction(ray_session):
    prof = profile_columns(_ds(ROWS), cls="Doc",
                           columns=["doc_id", "lang", "score"])
    spec = induce_spec(prof, root="Doc")
    fixed, _ = repair_spec(spec)
    assert lint_spec(fixed) == []
    classes = verify_template_source(render_template(fixed))
    assert "Doc" in classes


def test_render_max_instances_and_closed_catalog():
    from docling_graph_ray.templategen import (
        lint_spec, render_template, verify_template_source,
    )

    spec = {
        "name": "t", "docstring": "d", "root": "Root", "enums": [],
        "models": [
            {"name": "Root", "kind": "root", "identity": ["name"],
             "docstring": "", "max_instances": 3, "fields": [
                 {"name": "name", "type": "str", "is_list": False,
                  "optional": False, "role": "identity",
                  "edge_label": None, "reference": False},
                 {"name": "cats", "type": "str", "is_list": True,
                  "optional": True, "role": "edge",
                  "edge_label": "IN_CATALOG", "reference": True,
                  "closed_catalog": True},
                 {"name": "owner", "type": "str", "is_list": False,
                  "optional": True, "role": "edge",
                  "edge_label": "OWNED_BY", "reference": True,
                  "closed_catalog": True}]},
        ],
    }
    assert lint_spec(spec) == []
    src = render_template(spec)
    assert src == render_template(spec)
    classes = verify_template_source(src)
    root = classes["Root"]
    assert root.model_config["graph_max_instances"] == 3
    for fname in ("cats", "owner"):
        extra = root.model_fields[fname].json_schema_extra
        assert extra["reference_closed_catalog"] is True
        assert extra["graph_reference"] is True
    # list edge keeps its factory default alongside the catalog marker
    assert root(name="x").cats == []


def test_lint_marker_rules():
    from docling_graph_ray.templategen import lint_spec

    spec = {
        "name": "t", "docstring": "d", "root": "A", "enums": [],
        "models": [
            {"name": "A", "kind": "root", "identity": ["name"],
             "docstring": "", "max_instances": 0, "fields": [
                 {"name": "name", "type": "str", "is_list": False,
                  "optional": False, "role": "identity",
                  "edge_label": None, "reference": False},
                 {"name": "bad", "type": "str", "is_list": False,
                  "optional": True, "role": "property",
                  "edge_label": None, "reference": False,
                  "closed_catalog": True}]},
            {"name": "B", "kind": "component", "identity": [],
             "docstring": "", "max_instances": 2, "fields": [
                 {"name": "x", "type": "str", "is_list": False,
                  "optional": True, "role": "property",
                  "edge_label": None, "reference": False}]},
        ],
    }
    codes = {f["code"] for f in lint_spec(spec)}
    assert "E11" in codes   # max_instances=0
    assert "E12" in codes   # closed_catalog without reference
    assert "W02" in codes   # max_instances on a component


def test_lint_prose_hygiene_rules():
    from docling_graph_ray.templategen import (
        DOCSTRING_WINDOW, lint_spec, repair_spec,
    )

    long_doc = ("An invoice is a billing document. It is not a receipt. "
                "At most 3 per order. " + "Padding sentence here. " * 20)
    spec = {
        "name": "t", "root": "Invoice", "enums": [],
        "models": [
            {"name": "Invoice", "kind": "root",
             "identity": ["invoice_number"], "docstring": long_doc,
             "fields": [
                 {"name": "invoice_number", "type": "str", "is_list": False,
                  "optional": False, "role": "identity", "edge_label": None,
                  "examples": ["alpha", "beta"],  # digit-free!
                  "description": ""},
                 {"name": "total", "type": "float", "is_list": False,
                  "optional": True, "role": "property", "edge_label": None,
                  "description": "The grand total. Calculate it by "
                                 "multiplying price and quantity. "
                                 "Leave empty if absent."},
                 {"name": "notes", "type": "str", "is_list": True,
                  "optional": True, "role": "property", "edge_label": None,
                  "description": "Generate an id for each note."},
             ]},
        ],
    }
    codes = {f["code"] for f in lint_spec(spec)}
    assert "W03" in codes   # docstring over budget
    assert "W04" in codes   # computation / global-rule sentences
    assert "W05" in codes   # invention sentence
    assert "W06" in codes   # digit-free number-named identity
    assert "W09" in codes   # identity-less root list

    fixed, actions = repair_spec(spec)
    assert lint_spec(fixed) == []
    m = fixed["models"][0]
    # W06: identity renamed to 'name' (tracking the identity list)
    assert m["identity"] == ["name"]
    assert m["fields"][0]["name"] == "name"
    # W03: docstring reordered IS -> IS-NOT -> cardinality
    assert m["docstring"].startswith("An invoice is a billing document.")
    assert m["docstring"].index("not a receipt") > m["docstring"].index(
        "Padding sentence")
    # W04/W05 scrub keeps only the innocent sentences
    assert m["fields"][1]["description"] == "The grand total."
    assert m["fields"][2]["description"] == ""
    # W09 scheduled
    assert m["root_list_dedup"] == ["notes"]
    assert any("dedup" in a for a in actions)


def test_lint_identity_examples_and_digit_flags():
    from docling_graph_ray.templategen import lint_spec

    spec = {
        "name": "t", "root": "R", "enums": [],
        "models": [
            {"name": "R", "kind": "root", "identity": ["name"],
             "docstring": "", "fields": [
                 {"name": "name", "type": "str", "is_list": False,
                  "optional": False, "role": "identity", "edge_label": None,
                  "examples": ["123", "456"], "description": ""},
             ]},
        ],
    }
    codes = {f["code"] for f in lint_spec(spec)}
    assert "W07" in codes   # name identity holding digit-only values

    spec["models"][0]["fields"][0]["examples"] = ["only-one"]
    codes = {f["code"] for f in lint_spec(spec)}
    assert "W08" in codes   # fewer than 2 verbatim examples

    # no examples key at all (hand-authored spec) -> silent
    del spec["models"][0]["fields"][0]["examples"]
    assert lint_spec(spec) == []


def test_render_root_list_dedup_marker():
    from docling_graph_ray.templategen import (
        render_template, repair_spec, verify_template_source,
    )

    spec = {
        "name": "t", "docstring": "d", "root": "R", "enums": [],
        "models": [
            {"name": "R", "kind": "root", "identity": ["name"],
             "docstring": "", "fields": [
                 {"name": "name", "type": "str", "is_list": False,
                  "optional": False, "role": "identity",
                  "edge_label": None, "reference": False},
                 {"name": "tags", "type": "str", "is_list": True,
                  "optional": True, "role": "property",
                  "edge_label": None, "reference": False}]},
        ],
    }
    fixed, _ = repair_spec(spec)
    classes = verify_template_source(render_template(fixed))
    assert classes["R"].model_config["graph_root_list_dedup"] == ["tags"]
