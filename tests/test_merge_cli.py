"""Whole-graph merge composition (docling_graph_ray/merge.py) and the
``merge`` CLI subcommand — mirrors the reference merge flow
(merger.py:141-972): absorb → gate → re-key → split → fold → report."""

import json

import pytest

from docling_graph_ray.functions.merge_gate import stamp_graph_metadata
from docling_graph_ray.merge import merge_graph_dicts, merge_graph_files

ID_MAP = {"Person": ["name"]}


def _g(doc, nodes, edges=(), id_map=ID_MAP):
    from docling_graph_ray.stages.exporters import FORMAT_MARKER

    return {
        "nodes": [dict(n) for n in nodes],
        "edges": [dict(e) for e in edges],
        "metadata": stamp_graph_metadata({"document_id": doc},
                                         id_fields_map=id_map),
        "graph": {"format": FORMAT_MARKER},
    }


def _person(nid, name, **attrs):
    return {"node_id": nid, "__class__": "Person", "name": name, **attrs}


def test_merge_self_is_identity():
    a = _g("d1", [_person("x", "Ada", role="eng")],
           [{"src": "x", "dst": "x2", "label": "KNOWS"}])
    merged, report = merge_graph_dicts([a, a])
    again, _ = merge_graph_dicts([a])
    assert merged["nodes"] == again["nodes"]
    assert merged["edges"] == again["edges"]
    assert report["absorbed_duplicates"][0]["document_id"] == "d1"


def test_merge_gate_refuses_mismatched_schemas():
    a = _g("d1", [_person("x", "Ada")])
    b = _g("d2", [_person("y", "Bob")], id_map={"Person": ["name", "email"]})
    with pytest.raises(ValueError, match="refusing to merge"):
        merge_graph_dicts([a, b])
    merged, report = merge_graph_dicts([a, b], strict=False)
    assert report["warnings"]
    assert len(merged["nodes"]) == 2


def test_merge_fill_empty_folds_without_split():
    # same person from two docs, NO conflicting scalar: fill-empty folds
    # (split guard only fires on rule-8 scalar conflicts)
    a = _g("d1", [_person("x", "Ada", role="eng", city=None)])
    b = _g("d2", [_person("x", "Ada", role=None, city="Zurich")])
    merged, report = merge_graph_dicts([a, b], rekey=False)
    (node,) = merged["nodes"]
    assert node["role"] == "eng"            # keep-first
    assert node["city"] == "Zurich"         # fill-empty
    assert report["splits"] == [] and report["fold_conflicts"] == []


def test_merge_conflicting_scalars_split_not_fold():
    # cross-doc scalar conflict with no shared root -> rule-8 split,
    # NOT a silent keep-first fold (merger.py:473-596)
    a = _g("d1", [_person("x", "Ada", role="eng")])
    b = _g("d2", [_person("x", "Ada", role="mgr")])
    merged, report = merge_graph_dicts([a, b], rekey=False)
    assert len(merged["nodes"]) == 2
    assert len(report["splits"]) == 1
    assert report["splits"][0]["conflicting_fields"] == ["role"]


def test_merge_rekey_fanin_records_conflicts():
    # one input, two ids with equal canonical identity but conflicting
    # scalars: the re-key fan-in folds keep-first and RECORDS the loss
    a = _g("d1", [_person("n1", "Ada Lovelace", role="eng"),
                  _person("n2", "ada  lovelace", role="mgr")])
    merged, report = merge_graph_dicts([a])
    assert len(merged["nodes"]) == 1
    assert merged["nodes"][0]["role"] == "eng"
    assert any(c["field"] == "role" for c in report["rekey_conflicts"])


def test_merge_split_follows_edges():
    # same id, different docs, conflicting scalar, no shared root ->
    # the later doc's node splits and ITS edges follow the rename
    a = _g("d1", [_person("p", "Ada", email="a@x")],
           [{"src": "p", "dst": "q", "label": "KNOWS"}])
    b = _g("d2", [_person("p", "Ada", email="b@y")],
           [{"src": "p", "dst": "q", "label": "KNOWS"}])
    merged, report = merge_graph_dicts([a, b], rekey=False)
    assert len(report["splits"]) == 1
    split_id = report["splits"][0]["split_id"]
    ids = {n["node_id"] for n in merged["nodes"]}
    assert {"p", split_id} <= ids
    srcs = sorted(e["src"] for e in merged["edges"])
    assert srcs == sorted(["p", split_id])


def test_merge_rekey_folds_equal_identities():
    # different input ids, same canonical identity -> re-key folds them
    a = _g("d1", [_person("n1", "Ada Lovelace", role="eng")])
    b = _g("d2", [_person("n2", "ada  lovelace", city="London")])
    merged, _ = merge_graph_dicts([a, b])
    assert len(merged["nodes"]) == 1
    n = merged["nodes"][0]
    assert n["role"] == "eng" and n["city"] == "London"
    assert n["node_id"].startswith("Person_")


def test_merge_cli_roundtrip(tmp_path):
    from docling_graph_ray.__main__ import main

    p1, p2 = tmp_path / "g1.json", tmp_path / "g2.json"
    p1.write_text(json.dumps(_g(
        "d1", [_person("x", "Ada", role="eng")],
        [{"src": "x", "dst": "y", "label": "KNOWS"}])))
    p2.write_text(json.dumps(_g("d2", [_person("y", "Bob")])))
    out = tmp_path / "merged" / "graph.json"
    rc = main(["merge", "--inputs", str(p1), str(p2), "--out", str(out)])
    assert rc == 0
    merged = json.loads(out.read_text())
    assert len(merged["nodes"]) == 2
    report = json.loads((out.parent / "merge_report.json").read_text())
    assert report["n_nodes"] == 2 and report["n_edges"] == 1
    # byte-identical re-run (determinism discipline, merger.py:68-73)
    before = out.read_bytes()
    assert main(["merge", "--inputs", str(p1), str(p2),
                 "--out", str(out)]) == 0
    assert out.read_bytes() == before
