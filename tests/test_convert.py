"""records → graph conversion (stages/convert.py): marker-driven walk,
component embedding, duplicate enrichment, closed-catalog handoff."""

import json

import pyarrow as pa
import ray

from docling_graph_ray.stages.convert import (
    finalize_nodes, records_to_graph, split_graph,
)

SPEC = {
    "name": "t", "docstring": "", "root": "Order", "enums": [],
    "models": [
        {"name": "Order", "kind": "root", "identity": ["order_id"],
         "docstring": "", "fields": [
             {"name": "order_id", "type": "int", "is_list": False,
              "optional": False, "role": "identity",
              "edge_label": None, "reference": False},
             {"name": "priority", "type": "str", "is_list": False,
              "optional": True, "role": "property",
              "edge_label": None, "reference": False},
             {"name": "meta", "type": "Meta", "is_list": False,
              "optional": True, "role": "property",
              "edge_label": None, "reference": False},
             {"name": "customer", "type": "Customer", "is_list": False,
              "optional": True, "role": "edge",
              "edge_label": "PLACED_BY", "reference": True,
              "closed_catalog": True}]},
        {"name": "Meta", "kind": "component", "identity": [],
         "docstring": "", "fields": [
             {"name": "status", "type": "str", "is_list": False,
              "optional": True, "role": "property",
              "edge_label": None, "reference": False},
             {"name": "approver", "type": "Customer", "is_list": False,
              "optional": True, "role": "edge",
              "edge_label": "APPROVED_BY", "reference": False}]},
        {"name": "Customer", "kind": "entity", "identity": ["cust_id"],
         "docstring": "", "fields": [
             {"name": "cust_id", "type": "int", "is_list": False,
              "optional": False, "role": "identity",
              "edge_label": None, "reference": False},
             {"name": "segment", "type": "str", "is_list": False,
              "optional": True, "role": "property",
              "edge_label": None, "reference": False}]},
    ],
}


def _records():
    recs = [
        {"order_id": 1, "priority": "HIGH",
         "meta": {"status": "F", "approver": {"cust_id": 9,
                                              "segment": None}},
         "customer": {"cust_id": 7, "segment": None}},
        # same customer again, now WITH a segment -> enrichment fills it
        {"order_id": 2, "priority": None,
         "meta": {"status": "O", "approver": None},
         "customer": {"cust_id": 7, "segment": "BUILDING"}},
    ]
    return ray.data.from_arrow(pa.table({
        "doc_key": [f"d{r['order_id']}" for r in recs],
        "record": [json.dumps(r) for r in recs],
    }))


def test_walk_mentions_edges(ray_session):
    tagged = records_to_graph(_records(), SPEC)
    mentions, edges = split_graph(tagged)
    m = mentions.take_all()
    e = edges.take_all()

    by_cls = {}
    for r in m:
        by_cls.setdefault(r["class"], []).append(r)
    assert len(by_cls["Order"]) == 2
    assert len(by_cls["Customer"]) == 3        # 7, 9, 7-again
    # component embeds in the parent's attrs; entity fields null out
    o1 = next(r for r in by_cls["Order"]
              if json.loads(r["attrs"])["order_id"] == 1)
    attrs = json.loads(o1["attrs"])
    assert attrs["customer"] is None
    assert attrs["meta"]["status"] == "F"
    assert attrs["meta"]["approver"] is None   # entity nulls inside component

    labels = sorted((r["label"], r["closed_catalog"]) for r in e)
    # order1: PLACED_BY (catalog) + APPROVED_BY through the component;
    # order2: PLACED_BY only
    assert labels == [("APPROVED_BY", False), ("PLACED_BY", True),
                      ("PLACED_BY", True)]
    # edges through a component hang off the nearest entity ancestor
    appr = next(r for r in e if r["label"] == "APPROVED_BY")
    assert appr["src"] == o1["node_id"]


def test_finalize_enrichment(ray_session):
    mentions, _ = split_graph(records_to_graph(_records(), SPEC))
    nodes = {json.loads(r["attrs"]).get("cust_id"): r
             for r in finalize_nodes(mentions).take_all()
             if r["class"] == "Customer"}
    c7 = nodes[7]
    assert c7["n_mentions"] == 2
    # first mention (doc d1) had no segment; the d2 mention fills it
    assert json.loads(c7["attrs"])["segment"] == "BUILDING"
    # determinism: same input -> byte-identical node rows
    again = {json.loads(r["attrs"]).get("cust_id"): r
             for r in finalize_nodes(split_graph(
                 records_to_graph(_records(), SPEC))[0]).take_all()
             if r["class"] == "Customer"}
    assert again[7] == c7


def test_closed_catalog_handoff(ray_session):
    from docling_graph_ray.stages.graph import enforce_closed_catalogs

    tagged = records_to_graph(_records(), SPEC)
    mentions, edges = split_graph(tagged)
    nodes = finalize_nodes(mentions)
    # customer 7 is reached ONLY via closed-catalog PLACED_BY edges ->
    # candidate; customer 9 has an unmarked APPROVED_BY edge -> anchored.
    # guard does not fire (9 anchors the Customer class).
    nodes_out, edges_out, audit = enforce_closed_catalogs(
        nodes.map_batches(
            lambda b: b.select(["node_id", "class"]),
            batch_format="pyarrow"),
        edges,
    )
    assert audit["skipped_classes"] == []
    assert audit["drops_by_label"] == {"PLACED_BY": 2}
    kept = sorted(r["label"] for r in edges_out.take_all())
    assert kept == ["APPROVED_BY"]


def test_deep_nesting_and_entity_lists(ray_session):
    """Entities nested three levels down (entity → component → entity
    list) all surface as nodes; edges hang off the nearest entity."""
    import pyarrow as pa
    import ray

    spec = {
        "name": "t", "docstring": "", "root": "Org", "enums": [],
        "models": [
            {"name": "Org", "kind": "root", "identity": ["org_id"],
             "docstring": "", "fields": [
                 {"name": "org_id", "type": "int", "is_list": False,
                  "optional": False, "role": "identity",
                  "edge_label": None, "reference": False},
                 {"name": "hq", "type": "Address", "is_list": False,
                  "optional": True, "role": "property",
                  "edge_label": None, "reference": False}]},
            {"name": "Address", "kind": "component", "identity": [],
             "docstring": "", "fields": [
                 {"name": "city", "type": "str", "is_list": False,
                  "optional": True, "role": "property",
                  "edge_label": None, "reference": False},
                 {"name": "tenants", "type": "Person", "is_list": True,
                  "optional": True, "role": "edge",
                  "edge_label": "HOUSES", "reference": False}]},
            {"name": "Person", "kind": "entity", "identity": ["pid"],
             "docstring": "", "fields": [
                 {"name": "pid", "type": "int", "is_list": False,
                  "optional": False, "role": "identity",
                  "edge_label": None, "reference": False}]},
        ],
    }
    import json as _json

    from docling_graph_ray.stages.convert import (
        records_to_graph, split_graph,
    )

    rec = {"org_id": 1, "hq": {"city": "Bern",
                               "tenants": [{"pid": 7}, {"pid": 8}]}}
    ds = ray.data.from_arrow(pa.table({
        "doc_key": ["d"], "record": [_json.dumps(rec)]}))
    mentions, edges = split_graph(records_to_graph(ds, spec))
    m = mentions.take_all()
    e = edges.take_all()
    assert sorted(r["class"] for r in m) == ["Org", "Person", "Person"]
    org = next(r for r in m if r["class"] == "Org")
    # component embeds with the entity list nulled out
    assert _json.loads(org["attrs"])["hq"] == {"city": "Bern",
                                               "tenants": None}
    assert [r["label"] for r in e] == ["HOUSES", "HOUSES"]
    assert all(r["src"] == org["node_id"] for r in e)
