"""Ontology → template compilers: JSON Schema, LinkML, OWL/TTL.

Golden-style checks analogous to the reference's ontology fixtures
(reference: tests/fixtures/templategen/ontologies/*,
golden/policy_ontology.py): each compiler's spec renders through the
deterministic renderer and passes the exec-verify gate with the expected
classes, identity fields, enums, and edge markers."""

import json

from docling_graph_ray.ontology import (
    spec_from_json_schema,
    spec_from_linkml,
    spec_from_ttl,
)
from docling_graph_ray.templategen import render_template, verify_template_source

ORDER_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "title": "PurchaseOrder",
    "description": "A purchase order document.",
    "type": "object",
    "required": ["order_number", "issue_date"],
    "properties": {
        "order_number": {"type": "string", "examples": ["PO-1", "PO-2"]},
        "issue_date": {"type": "string", "format": "date"},
        "updated_at": {"type": "string", "format": "date-time"},
        "status": {"type": "string", "enum": ["open", "closed"]},
        "priority": {"oneOf": [{"const": "low"}, {"const": "high"}]},
        "total": {
            "type": "object",
            "properties": {"amount": {"type": "number"},
                           "currency": {"type": "string"}},
        },
        "items": {"type": "array", "items": {"$ref": "#/$defs/Item"}},
        "vendor": {"$ref": "#/$defs/Vendor"},
        "tags": {"type": "array", "items": {"type": "string"}},
        "paid": {"type": "boolean"},
    },
    "$defs": {
        "Item": {
            "type": "object",
            "required": ["sku"],
            "properties": {"sku": {"type": "string"},
                           "qty": {"type": "integer"}},
        },
        "Vendor": {
            "allOf": [
                {"type": "object",
                 "properties": {"name": {"type": "string"}},
                 "required": ["name"]},
                {"type": "object",
                 "properties": {"vat_code": {"type": "string"}}},
            ],
        },
    },
}


def test_json_schema_compile_and_render():
    spec = spec_from_json_schema(ORDER_SCHEMA)
    assert spec["root"] == "PurchaseOrder"
    by_name = {m["name"]: m for m in spec["models"]}
    assert set(by_name) == {"PurchaseOrder", "Item", "Vendor", "Total"}
    root = by_name["PurchaseOrder"]
    fields = {f["name"]: f for f in root["fields"]}
    # required → non-optional; formats map; scalars map
    assert not fields["order_number"]["optional"]
    assert fields["issue_date"]["type"] == "date"
    assert fields["updated_at"]["type"] == "datetime"
    assert fields["paid"]["type"] == "bool"
    assert fields["tags"]["is_list"] and fields["tags"]["type"] == "str"
    # enum + oneOf-of-consts → enums
    enames = {e["name"]: e["members"] for e in spec["enums"]}
    assert enames["PurchaseOrderStatus"] == ["open", "closed"]
    assert enames["PurchaseOrderPriority"] == ["low", "high"]
    # refs and inline objects → edges
    assert fields["items"]["role"] == "edge" and fields["items"]["is_list"]
    assert fields["items"]["type"] == "Item"
    assert fields["vendor"]["type"] == "Vendor"
    assert fields["total"]["type"] == "Total"
    # allOf merged: Vendor has both fields, name required
    vfields = {f["name"]: f for f in by_name["Vendor"]["fields"]}
    assert set(vfields) == {"name", "vat_code"}
    assert not vfields["name"]["optional"]
    # identity heuristics: order_number; Item.sku
    assert root["identity"] == ["order_number"]
    assert by_name["Item"]["identity"] == ["sku"]
    # renders + verifies
    classes = verify_template_source(render_template(spec))
    assert {"PurchaseOrder", "Item", "Vendor", "Total"} <= set(classes)
    po = classes["PurchaseOrder"]
    assert po.model_config.get("graph_id_fields") == ["order_number"]
    inst = po(order_number="PO-9", issue_date="2024-01-01")
    assert inst.order_number == "PO-9"


LIBRARY_YAML = """
id: https://example.org/lending
name: lending
description: Lending domain.
default_range: string
classes:
  NamedThing:
    abstract: true
    slots: [note]
  Library:
    tree_root: true
    description: A lending library.
    slots: [library_name, status, books]
  Book:
    is_a: NamedThing
    description: A catalogued book.
    slots: [isbn, page_count, author]
    slot_usage:
      page_count:
        description: Pages as printed.
  Person:
    slots: [person_name]
slots:
  note: {}
  library_name:
    identifier: true
  status:
    range: LoanStatus
  books:
    range: Book
    multivalued: true
  isbn:
    identifier: true
  page_count:
    range: integer
  author:
    range: Person
  person_name:
    required: true
enums:
  LoanStatus:
    permissible_values:
      on_loan: {}
      returned: {}
"""


def test_linkml_compile_and_render():
    spec = spec_from_linkml(LIBRARY_YAML)
    assert spec["root"] == "Library"
    by_name = {m["name"]: m for m in spec["models"]}
    assert set(by_name) == {"Library", "Book", "Person"}  # abstract dropped
    book = by_name["Book"]
    bfields = {f["name"]: f for f in book["fields"]}
    # is_a flattening pulled the parent slot in
    assert "note" in bfields
    assert bfields["page_count"]["type"] == "int"
    assert bfields["page_count"]["description"] == "Pages as printed."
    assert bfields["author"]["role"] == "edge"
    assert book["identity"] == ["isbn"]
    lib = by_name["Library"]
    lfields = {f["name"]: f for f in lib["fields"]}
    assert lfields["books"]["is_list"] and lfields["books"]["type"] == "Book"
    assert lfields["status"]["type"] == "LoanStatus"
    assert lib["identity"] == ["library_name"]
    enums = {e["name"]: e["members"] for e in spec["enums"]}
    assert enums["LoanStatus"] == ["on_loan", "returned"]
    classes = verify_template_source(render_template(spec))
    assert {"Library", "Book", "Person"} <= set(classes)


POLICY_TTL = """
@prefix ex: <http://example.org/cover#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:Contract a owl:Class ;
    rdfs:comment "A cover contract." .

ex:Clause a owl:Class ;
    rdfs:comment "One clause of a contract." .

ex:SpecialClause a owl:Class ;
    rdfs:subClassOf ex:Clause .

ex:contractNumber a owl:DatatypeProperty, owl:InverseFunctionalProperty ;
    rdfs:domain ex:Contract ;
    rdfs:range xsd:string ;
    skos:example "C-1", "C-2" .

ex:premium a owl:DatatypeProperty, owl:FunctionalProperty ;
    rdfs:domain ex:Contract ;
    rdfs:range xsd:decimal .

ex:active a owl:DatatypeProperty, owl:FunctionalProperty ;
    rdfs:domain ex:Contract ;
    rdfs:range xsd:boolean .

ex:startDate a owl:DatatypeProperty, owl:FunctionalProperty ;
    rdfs:domain ex:Contract ;
    rdfs:range xsd:date .

ex:remark a owl:DatatypeProperty ;
    rdfs:domain ex:Contract ;
    rdfs:range xsd:string .

ex:Contract rdfs:subClassOf [
    a owl:Restriction ;
    owl:onProperty ex:remark ;
    owl:maxCardinality "1"^^xsd:nonNegativeInteger
] .

ex:hasClause a owl:ObjectProperty ;
    rdfs:domain ex:Contract ;
    rdfs:range ex:Clause ;
    rdfs:comment "A clause of the contract." .

ex:clauseCode a owl:DatatypeProperty, owl:InverseFunctionalProperty ;
    rdfs:domain ex:Clause ;
    rdfs:range xsd:string .
"""


def test_ttl_compile_and_render():
    spec = spec_from_ttl(POLICY_TTL)
    by_name = {m["name"]: m for m in spec["models"]}
    assert set(by_name) == {"Contract", "Clause", "SpecialClause"}
    assert spec["root"] == "Contract"  # never an object range
    c = by_name["Contract"]
    cfields = {f["name"]: f for f in c["fields"]}
    assert c["identity"] == ["contractNumber"]        # InverseFunctional
    assert cfields["premium"]["type"] == "float"
    assert not cfields["premium"]["is_list"]          # Functional → single
    assert cfields["active"]["type"] == "bool"
    assert cfields["startDate"]["type"] == "date"
    assert not cfields["remark"]["is_list"]           # maxCardinality 1
    assert cfields["hasClause"]["role"] == "edge"
    assert cfields["hasClause"]["is_list"]            # unrestricted obj prop
    assert cfields["hasClause"]["type"] == "Clause"
    assert cfields["contractNumber"]["examples"] == ["C-1", "C-2"]
    # subclass flattening: SpecialClause inherits clauseCode
    sfields = {f["name"] for f in by_name["SpecialClause"]["fields"]}
    assert "clauseCode" in sfields
    assert by_name["SpecialClause"]["identity"] == ["clauseCode"]
    classes = verify_template_source(render_template(spec))
    assert {"Contract", "Clause", "SpecialClause"} <= set(classes)
    assert classes["Contract"].model_config.get("graph_id_fields") == [
        "contractNumber"]


def test_ttl_skos_scheme_enum():
    ttl = """
@prefix ex: <http://example.org/s#> .
@prefix owl: <http://www.w3.org/2002/07/owl#> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:Severity a skos:ConceptScheme .
ex:low a skos:Concept ; skos:inScheme ex:Severity ; skos:prefLabel "low" .
ex:high a skos:Concept ; skos:inScheme ex:Severity ; skos:prefLabel "high" .

ex:Incident a owl:Class .
ex:severity a owl:DatatypeProperty, owl:FunctionalProperty ;
    rdfs:domain ex:Incident ;
    rdfs:range ex:Severity .
ex:incidentId a owl:DatatypeProperty, owl:InverseFunctionalProperty ;
    rdfs:domain ex:Incident ;
    rdfs:range xsd:string .
"""
    spec = spec_from_ttl(ttl)
    enums = {e["name"]: e["members"] for e in spec["enums"]}
    assert enums == {"Severity": ["high", "low"]}
    inc = {m["name"]: m for m in spec["models"]}["Incident"]
    f = {f["name"]: f for f in inc["fields"]}
    assert f["severity"]["type"] == "Severity"
    classes = verify_template_source(render_template(spec))
    assert "Incident" in classes


def test_render_deterministic():
    src1 = render_template(spec_from_json_schema(ORDER_SCHEMA))
    src2 = render_template(spec_from_json_schema(
        json.loads(json.dumps(ORDER_SCHEMA))))
    assert src1 == src2
