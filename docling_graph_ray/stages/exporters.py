"""Graph exporters in the reference's canonical shapes.

- ``export_graph_csv``: ``nodes.csv`` + ``edges.csv`` (Neo4j-ready; all
  non-numeric fields quoted; struct/list attrs JSON-encoded) — reference
  docling_graph/core/exporters/csv_exporter.py:15-111, re-expressed as
  Ray Dataset writes (``write_csv`` task-parallel for big graphs, a
  single-file driver write for small ones).
- ``export_graph_json`` / ``graph_to_dict``: canonical ``graph.json``
  ``{nodes, edges, metadata, graph}`` shape — reference
  docling_graph/core/exporters/json_exporter.py:14-80.  ``graph`` carries
  the format marker ``docling-graph/v2`` equivalent for conformance.
- ``export_graph_jsonl``: the scale path — one JSON object per line via
  ``Dataset.write_json`` (node/edge files per block, resumable layout).

Determinism: exports are timestamp-free by default (the reference's merge
subsystem is deliberately timestamp-free for byte-identical reruns,
docling_graph/core/merge/merger.py:68-73); callers may inject a
``created_at`` explicitly."""

from __future__ import annotations

import csv
import io
import json
import os
from typing import Any

FORMAT_MARKER = "docling-graph-ray/v1"


def _encode_cell(v: Any) -> Any:
    if isinstance(v, (dict, list)):
        return json.dumps(v, sort_keys=True, default=str)
    return v


def _rows_sorted(ds, sort_cols: list[str]) -> list[dict]:
    rows = [r for batch in ds.to_arrow_refs() for r in _get(batch).to_pylist()]
    rows.sort(key=lambda r: tuple(str(r.get(c)) for c in sort_cols))
    return rows


def _get(ref):
    import ray

    return ray.get(ref)


def export_graph_csv(nodes, edges, out_dir: str, *,
                     node_sort: list[str] | None = None,
                     edge_sort: list[str] | None = None) -> dict[str, str]:
    """Write ``nodes.csv`` + ``edges.csv``; deterministic row order.

    Small-graph path: rows collected driver-side and written as ONE file
    each (the reference's exact layout).  For big graphs use
    ``nodes.write_csv(dir)`` directly — this helper is the conformance
    shape, not the 100 TB path."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, ds, sort_cols in (
        ("nodes", nodes, node_sort or ["node_id"]),
        ("edges", edges, edge_sort or ["src", "dst", "label"]),
    ):
        rows = _rows_sorted(ds, sort_cols)
        path = os.path.join(out_dir, f"{name}.csv")
        buf = io.StringIO()
        if rows:
            writer = csv.DictWriter(
                buf, fieldnames=list(rows[0].keys()), quoting=csv.QUOTE_NONNUMERIC
            )
            writer.writeheader()
            for r in rows:
                writer.writerow({k: _encode_cell(v) for k, v in r.items()})
        with open(path, "w") as f:
            f.write(buf.getvalue())
        paths[name] = path
    return paths


def graph_to_dict(nodes, edges, metadata: dict | None = None) -> dict:
    """Canonical in-memory graph dict (json_exporter.py:14-80 shape)."""
    return {
        "nodes": _rows_sorted(nodes, ["node_id"]),
        "edges": _rows_sorted(edges, ["src", "dst", "label"]),
        "metadata": dict(metadata or {}),
        "graph": {"format": FORMAT_MARKER},
    }


def export_graph_json(nodes, edges, path: str, metadata: dict | None = None) -> str:
    d = graph_to_dict(nodes, edges, metadata)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(d, f, sort_keys=True, default=str)
    os.replace(tmp, path)
    return path


def export_graph_jsonl(nodes, edges, out_dir: str) -> dict[str, str]:
    """Scale path: task-parallel JSONL writes, one directory per table."""
    node_dir = os.path.join(out_dir, "nodes")
    edge_dir = os.path.join(out_dir, "edges")
    nodes.write_json(node_dir)
    edges.write_json(edge_dir)
    return {"nodes": node_dir, "edges": edge_dir}


def import_graph_json(path: str) -> tuple[list[dict], list[dict], dict]:
    """Read a canonical graph.json back (importers/graph_json.py:96-215
    analogue): returns (nodes, edges, metadata); format marker checked."""
    with open(path) as f:
        d = json.load(f)
    if d.get("graph", {}).get("format") != FORMAT_MARKER:
        raise ValueError(f"not a {FORMAT_MARKER} export: {path}")
    return d["nodes"], d["edges"], d.get("metadata", {})
