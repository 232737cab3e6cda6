"""Per-partition checkpoint manifests for idempotent resume.

The reference has NO checkpoint/resume (SURVEY.md §4.1 — a failed run
restarts from scratch); this module is the designed replacement the north
rule requires: each url-hash partition writes its Parquet output
atomically (tmp + rename) and then drops a manifest JSON recording its
lineage/metrics.  Manifest presence == partition complete.  Resume is an
anti-join of input partition ids against completed manifests — only
missing partitions re-run, and determinism of the extractor makes the
re-run idempotent.
"""

from __future__ import annotations

import json
import os
import uuid

MANIFEST_DIR = "_manifests"


def _manifest_path(out_dir: str, part_id: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"part-{part_id:05d}.json")


def write_partition_atomic(out_dir: str, part_id: int, table, lineage: dict) -> None:
    """Write one partition's Parquet + manifest; safe to call twice
    (second write of the same deterministic content just overwrites)."""
    import pyarrow.parquet as pq

    part_dir = os.path.join(out_dir, f"part_id={part_id}")
    os.makedirs(part_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    tmp = os.path.join(part_dir, f".tmp-{uuid.uuid4().hex}.parquet")
    final = os.path.join(part_dir, "data.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, final)  # atomic on POSIX

    mtmp = _manifest_path(out_dir, part_id) + f".tmp-{uuid.uuid4().hex}"
    with open(mtmp, "w") as f:
        json.dump(lineage, f, sort_keys=True)
    os.replace(mtmp, _manifest_path(out_dir, part_id))


def completed_parts(out_dir: str) -> set[int]:
    """Partition ids with a committed manifest (the resume anti-join side)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            out.add(int(name[len("part-"):-len(".json")]))
    return out


def read_lineage(out_dir: str) -> list[dict]:
    """All committed lineage records, sorted by part_id."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    recs = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                recs.append(json.load(f))
    return sorted(recs, key=lambda r: r["part_id"])


def write_run_manifest(out_dir: str, config: dict) -> str:
    """Run-level metadata sidecar (the reference writes metadata.json per
    run, docling_graph/pipeline/orchestrator.py:128-231): records the
    pipeline config + the committed-partition lineage rollup.  Timestamp-
    free by default (byte-identical reruns); callers may put a timestamp
    in ``config`` explicitly."""
    recs = read_lineage(out_dir)
    manifest = {
        "format": "docling-graph-ray/run-manifest/v1",
        "config": dict(sorted(config.items())),
        "partitions_committed": len(recs),
        "totals": {
            # .get: a resumed run may roll up partitions committed by an
            # older build whose lineage predates a counter
            k: sum(r.get(k, 0) for r in recs)
            for k in ("n_urls", "n_ok", "n_salvaged", "n_fallback",
                      "n_failed", "n_image_only", "blocks_kept",
                      "blocks_dropped", "bytes_in", "bytes_out")
        },
    }
    path = os.path.join(out_dir, "run_manifest.json")
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True, indent=1)
    os.replace(tmp, path)
    return path
