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
