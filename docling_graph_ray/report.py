"""Run report: human-readable markdown from the run's lineage records.

The reference's Visualization stage writes a markdown report with stats
and diagnostics next to the run artifacts
(docling_graph/core/visualizers/report_generator.py:13-260); here the
report renders from the per-partition lineage manifests — driver-side
small data, deterministic row order."""

from __future__ import annotations

import json
import os

from docling_graph_ray.state.manifest import read_lineage


def render_run_report(out_dir: str) -> str:
    """out_dir (a completed run) → markdown string."""
    recs = read_lineage(out_dir)
    man_path = os.path.join(out_dir, "run_manifest.json")
    config = {}
    if os.path.exists(man_path):
        with open(man_path) as f:
            config = json.load(f).get("config", {})

    def total(k: str) -> int:
        return sum(r.get(k, 0) for r in recs)

    n_urls = total("n_urls") or 1
    lines = [
        "# Extraction run report",
        "",
        f"- partitions committed: **{len(recs)}**",
        f"- documents (deduped urls): **{total('n_urls')}**",
        f"- parse outcomes: ok {total('n_ok')}, salvaged {total('n_salvaged')},"
        f" fallback {total('n_fallback')}, failed {total('n_failed')},"
        f" image-only {total('n_image_only')}",
        f"- parse failure rate: {total('n_failed') / n_urls:.4%}",
        f"- OCR gap (image-only, text-free docs): "
        f"{total('n_image_only') / n_urls:.4%}",
        f"- blocks kept/dropped: {total('blocks_kept')} /"
        f" {total('blocks_dropped')}",
        f"- bytes in → out: {total('bytes_in'):,} → {total('bytes_out'):,}"
        f" ({total('bytes_out') / max(1, total('bytes_in')):.1%} retained)",
        "",
    ]
    if config:
        lines += ["## Config", ""]
        lines += [f"- {k}: {v}" for k, v in sorted(config.items())]
        lines += [""]
    lines += [
        "## Partitions",
        "",
        "| part | urls | ok | salvaged | fallback | failed | bytes out | content hash |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in recs:
        lines.append(
            f"| {r['part_id']} | {r['n_urls']} | {r['n_ok']} |"
            f" {r['n_salvaged']} | {r['n_fallback']} | {r['n_failed']} |"
            f" {r['bytes_out']:,} | `{r['content_hash']}` |"
        )
    return "\n".join(lines) + "\n"


def write_run_report(out_dir: str) -> str:
    path = os.path.join(out_dir, "report.md")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(render_run_report(out_dir))
    os.replace(tmp, path)
    return path
