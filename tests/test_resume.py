"""Resume idempotence (SURVEY.md §5.2 item 4, FIXTURES.md §3).

Kill after K partitions → re-run → lineage equals the full-run lineage and
no partition is recomputed twice."""

import os
import shutil

import pandas as pd

from docling_graph_ray.fixtures.pages import pages_dataset
from docling_graph_ray.pipelines.extract import run_extract_pipeline
from docling_graph_ray.state.manifest import completed_parts, read_lineage

N = 200
P = 8


def _run(out_dir):
    return run_extract_pipeline(
        pages_dataset(N, profile="t1"), out_dir=out_dir, num_partitions=P
    ).to_pandas()


def test_resume_after_partial_failure(ray_session, tmp_path):
    full_dir = str(tmp_path / "full")
    _run(full_dir)
    full = sorted(read_lineage(full_dir), key=lambda r: r["part_id"])
    assert len(full) == P

    # simulate a crash: keep only 3 committed partitions
    part_dir = str(tmp_path / "partial")
    _run(part_dir)
    for pid in range(3, P):
        os.remove(os.path.join(part_dir, "_manifests", f"part-{pid:05d}.json"))
        shutil.rmtree(os.path.join(part_dir, f"part_id={pid}"))
    assert completed_parts(part_dir) == {0, 1, 2}

    # resume: only the missing partitions are recomputed
    resumed = _run(part_dir)
    assert sorted(resumed["part_id"]) == list(range(3, P))

    after = sorted(read_lineage(part_dir), key=lambda r: r["part_id"])
    assert after == full  # byte-identical lineage incl. content_hash rollups


def test_rerun_when_complete_is_noop(ray_session, tmp_path):
    out = str(tmp_path / "out")
    _run(out)
    before = read_lineage(out)
    again = _run(out)
    assert len(again) == 0  # nothing left to do
    assert read_lineage(out) == before


def test_cli_extract_report_chunks(ray_session, tmp_path):
    """End-to-end CLI: extract → report → chunks over a pages parquet."""
    import pyarrow.parquet as pq

    from docling_graph_ray.__main__ import main
    from docling_graph_ray.fixtures.pages import make_pages_table

    src = str(tmp_path / "pages.parquet")
    pq.write_table(make_pages_table(list(range(80)), profile="t1"), src)
    out = str(tmp_path / "run")
    assert main(["extract", "--input", src, "--out", out,
                 "--partitions", "4"]) == 0
    report = (tmp_path / "run" / "report.md").read_text()
    assert "partitions committed: **4**" in report
    assert "parse failure rate: 0.0000%" in report

    chunks_out = str(tmp_path / "chunks")
    data = str(tmp_path / "run" / "part_id=0" / "data.parquet")
    assert main(["chunks", "--input", data, "--out", chunks_out,
                 "--max-tokens", "64"]) == 0
    t = pq.read_table(chunks_out)
    assert t.num_rows > 0 and "chunk_text" in t.schema.names
