"""The flagship pipeline: pages → extracted text + spans + lineage.

Ray-Data-first shape (SURVEY.md §7):

    read/generate pages (url, warc_ts, html, text, lang)
      → classify: content_kind + size_bucket + part_id   (cheap, vectorized)
      → three lanes (size-bucketed / content-routed):
          html        map_batches(extract_batch, batch_size=64)
          html_giant  map_batches(extract_batch, batch_size=4)   # skew lane
          pdf         map_batches(PdfParseActor, concurrency=…)  # warm actors
      → union
      → groupby(part_id).map_groups(PartitionFinalizer)          # ONE shuffle
          - latest-wins url dedup (url-hash partitioning makes it global)
          - per-partition lineage + metrics
          - atomic partition Parquet + manifest (idempotent resume)

Design notes for 100 TB:
- the single wide op is the url-hash groupby, and the same key drives
  dedup, lineage, checkpoint layout and resume (SURVEY.md §7.4);
- ``html`` is projected away inside the extract stage, so the shuffle
  moves extracted text only (§7.5);
- ``num_partitions`` must scale with input size (each partition's group is
  held in one worker: target 100–500 MB of *output* per partition);
- lane branches re-evaluate only the cheap classify projection; the heavy
  parse runs exactly once per row, in exactly one lane;
- resume filters completed partitions out BEFORE the parse, so a resumed
  run pays only for missing partitions.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from docling_graph_ray.functions.hashing import url_part_ids, xor_rollup_hex
from docling_graph_ray.stages.html_extract import extract_batch
from docling_graph_ray.stages.pdf_parse import PDF_MAGIC, PdfParseActor
from docling_graph_ray.state.manifest import completed_parts, write_partition_atomic

DEFAULT_GIANT_BYTES = 1 << 20  # 1 MB: giant-lane threshold

LINEAGE_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("n_urls", pa.int64()),
        ("n_ok", pa.int64()),
        ("n_salvaged", pa.int64()),
        ("n_fallback", pa.int64()),
        ("n_failed", pa.int64()),
        ("blocks_kept", pa.int64()),
        ("blocks_dropped", pa.int64()),
        ("bytes_in", pa.int64()),
        ("bytes_out", pa.int64()),
        ("content_hash", pa.string()),
    ]
)


# ---------------------------------------------------------------------------
# classify (lane + partition id) — cheap vectorized projection


def make_classifier(num_partitions: int, giant_bytes: int = DEFAULT_GIANT_BYTES):
    def classify(batch: pa.Table) -> pa.Table:
        html = batch.column("html")
        nbytes = pc.binary_length(html).cast(pa.int64())
        try:
            prefix = pc.binary_slice(html, 0, len(PDF_MAGIC))
            is_pdf = pc.equal(prefix, PDF_MAGIC)
        except (AttributeError, pa.ArrowNotImplementedError):
            is_pdf = pa.array(
                [(h or b"")[: len(PDF_MAGIC)] == PDF_MAGIC for h in html.to_pylist()]
            )
        is_pdf = pc.fill_null(is_pdf, False)
        giant = pc.and_(pc.invert(is_pdf), pc.greater_equal(nbytes, giant_bytes))
        lane = pc.if_else(
            is_pdf, "pdf", pc.if_else(giant, "html_giant", "html")
        )
        part = pa.array(
            url_part_ids(batch.column("url").to_pylist(), num_partitions),
            pa.int32(),
        )
        return batch.append_column("lane", lane).append_column("part_id", part)

    return classify


def _passthrough_part_id(fn):
    """Wrap an EXTRACT_SCHEMA batch fn so part_id survives the stage."""

    def wrapped(batch: pa.Table) -> pa.Table:
        out = fn(batch)
        return out.append_column("part_id", batch.column("part_id"))

    return wrapped


class _PdfLane(PdfParseActor):
    def __call__(self, batch: pa.Table) -> pa.Table:
        out = super().__call__(batch)
        return out.append_column("part_id", batch.column("part_id"))


# ---------------------------------------------------------------------------
# partition finalizer (the wide step)


def _dedup_latest_wins(group: pa.Table) -> pa.Table:
    """Per-url latest-wins (warc_ts desc, text_sha256 desc tie-break) —
    the per-group-first pattern (reference semantics: duplicate absorption
    in docling_graph/core/merge/merger.py:175-238, re-expressed as a
    sort + first-occurrence mask)."""
    import numpy as np

    idx = pc.sort_indices(
        group,
        sort_keys=[
            ("url", "ascending"),
            ("warc_ts", "descending"),
            ("text_sha256", "descending"),
        ],
    )
    g = group.take(idx)
    urls = np.asarray(g.column("url").to_pylist(), dtype=object)
    mask = np.empty(len(urls), dtype=bool)
    if len(urls):
        mask[0] = True
        mask[1:] = urls[1:] != urls[:-1]
    return g.filter(pa.array(mask))


def _lineage_record(part_id: int, deduped: pa.Table) -> dict:
    status = deduped.column("parse_status")
    def _count(v: str) -> int:
        return int(pc.sum(pc.cast(pc.equal(status, v), pa.int64())).as_py() or 0)

    return {
        "part_id": int(part_id),
        "n_urls": deduped.num_rows,
        "n_ok": _count("ok"),
        "n_salvaged": _count("salvaged"),
        "n_fallback": _count("fallback_text"),
        "n_failed": _count("failed"),
        "blocks_kept": int(pc.sum(deduped.column("n_blocks_kept")).as_py() or 0),
        "blocks_dropped": int(pc.sum(deduped.column("n_blocks_dropped")).as_py() or 0),
        "bytes_in": int(pc.sum(deduped.column("bytes_in")).as_py() or 0),
        "bytes_out": int(pc.sum(deduped.column("bytes_out")).as_py() or 0),
        "content_hash": xor_rollup_hex(deduped.column("text_sha256").to_pylist()),
    }


class PartitionFinalizer:
    """``map_groups`` callable: one url-hash partition in → one lineage row
    out; optionally commits the partition Parquet + manifest atomically.

    Analogue of the reference's run-stats + ledger freeze
    (docling_graph/core/extractors/contracts/dense/orchestrator.py:
    2010-2180) — but per-partition and resumable."""

    def __init__(self, out_dir: str | None) -> None:
        self.out_dir = out_dir

    def __call__(self, group: pa.Table) -> pa.Table:
        part_id = group.column("part_id")[0].as_py()
        deduped = _dedup_latest_wins(group)
        rec = _lineage_record(part_id, deduped)
        if self.out_dir:
            write_partition_atomic(
                self.out_dir, part_id, deduped.drop_columns(["part_id"]), rec
            )
        return pa.Table.from_pylist([rec], schema=LINEAGE_SCHEMA)


# ---------------------------------------------------------------------------
# pipeline assembly


def _lanes(classified, pdf_concurrency):
    html_ds = classified.filter(expr="lane == 'html'").drop_columns(["lane"])
    giant_ds = classified.filter(expr="lane == 'html_giant'").drop_columns(["lane"])
    pdf_ds = classified.filter(expr="lane == 'pdf'").drop_columns(["lane"])

    ex = _passthrough_part_id(extract_batch)
    html_out = html_ds.map_batches(ex, batch_format="pyarrow", batch_size=64)
    giant_out = giant_ds.map_batches(
        ex, batch_format="pyarrow", batch_size=4, num_cpus=1
    )
    pdf_out = pdf_ds.map_batches(
        _PdfLane,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=pdf_concurrency,
    )
    return html_out.union(giant_out, pdf_out)


def extract_pages_dataset(
    pages,
    *,
    num_partitions: int = 16,
    giant_bytes: int = DEFAULT_GIANT_BYTES,
    pdf_concurrency=(1, 4),
):
    """pages Dataset → extracted Dataset (NOT deduped; no shuffle).

    The narrow part of the pipeline, for callers that want the extracted
    rows themselves (queries, tests)."""
    classified = pages.map_batches(
        make_classifier(num_partitions, giant_bytes), batch_format="pyarrow"
    )
    return _lanes(classified, pdf_concurrency)


def run_extract_pipeline(
    pages,
    *,
    out_dir: str | None = None,
    num_partitions: int = 16,
    giant_bytes: int = DEFAULT_GIANT_BYTES,
    pdf_concurrency=(1, 4),
    resume: bool = True,
):
    """Full pipeline; returns the lineage Dataset (one row per partition).

    With ``out_dir`` set, each partition's Parquet + manifest is committed
    atomically inside the groupby; on a re-run with ``resume=True``,
    already-committed partitions are filtered out BEFORE the parse."""
    classified = pages.map_batches(
        make_classifier(num_partitions, giant_bytes), batch_format="pyarrow"
    )
    if out_dir and resume:
        done = completed_parts(out_dir)
        if done:
            done_arr = pa.array(sorted(done), pa.int32())

            def _skip_done(batch: pa.Table) -> pa.Table:
                mask = pc.invert(pc.is_in(batch.column("part_id"), value_set=done_arr))
                return batch.filter(mask)

            classified = classified.map_batches(_skip_done, batch_format="pyarrow")

    extracted = _lanes(classified, pdf_concurrency)
    finalizer = PartitionFinalizer(out_dir)

    def finalize_partition(group: pa.Table) -> pa.Table:
        return finalizer(group)

    return extracted.groupby("part_id").map_groups(
        finalize_partition, batch_format="pyarrow"
    )


def dedup_extracted(extracted):
    """Deduped extracted rows (latest-wins per url) via the same url-hash
    groupby, without writing — used by queries/tests."""
    def dedup_group(group: pa.Table) -> pa.Table:
        return _dedup_latest_wins(group)

    return extracted.groupby("part_id").map_groups(
        dedup_group, batch_format="pyarrow"
    )
