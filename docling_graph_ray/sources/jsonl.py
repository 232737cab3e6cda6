"""JSONL crawl-corpus source: the third ingestion lane.

Text corpora very commonly ship as gzipped JSONL (one JSON object per
line) rather than Parquet or WARC — e.g. dataset dumps and scraper
output.  This lane reads such files into the north-rule pages shape
``(url, warc_ts, html, text, lang)`` so the flagship extraction pipeline
runs unchanged on them.

Conventions (documented, deterministic):
- ``html`` rides base64-encoded (JSON cannot carry raw bytes); absent or
  empty → NULL bytes, which the extract stage's salvage ladder treats as
  a fallback-text row — no row is unroutable.
- ``warc_ts`` is an ISO-8601 string, parsed to timestamp[us].
- Unknown extra keys per line are ignored (projection happens in the
  decode batch, so only the five north-rule columns leave the reader).

Scale shape: ``ray.data.read_text`` gives one-or-more read tasks PER
FILE with block splitting by bytes — unlike WARC's member streams,
line-oriented JSONL splits for free, so a directory of large .jsonl.gz
files parallelizes without a member-offset index.  The per-batch decode
(json parse + base64) is the CPU cost; it is a plain task-pool
``map_batches`` that pipelines into the extract actor pool downstream.

Writer half (`write_jsonl`) exists for fixtures/round-trips, mirroring
sources/warc.py's deterministic writer.
"""

from __future__ import annotations

import base64
import gzip
import json

import numpy as np
import pyarrow as pa

from docling_graph_ray.fixtures.pages import PAGES_SCHEMA

_EPOCH = np.datetime64("1970-01-01T00:00:00", "us")


def rows_to_jsonl_bytes(tbl: pa.Table) -> bytes:
    """Serialize a pages table to JSONL bytes (html → base64, ts → ISO)."""
    out = []
    for r in tbl.to_pylist():
        out.append(json.dumps({
            "url": r["url"],
            "warc_ts": r["warc_ts"].isoformat() if r["warc_ts"] else None,
            "html_b64": base64.b64encode(r["html"]).decode("ascii")
            if r["html"] is not None else "",
            "text": r["text"],
            "lang": r["lang"],
        }, ensure_ascii=False))
    return ("\n".join(out) + "\n").encode("utf-8")


def write_jsonl(tbl: pa.Table, path: str, *, compress: bool = True) -> None:
    raw = rows_to_jsonl_bytes(tbl)
    if compress:
        raw = gzip.compress(raw, compresslevel=1, mtime=0)
    with open(path, "wb") as f:
        f.write(raw)


def decode_jsonl_batch(batch: pa.Table) -> pa.Table:
    """map_batches UDF: lines of JSON → north-rule pages schema."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for line in batch.column("text").to_pylist():
        if not line or not line.strip():
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            # salvage stance: a corrupt line becomes a failed-parse row
            # rather than poisoning the batch
            urls.append("")
            tss.append(None)
            htmls.append(None)
            texts.append(line)
            langs.append("")
            continue
        urls.append(str(obj.get("url") or ""))
        ts = obj.get("warc_ts")
        tss.append(np.datetime64(ts, "us") if ts else None)
        b64 = obj.get("html_b64") or ""
        try:
            htmls.append(base64.b64decode(b64) if b64 else None)
        except ValueError:
            htmls.append(None)
        texts.append(str(obj.get("text") or ""))
        langs.append(str(obj.get("lang") or ""))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }).cast(PAGES_SCHEMA)


def read_jsonl_pages(paths, **read_kwargs):
    """``ray.data.Dataset`` of north-rule pages over .jsonl / .jsonl.gz
    files.  ``read_text`` handles gzip transparently via
    arrow_open_stream_args and splits plain-text files by byte ranges;
    the JSON+base64 decode is a pipelined task-pool stage."""
    import ray.data

    ds = ray.data.read_text(
        paths,
        arrow_open_stream_args={"compression": "detect"},
        file_extensions=["jsonl", "gz"],  # skip markers/sidecars in dirs
        **read_kwargs,
    )
    return ds.map_batches(decode_jsonl_batch, batch_format="pyarrow")


def jsonl_fixture_dir(n: int, seed: int = 42, profile: str = "t1",
                      files: int = 4) -> str:
    """Materialize n synthetic pages as .jsonl.gz files under /tmp ONCE
    and reuse (cache key covers the generator + this module's source),
    mirroring warc_fixture_dir."""
    import hashlib
    import os
    from pathlib import Path

    from docling_graph_ray.fixtures import pages as pages_mod
    from docling_graph_ray.fixtures.pages import make_pages_table

    src = Path(pages_mod.__file__).read_bytes() + Path(__file__).read_bytes()
    key = hashlib.sha256(
        src + f"{n}:{seed}:{profile}:{files}".encode()
    ).hexdigest()[:16]
    out_dir = f"/tmp/docling_graph_ray_jsonl_{key}"
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    bounds = np.linspace(0, n, files + 1).astype(int)
    for i in range(files):
        idx = np.arange(bounds[i], bounds[i + 1])
        tbl = make_pages_table(idx, seed, profile)
        write_jsonl(tbl, os.path.join(out_dir, f"part-{i:04d}.jsonl.gz"))
    with open(done, "w") as f:
        f.write("ok\n")
    return out_dir
