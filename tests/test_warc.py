"""WARC/WET datasource: writer↔reader round-trips, multi-member gzip,
HTTP payload splitting, Ray Data read path, flagship integration."""

from __future__ import annotations

import gzip
import io

import numpy as np
import pyarrow as pa
import pytest

from docling_graph_ray.fixtures.pages import make_pages_table
from docling_graph_ray.sources.warc import (
    WARC_SCHEMA,
    iter_warc_records,
    read_warc,
    warc_fixture_dir,
    warc_record_bytes,
    write_warc,
)


def _pages(n=20, profile="t1"):
    return make_pages_table(np.arange(n), 42, profile)


def test_record_bytes_deterministic_and_parseable():
    rec = warc_record_bytes("http://x.test/a", 1_700_000_000_000_000,
                            b"<html>hi</html>")
    assert rec == warc_record_bytes("http://x.test/a",
                                    1_700_000_000_000_000, b"<html>hi</html>")
    got = list(iter_warc_records(io.BytesIO(rec)))
    assert len(got) == 1
    assert got[0]["url"] == "http://x.test/a"
    assert got[0]["html"] == b"<html>hi</html>"  # HTTP envelope stripped
    assert got[0]["warc_ts"] == 1_700_000_000_000_000
    assert got[0]["text"] is None


@pytest.mark.parametrize("gz", [True, False])
def test_write_read_roundtrip(tmp_path, gz):
    tbl = _pages(25)
    path = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    assert write_warc(path, tbl, gzip_members=gz) == 25
    with open(path, "rb") as fh:
        recs = list(iter_warc_records(fh))
    assert len(recs) == 25
    assert [r["url"] for r in recs] == tbl.column("url").to_pylist()
    assert [r["html"] for r in recs] == [
        bytes(h) for h in tbl.column("html").to_pylist()
    ]
    ts = tbl.column("warc_ts").cast(pa.int64()).to_pylist()
    # writer truncates to whole seconds (WARC-Date granularity)
    assert [r["warc_ts"] for r in recs] == [t - t % 1_000_000 for t in ts]


def test_multi_member_gzip_is_per_record(tmp_path):
    """The crawl convention: each record its own gzip member — a reader
    must hit a member boundary per record and re-arm."""
    path = str(tmp_path / "m.warc.gz")
    write_warc(path, _pages(5))
    raw = open(path, "rb").read()
    assert raw.count(b"\x1f\x8b\x08") >= 5
    # stdlib gzip agrees on the decompressed whole
    plain = gzip.decompress(raw)
    assert plain.count(b"WARC/1.0") == 5


def test_wet_conversion_records(tmp_path):
    tbl = pa.table(
        {
            "url": pa.array(["http://a.test/1", "http://a.test/2"]),
            "warc_ts": pa.array([10**15, 2 * 10**15], pa.timestamp("us")),
            "text": pa.array(["extracted text one", "και ελληνικά"]),
        }
    )
    path = str(tmp_path / "x.wet.gz")
    write_warc(path, tbl, rtype="conversion")
    with open(path, "rb") as fh:
        recs = list(iter_warc_records(fh))
    assert [r["text"] for r in recs] == tbl.column("text").to_pylist()
    assert all(r["html"] is None for r in recs)


def test_skips_non_content_records_and_noise():
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd"
        b"\r\n\r\n"
    )
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://x.test/\r\nContent-Length: 0\r\n\r\n"
        b"\r\n\r\n"
    )
    resp = warc_record_bytes("http://x.test/", 0, b"<p>ok</p>")
    stream = io.BytesIO(info + b"junkpad\r\n\r\n" + req + resp)
    recs = list(iter_warc_records(stream))
    assert len(recs) == 1 and recs[0]["html"] == b"<p>ok</p>"


def test_resource_record_payload_not_http():
    rec = (
        b"WARC/1.0\r\nWARC-Type: resource\r\n"
        b"WARC-Target-URI: http://x.test/img\r\n"
        b"WARC-Date: 2026-01-02T03:04:05Z\r\nContent-Length: 9\r\n\r\n"
        b"\x89PNGdata!" + b"\r\n\r\n"
    )
    got = list(iter_warc_records(io.BytesIO(rec)))
    assert got[0]["html"] == b"\x89PNGdata!"  # bare payload, no HTTP split


def test_read_warc_dataset(ray_session, tmp_path):
    import ray.data  # noqa: F401

    tbl = _pages(40)
    for i in range(2):
        write_warc(str(tmp_path / f"p{i}.warc.gz"), tbl.slice(i * 20, 20))
    ds = read_warc(str(tmp_path))
    out = ds.take_all()
    assert len(out) == 40
    assert ds.schema().names == WARC_SCHEMA.names
    urls = sorted(r["url"] for r in out)
    assert urls == sorted(tbl.column("url").to_pylist())
    # bytes survive exactly (the extractor's golden identity depends on
    # it); the fixture contains duplicate urls → compare as multisets
    got = sorted((r["url"], bytes(r["html"])) for r in out)
    want = sorted(
        (u, bytes(h))
        for u, h in zip(tbl.column("url").to_pylist(),
                        tbl.column("html").to_pylist())
    )
    assert got == want


def test_warc_flagship_extraction_matches_parquet_path(ray_session, tmp_path):
    """Reading the same synthetic corpus from WARC or from the fixture
    table must yield byte-identical extracted text per url."""
    import ray.data

    from docling_graph_ray.pipelines.extract import run_extract_pipeline

    n = 60
    warc_dir = warc_fixture_dir(n, profile="t1", files=2)
    lineage_w = run_extract_pipeline(
        read_warc(warc_dir), out_dir=str(tmp_path / "w"), num_partitions=4
    ).to_pandas()
    lineage_p = run_extract_pipeline(
        ray.data.from_arrow(_pages(n)), out_dir=str(tmp_path / "p"),
        num_partitions=4,
    ).to_pandas()
    assert int(lineage_w["n_urls"].sum()) == int(lineage_p["n_urls"].sum())
    assert (
        sorted(lineage_w["content_hash"]) == sorted(lineage_p["content_hash"])
    )


def test_member_gzip_reader_no_duplication_any_read_size():
    """Regression (r5): at a gzip member boundary zlib reports the next
    member's bytes in BOTH unconsumed_tail and unused_data; the pre-r5
    reader concatenated them, silently DUPLICATING every record whose
    member ended inside a chunk (absorbed downstream by url dedup) and
    corrupting the stream under small read sizes."""
    from docling_graph_ray.sources.warc import _MemberGzipReader

    members = [b"A" * 100_000, b"B" * 50, b"C" * 7777, b"D" * 1]
    data = b"".join(gzip.compress(m) for m in members)
    want = b"".join(members)
    for n in (7, 333, 4096, 1 << 20):
        rd = _MemberGzipReader(io.BytesIO(data))
        out = bytearray()
        while True:
            c = rd.read(n)
            if not c:
                break
            out.extend(c)
        assert bytes(out) == want, f"read size {n}: {len(out)} bytes"


def test_warc_record_count_exact_no_dups():
    """Every WARC record yields exactly ONE row (pre-r5 the duplicated
    members produced extra rows that only dedup hid)."""
    tbl = _pages(40)
    buf = io.BytesIO()

    import tempfile
    from pathlib import Path

    from docling_graph_ray.sources.warc import iter_warc_records, write_warc

    with tempfile.TemporaryDirectory() as d:
        p = str(Path(d) / "x.warc.gz")
        write_warc(p, tbl, gzip_members=True)
        with open(p, "rb") as fh:
            recs = list(iter_warc_records(fh))
    assert len(recs) == 40
    # url MULTISET matches the table exactly (the fixture itself holds
    # deliberate dup urls for dedup coverage — but one row each)
    assert sorted(r["url"] for r in recs) == \
        sorted(tbl.column("url").to_pylist())
    del buf
