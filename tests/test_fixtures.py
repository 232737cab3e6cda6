"""Fixture generator invariants (FIXTURES.md §1)."""

import collections

from docling_graph_ray.fixtures.pages import make_pages_table, make_row, _bucket_for


def test_rows_are_pure_functions_of_seed_and_index():
    for i in (0, 7, 32, 99, 150, 298):
        a = make_row(i, seed=42, profile="t1")
        b = make_row(i, seed=42, profile="t1")
        assert a == b
    assert make_row(5, seed=42) != make_row(5, seed=43)


def test_bucket_shares():
    counts = collections.Counter(_bucket_for(i) for i in range(1000))
    assert counts["tiny"] == 200
    assert counts["normal"] == 700
    assert counts["giant"] == 90
    assert counts["pathological"] == 10


def test_recrawl_and_exact_duplicates():
    t = make_pages_table(list(range(200)), profile="t1")
    rows = t.to_pylist()
    # i=32 is a re-crawl of i=31: same url, later ts, different html
    assert rows[32]["url"] == rows[31]["url"]
    assert rows[32]["warc_ts"] > rows[31]["warc_ts"]
    assert rows[32]["html"] != rows[31]["html"]
    # i=99 duplicates i=95 exactly
    assert rows[99] == rows[95]


def test_pdf_rows_present():
    t = make_pages_table(list(range(300)), profile="t1")
    pdfs = [r for r in t.to_pylist() if r["html"][:5] == b"%PDF-"]
    assert len(pdfs) > 0


def test_schema():
    from docling_graph_ray.fixtures.pages import PAGES_SCHEMA

    t = make_pages_table([0, 1, 2], profile="t1")
    assert t.schema.equals(PAGES_SCHEMA)
