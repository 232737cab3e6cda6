"""URL canonicalization + url dedup (stages/urlops.py)."""

from __future__ import annotations

import pyarrow as pa

from docling_graph_ray.stages.urlops import (
    canonicalize_url,
    synth_messy_urls,
    url_dedup,
)


def canon(u: str) -> str:
    return canonicalize_url(pa.array([u])).to_pylist()[0]


def test_fragment_and_case_and_ports():
    assert canon("HTTP://WWW.Ex.COM/Path?Q=1#frag") == "http://www.ex.com/Path?Q=1"
    assert canon("http://h.com:80/a") == "http://h.com/a"
    assert canon("https://h.com:443/a?x=1") == "https://h.com/a?x=1"
    # non-default ports survive
    assert canon("http://h.com:8080/a") == "http://h.com:8080/a"
    assert canon("https://h.com:80/a") == "https://h.com:80/a"  # not default


def test_path_and_query_case_preserved():
    assert canon("http://H.com/CaseSensitive?Key=Val") == \
        "http://h.com/CaseSensitive?Key=Val"


def test_tracking_params_everywhere():
    assert canon("http://h.com/a?utm_source=x") == "http://h.com/a"
    assert canon("http://h.com/a?utm_source=x&q=1") == "http://h.com/a?q=1"
    assert canon("http://h.com/a?q=1&utm_source=x") == "http://h.com/a?q=1"
    # three adjacent trackers (the repeat-pass case)
    assert canon("http://h.com/a?utm_a=1&utm_b=2&utm_c=3&q=9") == \
        "http://h.com/a?q=9"
    assert canon("http://h.com/a?gclid=g&fbclid=f&msclkid=m") == \
        "http://h.com/a"
    # mid-query mix
    assert canon("http://h.com/a?x=1&utm_medium=m&y=2") == \
        "http://h.com/a?x=1&y=2"


def test_no_scheme_passthrough_and_empty():
    assert canon("not a url") == "not a url"
    assert canon("") == ""
    assert canon("relative/path?utm_source=x") == "relative/path"


def test_synth_variants_collapse():
    ids = pa.array(list(range(12)), pa.int64())
    urls = synth_messy_urls(ids)
    out = canonicalize_url(urls).to_pylist()
    # first sextet: five http spellings collapse + one https
    assert len(set(out[0:6])) == 2
    assert out[0] == "http://site0.com/page0?q=0"
    assert out[5] == "https://site0.com/page0?q=0"
    assert len(set(out[6:12])) == 2
    assert out[6] == "http://site1.com/page1?q=1"


def test_url_dedup_dataset(ray_session):
    import ray.data

    ids = pa.array(list(range(60)), pa.int64())
    t = pa.table({"doc_id": ids, "url": synth_messy_urls(ids)})
    out = url_dedup(ray.data.from_arrow(t)).to_pandas()
    # 10 sextets -> 10 http groups (5 members) + 10 https singles
    assert len(out) == 20
    assert sorted(out["n_dups"].tolist()) == [1] * 10 + [5] * 10
    by_url = dict(zip(out["url_canon"], out["keep_id"]))
    assert by_url["http://site0.com/page0?q=0"] == 0
    assert by_url["https://site0.com/page0?q=0"] == 5
