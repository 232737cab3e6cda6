"""End-to-end corpus-curation composite (pipelines/textops.py:
doc_curation_pipeline) vs the DuckDB oracle on a constructed corpus."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_REPO = Path(__file__).resolve().parent.parent


def _entry():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_test", _REPO / "__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _good_text(i: int) -> str:
    # 40 words, all distinct, mean word len ~6.9, one stopword:
    # passes every Gopher rung
    return "the " + " ".join(f"w{i:03d}x{j:02d}" for j in range(39))


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("curation_sf")
    rows = []
    for i in range(70):
        lang = "fr" if i >= 60 else "en"  # skewed: 60 en vs 10 fr
        if i in (3, 9):
            text = "short text"  # fails the >=30-words rung
        elif i == 17:
            text = _good_text(5)  # exact duplicate of doc 5 -> keeper 5
        else:
            text = _good_text(i)
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": lang,
                "source": f"src{i % 4}",
                "n_chars": len(text),
            }
        )
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))
    return str(d)


def test_curation_pipeline_matches_oracle(ray_session, corpus_dir):
    import duckdb

    from docling_graph_ray.pipelines.textops import doc_curation_pipeline

    got = (
        doc_curation_pipeline(corpus_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{corpus_dir}/documents.parquet')"
    )
    want = (
        con.execute(_entry().oracle_sql()["doc_curation_pipeline"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )

    assert sorted(got.columns) == sorted(want.columns)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)].astype(got.dtypes.to_dict())
    assert got.equals(want)


def test_curation_pipeline_semantics(ray_session, corpus_dir):
    from docling_graph_ray.pipelines.textops import doc_curation_pipeline
    from docling_graph_ray.stages.sampling import mix32, temperature_thresholds

    out = doc_curation_pipeline(corpus_dir).to_pandas()
    kept = set(out["doc_id"])

    # quality-failing docs and the duplicate never survive
    assert not {3, 9, 17} & kept
    # rarest language keeps everything (p=1): all 10 fr docs present
    assert (out["lang"] == "fr").sum() == 10
    # en is downsampled by exactly the advertised threshold
    # (survivor counts: en = 60 - 2 bad - 1 dup = 57, fr = 10)
    thr = temperature_thresholds({"en": 57, "fr": 10}, 0.5)
    expect_en = {
        i
        for i in range(60)
        if i not in (3, 9, 17) and mix32(np.array([i]))[0] < thr["en"]
    }
    assert set(out[out["lang"] == "en"]["doc_id"]) == expect_en
    # split labels are well-formed
    assert set(out["split"]) <= {"train", "val", "test"}
    assert (out["n_source"].isin([57, 10])).all()


def test_curate_cli_writes_split_parquet(ray_session, corpus_dir, tmp_path):
    import pyarrow.parquet as pq

    from docling_graph_ray.__main__ import main

    out = tmp_path / "curated"
    rc = main([
        "curate", "--input", f"{corpus_dir}/documents.parquet",
        "--out", str(out),
    ])
    assert rc == 0
    t = pq.read_table(str(out))
    assert set(t.schema.names) == {
        "doc_id", "lang", "n_source", "thr", "bucket", "split",
    }
    # matches the library path exactly
    from docling_graph_ray.pipelines.textops import doc_curation_pipeline

    lib = doc_curation_pipeline(corpus_dir).to_pandas().sort_values("doc_id")
    cli = t.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert cli.equals(lib[cli.columns].reset_index(drop=True))


def test_pages_curation_composite(ray_session):
    """Full crawl -> extract -> langid -> curate composite over the
    in-repo synthetic pages fixture (sf tier name only selects row
    count; no external data)."""
    from docling_graph_ray.pipelines.textops import pages_curation

    a = pages_curation("/nonexistent/sf0.001").to_pandas()
    assert len(a) > 0
    assert set(a.columns) == {
        "doc_id", "lang", "n_source", "thr", "bucket", "split",
    }
    assert set(a["lang"]) <= {"en", "es", "de", "fr", "und"}
    # deterministic end to end
    b = pages_curation("/nonexistent/sf0.001").to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_curation_all_rejected_returns_empty(ray_session, tmp_path):
    """The default English-web Gopher gate can reject an entire corpus;
    the composite must return a schema-stable empty result, not crash
    in the hash join."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray.data
    from docling_graph_ray.pipelines.textops import curate_documents

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["short text", "tiny"]),
        "lang": pa.array(["en", "fr"]),
    })
    out = curate_documents(ray.data.from_arrow(t))
    assert out.count() == 0
    assert set(out.schema().names) == {
        "doc_id", "lang", "n_source", "thr", "bucket", "split",
    }
