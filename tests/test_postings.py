"""Chunked inverted-index postings (stages/postings.py)."""

import duckdb
import pandas as pd
import pyarrow as pa

import ray

from docling_graph_ray.stages.postings import build_postings

_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(TRIM(text), '\\s+')) AS token
    FROM docs WHERE TRIM(text) <> ''
),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) tf
       FROM toks WHERE token <> '' GROUP BY doc_id, token)
SELECT token, doc_id // {span} AS chunk_id,
       CAST(COUNT(*) AS BIGINT) df_chunk,
       CAST(SUM(tf) AS BIGINT) tf_sum,
       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) postings
FROM tf GROUP BY token, chunk_id ORDER BY token, chunk_id
"""


def _run(docs: pa.Table, span: int) -> pd.DataFrame:
    ds = ray.data.from_arrow(docs)
    return (build_postings(ds, chunk_span=span, num_partitions=4)
            .to_pandas()
            .sort_values(["token", "chunk_id"]).reset_index(drop=True))


def test_postings_match_duckdb(ray_session):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 65, 66, 130], pa.int64()),
        "text": pa.array(["the cat sat", "the dog", "the cat",
                          "  ", "dog the the"]),
    })
    got = _run(docs, 64)
    want = duckdb.sql(_ORACLE.format(span=64)).df()
    pd.testing.assert_frame_equal(got, want)
    # the stop word spans three chunks, each a separate bounded row
    assert (got[got["token"] == "the"]["chunk_id"].tolist() == [0, 1, 2])


def test_postings_hot_token_chunks_are_bounded(ray_session):
    # every doc contains the same token: with chunk_span=8 no posting
    # row may carry more than 8 ids, however hot the token
    n, span = 200, 8
    docs = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(["hot token%d" % (i % 5) for i in range(n)]),
    })
    got = _run(docs, span)
    hot = got[got["token"] == "hot"]
    assert hot["df_chunk"].max() <= span
    assert hot["df_chunk"].sum() == n
    # chunk-local lists concatenate in chunk order to the full sorted
    # posting list
    full = ",".join(hot.sort_values("chunk_id")["postings"])
    assert full == ",".join(str(i) for i in range(n))


def test_postings_repeated_tokens_fold_into_tf_sum(ray_session):
    docs = pa.table({
        "doc_id": pa.array([3], pa.int64()),
        "text": pa.array(["x x x y"]),
    })
    got = _run(docs, 64).set_index("token")
    assert got.loc["x", "tf_sum"] == 3
    assert got.loc["x", "df_chunk"] == 1
    assert got.loc["y", "postings"] == "3"
