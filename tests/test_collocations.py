"""PMI collocation mining (stages/collocations.py)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from docling_graph_ray.stages.collocations import bigram_pmi

_ORACLE = """
WITH lists AS (SELECT regexp_split_to_array(TRIM(text), '\\s+') AS l
               FROM docs WHERE TRIM(text) <> ''),
uni AS (SELECT token, CAST(COUNT(*) AS BIGINT) c
        FROM (SELECT unnest(l) token FROM lists)
        WHERE token <> '' GROUP BY token),
tot AS (SELECT CAST(SUM(c) AS BIGINT) n FROM uni),
big AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) c_xy FROM (
        SELECT unnest(l[1:len(l)-1]) a, unnest(l[2:len(l)]) b
        FROM lists WHERE len(l) >= 2) GROUP BY a, b),
nbi AS (SELECT CAST(SUM(c_xy) AS BIGINT) n FROM big),
j AS (SELECT bg.a, bg.b, bg.c_xy, ux.c c_x, uy.c c_y FROM big bg
      JOIN uni ux ON ux.token=bg.a JOIN uni uy ON uy.token=bg.b
      WHERE bg.c_xy >= {mc}),
scored AS (SELECT a || ' ' || b AS bigram, c_xy, c_x, c_y,
    CAST(ROUND(ln((CAST(c_xy AS DOUBLE)/CAST(nbi.n AS DOUBLE)) /
       ((CAST(c_x AS DOUBLE)/CAST(tot.n AS DOUBLE))
        * (CAST(c_y AS DOUBLE)/CAST(tot.n AS DOUBLE)))) * 1e9)
       AS BIGINT) pmi_e9
    FROM j CROSS JOIN nbi CROSS JOIN tot)
SELECT bigram, c_xy, c_x, c_y, pmi_e9 FROM scored
ORDER BY pmi_e9 DESC, bigram LIMIT {k}
"""


def test_bigram_pmi_matches_duckdb_and_finds_collocation(ray_session):
    rng = np.random.default_rng(2)
    vocab = ["new", "york", "data", "base", "hot", "dog", "x", "y"]
    texts = []
    for i in range(300):
        words = list(rng.choice(vocab, rng.integers(4, 20)))
        if i % 3 == 0:
            words[1:1] = ["new", "york"]  # planted collocation
        texts.append(" ".join(words))
    docs = pa.table({"text": pa.array(texts)})
    ds = ray.data.from_arrow(docs).repartition(5)
    got = bigram_pmi(ds, min_count=5, k=20).to_pandas() \
        .reset_index(drop=True)
    want = duckdb.sql(_ORACLE.format(mc=5, k=20)).df()
    pd.testing.assert_frame_equal(got, want)
    assert got.iloc[0]["bigram"] == "new york"


def test_bigram_pmi_min_count_guard(ray_session):
    # a one-off pair has huge PMI but must be dropped by the guard
    texts = ["unique pairing"] + ["common words"] * 10
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    got = bigram_pmi(ds, min_count=5, k=10).to_pandas()
    assert "unique pairing" not in set(got["bigram"])
    assert "common words" in set(got["bigram"])


def test_bigram_pmi_empty_corpus(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": pa.array(["  ", ""])}))
    assert bigram_pmi(ds, min_count=1, k=5).num_rows == 0
