"""Inverted-index postings builder (IR / retrieval building block).

The reference ships no retrieval index; this is one of the
beyond-reference training-data operators (SURVEY §2 extras).  Shape
follows the classic MapReduce index build (Dean & Ghemawat 2004 §2's
canonical example) with one scale amendment: postings are CHUNKED by
document-id range, so a stop-word's posting list ("the" — every
document in the corpus) never lands on one worker.  The partition key
is ``(token, chunk_id)`` with ``chunk_id = doc_id // chunk_span``:

- group memory is bounded by ``chunk_span`` postings per (token,
  chunk) regardless of token frequency;
- a hot token's chunks spread across ALL hash buckets, so the skew a
  plain ``groupby(token)`` would concentrate is diffused by design;
- consumers re-assemble a full posting list by scanning a token's
  chunks in chunk_id order (chunk boundaries are doc-id ranges, so
  chunk-local lists concatenate sorted).

Postings are emitted as a comma-joined string (deterministic,
hash-comparable across engines); ``df_chunk``/``tf_sum`` ride along so
document frequency and collection frequency are one tiny rollup away.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

POSTINGS_SCHEMA = pa.schema([
    ("token", pa.string()),
    ("chunk_id", pa.int64()),
    ("df_chunk", pa.int64()),
    ("tf_sum", pa.int64()),
    ("postings", pa.string()),
])


def build_postings(docs, *, id_col: str = "doc_id",
                   text_col: str = "text", chunk_span: int = 1024,
                   num_partitions: int = 64):
    """Documents → chunked inverted-index postings.

    One vectorized explode pass (``term_freq_batch`` — the repo-wide
    whitespace tokenization, matching the
    ``regexp_split_to_array(TRIM(text), '\\s+')`` oracle convention),
    then ONE bucketed shuffle keyed on ``(token, chunk_id)``; inside
    each of the P ``map_groups`` calls the posting strings are built
    run-at-a-time from a (token, chunk_id, doc_id) sort."""
    from docling_graph_ray.stages.bucketing import add_part, run_starts
    from docling_graph_ray.stages.text_analysis import term_freq_batch

    def tf_with_chunk(b: pa.Table) -> pa.Table:
        t = term_freq_batch(b, text_col=text_col, id_col=id_col)
        chunk = pc.divide(t.column("doc_id"), chunk_span)
        # arrow divide truncates toward zero; doc ids are non-negative
        # here so this equals floor division (the oracle's ``//``)
        return t.append_column("chunk_id", chunk.cast(pa.int64()))

    in_schema = pa.schema([("doc_id", pa.int64()), ("token", pa.string()),
                           ("tf", pa.int64()), ("chunk_id", pa.int64())])

    def postings_partition(g: pa.Table) -> pa.Table:
        if g.num_rows == 0 or "token" not in g.schema.names:
            return POSTINGS_SCHEMA.empty_table()
        if "_part" in g.schema.names:
            g = g.drop_columns(["_part"])
        idx = pc.sort_indices(g, sort_keys=[
            ("token", "ascending"), ("chunk_id", "ascending"),
            ("doc_id", "ascending")])
        g = g.take(idx).combine_chunks()
        starts, lens = run_starts(g, ["token", "chunk_id"])
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        tf = g.column("tf").to_numpy(zero_copy_only=False)
        id_str = ids.astype("U")
        ends = starts + lens
        tf_cum = np.r_[0, np.cumsum(tf)]
        return pa.table({
            "token": g.column("token").take(pa.array(starts)),
            "chunk_id": g.column("chunk_id").take(pa.array(starts)),
            "df_chunk": pa.array(lens, pa.int64()),
            "tf_sum": pa.array(tf_cum[ends] - tf_cum[starts], pa.int64()),
            "postings": pa.array(
                [",".join(id_str[s:e]) for s, e in zip(starts, ends)],
                pa.string()),
        })

    return (
        docs.map_batches(tf_with_chunk, batch_format="pyarrow")
        .map_batches(add_part(["token", "chunk_id"], num_partitions,
                              in_schema), batch_format="pyarrow")
        .groupby("_part")
        .map_groups(postings_partition, batch_format="pyarrow")
    )
