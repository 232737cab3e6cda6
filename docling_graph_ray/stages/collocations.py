"""PMI collocation mining over adjacent token bigrams.

Pointwise mutual information (Church & Hanks 1990) for corpus
collocations — the WIMBD-style corpus-analysis companion to the n-gram
novelty and top-token operators: which adjacent pairs co-occur far
more than their unigram frequencies predict.

Scale shape: one vectorized explode pass emits adjacent bigrams and
unigram partials; both fold through bucketed aggregates (shuffle rows
bounded by per-batch vocabulary, same bound as ``doc_top_tokens``);
unigram counts attach to surviving bigrams by two auto-selected lookup
joins; the final top-k folds per-block partials.  PMI is quantized to
integer nano-units for ranking, so float addition order can't perturb
the cutoff and a SQL engine mirroring the expression reproduces it
bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PMI_SCHEMA = pa.schema([
    ("bigram", pa.string()),
    ("c_xy", pa.int64()),
    ("c_x", pa.int64()),
    ("c_y", pa.int64()),
    ("pmi_e9", pa.int64()),
])


def _token_lists(batch: pa.Table, text_col: str):
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(batch.column(text_col),
                                             "")), r"\s+")
    return toks


def bigram_pmi(docs, *, text_col: str = "text", min_count: int = 5,
               k: int = 50, num_partitions: int = 64):
    """Top-k adjacent-bigram collocations by PMI.

    ``pmi = ln((c_xy/N_bi) / ((c_x/N) * (c_y/N)))`` with all counts
    exact int64; the ranking key is ``round(pmi * 1e9)`` (ties break
    bigram-asc).  Bigrams below ``min_count`` are dropped before the
    joins — the standard low-frequency PMI guard."""
    from docling_graph_ray.stages.bucketing import bucketed_aggregate
    from docling_graph_ray.stages.joins import lookup_join_auto

    uni_schema = pa.schema([("token", pa.string()), ("c", pa.int64())])
    bi_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                           ("c", pa.int64())])

    def flat_tokens(batch: pa.Table):
        toks = _token_lists(batch, text_col)
        flat = pc.list_flatten(toks).combine_chunks()
        # rows whose text is empty still produce [''] from the split
        return flat.filter(pc.not_equal(flat, ""))

    def uni_partial(batch: pa.Table) -> pa.Table:
        flat = flat_tokens(batch)
        if len(flat) == 0:
            return uni_schema.empty_table()
        t = pa.table({"token": flat})
        g = t.group_by("token").aggregate([([], "count_all")])
        return g.rename_columns(["token", "c"]).cast(uni_schema)

    def bi_partial(batch: pa.Table) -> pa.Table:
        toks = _token_lists(batch, text_col)
        flat = pc.list_flatten(toks).combine_chunks() \
            .to_numpy(zero_copy_only=False)
        lens = np.asarray(pc.list_value_length(toks).fill_null(0)
                          .to_numpy(zero_copy_only=False), np.int64)
        starts = np.r_[0, np.cumsum(lens)][:-1]
        # adjacent within-doc pairs: every flat position except each
        # doc's last; skip docs whose only token is '' (empty text)
        valid = flat != ""
        pos = np.arange(len(flat))
        last = np.zeros(len(flat), bool)
        ends = starts + lens - 1
        last[ends[lens > 0]] = True
        first_ok = valid & ~last
        a_idx = pos[first_ok]
        b_idx = a_idx + 1
        good = valid[b_idx] if len(b_idx) else np.array([], bool)
        a_idx, b_idx = a_idx[good], b_idx[good]
        if not len(a_idx):
            return bi_schema.empty_table()
        t = pa.table({"a": pa.array(flat[a_idx]),
                      "b": pa.array(flat[b_idx])})
        g = t.group_by(["a", "b"]).aggregate([([], "count_all")])
        return g.rename_columns(["a", "b", "c"]).cast(bi_schema)

    uni = bucketed_aggregate(
        docs.map_batches(uni_partial, batch_format="pyarrow"),
        ["token"], [("c", "sum")], rename=["token", "c"],
        combine=True, num_partitions=num_partitions).materialize()
    n_tokens = int(uni.sum("c") or 0)
    n_vocab = uni.count()
    if n_tokens == 0:
        return PMI_SCHEMA.empty_table()

    bi = bucketed_aggregate(
        docs.map_batches(bi_partial, batch_format="pyarrow"),
        ["a", "b"], [("c", "sum")], rename=["a", "b", "c"],
        combine=True, num_partitions=num_partitions)
    bi = bi.materialize()
    n_bigrams = int(bi.sum("c") or 0)
    if n_bigrams == 0:
        return PMI_SCHEMA.empty_table()

    survivors = bi.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("c"), min_count)),
        batch_format="pyarrow")

    wx = lookup_join_auto(
        survivors.map_batches(
            lambda t: t.rename_columns(["a", "b", "c_xy"]),
            batch_format="pyarrow"),
        uni, on="a", key_col="token", value_cols=["c"],
        probe_rows=n_vocab, num_partitions=num_partitions,
    ).map_batches(lambda t: t.rename_columns(["a", "b", "c_xy", "c_x"]),
                  batch_format="pyarrow")
    wxy = lookup_join_auto(
        wx, uni, on="b", key_col="token", value_cols=["c"],
        probe_rows=n_vocab, num_partitions=num_partitions,
    ).map_batches(
        lambda t: t.rename_columns(["a", "b", "c_xy", "c_x", "c_y"]),
        batch_format="pyarrow")

    fn, fnb = np.float64(n_tokens), np.float64(n_bigrams)

    def score_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return PMI_SCHEMA.empty_table()
        cxy = b.column("c_xy").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cx = b.column("c_x").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        cy = b.column("c_y").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        pmi = np.log((cxy / fnb) / ((cx / fn) * (cy / fn)))
        scaled = pmi * np.float64(1e9)
        # half-away-from-zero to match DuckDB ROUND (PMI is signed)
        e9 = (np.sign(scaled)
              * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
        big = pc.binary_join_element_wise(
            b.column("a").cast(pa.string()),
            b.column("b").cast(pa.string()), " ")
        t = pa.table({
            "bigram": big,
            "c_xy": b.column("c_xy").cast(pa.int64()),
            "c_x": b.column("c_x").cast(pa.int64()),
            "c_y": b.column("c_y").cast(pa.int64()),
            "pmi_e9": pa.array(e9, pa.int64()),
        })
        if t.num_rows > k:  # per-block partial top-k (deterministic)
            idx = pc.sort_indices(t, sort_keys=[
                ("pmi_e9", "descending"), ("bigram", "ascending")])
            t = t.take(idx).slice(0, k)
        return t

    cands = wxy.map_batches(score_partial, batch_format="pyarrow")
    top = cands.sort(["pmi_e9", "bigram"],
                     descending=[True, False]).limit(k)
    return pa.Table.from_pandas(top.to_pandas(), schema=PMI_SCHEMA,
                                preserve_index=False)
