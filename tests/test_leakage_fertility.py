"""Tests for the split-leakage audit and per-source BPE fertility
(pipelines/textops.py doc_split_leakage / doc_bpe_fertility)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from docling_graph_ray.pipelines import textops as t
from docling_graph_ray.stages.sampling import mix32

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# split leakage


def _brute_leakage(sf_dir: str) -> pd.DataFrame:
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    planted = [docs]
    for mod, off in ((10, 10_000_000), (50, 20_000_000)):
        tw = docs[docs.doc_id % mod == 0].copy()
        tw["doc_id"] = tw["doc_id"] + off
        planted.append(tw)
    full = pd.concat(planted, ignore_index=True)
    bucket = mix32(full["doc_id"].to_numpy()) % 100
    full["split"] = np.where(bucket < 80, "train",
                             np.where(bucket < 90, "val", "test"))
    rows = []
    for _, g in full.groupby("text", sort=False):
        n_train = int((g["split"] == "train").sum())
        n_val = int((g["split"] == "val").sum())
        n_test = int((g["split"] == "test").sum())
        if (n_train > 0) + (n_val > 0) + (n_test > 0) >= 2:
            rows.append({
                "keeper_id": int(g["doc_id"].min()),
                "n_docs": len(g),
                "n_train": n_train, "n_val": n_val, "n_test": n_test,
                "splits": "+".join(
                    s for s, f in (("train", n_train), ("val", n_val),
                                   ("test", n_test)) if f),
            })
    return (pd.DataFrame(rows)
            .sort_values("keeper_id").reset_index(drop=True))


def test_split_leakage_matches_brute_force():
    got = (t.doc_split_leakage(SF).to_pandas()
           .sort_values("keeper_id").reset_index(drop=True))
    want = _brute_leakage(SF)
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(
        got[want.columns].astype(want.dtypes.to_dict()), want)


def test_split_leakage_invariants():
    df = t.doc_split_leakage(SF).to_pandas()
    # every emitted cluster genuinely crosses a split boundary
    assert ((df[["n_train", "n_val", "n_test"]] > 0).sum(axis=1) >= 2).all()
    # member accounting is exact
    assert (df.n_train + df.n_val + df.n_test == df.n_docs).all()
    # only planted clusters can be duplicates: keeper is an original id
    assert (df.keeper_id < 10_000_000).all()
    assert (df.keeper_id % 10 == 0).all()
    # splits string agrees with the flags
    for _, r in df.iterrows():
        want = "+".join(s for s, f in (("train", r.n_train),
                                       ("val", r.n_val),
                                       ("test", r.n_test)) if f)
        assert r.splits == want


# ---------------------------------------------------------------------------
# BPE fertility


def test_bpe_fertility_totals_match_apply():
    """The per-source fertility sums must reconcile with the per-doc
    doc_bpe_apply totals — same deterministic trainer, same corpus."""
    fert = t.doc_bpe_fertility(SF).to_pandas()
    apply_total = int(
        t.doc_bpe_apply(SF).to_pandas()["n_bpe_tokens"].sum())
    assert int(fert["n_bpe_tokens"].sum()) == apply_total
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "source", "text"])
    assert int(fert["n_docs"].sum()) == len(docs)
    assert set(fert["source"]) == set(docs["source"])
    # chars reconcile against the raw column
    assert int(fert["n_chars"].sum()) == int(
        docs["text"].fillna("").str.len().sum())


def test_bpe_fertility_ratio_arithmetic():
    fert = t.doc_bpe_fertility(SF).to_pandas()
    tw = np.round(fert.n_bpe_tokens / fert.n_words, 6)
    ct = np.round(fert.n_chars / fert.n_bpe_tokens, 6)
    assert np.allclose(fert.tokens_per_word, tw, atol=0)
    assert np.allclose(fert.chars_per_token, ct, atol=0)
    # 20 merges cannot push a word below 1 token; '</w>' keeps >= 1
    assert (fert.tokens_per_word >= 1.0).all()
    assert (fert.chars_per_token > 0).all()


# ---------------------------------------------------------------------------
# BPETokenizer additive kwargs


def test_bpe_tokenizer_carry_cols_and_word_count():
    from docling_graph_ray.stages.text_analysis import BPETokenizer

    batch = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "source": pa.array(["a", "b"]),
        "text": pa.array(["low lower", "  low  "]),
    })
    tok = BPETokenizer(merges=[("l", "o")], carry_cols=("source",),
                       emit_word_count=True)
    out = tok(batch)
    assert out.column_names == ["doc_id", "n_bpe_tokens", "n_words",
                                "source"]
    assert out.column("n_words").to_pylist() == [2, 1]
    assert out.column("source").to_pylist() == ["a", "b"]
    # 'low' -> lo w </w> = 3 tokens; 'lower' -> lo w e r </w> = 5
    assert out.column("n_bpe_tokens").to_pylist() == [8, 3]
    # default behavior unchanged
    plain = BPETokenizer(merges=[("l", "o")])(batch)
    assert plain.column_names == ["doc_id", "n_bpe_tokens"]


# ---------------------------------------------------------------------------
# domain reweighting


def test_domain_reweight_downweights_noisy_source(ray_session, tmp_path):
    """A source of high-entropy gibberish scores worse under the corpus
    bigram LM and must receive LESS mixture weight than a clean,
    self-similar source; weights sum to 1."""
    import pyarrow.parquet as pq

    from docling_graph_ray.pipelines.textops import doc_domain_reweight

    rng = np.random.Generator(np.random.PCG64(5))
    rows = []
    for i in range(60):
        rows.append({"doc_id": i, "source": "clean",
                     "text": "the quick brown fox " * 20})
    for i in range(60, 120):
        junk = "".join(chr(33 + int(c)) for c in rng.integers(0, 88, 300))
        rows.append({"doc_id": i, "source": "noisy", "text": junk})
    pq.write_table(pa.Table.from_pylist(rows),
                   str(tmp_path / "documents.parquet"))
    out = doc_domain_reweight(str(tmp_path)).to_pandas().set_index("source")
    assert abs(out["weight"].sum() - 1.0) < 1e-4
    assert out.loc["clean", "weight"] > out.loc["noisy", "weight"]
    assert out.loc["noisy", "excess"] > 0 > out.loc["clean", "excess"]
    assert (out["n_docs"] == 60).all()
