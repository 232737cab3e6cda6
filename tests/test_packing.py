"""Sequence packing (stages/packing.py): deterministic placement of
document tokens into fixed-length LM-training sequences within
doc_id-bucketed packing streams."""

import numpy as np
import pyarrow as pa

from docling_graph_ray.stages.packing import pack_sequences


def _docs_table(n=120, seed=3):
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        if i % 17 == 0:
            texts.append("")                   # dropped: no tokens
        elif i % 11 == 0:
            # monster doc spanning several 32-token sequences
            texts.append(" ".join(f"w{j}" for j in range(150)))
        else:
            texts.append(" ".join(
                f"w{j}" for j in range(int(rng.integers(1, 40)))))
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _brute(tbl, seq_len, num_buckets):
    rows = {}
    per_bucket = {}
    for r in tbl.to_pylist():
        toks = (r["text"] or "").split()
        if not toks:
            continue
        per_bucket.setdefault(r["doc_id"] % num_buckets, []).append(
            (r["doc_id"], len(toks)))
    for bucket, docs in per_bucket.items():
        off = 0
        for doc_id, n in sorted(docs):
            rows[doc_id] = (bucket, n, off // seq_len,
                            (off + n - 1) // seq_len, off % seq_len)
            off += n
    return rows


def test_pack_matches_brute_force(ray_session):
    import ray.data

    tbl = _docs_table()
    out = pack_sequences(ray.data.from_arrow(tbl).repartition(7),
                         seq_len=32, num_buckets=4).to_pandas()
    want = _brute(tbl, 32, 4)
    assert len(out) == len(want)
    for r in out.itertuples():
        assert want[r.doc_id] == (r.bucket, r.n_tokens, r.seq_first,
                                  r.seq_last, r.offset_in_first)
    # monster docs really span sequences
    assert (out.seq_last > out.seq_first).any()


def test_pack_contiguity_and_determinism(ray_session):
    """Within a bucket the streams are gapless: each doc starts exactly
    where the previous one ended; block layout does not change the
    answer."""
    import ray.data

    tbl = _docs_table(80, seed=9)
    a = pack_sequences(ray.data.from_arrow(tbl).repartition(3),
                       seq_len=32, num_buckets=4).to_pandas()
    b = pack_sequences(ray.data.from_arrow(tbl).repartition(11),
                       seq_len=32, num_buckets=4).to_pandas()
    key = ["doc_id"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))
    for bucket, grp in a.sort_values("doc_id").groupby("bucket"):
        pos = 0
        for r in grp.itertuples():
            assert r.seq_first * 32 + r.offset_in_first == pos
            pos += r.n_tokens
