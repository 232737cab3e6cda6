"""Binary token-shard sink (stages/token_shards.py): the emitted .bin
bytes must reproduce a sequential reference packing exactly (including
trailing padding and sha256), shards must be bounded by construction,
and reruns with skip_existing must leave finished shards untouched."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa

import ray.data

from docling_graph_ray.stages.token_shards import write_token_shards

L, SPS, NB = 8, 4, 2  # tiny: 8-token seqs, 4 seqs/shard, 2 buckets
SPAN = L * SPS


def _toks_table(docs):
    return pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "toks": pa.array([d[1] for d in docs], pa.list_(pa.int64())),
        "n_tokens": pa.array([len(d[1]) for d in docs], pa.int64()),
    })


def _reference_shards(docs, pad_id=0):
    """Sequential recompute: per-bucket doc_id-ordered concatenation,
    sliced into SPAN-token shards, trailing sequence padded."""
    streams: dict[int, list[int]] = {}
    for doc_id, toks in sorted(docs):
        if toks:
            streams.setdefault(doc_id % NB, []).extend(toks)
    out = {}
    for bucket, stream in streams.items():
        for s in range(0, (len(stream) + SPAN - 1) // SPAN):
            chunk = stream[s * SPAN: (s + 1) * SPAN]
            n_seqs = (len(chunk) - 1) // L + 1
            buf = np.full(n_seqs * L, pad_id, np.uint32)
            buf[: len(chunk)] = chunk
            out[(bucket, s)] = buf
    return out


DOCS = [
    (0, [1, 2, 3]),
    (1, [10] * 5),
    (2, [7] * 40),            # spans two shards in its bucket
    (3, [11, 12]),
    (4, []),                  # empty → places nowhere
    (5, [9] * (SPAN + 3)),    # giant: more tokens than one shard
    (6, [4, 5, 6, 7, 8]),
    (7, [2] * 13),
]


def _run(tmp_path, docs=DOCS, **kw):
    ds = ray.data.from_arrow(_toks_table(docs))
    out = str(tmp_path / "shards")
    man = write_token_shards(
        ds, out, seq_len=L, seqs_per_shard=SPS, num_buckets=NB,
        rows_hint=len(docs), **kw,
    ).take_all()
    return out, {(m["bucket"], m["shard_id"]): m for m in man}


def test_bytes_match_sequential_reference(ray_session, tmp_path):
    out, man = _run(tmp_path)
    ref = _reference_shards(DOCS)
    assert set(man) == set(ref)
    for (bucket, shard), buf in ref.items():
        m = man[(bucket, shard)]
        raw = open(m["path"], "rb").read()
        assert raw == buf.astype("<u4").tobytes(), (bucket, shard)
        assert m["sha256"] == hashlib.sha256(raw).hexdigest()
        assert m["n_seqs"] == len(buf) // L


def test_manifest_counts(ray_session, tmp_path):
    _, man = _run(tmp_path)
    total = sum(m["n_tokens"] for m in man.values())
    assert total == sum(len(t) for _, t in DOCS)
    assert sum(m["token_sum"] for m in man.values()) \
        == sum(sum(t) for _, t in DOCS)
    # a full shard never exceeds its span — bounded by construction
    assert all(m["n_tokens"] <= SPAN for m in man.values())
    # the giant doc spans >1 shard and is counted in each
    giant_shards = [m for m in man.values()
                    if (5 % NB) == m["bucket"]]
    assert sum(m["n_tokens"] for m in giant_shards) >= SPAN + 3


def test_skip_existing_preserves_files(ray_session, tmp_path):
    out, man = _run(tmp_path)
    victim = next(iter(man.values()))["path"]
    os.utime(victim, (1, 1))
    ds = ray.data.from_arrow(_toks_table(DOCS))
    man2 = {(m["bucket"], m["shard_id"]): m for m in write_token_shards(
        ds, out, seq_len=L, seqs_per_shard=SPS, num_buckets=NB,
        rows_hint=len(DOCS), skip_existing=True,
    ).take_all()}
    assert os.stat(victim).st_mtime == 1  # untouched
    assert man2 == {(m["bucket"], m["shard_id"]): m for m in man.values()} \
        or all(man2[k]["sha256"] == v["sha256"]
               for k, v in man.items())  # manifest still exact


def test_rerun_is_byte_identical(ray_session, tmp_path):
    _, a = _run(tmp_path / "a")
    _, b = _run(tmp_path / "b")
    assert {k: v["sha256"] for k, v in a.items()} \
        == {k: v["sha256"] for k, v in b.items()}


from hypothesis import given, settings
from hypothesis import strategies as st

_doc_toks = st.lists(st.integers(min_value=0, max_value=1000),
                     max_size=2 * SPAN + 3)


@settings(max_examples=5, deadline=None)
@given(st.lists(_doc_toks, min_size=1, max_size=12))
def test_property_bytes_match_reference(ray_session, tmp_path_factory, tok_lists):
    docs = list(enumerate(tok_lists))
    out, man = _run(tmp_path_factory.mktemp("prop"), docs=docs)
    ref = _reference_shards(docs)
    assert set(man) == set(ref)
    for key, buf in ref.items():
        raw = open(man[key]["path"], "rb").read()
        assert raw == buf.astype("<u4").tobytes(), key
    # manifest totals reconcile with the input
    assert sum(m["n_tokens"] for m in man.values()) == sum(
        len(t) for _, t in docs)


def test_shards_cli_roundtrip(ray_session, tmp_path):
    """The `shards` CLI writes .bin files + a manifest parquet whose
    checksums match the files on disk."""
    import pyarrow.parquet as pq

    from docling_graph_ray.__main__ import main

    src = tmp_path / "docs.parquet"
    pq.write_table(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": [f"tok{i} tok{i+1} tok{i+2} shared words" for i in range(20)],
    }), str(src))
    out = tmp_path / "shards"
    rc = main(["shards", "--input", str(src), "--out", str(out),
               "--seq-len", "8", "--seqs-per-shard", "4",
               "--num-buckets", "2"])
    assert rc == 0
    man = pq.read_table(str(out / "_manifest"))
    assert man.num_rows > 0
    for row in man.to_pylist():
        raw = open(row["path"], "rb").read()
        assert hashlib.sha256(raw).hexdigest() == row["sha256"]
        assert len(raw) == row["n_seqs"] * 8 * 4  # seq_len x uint32
    # resume: a second run with --resume skips existing files
    victim = man.to_pylist()[0]["path"]
    os.utime(victim, (1, 1))
    assert main(["shards", "--input", str(src), "--out", str(out),
                 "--seq-len", "8", "--seqs-per-shard", "4",
                 "--num-buckets", "2", "--resume"]) == 0
    assert os.stat(victim).st_mtime == 1
