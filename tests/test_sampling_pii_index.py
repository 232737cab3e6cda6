"""Tests for deterministic sampling, PII scrubbing and the sharded
incremental-dedup index (stages/sampling.py, pii.py, hash_index.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from docling_graph_ray.stages.hash_index import (
    HashIndexShard,
    IncrementalDedup,
    content_hash64,
    create_index,
)
from docling_graph_ray.stages.pii import redact_batch
from docling_graph_ray.stages.sampling import (
    MIX32_SQL,
    mix32,
    split_assign_batch,
    stratified_sample,
    temperature_mix,
    temperature_thresholds,
)

# ---------------------------------------------------------------------------
# mix32 / split


def test_mix32_matches_duckdb_fragment():
    import duckdb

    ids = np.arange(0, 20000, dtype=np.int64)
    sql = (
        f"SELECT {MIX32_SQL.format(c='id')} AS h "
        "FROM (SELECT unnest(range(0, 20000)) AS id) ORDER BY id"
    )
    db = duckdb.sql(sql).fetchnumpy()["h"]
    assert np.array_equal(mix32(ids), db)


def test_mix32_is_uniform_enough():
    buckets = mix32(np.arange(100_000, dtype=np.int64)) % 100
    counts = np.bincount(buckets, minlength=100)
    # each bucket within 15% of the expected 1000
    assert counts.min() > 850 and counts.max() < 1150


def test_split_assign_proportions_and_determinism():
    t = pa.table({"doc_id": pa.array(np.arange(50_000), pa.int64())})
    out = split_assign_batch("doc_id")(t)
    splits = out.column("split").to_pylist()
    n = len(splits)
    frac = {s: splits.count(s) / n for s in ("train", "val", "test")}
    assert abs(frac["train"] - 0.80) < 0.02
    assert abs(frac["val"] - 0.10) < 0.01
    assert abs(frac["test"] - 0.10) < 0.01
    # re-run on a shuffled subset: every id keeps its assignment
    sub = t.take(pa.array([7, 42, 31337, 49999, 0]))
    again = split_assign_batch("doc_id")(sub)
    by_id = dict(zip(out.column("doc_id").to_pylist(), splits))
    for i, s in zip(again.column("doc_id").to_pylist(),
                    again.column("split").to_pylist()):
        assert by_id[i] == s


def test_split_assign_rejects_bad_percentages():
    with pytest.raises(ValueError):
        split_assign_batch("doc_id", train_pct=95, val_pct=10)


# ---------------------------------------------------------------------------
# stratified sample


def _doc_table(n=300, langs=("en", "en", "en", "fr", "de")):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array([langs[i % len(langs)] for i in range(n)]),
        }
    )


def test_stratified_sample_block_size_invariant(ray_session):
    """The per-block top-k partial is a true combiner: the result is
    identical whether the input is 1 block or many tiny ones."""
    t = _doc_table(300)
    outs = []
    for blocks in (1, 16):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = (
            stratified_sample(ds, strat_col="lang", id_col="doc_id", k=10)
            .to_pandas()
            .sort_values(["lang", "rk"])
            .reset_index(drop=True)
        )
        outs.append(out)
    assert outs[0].equals(outs[1])
    by_lang = outs[0].groupby("lang").size().to_dict()
    assert by_lang == {"de": 10, "en": 10, "fr": 10}


def test_stratified_sample_orders_by_hash(ray_session):
    t = _doc_table(50, langs=("en",))
    out = (
        stratified_sample(
            ray.data.from_arrow(t), strat_col="lang", id_col="doc_id", k=5
        )
        .to_pandas()
        .sort_values("rk")
    )
    ids = np.arange(50, dtype=np.int64)
    expect = ids[np.lexsort((ids, mix32(ids)))][:5]
    assert list(out["doc_id"]) == list(expect)
    assert list(out["rk"]) == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# temperature mix


def test_temperature_thresholds_limits():
    counts = {"big": 400, "small": 100}
    # alpha=1: keep everything
    t1 = temperature_thresholds(counts, alpha=1.0)
    assert t1["big"] == t1["small"] == 1 << 32
    # alpha=0: equalize expected volumes (thr ratio == inverse count ratio)
    t0 = temperature_thresholds(counts, alpha=0.0)
    assert t0["small"] == 1 << 32
    assert t0["big"] == int(np.floor((100 / 400) * (1 << 32)))
    # alpha=0.5: in between
    t5 = temperature_thresholds(counts, alpha=0.5)
    assert t0["big"] < t5["big"] < t1["big"]
    assert temperature_thresholds({}, 0.5) == {}


def test_temperature_mix_keeps_rarest_and_downsamples(ray_session):
    n = 1000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array(["common"] * 900 + ["rare"] * 100),
        }
    )
    out = temperature_mix(
        ray.data.from_arrow(t).repartition(8),
        source_col="source", id_col="doc_id", alpha=0.5,
    ).to_pandas()
    kept = out.groupby("source").size().to_dict()
    assert kept["rare"] == 100  # p=1 for the rarest source
    # expected keep p = sqrt(100/900) = 1/3
    assert 0.25 < kept["common"] / 900 < 0.42
    # decision is reproducible from the id alone
    thr = temperature_thresholds({"common": 900, "rare": 100}, 0.5)
    kept_ids = set(out[out["source"] == "common"]["doc_id"])
    expect = {i for i in range(900) if mix32(np.array([i]))[0] < thr["common"]}
    assert kept_ids == expect


# ---------------------------------------------------------------------------
# PII redaction


def test_redact_batch_counts_and_replaces():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "write a.b+c@foo-bar.co.uk or boss@corp.io today",
                    "host 10.0.255.3, backup 192.168.1.1; call 555-867-5309",
                    "nothing sensitive here",
                ]
            ),
        }
    )
    out = redact_batch("text", out_col="redacted")(t)
    assert out.column("n_email").to_pylist() == [2, 0, 0]
    assert out.column("n_ip").to_pylist() == [0, 2, 0]
    assert out.column("n_phone").to_pylist() == [0, 1, 0]
    red = out.column("redacted").to_pylist()
    assert red[0] == "write <EMAIL> or <EMAIL> today"
    assert red[1] == "host <IP>, backup <IP>; call <PHONE>"
    assert red[2] == "nothing sensitive here"


def test_redact_email_before_ip_ordering():
    # an IP-looking email domain must redact as ONE email, not leak a
    # partial <IP> match to the later rule (email rule runs first)
    t = pa.table({"text": pa.array(["u@1.2.3.44.com stays one token"])})
    out = redact_batch("text")(t)
    assert out.column("n_email").to_pylist() == [1]
    assert out.column("redacted").to_pylist() == ["<EMAIL> stays one token"]


# ---------------------------------------------------------------------------
# sharded hash index


def test_hash_shard_exact_sequential_semantics(ray_session):
    shard = HashIndexShard.remote(mode="exact")
    h = content_hash64(["a", "b", "a", "c", "b"])
    seen = ray.get(shard.test_and_insert.remote(h))
    assert list(seen) == [False, False, True, False, True]
    # second call: everything already present
    assert list(ray.get(shard.test_and_insert.remote(h))) == [True] * 5
    assert ray.get(shard.n_distinct.remote()) == 3
    ray.kill(shard)


def test_hash_shard_bloom_no_false_negatives(ray_session):
    shard = HashIndexShard.remote(mode="bloom", n_bits=1 << 20, k=4)
    texts = [f"doc-{i}" for i in range(2000)]
    h = content_hash64(texts)
    first = ray.get(shard.test_and_insert.remote(h))
    second = ray.get(shard.test_and_insert.remote(h))
    assert second.all()  # no false negatives, ever
    # at 2k items in 1M bits the false-positive count is ~0
    assert first.sum() <= 2
    ray.kill(shard)


def test_hash_shard_rejects_unknown_mode(ray_session):
    with pytest.raises(Exception):
        ray.get(HashIndexShard.remote(mode="nope").n_distinct.remote())


def test_incremental_dedup_two_passes(ray_session):
    texts = [f"t{i % 40}" for i in range(100)]  # 40 distinct, 60 copies
    t = pa.table(
        {"doc_id": pa.array(np.arange(100), pa.int64()), "text": pa.array(texts)}
    )
    shards = create_index(3, mode="exact")
    try:
        for expect_new in (40, 0):
            marked = ray.data.from_arrow(t).repartition(4).map_batches(
                IncrementalDedup,
                fn_constructor_kwargs={"shards": shards},
                batch_format="pyarrow",
                concurrency=2,
            ).to_pandas()
            assert (~marked["seen"]).sum() == expect_new
        assert sum(ray.get([s.n_distinct.remote() for s in shards])) == 40
    finally:
        for s in shards:
            ray.kill(s)


# ---------------------------------------------------------------------------
# priority sampling (Duffield-Lund-Thorup weighted without replacement)


def test_priority_sample_matches_brute_force(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from docling_graph_ray.stages.sampling import mix32, priority_sample

    rng = np.random.default_rng(3)
    n, k = 500, 20
    ids = np.arange(n, dtype=np.int64)
    w = rng.integers(1, 10_000, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_chars": pa.array(w, pa.int64())})).repartition(7)

    got = priority_sample(ds, id_col="doc_id", weight_col="n_chars",
                          k=k).to_pandas()

    u = (mix32(ids).astype(np.float64) + 1.0) / 4294967296.0
    q = w.astype(np.float64) / u
    order = np.lexsort((ids, -q))
    want_ids = ids[order[:k]]
    tau = q[order[k]]
    assert list(got["doc_id"]) == list(want_ids)
    assert list(got["priority"]) == list(q[order[:k]])
    assert list(got["w_hat"]) == [max(float(x), tau)
                                  for x in w[order[:k]]]


def test_priority_sample_estimator_is_unbiased_over_salts(ray_session):
    # the w_hat estimator's defining property: for any fixed item,
    # E[w_hat * 1(selected)] = w.  With ONE deterministic hash draw the
    # population-sum identity sum(w_hat) ≈ sum(w) holds only up to the
    # estimator's sampling variance (relative sd ~ 1/sqrt(k)), so the
    # bound is loose — the bit-exact selection/estimator arithmetic is
    # pinned by the brute-force test above and the DuckDB oracle
    import numpy as np
    import pyarrow as pa
    import ray

    from docling_graph_ray.stages.sampling import priority_sample

    rng = np.random.default_rng(5)
    n, k = 3000, 200
    w = rng.integers(1, 1000, n).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "n_chars": pa.array(w, pa.int64())}))
    got = priority_sample(ds, k=k).to_pandas()
    assert len(got) == k
    est, true = got["w_hat"].sum(), float(w.sum())
    assert abs(est - true) / true < 0.30, (est, true)


def test_priority_sample_excludes_nonpositive_weights(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray

    from docling_graph_ray.stages.sampling import priority_sample

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "n_chars": pa.array([0, -5, 10, 20], pa.int64())}))
    got = priority_sample(ds, k=10).to_pandas()
    assert set(got["doc_id"]) == {3, 4}
