"""Sharded mutable content-hash index for INCREMENTAL dedup.

Batch dedup (``stages/dedup.py``) answers "which rows of THIS dataset
are copies"; a continuously-fed 100 TB pipeline also needs "have we
EVER ingested this content" — a shared mutable index that survives
across ``map_batches`` tasks.  That is the one semantics the Dataset
API genuinely cannot express (a groupby sees only this run's rows), so
this module drops to raw ``@ray.remote`` actors, exactly as the
engine-design notes prescribe: N shard actors each own a disjoint
slice of hash space (``hash % n_shards``), actor tasks serialize per
actor, so ``test_and_insert`` is atomic per shard and distinct-content
counts are exact regardless of batch arrival order.

Two shard modes:

- ``exact`` (default): a set of 64-bit content hashes.  Memory is
  ~40 B per distinct doc per shard-replica — at 10^11 docs you shard
  wider (the router takes any shard count) or switch to:
- ``bloom``: a packed bit array with k derived probes
  (Kirsch–Mitzenmacher double hashing), constant memory, documented
  false-positive rate ~ (1 - e^{-kn/m})^k; a false positive DROPS a
  genuinely-new doc, which for corpus dedup is a tiny recall loss,
  never corruption.

Partitioning assumption: a given content hash always routes to the
same shard, so cross-shard races cannot double-admit one content.
Within a batch, earlier occurrences win (positional first-seen).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray


def content_hash64(texts: list) -> np.ndarray:
    """uint64 blake2b content hashes (stable across runs/processes)."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(
                    (t or "").encode("utf-8", "surrogatepass"), digest_size=8
                ).digest(),
                "big",
            )
            for t in texts
        ),
        np.uint64,
        len(texts),
    )


@ray.remote(num_cpus=0.25)
class HashIndexShard:
    """One shard of the index; holds state across the whole run."""

    def __init__(self, mode: str = "exact", n_bits: int = 1 << 22, k: int = 4):
        if mode not in ("exact", "bloom"):
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        self.k = k
        self.n_bits = n_bits
        self.seen: set[int] = set()
        self.bits = np.zeros(n_bits // 8 + 1, np.uint8)

    def test_and_insert(self, hashes: np.ndarray) -> np.ndarray:
        """Return seen-before mask; insert every hash.  Duplicates inside
        one call follow sequential semantics (first occurrence is new)."""
        uniq, first_pos, inv = np.unique(
            hashes, return_index=True, return_inverse=True
        )
        if self.mode == "exact":
            present = np.fromiter(
                (int(h) in self.seen for h in uniq), bool, len(uniq)
            )
            self.seen.update(int(h) for h in uniq)
        else:
            h1 = uniq % np.uint64(self.n_bits)
            h2 = (uniq >> np.uint64(32)) | np.uint64(1)  # odd => full-period probe
            probes = (
                h1[:, None] + np.arange(self.k, dtype=np.uint64) * h2[:, None]
            ) % np.uint64(self.n_bits)
            byte_idx = (probes >> 3).astype(np.int64)
            bit = (np.uint8(1) << (probes & np.uint64(7)).astype(np.uint8))
            present = ((self.bits[byte_idx] & bit) != 0).all(axis=1)
            np.bitwise_or.at(self.bits, byte_idx.ravel(), bit.ravel())
        # a row is "seen" if its content was present OR an earlier row of
        # this batch carried the same content
        is_first = np.arange(len(hashes)) == first_pos[inv]
        return present[inv] | ~is_first

    def n_distinct(self) -> int:
        """Exact count (exact mode) / set-bit count (bloom mode)."""
        if self.mode == "exact":
            return len(self.seen)
        return int(np.unpackbits(self.bits).sum())


def create_index(n_shards: int = 8, mode: str = "exact", **kw) -> list:
    """Spawn the shard actors.  Callers own their lifetime (ray.kill)."""
    return [HashIndexShard.remote(mode=mode, **kw) for _ in range(n_shards)]


class IncrementalDedup:
    """Actor-pool ``map_batches`` stage marking rows seen/new against a
    shared :func:`create_index`.  Shard handles arrive through
    ``fn_constructor_kwargs`` so each pool actor resolves them once.

    One round trip per (batch, touched shard); calls to distinct shards
    are issued concurrently and gathered with a single ``ray.get``.
    """

    def __init__(self, shards: list, text_col: str = "text"):
        self.shards = shards
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = content_hash64(batch.column(self.text_col).to_pylist())
        shard_of = (h % np.uint64(len(self.shards))).astype(np.int64)
        seen = np.zeros(len(h), bool)
        touched = np.unique(shard_of)
        masks = ray.get(
            [
                self.shards[s].test_and_insert.remote(h[shard_of == s])
                for s in touched
            ]
        )
        for s, m in zip(touched, masks):
            seen[shard_of == s] = m
        return batch.append_column("seen", pa.array(seen))
