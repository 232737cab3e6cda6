"""Deterministic hashing helpers.

The reference derives node ids / chunk hashes from ``blake2b`` digests
(reference: docling_graph/core/provenance/models.py:30-37,
docling_graph/core/converters/node_id_registry.py:58-113) so that the same
input always produces the same id on any worker — the property that lets us
delete the reference's shared ``NodeIDRegistry`` entirely: hash-equality
replaces the registry dict.

Everything here must be a pure function of its inputs (never of
``PYTHONHASHSEED``, wall clock, or process identity).
"""

from __future__ import annotations

import hashlib

import numpy as np

# ---------------------------------------------------------------------------
# scalar digests


def blake2b_hex(data: bytes | str, digest_size: int = 16) -> str:
    """Stable hex digest; 16 bytes matches the reference's document id width."""
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return hashlib.blake2b(data, digest_size=digest_size).hexdigest()


def blake2b_u64(data: bytes | str) -> int:
    """Stable unsigned 64-bit hash (used for partitioning and minhash bases)."""
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return int.from_bytes(
        hashlib.blake2b(data, digest_size=8).digest(), "big", signed=False
    )


def sha256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return hashlib.sha256(data).hexdigest()


# ---------------------------------------------------------------------------
# partitioning


def url_part_id(url: str, num_partitions: int) -> int:
    """Partition id for a url: ``blake2b(url) % P``.

    This is THE partitioning key of the engine (SURVEY.md §7.4): the lineage
    groupby, checkpoint layout and resume anti-join all reuse it, so the
    shuffle key is chosen once and shared by every wide step.
    """
    return blake2b_u64(url) % num_partitions


def url_part_ids(urls: list[str], num_partitions: int) -> np.ndarray:
    return np.fromiter(
        (url_part_id(u, num_partitions) for u in urls),
        dtype=np.int32,
        count=len(urls),
    )


# ---------------------------------------------------------------------------
# order-independent rollup (for resume-idempotence checks)


def xor_rollup_hex(hex_digests: list[str], width: int = 16) -> str:
    """Order-independent combination of hex digests (xor of the first
    ``width`` bytes).  Equal multisets of per-url digests produce equal
    rollups no matter how rows were distributed across workers — the
    property the resume test asserts (FIXTURES.md §3).
    """
    acc = 0
    for h in hex_digests:
        acc ^= int(h[: width * 2], 16)
    return format(acc, f"0{width * 2}x")


# ---------------------------------------------------------------------------
# vectorized rolling polynomial hash (document fingerprinting)

_POLY_BASE = np.uint64(1099511628211)  # FNV prime as the multiplier
_POLY_SEED = np.uint64(14695981039346656037)  # FNV offset basis


def rolling_fingerprint(text: str) -> int:
    """64-bit polynomial rolling hash over the utf-8 bytes, vectorized.

    acc_i = acc_{i-1} * B + byte_i  (mod 2^64), computed with a numpy
    cumulative product trick: acc_n = sum_j byte_j * B^(n-1-j).
    """
    raw = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if raw.size == 0:
        return int(_POLY_SEED)
    n = raw.size
    with np.errstate(over="ignore"):
        powers = np.empty(n, dtype=np.uint64)
        powers[0] = np.uint64(1)
        if n > 1:
            powers[1:] = _POLY_BASE
            np.cumprod(powers, out=powers)
        # reversed so the last byte gets B^0
        acc = np.uint64(0)
        acc = (raw.astype(np.uint64) * powers[::-1]).sum(dtype=np.uint64)
        acc += _POLY_SEED * powers[-1] * _POLY_BASE
    return int(acc)
