"""Pin the near-dup oracle's SQL arithmetic primitives bit-exactly
against the stage implementations (no Ray): CRC32 (recursive-CTE table +
per-char fold) vs zlib.crc32, the pure-UBIGINT (a*h+b) mod 2^64 mod
(2^61-1) permutation vs the numpy uint64-wraparound in
stages/dedup.py:minhash_signature, and splitmix64 vs _mix64."""

from __future__ import annotations

import sys
import zlib
from pathlib import Path

import duckdb
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __ray_entry__ as entry_mod
from docling_graph_ray.stages.dedup import _mix64

M61 = (1 << 61) - 1


def test_sql_crc32_matches_zlib():
    samples = ["hello", "the of and", "a", "zzz yyy xxx www",
               "Sección—é",  # non-ascii multi-byte chars excluded by
               ]
    # oracle corpus is printable ASCII (ord == utf-8 byte); keep the
    # pinned samples in that domain
    samples = [s for s in samples if all(ord(c) < 128 for c in s)]
    vals = ", ".join(f"({i}, '{s}')" for i, s in enumerate(samples))
    sql = f"""
WITH RECURSIVE
{entry_mod._ND_CRCTAB_SQL},
inputs(sid, s) AS (VALUES {vals}),
fold AS (
  SELECT sid, s, 1 AS pos, CAST(4294967295 AS UBIGINT) AS crc FROM inputs
  UNION ALL
  SELECT f.sid, f.s, f.pos + 1, xor(t.entry, f.crc // 256)
  FROM fold f JOIN crctab t
    ON t.idx = CAST(xor(f.crc % 256,
                        ord(substr(f.s, f.pos, 1))::UBIGINT) AS INTEGER)
  WHERE f.pos <= length(f.s)
)
SELECT sid, xor(crc, CAST(4294967295 AS UBIGINT)) AS crc32
FROM fold WHERE pos = length(s) + 1 ORDER BY sid
"""
    got = dict(duckdb.sql(sql).fetchall())
    for i, s in enumerate(samples):
        assert got[i] == zlib.crc32(s.encode()), s


def test_sql_perm_arith_matches_numpy_wraparound():
    rng = np.random.default_rng(3)
    a = rng.integers(1, M61, size=300, dtype=np.uint64)
    b = rng.integers(0, M61, size=300, dtype=np.uint64)
    h = rng.integers(0, 1 << 32, size=300, dtype=np.uint64)
    # force boundary shapes: max operands and Mersenne-multiple sums
    a[0], b[0], h[0] = np.uint64(M61 - 1), np.uint64(M61 - 1), np.uint64((1 << 32) - 1)
    a[1], b[1], h[1] = np.uint64(1), np.uint64(0), np.uint64(0)
    a[2], b[2], h[2] = np.uint64(M61), np.uint64(0), np.uint64(1)
    with np.errstate(over="ignore"):
        exp = ((a * h + b) % np.uint64(M61)) & np.uint64((1 << 32) - 1)
    vals = ", ".join(
        f"({int(a[i])}::UBIGINT, {int(b[i])}::UBIGINT, {int(h[i])}::UBIGINT)"
        for i in range(len(a)))
    sql = f"""
WITH inp(a, b, h) AS (VALUES {vals}),
s0 AS (
  SELECT a, b, h,
         (a & CAST(4294967295 AS UBIGINT)) * h AS t1,
         ((a >> CAST(32 AS UBIGINT)) * h % CAST(4294967296 AS UBIGINT))
           * CAST(4294967296 AS UBIGINT) AS t2
  FROM inp),
s1 AS (SELECT b, CASE WHEN t1 > CAST(18446744073709551615 AS UBIGINT) - t2
                      THEN t1 - (CAST(18446744073709551615 AS UBIGINT) - t2) - 1
                      ELSE t1 + t2 END AS s1 FROM s0),
s2 AS (SELECT CASE WHEN s1 > CAST(18446744073709551615 AS UBIGINT) - b
                   THEN s1 - (CAST(18446744073709551615 AS UBIGINT) - b) - 1
                   ELSE s1 + b END AS s2 FROM s1),
s3 AS (SELECT (s2 >> CAST(61 AS UBIGINT))
                + (s2 & CAST(2305843009213693951 AS UBIGINT)) AS m FROM s2)
SELECT (CASE WHEN m >= CAST(2305843009213693951 AS UBIGINT)
             THEN m - CAST(2305843009213693951 AS UBIGINT) ELSE m END)
       & CAST(4294967295 AS UBIGINT) AS v
FROM s3
"""
    got = np.array([r[0] for r in duckdb.sql(sql).fetchall()], dtype=np.uint64)
    assert (got == exp).all()


def test_sql_splitmix64_matches_mix64():
    rng = np.random.default_rng(5)
    h = rng.integers(0, 1 << 32, size=200, dtype=np.uint64)
    exp = _mix64(h.copy())
    vals = ", ".join(f"({int(x)}::UBIGINT)" for x in h)
    mul = (
        "CAST((  (h::HUGEINT % 4294967296) * {c} % 18446744073709551616\n"
        "  + ((h::HUGEINT // 4294967296) * {c} % 4294967296) * 4294967296\n"
        "  ) % 18446744073709551616 AS UBIGINT)"
    )
    sql = f"""
WITH inp(h) AS (VALUES {vals}),
m1 AS (SELECT xor(h, h >> 30) AS h FROM inp),
m2 AS (SELECT {mul.format(c=13787848793156543929)} AS h FROM m1),
m3 AS (SELECT xor(h, h >> 27) AS h FROM m2),
m4 AS (SELECT {mul.format(c=10723151780598845931)} AS h FROM m3)
SELECT xor(h, h >> 31) AS h FROM m4
"""
    got = np.array([r[0] for r in duckdb.sql(sql).fetchall()], dtype=np.uint64)
    assert (got == exp).all()
