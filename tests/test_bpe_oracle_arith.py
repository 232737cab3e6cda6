"""Pin the BPE oracle's merge-replay primitive against the stage
implementation (no Ray): the double-separator string replace —
``replace('|'+join(ts,'||')+'|', '|l||r|', '|lr|')`` — must reproduce
``_merge_pair_in_seq``'s left-to-right NON-OVERLAPPING merge exactly,
including runs ('aaaa' -> ['aa','aa'], 'aaa' -> ['aa','a']) and tokens
that are substrings/concatenations of each other ('a' vs 'ab' vs 'aab'),
because the claim in ``__ray_entry__._bpe_replay_cte`` rests on it.
The replay is exercised both in pure Python (string semantics) and in
DuckDB (the actual replace() the oracle runs)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from docling_graph_ray.stages.text_analysis import _merge_pair_in_seq

# tokens chosen to maximize boundary confusion: single chars, a 2-char
# token sharing chars with both singles, overlapping concatenations,
# and the real end-of-word sentinel
TOKENS = ["a", "b", "ab", "ba", "aab", "</w>"]


def encode(seq: list[str]) -> str:
    return "|" + "||".join(seq) + "|"


def decode(st: str) -> list[str]:
    return st[1:-1].split("||") if len(st) > 2 else [st[1:-1]]


def replay_merge(seq: list[str], left: str, right: str) -> list[str]:
    st = encode(seq)
    st = st.replace(f"|{left}||{right}|", f"|{left}{right}|")
    return decode(st)


@settings(max_examples=300, deadline=None)
@given(
    seq=st.lists(st.sampled_from(TOKENS), min_size=1, max_size=12),
    pair=st.tuples(st.sampled_from(TOKENS), st.sampled_from(TOKENS)),
)
def test_replay_matches_merge_pair_in_seq(seq, pair):
    left, right = pair
    assert replay_merge(seq, left, right) == _merge_pair_in_seq(
        seq, left, right
    )


def test_replay_run_semantics_pinned():
    # the cases that break the single-separator encoding
    assert replay_merge(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert replay_merge(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert replay_merge(["a", "a", "a", "a", "a"], "a", "a") == [
        "aa", "aa", "a"]
    # mid-token false-match guard: pair (a, b) must not fire inside
    # ('ba', 'b') or ('a', 'ab')
    assert replay_merge(["ba", "b"], "a", "b") == ["ba", "b"]
    assert replay_merge(["a", "ab"], "a", "b") == ["a", "ab"]


@settings(max_examples=60, deadline=None)
@given(
    seq=st.lists(st.sampled_from(TOKENS), min_size=1, max_size=10),
    pair=st.tuples(st.sampled_from(TOKENS), st.sampled_from(TOKENS)),
)
def test_duckdb_replace_matches_python_replace(seq, pair):
    # the oracle runs DuckDB's replace(), not Python's — pin that they
    # agree on the encoded states (both non-overlapping left-to-right)
    left, right = pair
    st_enc = encode(seq)
    got = duckdb.sql(
        "SELECT replace(?, ?, ?) AS s",
        params=[st_enc, f"|{left}||{right}|", f"|{left}{right}|"],
    ).fetchone()[0]
    assert got == st_enc.replace(f"|{left}||{right}|", f"|{left}{right}|")
