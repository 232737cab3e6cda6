"""Merge-fold vectors (FIXTURES.md §5; reference: node_folder.py /
graph_converter.py enrichment / description_merger.py)."""

from docling_graph_ray.functions.merging import (
    enrich_first_wins,
    fold_records,
    merge_descriptions,
)


def test_enrich_fills_empty_never_overwrites():
    recs = [
        {"name": "A", "city": "", "age": None},
        {"name": "B", "city": "Paris", "age": 30},
    ]
    out = enrich_first_wins(recs)
    assert out == {"name": "A", "city": "Paris", "age": 30}


def test_fold_idempotent_merge_a_a_equals_a():
    a = {"name": "A", "x": 1}
    out, conflicts = fold_records([a, dict(a)])
    assert out == a and conflicts == []


def test_fold_records_conflicts():
    out, conflicts = fold_records(
        [{"name": "A", "x": 1}, {"name": "A", "x": 2, "y": "z"}]
    )
    assert out == {"name": "A", "x": 1, "y": "z"}
    assert conflicts == [{"field": "x", "kept": 1, "dropped": 2, "source_index": 1}]


def test_fold_left_associative_first_wins():
    out, _ = fold_records([{"v": "first"}, {"v": "second"}, {"v": "third"}])
    assert out["v"] == "first"


def test_merge_descriptions_sentence_dedup():
    m = merge_descriptions(["One two. Three four.", "Three four. Five six."])
    assert m == "One two. Three four. Five six."


def test_merge_descriptions_cap():
    m = merge_descriptions(["Aaaa bbbb. " * 50], max_len=30)
    assert len(m) <= 30
