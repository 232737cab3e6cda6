"""Multimodal plumbing: schema, actor stage, determinism (decode stubbed)."""

import numpy as np

import ray.data

from docling_graph_ray.stages.multimodal import (
    FEATURE_DIM,
    MediaFeatureActor,
    make_media_table,
    media_features,
)


def test_media_table_schema():
    t = make_media_table(9)
    assert t.column_names == ["media_id", "payload", "meta"]
    meta0 = t.column("meta")[0].as_py()
    assert meta0["media_type"] == "image"


def test_actor_stage_features(ray_session):
    ds = ray.data.from_arrow(make_media_table(12))
    out = media_features(ds, concurrency=(1, 2), batch_size=4).take_all()
    assert len(out) == 12
    for r in out:
        v = np.asarray(r["feature"])
        assert v.shape == (FEATURE_DIM,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_features_deterministic():
    actor = MediaFeatureActor()
    t = make_media_table(5)
    a = actor(t).column("feature").to_pylist()
    b = MediaFeatureActor()(t).column("feature").to_pylist()
    assert a == b
