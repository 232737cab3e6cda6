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


def test_resize_stage(ray_session):
    import ray.data as rd

    from docling_graph_ray.stages.multimodal import MediaResizeActor, make_media_table

    ds = rd.from_arrow(make_media_table(12))
    out = ds.map_batches(
        MediaResizeActor, batch_format="pyarrow", batch_size=4,
        concurrency=(1, 2),
        fn_constructor_kwargs={"width": 8, "height": 8},
    ).to_pandas()
    assert len(out) == 12
    assert all(len(p) == 8 * 8 * 3 for p in out["payload"])
    assert all(m["width"] == 8 and m["height"] == 8 for m in out["meta"])


def test_frame_sample(ray_session):
    import ray.data as rd

    from docling_graph_ray.stages.multimodal import frame_sample, make_media_table

    tbl = make_media_table(12)  # every 3rd row is video with duration 1000+i
    out = frame_sample(rd.from_arrow(tbl), every_ms=250, max_frames=8).to_pandas()
    assert set(out["media_id"]) == {2, 5, 8, 11}   # video rows only
    one = out[out["media_id"] == 2].sort_values("frame_no")
    assert one["ts_ms"].tolist() == [0, 250, 500, 750, 1000]
    # deterministic frame bytes
    out2 = frame_sample(rd.from_arrow(tbl), every_ms=250, max_frames=8).to_pandas()
    assert sorted(map(bytes, out["frame"])) == sorted(map(bytes, out2["frame"]))
