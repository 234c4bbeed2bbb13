"""Multimodal plumbing: schema, determinism, batch shapes, frame fan-out."""

import numpy as np

from causalre_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_images,
    sample_frames,
    synth_assets_df,
)


def test_asset_schema_and_kinds(spark):
    df = synth_assets_df(spark, 30, partitions=4)
    assert df.schema["payload"].dataType.typeName() == "binary"
    kinds = {r.kind for r in df.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    m = df.filter("kind = 'image'").select("meta.width", "meta.codec").first()
    assert m["width"] >= 64 and m["codec"] == "fakejpg"


def test_features_deterministic_and_fixed_width(spark):
    df = synth_assets_df(spark, 24, partitions=3)
    f1 = {r.asset_id: r.feature for r in extract_features(df).collect()}
    f2 = {r.asset_id: r.feature for r in extract_features(df).collect()}
    assert len(f1) == 24
    assert all(len(v) == FEATURE_DIM for v in f1.values())
    for k in f1:
        assert np.allclose(f1[k], f2[k])


def test_frame_sampling_fanout(spark):
    df = synth_assets_df(spark, 30, partitions=2)
    frames = sample_frames(df, n_frames=4)
    rows = frames.collect()
    n_videos = df.filter("kind = 'video'").count()
    assert len(rows) == n_videos * 4
    assert {r.frame for r in rows} == {0, 1, 2, 3}


def test_resize_updates_payload_and_meta(spark):
    df = synth_assets_df(spark, 12, partitions=2)
    out = resize_images(df, target=32).collect()
    assert all(len(bytes(r.payload)) <= 32 for r in out)
    assert all(r.meta["width"] == 32 and r.meta["height"] == 32 for r in out)
    assert all(r.kind == "image" for r in out)
