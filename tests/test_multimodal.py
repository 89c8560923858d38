"""Multimodal stage plumbing tests: schemas, determinism, actor-pool
signatures, row expansion.  Decode backends are stubbed (no codec libs
in the container) — the Ray-side plumbing is what's under test."""

import numpy as np
import pytest

from mapshaper_ray.stages.multimodal import (AudioFeaturizer, ImageDecoder,
                                             VideoFrameSampler,
                                             decode_images, featurize_audio,
                                             sample_video_frames,
                                             synth_media)

SF = "/root/testdata/sf0.001"


def test_real_backends_stubbed():
    with pytest.raises(NotImplementedError):
        ImageDecoder(backend="pil")
    with pytest.raises(NotImplementedError):
        AudioFeaturizer(backend="librosa")
    with pytest.raises(NotImplementedError):
        VideoFrameSampler(backend="pyav")


def test_image_pipeline(ray_session):
    media = synth_media(SF, kind="image")
    out = decode_images(media, concurrency=(1, 2), n_features=8)
    df = out.to_pandas()
    assert {"media_id", "height", "width", "channels",
            "img_features"} <= set(df.columns)
    assert (df["channels"] == 3).all()
    assert all(len(f) == 8 for f in df["img_features"])
    # determinism: same payload -> same features across runs
    df2 = decode_images(synth_media(SF, kind="image"),
                        concurrency=(1, 2), n_features=8).to_pandas()
    a = df.sort_values("media_id")["img_features"].iloc[0]
    b = df2.sort_values("media_id")["img_features"].iloc[0]
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_image_resize_plan(ray_session):
    media = synth_media(SF, kind="image")
    df = decode_images(media, resize_to=(224, 224)).to_pandas()
    assert (df["height"] == 224).all()
    assert (df["width"] == 224).all()


def test_audio_pipeline(ray_session):
    media = synth_media(SF, kind="audio")
    df = featurize_audio(media, n_mfcc=4).to_pandas()
    assert {"n_samples", "duration_s", "audio_features"} <= set(df.columns)
    assert (df["duration_s"] > 0).all()
    assert all(len(f) == 4 for f in df["audio_features"])


def test_video_frame_sampling(ray_session):
    media = synth_media(SF, kind="image")  # payload only
    out = sample_video_frames(media, stride=10, max_frames=4)
    df = out.to_pandas()
    # row-expanding: more rows than media, capped per media
    per = df.groupby("media_id").size()
    assert per.max() <= 4
    assert (df["frame_idx"] % 10 == 0).all()
    # deterministic frame hashes
    df2 = sample_video_frames(synth_media(SF, kind="image"),
                              stride=10, max_frames=4).to_pandas()
    m = df.merge(df2, on=["media_id", "frame_idx"])
    assert (m["frame_hash_x"] == m["frame_hash_y"]).all()
