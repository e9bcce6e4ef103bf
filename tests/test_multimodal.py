"""Multimodal plumbing: binary schema, actor decode stage, frame sampling.
The decode kernel is a documented stub (real decoder raises
NotImplementedError); the Ray-side plumbing is real."""

import pytest

from agenticknowledgegraphconstructionsystem_ray.stages import multimodal

SF = "/root/testdata/sf0.001"


def test_decode_meta_roundtrip():
    out = multimodal.decode_meta(SF).to_pandas()
    assert len(out) == 500
    assert set(out["format"]) == {"IMG1", "AUD1", "VID1"}
    # header fields decode to the planted values
    row = out[out["media_id"] == 3].iloc[0]
    assert row["kind"] == "image" if 3 % 3 == 0 else True
    assert (out["width"] >= 16).all() and (out["width"] < 656).all()
    assert (out["body_bytes"] > 0).all()


def test_kind_assignment():
    out = multimodal.decode_meta(SF).to_pandas()
    for _, r in out.head(20).iterrows():
        expect = {0: ("image", "IMG1"), 1: ("audio", "AUD1"), 2: ("video", "VID1")}[
            r["media_id"] % 3
        ]
        assert (r["kind"], r["format"]) == expect


def test_frame_sampler_counts():
    frames = multimodal.sampled_frames(SF, stride=4).to_pandas()
    assert len(frames) > 0
    meta = multimodal.decode_meta(SF).to_pandas().set_index("media_id")
    for _, r in frames.head(10).iterrows():
        body = meta.loc[r["media_id"], "body_bytes"]
        n_frames = -(-body // multimodal.FRAME_BYTES)
        assert r["n_sampled_frames"] == -(-n_frames // 4)


def test_real_decode_is_marked_stub():
    with pytest.raises(NotImplementedError):
        multimodal.DecodeMedia(real_decode=True)
