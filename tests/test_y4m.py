"""Y4M video modality: real container parse, frame sampling re-emits
valid Y4M, feature extraction, error routing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from dedup.multimodal import (Y4mFeatureExtractor, Y4mFrameSampler,
                              _y4m_frames, sample_frames, video_features,
                              y4m_bytes)


def test_y4m_roundtrip_header_and_frames():
    p = y4m_bytes(6, 4, [10, 20, 30], fps=(30, 1), colorspace="C420")
    (w, h, fn, fd, cs, _off), spans = _y4m_frames(p)
    assert (w, h, fn, fd, cs) == (6, 4, 30, 1, "C420")
    assert len(spans) == 3
    # C420 frame = wh + 2*(wh//4)
    assert all(e - s == 24 + 2 * 6 for s, e in spans)


@pytest.mark.parametrize("cs,planes", [("C420", 24 + 12), ("C422", 24 + 24),
                                       ("C444", 24 * 3), ("Cmono", 24)])
def test_y4m_colorspace_frame_sizes(cs, planes):
    p = y4m_bytes(6, 4, [1], colorspace=cs)
    _, spans = _y4m_frames(p)
    assert spans[0][1] - spans[0][0] == planes


def test_y4m_features_mean_and_peak():
    fe = Y4mFeatureExtractor()
    p = y4m_bytes(8, 2, [0, 100, 255], fps=(25, 1))
    w, h, fn, fd, nf, dur, mean, peak = fe._parse(p)
    assert (w, h, fn, fd, nf) == (8, 2, 25, 1, 3)
    assert dur == 3 * 1000 // 25
    assert mean == (0 + 100 + 255) // 3
    assert peak == 255


def test_y4m_truncation_and_bad_marker_raise():
    p = y4m_bytes(4, 2, [5, 6])
    with pytest.raises(ValueError):
        _y4m_frames(p[:-1])          # truncated final frame
    bad = p.replace(b"FRAME", b"FRAMX", 1)
    with pytest.raises(ValueError):
        _y4m_frames(bad)
    with pytest.raises(ValueError):
        _y4m_frames(b"JUNK\n" + p)   # wrong magic


def test_sampler_emits_valid_y4m_with_selected_frames():
    p = y4m_bytes(4, 4, list(range(10, 100, 10)))  # 9 frames
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "payload": pa.array([p], pa.binary())})
    out = Y4mFrameSampler(every_k=4)(t)
    assert out["n_frames_in"][0].as_py() == 9
    assert out["n_frames_out"][0].as_py() == 3  # frames 0, 4, 8
    fe = Y4mFeatureExtractor()
    feats = fe._parse(out["payload"][0].as_py())
    assert feats[4] == 3                       # n_frames
    assert feats[6] == (10 + 50 + 90) // 3     # mean over kept frames
    assert feats[7] == 90


def test_sampler_k1_is_identity_content():
    p = y4m_bytes(4, 2, [1, 2, 3])
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "payload": pa.array([p], pa.binary())})
    out = Y4mFrameSampler(every_k=1)(t)
    assert out["payload"][0].as_py() == p


def test_ray_pipeline_error_routing_and_determinism():
    good = y4m_bytes(4, 2, [9, 11])
    rows = {"doc_id": pa.array([0, 1, 2], pa.int64()),
            "payload": pa.array([good, None, good[:12]], pa.binary())}
    ds = ray.data.from_arrow(pa.table(rows))
    f = video_features(ds, batch_size=2).to_pandas().sort_values("doc_id")
    assert f["decoded"].tolist() == [1, 0, 0]
    assert f.loc[f.doc_id == 0, "mean_luma"].iloc[0] == 10
    s = sample_frames(ds, every_k=2, batch_size=2).to_pandas() \
        .sort_values("doc_id")
    assert s["decoded"].tolist() == [1, 0, 0]
    assert s.loc[s.doc_id == 0, "n_frames_out"].iloc[0] == 1
