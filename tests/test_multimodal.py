"""Multimodal decode plumbing: actor-pool stage, schema, error routing.
The decode kernel is stubbed (no media libs in env) — these tests pin the
Ray-side contract."""

import numpy as np
import pytest
import ray.data

from dedup.multimodal import (DeterministicFakeDecoder, MediaDecoder,
                              decode_features, frame_sample_plan, synth_media)


def test_fake_decode_end_to_end():
    media = synth_media(60, seed=5)
    ds = ray.data.from_arrow(media).repartition(3)
    out = decode_features(ds, feature_dim=16, batch_size=16,
                          concurrency=(1, 2))
    rows = {}
    for b in out.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            rows[b["media_id"][i].as_py()] = (b["feature"][i].as_py(),
                                              b["decode_error"][i].as_py())
    assert len(rows) == 60
    feats = [f for f, e in rows.values() if e is None]
    assert all(len(f) == 16 for f in feats)
    # null payloads -> error rows, not dropped
    errs = [e for _, e in rows.values() if e is not None]
    assert errs and all("null payload" in e for e in errs)
    # deterministic: same payload -> same feature
    d = DeterministicFakeDecoder(feature_dim=16)
    v1 = d._decode_impl(b"same bytes", "image")
    v2 = d._decode_impl(b"same bytes", "image")
    assert np.array_equal(v1, v2)


def test_strict_decoder_marks_boundary():
    d = MediaDecoder()
    with pytest.raises(NotImplementedError):
        d._decode_impl(b"x", "image")


def test_frame_sample_plan():
    assert frame_sample_plan(5000, every_ms=1000) == [0, 1000, 2000, 3000, 4000]
    assert frame_sample_plan(0) == []
    assert len(frame_sample_plan(10_000_000, every_ms=100, max_frames=8)) == 8
