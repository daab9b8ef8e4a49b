"""Multimodal binary-column plumbing: schema, batch independence,
binary-in/binary-out, frame explosion."""

from __future__ import annotations

import pytest

from ojo_daps_mirror_spark.operators.multimodal import (
    TARGET_BYTES,
    _fake_resize,
    decode_media,
    resize_media,
    sample_frames,
)
from ojo_daps_mirror_spark.sources import load_table


def test_resize_outputs_bounded_binary(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = resize_media(docs)
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows[:50]:
        assert isinstance(r["payload"], (bytes, bytearray))
        assert r["n_bytes_out"] <= TARGET_BYTES
        assert r["n_bytes_out"] == len(r["payload"])


def test_resize_is_deterministic_across_repartition(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: r["payload"] for r in resize_media(docs).collect()}
    b = {
        r["doc_id"]: r["payload"]
        for r in resize_media(docs.repartition(7)).collect()
    }
    assert a == b


def test_real_codec_path_is_explicitly_gated():
    with pytest.raises(NotImplementedError):
        _fake_resize(b"abc", "image", use_real_codec=True)


def test_frame_sampling_explodes_videos_only(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(docs, every_nth=2)
    decoded = decode_media(docs).where("media_type = 'video'").collect()
    want = sum(len(range(0, max(r["n_frames_sampled"] - 1, 0) + 1, 2)) for r in decoded)
    assert frames.count() == want
    assert frames.select("doc_id").distinct().count() == len(decoded)
