"""WebM / Matroska EBML container codec (sources/webm.py — the WebM
half of the r8 verdict's missing #4): real element walking and
SimpleBlock demux, raw-RGB24 roundtrips, codec refusal by CodecID,
streamed (unknown-size) elements, and the Spark dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from social_media_etl_spark.sources import webm as W


def _frames(n, h=5, w=8, seed=5):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


@pytest.mark.parametrize("frames_per_cluster", [1, 4, 100])
def test_webm_roundtrip_across_cluster_layouts(frames_per_cluster):
    frames = _frames(9)
    p = W.encode_webm_raw(frames, fps=5, frames_per_cluster=frames_per_cluster)
    t = W.webm_block_table(p)
    assert t["codec_id"] == "V_UNCOMPRESSED"
    assert (t["width"], t["height"]) == (8, 5)
    # absolute timestamps reassemble from cluster ts + block-relative
    assert [b[2] for b in t["blocks"]] == [i * 200 for i in range(9)]
    dec = W.decode_webm_frames(p)
    assert len(dec) == 9
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)
    assert len(W.decode_webm_frames(p, max_frames=2)) == 2


def test_webm_compressed_codec_refused_by_codec_id():
    p = bytearray(W.encode_webm_raw(_frames(2)))
    i = bytes(p).index(b"V_UNCOMPRESSED")
    for codec in (b"V_VP8", b"V_VP9", b"V_AV1"):
        q = bytearray(p)
        q[i : i + 14] = codec.ljust(14, b"\x00")
        with pytest.raises(NotImplementedError, match=codec.decode()):
            W.decode_webm_frames(bytes(q))


def test_webm_unknown_size_segment_still_walks():
    """Live-muxed WebM leaves the Segment size as the all-ones
    'unknown' pattern (RFC 8794); the walker treats it as
    to-end-of-parent."""
    p = bytearray(W.encode_webm_raw(_frames(3)))
    i = bytes(p).index(bytes.fromhex("18538067"))  # Segment id
    size_pos = i + 4
    width = 9 - p[size_pos].bit_length()
    # the all-ones pattern OF THE SAME WIDTH (marker bits included)
    p[size_pos] = (1 << (9 - width)) - 1
    for k in range(1, width):
        p[size_pos + k] = 0xFF
    dec = W.decode_webm_frames(bytes(p))
    assert len(dec) == 3


def test_webm_malformed_payloads_raise_cleanly():
    with pytest.raises(ValueError, match="EBML"):
        W.webm_block_table(b"\x00" * 32)
    p = W.encode_webm_raw(_frames(2))
    # truncating mid-element is caught by the overrun guard
    with pytest.raises(ValueError, match="overruns"):
        W.webm_block_table(p[:20])
    # a structurally intact file with the Segment cut off entirely
    ebml_end = p.index(bytes.fromhex("18538067"))
    with pytest.raises(ValueError, match="Segment"):
        W.webm_block_table(p[:ebml_end])


def test_webm_rejects_bad_frames():
    with pytest.raises(ValueError, match="at least one"):
        W.encode_webm_raw([])
    with pytest.raises(ValueError, match="equal dims"):
        W.encode_webm_raw(
            [np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4, 3), np.uint8)]
        )


def test_webm_dispatches_through_sample_video_frames(spark):
    """A WebM payload rides the same Arrow frame-sampling stage as
    GIF/MP4/PPM — dispatch on the EBML magic."""
    import hashlib

    from social_media_etl_spark.sources import multimodal as mm

    frames = _frames(6, h=4, w=6, seed=17)
    payload = W.encode_webm_raw(frames, frames_per_cluster=2)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = (
        mm.sample_video_frames(df, every_n=3, max_frames=2, backend="numpy")
        .orderBy("frame_idx")
        .collect()
    )
    assert [r["frame_idx"] for r in rows] == [0, 3]
    want0 = hashlib.sha256(mm.encode_ppm(frames[0])).hexdigest()
    assert rows[0]["frame_digest"] == want0
    typed = mm.attach_media_metadata(df).collect()[0]
    assert typed["media_type"] == "video/webm"
