"""ISO-BMFF / MP4 container codec (sources/mp4.py — the container
half of the r8 verdict's missing #4): real box walking and sample
tables, raw-RGB24 roundtrips, codec-entropy refusal, and the Spark
frame-sampling dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from social_media_etl_spark.sources import mp4 as M


def _frames(n, h=6, w=9, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


@pytest.mark.parametrize("chunks", [1, 2, 3])
@pytest.mark.parametrize("use_co64", [False, True])
@pytest.mark.parametrize("uniform_stsz", [True, False])
def test_mp4_roundtrip_all_table_layouts(chunks, use_co64, uniform_stsz):
    """Every stsc/stco/stsz layout combination the demuxer claims —
    multi-chunk walks, 64-bit offsets, constant and per-sample sizes —
    roundtrips the exact frame bytes."""
    frames = _frames(7)
    p = M.encode_mp4_raw(
        frames, fps=5, chunks=chunks, use_co64=use_co64,
        uniform_stsz=uniform_stsz,
    )
    t = M.mp4_sample_table(p)
    assert (t["width"], t["height"]) == (9, 6)
    assert t["fourcc"] == "raw "
    assert [s[2] for s in t["samples"]] == [i * 200 for i in range(7)]
    dec = M.decode_mp4_frames(p)
    assert len(dec) == 7
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


def test_mp4_max_frames_bounds_the_decode():
    p = M.encode_mp4_raw(_frames(9))
    assert len(M.decode_mp4_frames(p, max_frames=4)) == 4


def test_mp4_sample_table_is_metadata_only():
    """The table resolves offsets/sizes/timestamps without touching a
    sample byte — truncating the mdat payload body does not stop the
    METADATA pass (only the frame decode notices)."""
    p = M.encode_mp4_raw(_frames(3))
    # moov sits after mdat in our layout; cutting bytes INSIDE mdat
    # would shift moov. Instead corrupt mdat sample bytes in place.
    t = M.mp4_sample_table(p)
    off = t["samples"][0][0]
    corrupted = p[:off] + b"\xee" * 10 + p[off + 10 :]
    t2 = M.mp4_sample_table(corrupted)
    assert t2["samples"] == t["samples"]


def test_mp4_compressed_codec_refused_by_fourcc():
    p = M.encode_mp4_raw(_frames(2))
    i = p.rindex(b"raw ")  # the stsd sample entry (hdlr name also has it)
    for fourcc in (b"avc1", b"vp09", b"hev1"):
        with pytest.raises(NotImplementedError, match=fourcc.decode()):
            M.decode_mp4_frames(p[:i] + fourcc + p[i + 4 :])


def test_mp4_malformed_payloads_raise_cleanly():
    with pytest.raises(ValueError, match="ftyp"):
        M.mp4_sample_table(b"\x00" * 64)
    p = M.encode_mp4_raw(_frames(2))
    with pytest.raises(ValueError, match="moov"):
        M.mp4_sample_table(p[: p.index(b"moov") - 4])
    # a box whose declared size overruns the file
    bad = bytearray(p)
    import struct

    struct.pack_into(">I", bad, p.index(b"moov") - 4, 1 << 30)
    with pytest.raises(ValueError, match="malformed box"):
        M.mp4_sample_table(bytes(bad))


def test_mp4_rejects_bad_frames():
    with pytest.raises(ValueError, match="at least one"):
        M.encode_mp4_raw([])
    with pytest.raises(ValueError, match="share dims"):
        M.encode_mp4_raw(
            [np.zeros((4, 4, 3), np.uint8), np.zeros((5, 4, 3), np.uint8)]
        )


def test_mp4_dispatches_through_sample_video_frames(spark):
    """An MP4 payload rides the same Arrow frame-sampling stage as GIF
    and PPM streams — dispatch on the ftyp magic, per-frame digests
    over canonical PPM bytes, every_n stride honored."""
    from social_media_etl_spark.sources import multimodal as mm

    frames = _frames(6, h=5, w=7, seed=11)
    payload = M.encode_mp4_raw(frames, chunks=2)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    rows = (
        mm.sample_video_frames(df, every_n=2, max_frames=3, backend="numpy")
        .orderBy("frame_idx")
        .collect()
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    import hashlib

    want0 = hashlib.sha256(mm.encode_ppm(frames[0])).hexdigest()
    assert rows[0]["frame_digest"] == want0
    assert rows[0]["mean_intensity"] == round(float(frames[0].mean()), 2)
    # sniffed media type is video/mp4 (JVM-side magic compare)
    typed = mm.attach_media_metadata(df).collect()[0]
    assert typed["media_type"] == "video/mp4"
