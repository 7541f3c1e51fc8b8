"""REST JSON source + multimodal binary column tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from social_media_etl_spark.sources import multimodal, rest_api

USERS = [
    {
        "id": 1,
        "name": "Ada",
        "email": "ada@example.com",
        "address": {"city": "X", "geo": {"lat": "1.5", "lng": "-2.25"}},
        "company": {"name": "Acme"},
    },
    {
        "id": 2,
        "name": "Bo",
        "email": "bo@example.com",
        "address": {"city": "Y", "geo": {"lat": "3.0", "lng": "4.0"}},
        "company": {"name": "Binary"},
    },
]

USERS_SCHEMA = (
    "id long, name string, email string, "
    "address struct<city:string, geo:struct<lat:string, lng:string>>, "
    "company struct<name:string>"
)


@pytest.fixture(scope="module")
def array_fixture(tmp_path_factory):
    p = tmp_path_factory.mktemp("api") / "users.json"
    p.write_text(json.dumps(USERS))
    return str(p)


@pytest.fixture(scope="module")
def ndjson_fixture(tmp_path_factory):
    p = tmp_path_factory.mktemp("api") / "users.ndjson"
    p.write_text("\n".join(json.dumps(u) for u in USERS))
    return str(p)


def test_fetch_json_records_array_and_ndjson(array_fixture, ndjson_fixture):
    assert rest_api.fetch_json_records(array_fixture) == USERS
    assert rest_api.fetch_json_records("file://" + ndjson_fixture) == USERS


def test_json_records_to_df_explicit_schema(spark, array_fixture):
    records = rest_api.fetch_json_records(array_fixture)
    df = rest_api.json_records_to_df(spark, records, USERS_SCHEMA)
    assert df.count() == 2
    assert df.select("address.geo.lat").orderBy("id").first()[0] == "1.5"


def test_python_datasource_scan(spark, array_fixture):
    rest_api.register_rest_json_source(spark)
    df = (
        spark.read.format("rest_json")
        .schema(USERS_SCHEMA)
        .option("url", array_fixture)
        .load()
    )
    rows = df.orderBy("id").collect()
    assert [r["name"] for r in rows] == ["Ada", "Bo"]
    assert rows[0]["company"]["name"] == "Acme"


def test_json_landing_roundtrip(spark, tmp_path, array_fixture):
    records = rest_api.fetch_json_records(array_fixture)
    df = rest_api.json_records_to_df(spark, records, USERS_SCHEMA)
    # K1 whole-array form → S2 multiline read
    k1 = str(tmp_path / "landing.json")
    rest_api.write_json_array(df, k1)
    back = rest_api.read_json_landing(spark, k1, USERS_SCHEMA, multiline=True)
    assert back.count() == 2
    # K2 NDJSON form → S3 read
    k2 = str(tmp_path / "landing_nd")
    rest_api.write_ndjson(df, k2)
    back2 = rest_api.read_json_landing(spark, k2, USERS_SCHEMA)
    assert sorted(r["id"] for r in back2.collect()) == [1, 2]


def test_format_roundtrips_with_compression(spark, tmp_path):
    from social_media_etl_spark.catalog import load_table
    from social_media_etl_spark.sources import formats

    nation = load_table(spark, "/root/testdata/sf0.001", "nation")
    want = sorted(map(str, nation.collect()))
    schema = nation.schema
    import glob as g

    for fmt in formats.SUPPORTED_FORMATS:
        if fmt == "text":
            continue  # single-string-column contract; own roundtrip test
        path = str(tmp_path / f"t_{fmt}")
        formats.write_table(nation, path, fmt=fmt)
        back = formats.read_table(spark, path, fmt=fmt, schema=schema)
        assert sorted(map(str, back.collect())) == want, fmt
    # default codecs visible in filenames
    assert g.glob(str(tmp_path / "t_parquet" / "*.zstd.parquet"))
    assert g.glob(str(tmp_path / "t_orc" / "*.zlib.orc"))


def test_python_datasource_streaming_incremental(spark, tmp_path):
    """The rest_json stream source polls the endpoint and emits only
    NEW records per micro-batch (offset = records seen)."""
    feed = tmp_path / "feed.json"
    feed.write_text(json.dumps([{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]))
    rest_api.register_rest_json_source(spark)
    stream = (
        spark.readStream.format("rest_json")
        .schema("id long, name string")
        .option("url", str(feed))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rest_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert sorted(
            r["id"] for r in spark.table("rest_feed").collect()
        ) == [1, 2]
        # feed grows → only the tail is emitted (no duplicates)
        feed.write_text(
            json.dumps(
                [
                    {"id": 1, "name": "a"},
                    {"id": 2, "name": "b"},
                    {"id": 3, "name": "c"},
                ]
            )
        )
        q.processAllAvailable()
        assert sorted(
            r["id"] for r in spark.table("rest_feed").collect()
        ) == [1, 2, 3]
    finally:
        q.stop()


def test_bad_record_policies(spark, tmp_path):
    """Poison-record handling: quarantine, drop, or reference-parity
    failfast."""
    p = tmp_path / "dirty.ndjson"
    p.write_text('{"id": 1, "name": "ok"}\nTHIS IS NOT JSON\n{"id": 2, "name": "ok2"}\n')
    schema = "id long, name string"

    quarantined = rest_api.read_json_landing(
        spark, str(p), schema, corrupt_col="_bad"
    )
    rows = quarantined.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r["_bad"] is not None]
    assert len(bad) == 1 and bad[0]["_bad"].startswith("THIS IS")
    assert bad[0]["id"] is None

    dropped = rest_api.read_json_landing(
        spark, str(p), schema, mode="DROPMALFORMED"
    )
    assert sorted(r["id"] for r in dropped.collect()) == [1, 2]

    with pytest.raises(Exception, match="FAILED_READ_FILE|Malformed"):
        rest_api.read_json_landing(
            spark, str(p), schema, mode="FAILFAST"
        ).collect()


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------

PNG = b"\x89PNG\r\n\x1a\n" + b"fakepng" * 10
JPEG = b"\xff\xd8\xff\xe0" + b"fakejpg" * 9
MP4 = b"\x00\x00\x00\x18ftypmp42" + b"fakevid" * 20
WAV = b"RIFF\x24\x00\x00\x00WAVE" + b"fakewav" * 5
RAW = b"justbytes"


@pytest.fixture(scope="module")
def media(spark):
    rows = [(1, PNG), (2, JPEG), (3, MP4), (4, WAV), (5, RAW)]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_sniff_and_metadata_jvm_side(media):
    out = multimodal.attach_media_metadata(media)
    got = {r["media_id"]: r for r in out.collect()}
    assert got[1]["media_type"] == "image/png"
    assert got[2]["media_type"] == "image/jpeg"
    assert got[3]["media_type"] == "video/mp4"
    assert got[4]["media_type"] == "audio/wav"
    assert got[5]["media_type"] == "application/octet-stream"
    assert got[5]["n_bytes"] == len(RAW)
    assert len(got[1]["digest"]) == 64


def test_decode_images_fake_backend_deterministic(media):
    imgs = media.filter(F.col("media_id") <= 2)
    a = sorted(multimodal.decode_images(imgs).collect())
    b = sorted(multimodal.decode_images(imgs).collect())
    assert a == b and len(a) == 2
    for r in a:
        assert 64 <= r["width"] <= 2048 and 64 <= r["height"] <= 2048
        assert r["channels"] == 3 and 0 <= r["mean_intensity"] <= 256


def test_decode_images_real_backend_is_stubbed(media):
    with pytest.raises(NotImplementedError):
        multimodal.decode_images(media, backend="real")


def test_resize_images_shape(media):
    out = multimodal.resize_images(media, target=(224, 224)).collect()
    assert len(out) == 5
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)
    assert all(len(bytes(r["payload"])) > 32 for r in out)


def test_sample_video_frames_multiplicity(media):
    out = multimodal.sample_video_frames(
        media, every_n=10, max_frames=4
    ).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {1, 2, 3, 4, 5}
    for rows in by_id.values():
        assert 1 <= len(rows) <= 4
        assert all(r["frame_idx"] % 10 == 0 for r in rows)
        assert len({r["frame_digest"] for r in rows}) == len(rows)


def test_extract_audio_features_dim_and_dtype(media):
    out = multimodal.extract_audio_features(media, n_mels=16)
    assert dict(out.dtypes)["features"] == "array<float>"
    rows = out.collect()
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(-1.0 <= x <= 1.0 for r in rows for x in r["features"])


@pytest.mark.slow
def test_multimodal_feature_to_ann_chain(media):
    """Integration: binary payload → feature extraction → similarity
    search — the multimodal output plugs straight into the embedding
    operators (schema compatibility is the contract)."""
    from social_media_etl_spark.operators import similarity

    feats = multimodal.extract_audio_features(media, n_mels=16)
    out = similarity.cosine_topk(
        feats, feats, id_col="media_id", vec_col="features", k=2
    )
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(by_q) == {1, 2, 3, 4, 5}
    assert all(len(v) == 2 for v in by_q.values())


def test_ppm_roundtrip_and_comment_header():
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(7, 11, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(img)), img)
    # header comments (a real-world PPM feature) are skipped
    with_comment = b"P6\n# made by hand\n11 7\n255\n" + img.tobytes()
    assert np.array_equal(mm.decode_ppm(with_comment), img)


def test_bmp_roundtrip_with_row_padding():
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    rng = np.random.RandomState(6)
    # width 3 → row stride 9 pads to 12: exercises the padding path
    img = rng.randint(0, 256, size=(4, 3, 3), dtype=np.uint8)
    assert np.array_equal(mm.decode_bmp(mm.encode_bmp(img)), img)


def test_png_roundtrip_is_exact():
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(13, 9, 3), dtype=np.uint8)
    payload = mm.encode_png(img)
    assert payload.startswith(b"\x89PNG\r\n\x1a\n")  # real PNG magic
    assert np.array_equal(mm.decode_png(payload), img)
    # magic-byte dispatch routes PNG through decode_image_array
    assert np.array_equal(mm.decode_image_array(payload), img)


def _png_with_filters(img, filters):
    """Reference PNG writer applying the SPEC's filter recurrences
    (one chosen filter per scanline) — independently validates the
    decoder's unfiltering, not just a None-filter roundtrip."""
    import struct
    import zlib

    import numpy as np

    from social_media_etl_spark.sources.multimodal import _png_chunk

    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    for y, ftype in zip(range(h), filters):
        row = flat[y]
        up = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        out = np.zeros(stride, dtype=np.int64)
        for x in range(stride):
            a = row[x - ch] if x >= ch else 0
            b = up[x]
            c = up[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[x] = (row[x] - pred) % 256
        raw += bytes([ftype]) + bytes(out.astype(np.uint8))
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_decoder_handles_all_five_filters():
    """Foreign PNGs use Sub/Up/Average/Paeth — validate the decoder
    against an independent spec-faithful filterer, per filter type and
    with a mixed sequence."""
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for ftype in (0, 1, 2, 3, 4):
        payload = _png_with_filters(img, [ftype] * 6)
        assert np.array_equal(mm.decode_png(payload), img), f"filter {ftype}"
    mixed = _png_with_filters(img, [4, 3, 1, 2, 0, 4])
    assert np.array_equal(mm.decode_png(mixed), img)


def test_png_decoder_gray_and_alpha_profiles():
    """8-bit gray expands to 3 channels; RGBA drops alpha — the
    (H, W, 3) decode_image_array contract."""
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    rng = np.random.RandomState(9)
    gray = rng.randint(0, 256, size=(4, 7, 1), dtype=np.uint8)
    got = mm.decode_png(_png_with_filters(gray, [1, 4, 2, 3]))
    assert np.array_equal(got, np.repeat(gray, 3, axis=2))
    rgba = rng.randint(0, 256, size=(5, 3, 4), dtype=np.uint8)
    got = mm.decode_png(_png_with_filters(rgba, [0, 1, 2, 3, 4]))
    assert np.array_equal(got, rgba[:, :, :3])


def test_png_decoder_reads_foreign_encoder_output():
    """A real-world PNG produced by a real encoder (the canonical 1×1
    red-pixel data-URI payload) must decode to exactly its known
    pixel — external validation, not a self-roundtrip."""
    import base64

    from social_media_etl_spark.sources import multimodal as mm

    b64 = (
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
        "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    img = mm.decode_png(base64.b64decode(b64))
    assert img.shape == (1, 1, 3)
    assert img[0, 0].tolist() == [255, 0, 0]


def test_jpeg_roundtrip_within_dct_rounding():
    """Baseline JPEG with flat quantization tables: the only loss is
    DCT float rounding — every channel within ±2, including on pure
    noise (the worst case for DCT energy compaction)."""
    import numpy as np

    from social_media_etl_spark.sources import jpeg as J

    rng = np.random.RandomState(11)
    y, x = np.mgrid[0:24, 0:17]
    grad = np.stack(
        [(x * 10) % 256, (y * 7) % 256, (x * 3 + y * 5) % 256], axis=2
    ).astype(np.uint8)
    noise = rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8)
    for img in (grad, noise):
        payload = J.encode_jpeg_baseline(img)
        assert payload.startswith(b"\xff\xd8\xff")  # real JPEG magic
        dec = J.decode_jpeg(payload)
        assert dec.shape == img.shape
        assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_restart_markers_and_subsampling():
    """DRI/RSTn resynchronization (predictor resets, byte alignment)
    and 4:2:0 chroma subsampling both decode: restart roundtrip stays
    in the ±2 envelope; subsampled smooth chroma stays within the
    2×2-box-average loss bound."""
    import numpy as np

    from social_media_etl_spark.sources import jpeg as J

    y, x = np.mgrid[0:40, 0:33]
    img = np.stack(
        [x * 255 / 32, y * 255 / 39, (x + y) * 255 / 71], axis=2
    ).astype(np.uint8)
    dec = J.decode_jpeg(J.encode_jpeg_baseline(img, restart_interval=2))
    assert int(np.abs(dec.astype(int) - img.astype(int)).max()) <= 2
    dec420 = J.decode_jpeg(J.encode_jpeg_baseline(img, subsample=True))
    err = np.abs(dec420.astype(int) - img.astype(int))
    assert float(err.mean()) < 3.0 and int(err.max()) <= 8


def test_jpeg_rejects_arithmetic_and_lossless_frames():
    """SOF9 (arithmetic) must raise with a precise message, not
    mis-decode. (SOF2 progressive is SUPPORTED since r9.)"""
    import numpy as np

    from social_media_etl_spark.sources import jpeg as J

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    payload = bytearray(J.encode_jpeg_baseline(img))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic)
    with pytest.raises(ValueError, match="SOF9"):
        J.decode_jpeg(bytes(payload))


def test_jpeg_progressive_roundtrip_both_scan_scripts():
    """Progressive encode→decode (T.81 Annex G) stays inside the same
    flat-quant DCT-rounding bound as baseline, for BOTH scan scripts:
    successive approximation (DC Al=1 + AC Al=1 first scans, then
    refinement scans — exercising correction bits, ZRL-in-refine and
    EOB spans) and spectral selection only (AC bands 1-5 / 6-63)."""
    import numpy as np

    from social_media_etl_spark.sources import jpeg as J

    rng = np.random.default_rng(11)
    imgs = [
        (np.arange(16 * 24 * 3).reshape(16, 24, 3) % 256).astype(np.uint8),
        rng.integers(0, 256, (21, 13, 3), dtype=np.uint8),
        rng.integers(0, 256, (3, 5, 3), dtype=np.uint8),
    ]
    for img in imgs:
        for successive in (True, False):
            payload = J.encode_jpeg_progressive(img, successive=successive)
            assert b"\xff\xc2" in payload  # genuinely SOF2
            dec = J.decode_jpeg(payload)
            assert dec.shape == img.shape
            err = int(np.abs(dec.astype(int) - img.astype(int)).max())
            assert err <= 2, (img.shape, successive, err)


def test_jpeg_progressive_randomized_scan_scripts_bit_match_baseline():
    """The decoder must handle ANY legal progression, not just the two
    canned scripts: random contiguous AC band splits per component,
    random successive-approximation depth per band and for DC, and
    random legal interleavings of the scan chains — each decode must be
    BIT-IDENTICAL to the baseline decode of the same quantized data
    (the layering is lossless by construction; any drift is a
    correction-bit ordering bug)."""
    import random

    import numpy as np

    from social_media_etl_spark.sources import jpeg as J

    rng = np.random.default_rng(31)
    pyr = random.Random(31)
    img = rng.integers(0, 256, (19, 14, 3), dtype=np.uint8)
    base = J.decode_jpeg(J.encode_jpeg_baseline(img))
    for trial in range(6):
        # chains: each is an ordered list of scans that must stay in
        # order; different chains interleave arbitrarily
        dc_al = pyr.randint(0, 2)
        chains = [
            [([0, 1, 2], 0, 0, 0, dc_al)]
            + [([0, 1, 2], 0, 0, a + 1, a) for a in range(dc_al - 1, -1, -1)]
        ]
        ac_chains = []
        for ci in range(3):
            # split [1, 63] into 1-3 contiguous bands
            cuts = sorted(pyr.sample(range(2, 63), pyr.randint(0, 2)))
            bounds = [1] + cuts + [64]
            for lo, hi in zip(bounds, bounds[1:]):
                al = pyr.randint(0, 2)
                chain = [([ci], lo, hi - 1, 0, al)]
                chain += [
                    ([ci], lo, hi - 1, a + 1, a)
                    for a in range(al - 1, -1, -1)
                ]
                ac_chains.append(chain)
        # a component's AC scans must follow the DC first scan: emit
        # the DC chain's head first, then merge everything else
        pyr.shuffle(ac_chains)
        chains += ac_chains
        script = [chains[0][0]]
        cursors = [1] + [0] * (len(chains) - 1)
        remaining = sum(len(c) for c in chains) - 1
        while remaining:
            i = pyr.randrange(len(chains))
            if cursors[i] < len(chains[i]):
                script.append(chains[i][cursors[i]])
                cursors[i] += 1
                remaining -= 1
        payload = J.encode_jpeg_progressive(img, scans=script)
        dec = J.decode_jpeg(payload)
        assert np.array_equal(dec, base), f"trial={trial} script={script}"


def test_jpeg_progressive_decodes_foreign_eobn_runs():
    """Our encoder caps EOB runs at 1 (Annex-K tables carry no EOBn
    symbols), but FOREIGN progressive files use them freely — craft a
    minimal SOF2 stream with a custom AC table whose EOB2 symbol
    (0x10 + 1 appended bit) covers both blocks' AC bands, and check
    the decoder honors the run."""
    import struct

    import numpy as np

    from social_media_etl_spark.sources import jpeg as J

    # grayscale 8x16 → two 8x8 blocks; DC-only content 128 / 129
    dc_codes = J._build_codes(J.DC_LUM_BITS, J.DC_LUM_VALS)

    def dht(tc_th, bits, vals):
        body = bytes([tc_th]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body

    dqt = b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + bytes([1] * 64)
    sof = b"\xff\xc2" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 8, 16, 1
    ) + bytes([1, 0x11, 0])
    # DC scan: diffs 0 then 8 (block2 pixels end up +1)
    wdc = J._BitWriter()
    for diff in (0, 8):
        ssss, bits = J._magnitude(diff)
        code, length = dc_codes[ssss]
        wdc.write(code, length)
        wdc.write(bits, ssss)
    wdc.flush()
    sos_dc = b"\xff\xda" + struct.pack(">H", 8) + bytes(
        [1, 1, 0x00, 0, 0, 0]
    ) + bytes(wdc.out)
    # custom AC table: single 1-bit code for symbol 0x10 (EOB2..3)
    ac_bits = [1] + [0] * 15
    sos_ac_hdr = b"\xff\xda" + struct.pack(">H", 8) + bytes(
        [1, 1, 0x00, 1, 63, 0]
    )
    wac = J._BitWriter()
    wac.write(0, 1)  # the 0x10 symbol
    wac.write(0, 1)  # appended run bit → EOBRUN covers exactly 2 blocks
    wac.flush()
    payload = (
        b"\xff\xd8"
        + dqt
        + sof
        + dht(0x00, J.DC_LUM_BITS, J.DC_LUM_VALS)
        + dht(0x10, ac_bits, [0x10])
        + sos_dc
        + sos_ac_hdr
        + bytes(wac.out)
        + b"\xff\xd9"
    )
    dec = J.decode_jpeg(payload)
    assert dec.shape == (8, 16, 3)
    assert np.all(dec[:, :8] == 128)
    assert np.all(dec[:, 8:] == 129)


def test_jpeg_progressive_420_matches_baseline_decode_exactly():
    """With identical quantization and subsampling, the progressive
    entropy layering must be LOSSLESS relative to baseline: decoding
    the progressive file equals decoding the baseline file bit for
    bit — any drift means a scan mis-ordered its correction bits."""
    import numpy as np

    from social_media_etl_spark.sources import jpeg as J

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (18, 22, 3), dtype=np.uint8)
    base = J.decode_jpeg(J.encode_jpeg_baseline(img, subsample=True))
    for successive in (True, False):
        prog = J.decode_jpeg(
            J.encode_jpeg_progressive(img, subsample=True, successive=successive)
        )
        assert np.array_equal(base, prog), f"successive={successive}"


def test_jpeg_dispatches_through_decode_image_array(spark):
    """JPEG payloads flow through the generic media decode stage and
    the aHash near-dup pipeline like every other format."""
    import numpy as np

    from social_media_etl_spark.sources import jpeg as J
    from social_media_etl_spark.sources import multimodal as mm

    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([x * 15, y * 15, (x + y) * 7], axis=2).astype(np.uint8)
    payload = J.encode_jpeg_baseline(img)
    assert np.array_equal(
        mm.decode_image_array(payload).shape, (16, 16, 3)
    )
    # progressive SOF2 rides the SAME magic-byte dispatch (r9)
    prog = J.encode_jpeg_progressive(img)
    assert np.array_equal(mm.decode_image_array(prog).shape, (16, 16, 3))
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(prog))],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in mm.decode_images(df, backend="numpy").collect()
    }
    for mid in (1, 2):
        r = rows[mid]
        assert (r["width"], r["height"], r["channels"]) == (16, 16, 3)
    # baseline and progressive of the same source decode to (nearly)
    # the same pixels → the Arrow stage reports matching intensities
    assert abs(rows[1]["mean_intensity"] - rows[2]["mean_intensity"]) < 0.5
    # sniffed type is image/jpeg (JVM-side magic compare)
    typed = mm.attach_media_metadata(df).collect()[0]
    assert typed["media_type"] == "image/jpeg"


def test_wav_pcm16_roundtrip():
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    t = np.arange(1600) / 16000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    back, rate = mm.decode_wav_pcm16(mm.encode_wav_pcm16(x, 16000))
    assert rate == 16000
    assert np.abs(back - x).max() < 1e-3  # 16-bit quantization error


def test_decode_images_numpy_backend_real_dims(spark):
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    imgs = {
        1: np.full((8, 6, 3), 100, dtype=np.uint8),
        2: np.full((3, 5, 3), 200, dtype=np.uint8),
    }
    rows = [(1, mm.encode_ppm(imgs[1])), (2, mm.encode_bmp(imgs[2]))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {
        r["media_id"]: (r["width"], r["height"], r["channels"], r["mean_intensity"])
        for r in mm.decode_images(df, backend="numpy").collect()
    }
    assert out == {1: (6, 8, 3, 100.0), 2: (5, 3, 3, 200.0)}


def test_resize_images_numpy_backend_resamples_pixels(spark):
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    # left half black, right half white → resize preserves the split
    img = np.zeros((4, 8, 3), dtype=np.uint8)
    img[:, 4:] = 255
    df = spark.createDataFrame(
        [(1, mm.encode_ppm(img))], "media_id long, payload binary"
    )
    out = mm.resize_images(df, target=(4, 2), backend="numpy").collect()[0]
    assert (out["width"], out["height"]) == (4, 2)
    resized = mm.decode_ppm(bytes(out["payload"]))
    assert resized.shape == (2, 4, 3)
    assert (resized[:, :2] == 0).all() and (resized[:, 2:] == 255).all()


def test_extract_audio_features_numpy_backend(spark):
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    t = np.arange(3200) / 16000.0
    quiet = mm.encode_wav_pcm16(0.01 * np.sin(2 * np.pi * 100 * t))
    loud = mm.encode_wav_pcm16(0.9 * np.sin(2 * np.pi * 100 * t))
    df = spark.createDataFrame(
        [(1, quiet), (2, loud)], "media_id long, payload binary"
    )
    feats = {
        r["media_id"]: r["features"]
        for r in mm.extract_audio_features(df, n_mels=8, backend="numpy").collect()
    }
    assert len(feats[1]) == 8 and len(feats[2]) == 8
    # energy lands in the lowest band, and louder in > quieter
    assert feats[2][0] > feats[1][0] > feats[1][-1]
    # deterministic
    again = {
        r["media_id"]: r["features"]
        for r in mm.extract_audio_features(df, n_mels=8, backend="numpy").collect()
    }
    assert feats == again


def test_sniff_recognizes_numpy_decodable_formats(spark):
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    rows = [
        (1, mm.encode_ppm(img)),
        (2, mm.encode_bmp(img)),
        (3, mm.encode_wav_pcm16(np.zeros(16))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r["media_type"]
        for r in mm.attach_media_metadata(df).collect()
    }
    assert got == {
        1: "image/x-portable-pixmap",
        2: "image/bmp",
        3: "audio/wav",
    }


def test_write_json_array_hadoop_fs_scheme(spark, tmp_path):
    """Scheme'd paths (gs://, s3a://, file://) go through the Hadoop
    FileSystem API; file:// exercises that code path hermetically."""
    import json as _json

    from social_media_etl_spark.sources import rest_api

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    target = f"file://{tmp_path}/out/users.json"
    rest_api.write_json_array(df, target)
    with open(f"{tmp_path}/out/users.json", encoding="utf-8") as fh:
        got = sorted(_json.load(fh), key=lambda r: r["id"])
    assert got == [{"id": 1, "v": "a"}, {"id": 2, "v": "b"}]


def test_ppm_stream_roundtrip_and_numpy_frame_sampling(spark):
    """encode_ppm_stream → sample_video_frames(backend='numpy') really
    demuxes: frame indices follow every_n/max_frames, and each sampled
    frame's digest/mean match a direct decode of that frame."""
    import hashlib

    import numpy as np

    frames = [
        np.full((2, 3, 3), fill_value=(10 * i) % 256, dtype=np.uint8)
        for i in range(7)
    ]
    stream = multimodal.encode_ppm_stream(frames)
    back = multimodal.decode_ppm_stream(stream)
    assert len(back) == 7 and all(
        np.array_equal(a, b) for a, b in zip(frames, back)
    )

    df = spark.createDataFrame([(1, bytearray(stream))], "media_id long, payload binary")
    out = multimodal.sample_video_frames(
        df, every_n=3, max_frames=2, backend="numpy"
    ).collect()
    assert [(r["frame_idx"]) for r in out] == [0, 3]
    for r in out:
        fr = frames[r["frame_idx"]]
        assert r["frame_digest"] == hashlib.sha256(
            multimodal.encode_ppm(fr)
        ).hexdigest()
        assert r["mean_intensity"] == round(float(fr.mean()), 2)


def test_read_binary_files_ingests_media_dir(spark, tmp_path):
    """binaryFile ingestion: one row per file with deterministic
    media_id, byte-exact payload, sniffed type + digest; pathGlobFilter
    prunes at listing; recursiveFileLookup picks up nested dirs."""
    import hashlib

    import numpy as np

    d = tmp_path / "media"
    (d / "nested").mkdir(parents=True)
    img = multimodal.encode_ppm(np.full((2, 2, 3), 7, dtype=np.uint8))
    wav = multimodal.encode_wav_pcm16(np.zeros(16, dtype=np.int16))
    (d / "a.ppm").write_bytes(img)
    (d / "nested" / "b.wav").write_bytes(wav)
    # a glob-MATCHING nested file, so the flat read's count genuinely
    # pins non-recursion (not just the glob filter — review r6)
    (d / "nested" / "c.ppm").write_bytes(img)
    (d / "ignore.txt").write_bytes(b"not media")

    flat = multimodal.read_binary_files(spark, str(d), glob="*.ppm")
    rows = flat.collect()
    assert len(rows) == 1  # glob pruned .txt AND nested/c.ppm not listed
    r = rows[0]
    assert bytes(r["payload"]) == img
    assert r["media_type"] == "image/x-portable-pixmap"
    assert r["digest"] == hashlib.sha256(img).hexdigest()
    assert r["n_bytes"] == len(img)

    deep = multimodal.read_binary_files(
        spark, str(d), glob="*.{ppm,wav}", recursive=True
    )
    got = {r["media_type"]: bytes(r["payload"]) for r in deep.collect()}
    assert got == {"image/x-portable-pixmap": img, "audio/wav": wav}
    # media_id is a pure function of path — stable across reruns
    a = {r["path"]: r["media_id"] for r in deep.collect()}
    b = {
        r["path"]: r["media_id"]
        for r in multimodal.read_binary_files(
            spark, str(d), glob="*.{ppm,wav}", recursive=True
        ).collect()
    }
    assert a == b


def test_text_format_roundtrips_raw_lines(spark, tmp_path):
    """`text` in the IO facade: one value row per line, byte-faithful
    for a raw corpus; the writer refuses multi-column frames eagerly."""
    import pytest

    from social_media_etl_spark.sources import formats

    lines = ["alpha beta", "", "  indented line", "Ünïcode ok"]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    p = str(tmp_path / "corpus_txt")
    formats.write_table(df, p, fmt="text")
    back = formats.read_table(spark, p, fmt="text")
    assert back.columns == ["value"]
    assert sorted(r["value"] for r in back.collect()) == sorted(lines)
    with pytest.raises(ValueError, match="one string column"):
        formats.write_table(
            spark.createDataFrame([(1, "a")], "k long, v string"), p, fmt="text"
        )
    with pytest.raises(ValueError, match="fixed"):
        formats.read_table(spark, p, fmt="text", schema="value string")


def test_merge_schema_reads_evolved_table(spark, tmp_path):
    """merge_schema unions part-file schemas: rows written before a
    column existed surface it as null, new rows carry it — the read
    mode for a table whose schema grew over time."""
    import pytest

    from social_media_etl_spark.sources import formats

    p = str(tmp_path / "evolving")
    old = spark.createDataFrame([(1, "a")], "id long, name string")
    formats.write_table(old, p, fmt="parquet", mode="overwrite")
    new = spark.createDataFrame(
        [(2, "b", 9.5)], "id long, name string, score double"
    )
    formats.write_table(new, p, fmt="parquet", mode="append")
    back = formats.read_table(spark, p, fmt="parquet", merge_schema=True)
    assert set(back.columns) == {"id", "name", "score"}
    got = {r["id"]: r["score"] for r in back.collect()}
    assert got == {1: None, 2: 9.5}
    with pytest.raises(ValueError, match="parquet/orc"):
        formats.read_table(spark, p, fmt="csv", merge_schema=True)
    # Spark would silently ignore mergeSchema under a user schema —
    # the facade rejects the contradiction instead
    with pytest.raises(ValueError, match="not both"):
        formats.read_table(
            spark, p, fmt="parquet", schema="id long", merge_schema=True
        )


def test_ahash_images_known_pattern_and_duplicates(spark):
    """aHash ground truth on a hand-built 8x8 image: left half dark,
    right half bright → bits set exactly where x >= 4 (row-major,
    bit 0 = top-left); identical payloads hash identically and
    distinct noise patterns do not."""
    import numpy as np

    from social_media_etl_spark.sources.multimodal import (
        ahash_images,
        encode_ppm,
    )

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, 4:, :] = 255
    half = encode_ppm(img)
    rng = np.random.RandomState(3)
    noise = encode_ppm(rng.randint(0, 256, (8, 8, 3)).astype(np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(half)), (2, bytearray(half)), (3, bytearray(noise))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["sh"] for r in ahash_images(df).collect()}
    want = 0
    for y in range(8):
        for x in range(4, 8):
            want |= 1 << (y * 8 + x)
    want = want - (1 << 64) if want >= (1 << 63) else want
    assert got[1] == want
    assert got[1] == got[2]      # identical payload → identical hash
    assert got[3] != got[1]      # different content → different hash


def test_ahash_images_rejects_oversize_grid(spark):
    from social_media_etl_spark.sources.multimodal import ahash_images

    df = spark.createDataFrame([(1, bytearray(b"x"))], "media_id long, payload binary")
    import pytest

    with pytest.raises(ValueError, match="grid"):
        ahash_images(df, grid=9)


def test_audio_fingerprint_tones_set_expected_bands(spark):
    """Spectral-bitmap ground truth: a pure tone at bin 128 of a
    512-sample clip lights exactly the band containing that bin (bands
    = 257 rfft bins split into 64 chunks); identical clips share the
    fingerprint, different tone sets do not."""
    import numpy as np

    from social_media_etl_spark.sources.multimodal import (
        audio_fingerprint,
        encode_wav_pcm16,
    )

    t = np.arange(512, dtype=np.float64)
    tone128 = encode_wav_pcm16(0.5 * np.sin(2 * np.pi * 128 * t / 512.0))
    tone40 = encode_wav_pcm16(0.5 * np.sin(2 * np.pi * 40 * t / 512.0))
    df = spark.createDataFrame(
        [(1, bytearray(tone128)), (2, bytearray(tone128)), (3, bytearray(tone40))],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["sh"] for r in audio_fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    # bin 128 falls in band 128 // ceil(257/64) ≈ band 31 (np.array_split
    # gives the first 257%64=1 band 5 bins, the rest 4): bins 0-4 band 0,
    # then 4 per band → bin 128 ∈ band 1 + (128-5)//4 = band 31
    assert got[1] & (1 << 31)


def test_gif_roundtrip_is_exact_with_lzw():
    """Single-frame GIF89a with real LZW: palette images roundtrip
    bit-exactly, including the 12-bit dictionary-clear path on images
    large enough to exhaust the 4096-code table."""
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    rng = np.random.RandomState(7)
    img = np.repeat(
        rng.randint(0, 6, size=(23, 17, 1)).astype(np.uint8) * 40, 3, axis=2
    )
    payload = mm.encode_gif(img)
    assert payload.startswith(b"GIF89a")  # real GIF magic
    assert np.array_equal(mm.decode_gif(payload), img)
    # magic-byte dispatch routes GIF through decode_image_array
    assert np.array_equal(mm.decode_image_array(payload), img)
    # a 200x300 random-palette frame exhausts the LZW dictionary and
    # exercises the clear-and-restart branch on both sides
    big = np.repeat(
        rng.randint(0, 250, size=(200, 300, 1)).astype(np.uint8), 3, axis=2
    )
    assert np.array_equal(mm.decode_gif(mm.encode_gif(big)), big)
    # GIF's hard 256-color limit is a loud error, not silent quantization
    noisy = rng.randint(0, 256, size=(40, 40, 3)).astype(np.uint8)
    try:
        mm.encode_gif(noisy)
        raise AssertionError("expected ValueError on >256 colors")
    except ValueError:
        pass


def test_gif_decoder_reads_foreign_encoder_output():
    """The canonical 1×1 transparent-spacer GIF (a real-world foreign
    payload with a graphic-control extension block) must decode to its
    known black pixel — external validation, not a self-roundtrip."""
    import base64

    from social_media_etl_spark.sources import multimodal as mm

    b64 = "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    img = mm.decode_gif(base64.b64decode(b64))
    assert img.shape == (1, 1, 3)
    assert img[0, 0].tolist() == [0, 0, 0]


def test_gif_decoder_deinterlaces_four_pass_frames():
    """Interlaced GIFs store rows in 8/8/4/2-stride pass order; the
    decoder must unshuffle them. Constructed by encoding the pass-
    ordered rows and setting the interlace flag in the descriptor."""
    import numpy as np

    from social_media_etl_spark.sources import multimodal as mm

    rng = np.random.RandomState(13)
    h, w = 19, 11
    img = np.repeat(
        rng.randint(0, 8, size=(h, w, 1)).astype(np.uint8) * 30, 3, axis=2
    )
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    payload = bytearray(mm.encode_gif(img[order]))
    # image descriptor: header(6) + LSD(7) + GCT(3*2^bits) + 0x2c + 8
    gct_size = 2 << (payload[10] & 0x07)
    iflags_at = 13 + 3 * gct_size + 9
    assert payload[iflags_at - 9] == 0x2C
    payload[iflags_at] |= 0x40
    assert np.array_equal(mm.decode_gif(bytes(payload)), img)


def test_gif_animated_roundtrip_and_frame_sampling(spark):
    """encode_gif_animated → decode_gif_frames roundtrips bit-exactly
    (per-frame local palettes, NETSCAPE loop block), and
    sample_video_frames(backend='numpy') demuxes the COMPRESSED
    container by magic-byte dispatch with the same every_n/max_frames
    semantics and canonical-PPM digests as the raw stream path."""
    import hashlib

    import numpy as np

    rng = np.random.RandomState(5)
    frames = [
        np.repeat(
            rng.randint(0, 7, size=(6, 5, 1)).astype(np.uint8) * (15 + 9 * i),
            3,
            axis=2,
        )
        for i in range(7)
    ]
    payload = multimodal.encode_gif_animated(frames, delay_cs=6)
    assert payload.startswith(b"GIF89a")
    back = multimodal.decode_gif_frames(payload)
    assert len(back) == 7 and all(
        np.array_equal(a, b) for a, b in zip(frames, back)
    )
    assert len(payload) < sum(f.nbytes for f in frames)  # really compressed

    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    out = multimodal.sample_video_frames(
        df, every_n=3, max_frames=2, backend="numpy"
    ).collect()
    assert [r["frame_idx"] for r in out] == [0, 3]
    for r in out:
        fr = frames[r["frame_idx"]]
        assert r["frame_digest"] == hashlib.sha256(
            multimodal.encode_ppm(fr)
        ).hexdigest()
        assert r["mean_intensity"] == round(float(fr.mean()), 2)


def test_gif_animation_compositing_semantics():
    """Partial-rect frames composite onto the running canvas and
    graphic-control transparency leaves prior pixels through — the
    real-world animated-GIF delta encoding."""
    import struct

    import numpy as np

    f1 = np.full((8, 8, 3), 200, dtype=np.uint8)
    base = multimodal.encode_gif_animated([f1])
    # hand-append a 4x4 frame at offset (2,2): solid 50 with palette
    # index 1 marked transparent via the graphic-control extension
    patch = np.full((4, 4, 3), 50, dtype=np.uint8)
    patch[0, 0] = [99, 99, 99]  # second palette entry -> index sorts after 50
    bits, table, min_code, blocks = multimodal._gif_frame_payload(patch)
    gce = b"\x21\xf9\x04\x01\x00\x00\x01\x00"  # transparency on, idx 1
    desc = b"\x2c" + struct.pack("<HHHHB", 2, 2, 4, 4, 0x80 | ((bits - 1) & 7))
    payload = base[:-1] + gce + desc + table + bytes([min_code]) + blocks + b"\x3b"
    out = multimodal.decode_gif_frames(payload)
    assert len(out) == 2
    assert np.array_equal(out[0], f1)
    assert (out[1][3:6, 3:6] == 50).all()  # painted rect
    assert (out[1][2, 2] == 200).all()  # transparent pixel kept canvas
    assert (out[1][0, 0] == 200).all()  # outside rect untouched


def test_adpcm_roundtrip_snr_and_block_structure():
    """IMA-ADPCM WAV: ~4:1 compressed payload decodes back within the
    4-bit quantizer's SNR envelope; the fact chunk trims trailing
    block padding to the true sample count; the decoder is validated
    DIFFERENTIALLY against an independent per-sample reference
    implementation of the published IMA quantizer recurrence."""
    import struct

    import numpy as np

    t = np.arange(2048, dtype=np.float64)
    x = (
        0.3 * np.sin(2 * np.pi * 23 * t / 512)
        + 0.2 * np.sin(2 * np.pi * 91 * t / 512)
        + 0.1 * np.sin(2 * np.pi * 170 * t / 512)
    )
    payload = multimodal.encode_wav_adpcm(x, rate=16_000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert len(payload) < 2 * len(x) / 2.5  # really ~4:1 vs PCM16
    y, rate = multimodal.decode_wav(payload)
    assert rate == 16_000 and len(y) == len(x)  # fact-chunk trim
    snr = 10 * np.log10((x**2).mean() / ((y - x) ** 2).mean())
    assert snr > 15.0, snr
    # deterministic: same input -> same bytes (pair-identity at scale)
    assert multimodal.encode_wav_adpcm(x, rate=16_000) == payload

    # independent reference decode of the data chunk
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        ln = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            fmt = payload[pos + 8 : pos + 8 + ln]
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
    block_align = struct.unpack_from("<H", fmt, 12)[0]
    steps = multimodal._IMA_STEP_TAB
    idx_tab = multimodal._IMA_INDEX_TAB
    ref = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        pred, index = struct.unpack_from("<hB", block, 0)
        ref.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):
                step = steps[index]
                dq = (step >> 3) + (step if nib & 4 else 0)
                dq += (step >> 1) if nib & 2 else 0
                dq += (step >> 2) if nib & 1 else 0
                pred = pred - dq if nib & 8 else pred + dq
                pred = min(32767, max(-32768, pred))
                index = min(88, max(0, index + idx_tab[nib & 7]))
                ref.append(pred)
    assert np.array_equal(
        np.round(y * 32767).astype(int), np.array(ref[: len(y)])
    )


def test_adpcm_batch_twins_match_scalar_bytes_and_samples():
    """The vectorized batch codec is a pure speed path: batch encode
    emits byte-identical payloads to per-signal encode, and batch
    decode returns sample-identical results for a MIXED batch (ADPCM
    fast path + PCM16 fallback in one call), preserving input order."""
    import numpy as np

    t = np.arange(700, dtype=np.float64)
    sigs = np.stack(
        [
            0.4 * np.sin(2 * np.pi * 19 * t / 512),
            0.2 * np.sin(2 * np.pi * 67 * t / 512) + 0.1 * np.cos(t / 5),
            np.clip(np.sin(t / 3.0) * 1.5, -1, 1),  # clipped square-ish
        ]
    )
    batch = multimodal.encode_wav_adpcm_batch(sigs, rate=8_000)
    assert [multimodal.encode_wav_adpcm(s, rate=8_000) for s in sigs] == batch

    import io
    import wave

    stereo_pcm = (
        np.clip(np.stack([sigs[0], -sigs[0]], axis=1).ravel(), -1, 1) * 32767
    ).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(22_050)
        wf.writeframes(stereo_pcm.tobytes())
    mixed = [
        batch[1],
        multimodal.encode_wav_pcm16(sigs[0]),
        batch[2],
        buf.getvalue(),  # stereo PCM16: fast path averages to mono
        batch[0],
    ]
    outs = multimodal.decode_wav_batch(mixed)
    assert len(outs) == 5
    for payload, (x_b, rate_b) in zip(mixed, outs):
        x_s, rate_s = multimodal.decode_wav(payload)
        assert rate_b == rate_s
        assert np.array_equal(x_b, x_s)
    # malformed payloads surface the scalar path's error, not a numpy one
    with pytest.raises(ValueError):
        multimodal.decode_wav_batch([b"RIFF\x00\x00\x00\x00WAVEjunk"])


def test_decode_wav_dispatches_pcm_and_rejects_unknown(spark):
    """decode_wav is the single audio entry point: PCM16 payloads
    route through the stdlib path unchanged, unknown format tags
    raise, and the Spark audio stages consume ADPCM payloads through
    the same mapInPandas plumbing as PCM."""
    import numpy as np

    x = 0.5 * np.sin(np.arange(600, dtype=np.float64) / 9.0)
    pcm = multimodal.encode_wav_pcm16(x, rate=8_000)
    y, rate = multimodal.decode_wav(pcm)
    assert rate == 8_000
    assert np.allclose(y, x, atol=2 / 32767)
    try:
        multimodal.decode_wav(b"RIFF\x00\x00\x00\x00WAVEjunk")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    # the fingerprint stage consumes compressed audio: identical clips
    # -> identical signatures; a different clip -> a different one
    rows = [
        (1, bytearray(multimodal.encode_wav_adpcm(x))),
        (2, bytearray(multimodal.encode_wav_adpcm(x))),
        (3, bytearray(multimodal.encode_wav_adpcm(np.cos(np.arange(600) / 3.0)))),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    sig = {
        r["media_id"]: r["sh"]
        for r in multimodal.audio_fingerprint(df, id_col="media_id").collect()
    }
    assert sig[1] == sig[2] != sig[3]


def test_jpeg_decoder_skips_fill_bytes():
    """T.81 B.1.1.2 allows runs of 0xFF fill bytes before any marker;
    a foreign baseline file padded that way must decode identically to
    the unpadded stream instead of misreading marker=0xFF (ADVICE r7)."""
    import numpy as np

    from social_media_etl_spark.sources import jpeg

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    payload = jpeg.encode_jpeg_baseline(img)
    # pad fill bytes before the first DQT and before the SOS marker
    padded = payload.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    padded = padded.replace(b"\xff\xda", b"\xff\xff\xff\xff\xda", 1)
    assert len(padded) == len(payload) + 5
    assert np.array_equal(jpeg.decode_jpeg(padded), jpeg.decode_jpeg(payload))


def test_jpeg_encoder_rejects_out_of_range_dqt():
    """Baseline DQT entries are 8-bit; a table value outside [1, 255]
    used to wrap silently in the header (& 0xFF) while quantization
    divided by the full value — now it raises (ADVICE r7)."""
    import numpy as np

    from social_media_etl_spark.sources import jpeg

    img = np.full((8, 8, 3), 128, dtype=np.uint8)
    with pytest.raises(ValueError, match="quant_luma"):
        jpeg.encode_jpeg_baseline(img, quant_luma=np.full((8, 8), 256))
    with pytest.raises(ValueError, match="quant_luma"):
        jpeg.encode_jpeg_baseline(img, quant_luma=np.zeros((8, 8)))
    with pytest.raises(ValueError, match="quant_chroma"):
        jpeg.encode_jpeg_baseline(
            img,
            quant_luma=np.ones((8, 8)),
            quant_chroma=np.full((8, 8), 999),
        )


def test_gif_disposal_2_restores_background_color():
    """Disposal 2 must restore the frame rect to the LSD background
    color resolved through the GLOBAL color table — not to black
    (ADVICE r7). Hand-built: GCT [200-gray, (10,20,30)], bg index 1,
    frame 1 full-rect disposal-2, frame 2 a small patch."""
    import struct

    import numpy as np

    f1 = np.full((8, 8, 3), 200, dtype=np.uint8)
    bits, _table, min_code, blocks = multimodal._gif_frame_payload(f1)
    gct = bytes([200, 200, 200, 10, 20, 30])
    header = b"GIF89a" + struct.pack("<HHBBB", 8, 8, 0x80, 1, 0) + gct
    gce_d2 = b"\x21\xf9\x04\x08\x00\x00\x00\x00"  # disposal=2
    desc1 = b"\x2c" + struct.pack("<HHHHB", 0, 0, 8, 8, 0)  # uses GCT
    patch = np.full((2, 2, 3), 99, dtype=np.uint8)
    b2, t2, mc2, bl2 = multimodal._gif_frame_payload(patch)
    desc2 = b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0x80 | ((b2 - 1) & 7))
    payload = (
        header
        + gce_d2 + desc1 + bytes([min_code]) + blocks
        + desc2 + t2 + bytes([mc2]) + bl2
        + b"\x3b"
    )
    out = multimodal.decode_gif_frames(payload)
    assert len(out) == 2
    assert (out[0] == 200).all()
    assert (out[1][0:2, 0:2] == 99).all()  # frame 2's own patch
    assert (out[1][5, 5] == (10, 20, 30)).all()  # bg color, not black


def test_gif_disposal_3_restores_previous_canvas():
    """Disposal 3 (restore-to-previous) must put back the pre-frame
    canvas pixels, not blank the rect (ADVICE r7)."""
    import struct

    import numpy as np

    f1 = np.full((8, 8, 3), 200, dtype=np.uint8)
    base = multimodal.encode_gif_animated([f1])
    patch = np.full((2, 2, 3), 50, dtype=np.uint8)
    b2, t2, mc2, bl2 = multimodal._gif_frame_payload(patch)
    gce_d3 = b"\x21\xf9\x04\x0c\x00\x00\x00\x00"  # disposal=3
    desc2 = b"\x2c" + struct.pack("<HHHHB", 2, 2, 2, 2, 0x80 | ((b2 - 1) & 7))
    patch3 = np.full((2, 2, 3), 70, dtype=np.uint8)
    b3, t3, mc3, bl3 = multimodal._gif_frame_payload(patch3)
    desc3 = b"\x2c" + struct.pack("<HHHHB", 5, 5, 2, 2, 0x80 | ((b3 - 1) & 7))
    payload = (
        base[:-1]
        + gce_d3 + desc2 + t2 + bytes([mc2]) + bl2
        + desc3 + t3 + bytes([mc3]) + bl3
        + b"\x3b"
    )
    out = multimodal.decode_gif_frames(payload)
    assert len(out) == 3
    assert (out[1][2:4, 2:4] == 50).all()  # frame 2 painted its rect
    assert (out[2][2:4, 2:4] == 200).all()  # restored to previous
    assert (out[2][5:7, 5:7] == 70).all()  # frame 3's own patch


def test_fetch_json_records_rejects_non_object_payloads(tmp_path):
    """r8 review: a scalar/array-of-scalars body used to pass the dead
    isinstance check and crash later in an executor — now it raises at
    fetch time with the real cause."""
    p = tmp_path / "scalar.json"
    p.write_text("42")
    with pytest.raises(ValueError, match="objects"):
        rest_api.fetch_json_records(str(p))
    p2 = tmp_path / "mixed.json"
    p2.write_text('[{"a": 1}, 7]')
    with pytest.raises(ValueError, match="objects"):
        rest_api.fetch_json_records(str(p2))
    # RFC 8089 localhost form reads fine
    p3 = tmp_path / "ok.json"
    p3.write_text('[{"a": 1}]')
    assert rest_api.fetch_json_records(f"file://localhost{p3}") == [{"a": 1}]
    assert rest_api.fetch_json_records(f"file://{p3}") == [{"a": 1}]


# -- r8 multimodal review fixes ------------------------------------------------


def test_backend_typos_raise_instead_of_silent_fake(spark, media):
    """r8 review: an unknown backend string silently selected the fake
    branch (or the real decode on the hash stages) — now it raises."""
    with pytest.raises(Exception, match="unknown backend"):
        multimodal.decode_images(media, backend="Numpy").collect()
    with pytest.raises(Exception, match="unknown backend"):
        multimodal.ahash_images(media, backend="fake").collect()


def test_audio_features_survive_empty_wav(spark):
    """An empty data chunk must yield all-zero bands, not an rfft
    crash that kills the whole Arrow batch (r8 review)."""
    import numpy as np

    empty = multimodal.encode_wav_pcm16(np.zeros(0), rate=8_000)
    df = spark.createDataFrame(
        [(1, bytearray(empty))], "media_id long, payload binary"
    )
    rows = multimodal.extract_audio_features(df, backend="numpy").collect()
    assert len(rows) == 1


def test_encode_bmp_rejects_non_rgb(spark):
    import numpy as np

    with pytest.raises(ValueError, match="encode_bmp"):
        multimodal.encode_bmp(np.zeros((4, 4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="encode_bmp"):
        multimodal.encode_bmp(np.zeros((4, 4), dtype=np.uint8))


def test_adpcm_rejects_corrupt_block_align(spark):
    import struct

    import numpy as np

    good = multimodal.encode_wav_adpcm(np.zeros(512))
    # fmt chunk: block_align lives 12 bytes into the fmt payload
    pos = good.index(b"fmt ") + 8 + 12
    bad = good[:pos] + struct.pack("<H", 0) + good[pos + 2 :]
    with pytest.raises(ValueError, match="block_align"):
        multimodal.decode_wav(bad)


def test_gif_foreign_oversized_frame_is_clipped(spark):
    """A frame rect exceeding the logical screen crops (as spec
    renderers do) instead of crashing in a broadcast error."""
    import struct

    import numpy as np

    patch = np.full((4, 4, 3), 50, dtype=np.uint8)
    bits, t, mc, bl = multimodal._gif_frame_payload(patch)
    # logical screen 2x2, frame descriptor 4x4
    payload = (
        b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0)
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0x80 | ((bits - 1) & 7))
        + t + bytes([mc]) + bl + b"\x3b"
    )
    out = multimodal.decode_gif_frames(payload)
    assert out[0].shape == (2, 2, 3)
    assert (out[0] == 50).all()
