"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata, with Arrow-batched decode/transform stages.

Design for 100 TB of media: the payload is an opaque ``binary`` column
(or a reference to object storage) carried alongside typed metadata;
everything metadata-only (sniffing, digests, sizes, filtering,
partitioning) stays JVM-side and codegen'd, and only the stages that
must touch pixels/samples cross into Python — as ``mapInPandas``
iterator UDFs, so one Arrow batch of payloads is decoded per call and
memory stays bounded by the batch size, never the partition.

Three backends per kernel:

- ``backend='numpy'`` — a REAL decode path with no codec libraries:
  pure-numpy/stdlib codecs for PPM (P6), BMP (24-bit BI_RGB), PNG
  (stdlib zlib inflate + all five scanline filters), baseline JPEG
  (Annex-K Huffman + vectorized IDCT, 4:4:4/4:2:2/4:2:0, restart
  markers — ``sources/jpeg.py``), GIF (variable-width LZW, local/
  global palettes, interlace, animated multi-frame compositing — the
  compressed VIDEO container for frame sampling), and WAV — PCM16
  (stdlib ``wave``) plus compressed IMA ADPCM (format tag 0x11, 4-bit
  differential quantization). Four genuinely COMPRESSED formats — one
  per modality family (PNG/JPEG images, GIF video, ADPCM audio) —
  decode with zero codec libraries; decode → resize → feature
  pipelines run end-to-end on genuine pixel/sample data.
- ``backend='fake'`` — deterministic pseudo-outputs derived from the
  payload digest (stable across runs/engines); for synthetic corpora
  whose payloads aren't real media.
- ``backend='real'`` — the PIL/opencv/ffmpeg call site for what
  remains: CODEC-compressed video tracks (H.264/VP9 inside MP4/WebM);
  raises ``NotImplementedError`` in this container. The MP4 CONTAINER
  itself demuxes for real (``sources/mp4.py``: ISO-BMFF box walk +
  sample tables; uncompressed ``raw `` RGB24 tracks decode end to
  end), so the boundary is codec entropy, not the format.

The Spark-side plumbing — schemas, UDF signatures, batch iteration,
row multiplicity — is identical across backends and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "sniff_media_type",
    "read_binary_files",
    "attach_media_metadata",
    "encode_ppm",
    "decode_ppm",
    "encode_bmp",
    "decode_bmp",
    "encode_png",
    "decode_png",
    "encode_gif",
    "decode_gif",
    "encode_gif_animated",
    "decode_gif_frames",
    "encode_ppm_stream",
    "decode_ppm_stream",
    "encode_wav_pcm16",
    "decode_wav_pcm16",
    "encode_wav_adpcm",
    "encode_wav_adpcm_batch",
    "decode_wav",
    "decode_wav_batch",
    "decode_image_array",
    "decode_images",
    "resize_images",
    "sample_video_frames",
    "extract_audio_features",
    "ahash_images",
    "audio_fingerprint",
]

# canonical typed-metadata layout for a media table
MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, n_bytes long, digest string"
)

_MAGIC = {
    "89504e47": "image/png",
    "ffd8ff": "image/jpeg",
    "47494638": "image/gif",
    "52494646": "audio/wav",  # RIFF container (also avi; wav for our corpus)
    "494433": "audio/mp3",
    "1a45dfa3": "video/webm",
    "66747970": "video/mp4",  # ftyp at offset 4; see sniff below
}


def sniff_media_type(payload: Column | str) -> Column:
    """Magic-byte content sniffing — pure JVM expression (hex prefix
    compare), no Python. Unknown → 'application/octet-stream'."""
    p = F.col(payload) if isinstance(payload, str) else payload
    head = F.lower(F.hex(F.substring(p, 1, 4)))
    head3 = F.substring(head, 1, 6)
    head2 = F.substring(head, 1, 4)
    # mp4: 'ftyp' sits at byte offset 5
    mp4 = F.lower(F.hex(F.substring(p, 5, 4)))
    expr = F.lit("application/octet-stream")
    expr = F.when(mp4 == "66747970", F.lit("video/mp4")).otherwise(expr)
    # 2-byte magics decodable by the numpy backend
    expr = F.when(head2 == "5036", F.lit("image/x-portable-pixmap")).otherwise(expr)
    expr = F.when(head2 == "424d", F.lit("image/bmp")).otherwise(expr)
    for magic, mtype in _MAGIC.items():
        if magic == "66747970":
            continue
        cond = (head == magic) if len(magic) == 8 else (head3 == magic)
        expr = F.when(cond, F.lit(mtype)).otherwise(expr)
    return expr


def read_binary_files(
    spark,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
    with_metadata: bool = True,
) -> DataFrame:
    """Ingest raw media FILES as an opaque-binary table via Spark's
    ``binaryFile`` source — the entry point that turns a bucket of
    image/audio files into the MEDIA_SCHEMA shape (one row per file:
    deterministic ``media_id`` = xxhash64(path), ``payload`` bytes,
    source ``path``, plus the sniffed/digested metadata columns when
    ``with_metadata``).

    Scale: the source lists and splits files into tasks by
    ``spark.sql.files.maxPartitionBytes`` / ``openCostInBytes`` like
    any file scan (many small media files batch into one task instead
    of one task each), and ``pathGlobFilter`` prunes at LISTING time —
    non-matching files are never opened. Single files above
    ``spark.sql.sources.binaryFile.maxLength`` (2 GiB default) error
    out rather than truncate; shard bigger media upstream. The payload
    stays JVM-side here — only an explicit decode stage
    (:func:`decode_images` etc.) ships bytes to Python, Arrow-batched.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(path).select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("content").alias("payload"),
        F.col("path"),
        F.col("modificationTime").alias("modified_at"),
    )
    return attach_media_metadata(df) if with_metadata else df


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Typed metadata columns from the opaque payload: size, sha-256
    digest, sniffed type. All codegen'd; the payload itself is never
    shipped to Python."""
    return df.withColumns(
        {
            "media_type": sniff_media_type(payload_col),
            "n_bytes": F.octet_length(payload_col),
            "digest": F.sha2(F.col(payload_col), 256),
        }
    )


def _fake_u32(payload: bytes, salt: str) -> int:
    """Deterministic pseudo-value from payload bytes (stable fake)."""
    h = hashlib.sha256(salt.encode() + payload).digest()
    return int.from_bytes(h[:4], "big")


# ---------------------------------------------------------------------------
# Pure-numpy / stdlib codecs (the backend='numpy' real decode path)
# ---------------------------------------------------------------------------


def encode_ppm(arr) -> bytes:
    """uint8 (H, W, 3) array → binary PPM (P6)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_ppm expects (H, W, 3) uint8")
    h, w = a.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + a.tobytes()


def _parse_ppm_at(payload: bytes, pos: int):
    """Parse one P6 frame starting at ``pos`` → (array, next_pos)."""
    import numpy as np

    if payload[pos : pos + 2] != b"P6":
        raise ValueError(f"not a P6 PPM frame at offset {pos}")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens (comments stripped), then exactly one whitespace byte
    pos, tokens = pos + 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(payload[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3).copy(), pos + w * h * 3


def decode_ppm(payload: bytes):
    """Binary PPM (P6) → uint8 (H, W, 3) numpy array."""
    arr, _ = _parse_ppm_at(payload, 0)
    return arr


def encode_ppm_stream(frames) -> bytes:
    """Frame arrays → concatenated-P6 stream — the uncompressed video
    container ``ffmpeg -f image2pipe -c:v ppm`` actually produces, so
    the numpy backend exercises a real (if humble) video format."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_stream(payload: bytes):
    """Concatenated-P6 stream → list of uint8 (H, W, 3) frames."""
    frames, pos = [], 0
    while pos < len(payload):
        arr, pos = _parse_ppm_at(payload, pos)
        frames.append(arr)
    return frames


def encode_bmp(arr) -> bytes:
    """uint8 (H, W, 3) array → 24-bit uncompressed BI_RGB BMP."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w = a.shape[:2]
    row_size = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up, BGR
        row = a[y, :, ::-1].tobytes()
        rows.append(row + b"\x00" * (row_size - len(row)))
    return header + b"".join(rows)


def decode_bmp(payload: bytes):
    """24-bit uncompressed BI_RGB BMP → uint8 (H, W, 3) numpy array."""
    import struct

    import numpy as np

    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BI_RGB BMP supported")
    flipped = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_offset
    ).reshape(h, row_size)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if flipped:
        img = img[::-1]
    return img.copy()


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib as _zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", _zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr) -> bytes:
    """uint8 (H, W, 3) array → real PNG bytes, stdlib zlib only
    (filter 0 scanlines, 8-bit truecolor, no interlace). This is a
    COMPRESSED format produced with zero codec libraries — any PNG
    reader opens it."""
    import struct
    import zlib as _zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_png expects (H, W, 3) uint8")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # one filter byte (0 = None) per scanline, then raw RGB
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """PNG → uint8 (H, W, 3) numpy array, stdlib zlib only — a REAL
    compressed-format decoder with zero codec libraries (closes the
    'compressed codecs need PIL' boundary for PNG; JPEG stays behind
    the documented backend='real' call site).

    Supports the common still-image profile: 8-bit depth, color types
    0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced, all
    five scanline filters (None/Sub/Up/Average/Paeth). Gray expands to
    3 channels; alpha is dropped (decode_image_array's (H, W, 3)
    contract). Sub-filter rows reconstruct via a vectorized per-stride
    cumsum; Average/Paeth fall back to the spec's sequential recurrence.
    """
    import struct
    import zlib as _zlib

    import numpy as np

    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (clen,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + clen]
        pos += 12 + clen
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype_id, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype_id)
    if depth != 8 or channels is None or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            "decode_png supports 8-bit gray/RGB/gray+alpha/RGBA, "
            f"non-interlaced (got depth={depth} color_type={ctype_id} "
            f"interlace={interlace})"
        )
    stride = w * channels
    raw = np.frombuffer(_zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG data size mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int64)
    bpp = channels
    for y in range(h):
        ftype, row = int(raw[y, 0]), raw[y, 1:].astype(np.int64)
        up = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        if ftype == 0:
            out[y] = row
        elif ftype == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            for k in range(bpp):
                out[y, k::bpp] = np.cumsum(row[k::bpp]) % 256
        elif ftype == 2:  # Up
            out[y] = (row + up) % 256
        elif ftype == 3:  # Average
            r = out[y]
            for x in range(stride):
                left = r[x - bpp] if x >= bpp else 0
                r[x] = (row[x] + (left + up[x]) // 2) % 256
        elif ftype == 4:  # Paeth
            r = out[y]
            for x in range(stride):
                a_ = r[x - bpp] if x >= bpp else 0
                b_ = up[x]
                c_ = up[x - bpp] if x >= bpp else 0
                p = a_ + b_ - c_
                pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
                pred = a_ if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c_)
                r[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    img = out.astype(np.uint8).reshape(h, w, channels)
    if channels == 1:
        img = np.repeat(img, 3, axis=2)
    elif channels == 2:
        img = np.repeat(img[:, :, :1], 3, axis=2)
    elif channels == 4:
        img = img[:, :, :3]
    return img.copy()


def _gif_frame_payload(arr):
    """uint8 (H, W, 3) array → (bits, palette_bytes, min_code,
    sub_blocked_lzw_bytes): the palette-quantize + LZW-compress stage
    shared by the single-frame and animated encoders. Raises if the
    frame needs more than 256 palette entries (GIF's hard limit;
    quantize upstream)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_gif expects (H, W, 3) uint8")
    flat = a.reshape(-1, 3)
    # pack RGB rows into one uint32 per pixel: unique on a flat int
    # vector is ~10x cheaper than np.unique(axis=0)'s row-structured
    # sort, and at 100 TB the palette pass runs once per frame
    packed_px = (
        flat[:, 0].astype(np.uint32) << 16
    ) | (flat[:, 1].astype(np.uint32) << 8) | flat[:, 2]
    pal_packed, inverse = np.unique(packed_px, return_inverse=True)
    if len(pal_packed) > 256:
        raise ValueError(
            f"encode_gif: {len(pal_packed)} distinct colors > GIF's 256-"
            "entry palette; quantize first"
        )
    palette = np.stack(
        [
            (pal_packed >> 16).astype(np.uint8),
            ((pal_packed >> 8) & 0xFF).astype(np.uint8),
            (pal_packed & 0xFF).astype(np.uint8),
        ],
        axis=1,
    )
    # palette size must be a power of two, minimum 2
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code = max(2, bits)

    # -- LZW compress the index stream --------------------------------------
    clear, end = 1 << min_code, (1 << min_code) + 1
    codes = []
    dict_next = end + 1
    width = min_code + 1
    # dictionary keyed by (prefix_code << 8 | next_index) int pairs:
    # a prefix string is fully identified by its own code, so the
    # tuple-building per pixel collapses to one int op + dict probe
    table_d: dict = {}
    codes.append((clear, width))
    prefix_code = -1
    for idx in map(int, inverse):
        if prefix_code < 0:
            prefix_code = idx
            continue
        cand = (prefix_code << 8) | idx
        hit = table_d.get(cand)
        if hit is not None:
            prefix_code = hit
            continue
        codes.append((prefix_code, width))
        if dict_next < 4096:
            table_d[cand] = dict_next
            dict_next += 1
            if dict_next - 1 == (1 << width) and width < 12:
                width += 1
        else:  # dictionary full: clear and restart
            codes.append((clear, width))
            table_d.clear()
            dict_next = end + 1
            width = min_code + 1
        prefix_code = idx
    if prefix_code >= 0:
        codes.append((prefix_code, width))
    codes.append((end, width))
    # pack LSB-first
    acc = n = 0
    out = bytearray()
    for code, cw in codes:
        acc |= code << n
        n += cw
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    # sub-blocks of <=255 bytes
    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks += bytes([len(chunk)]) + chunk
    blocks += b"\x00"
    return bits, table.tobytes(), min_code, bytes(blocks)


def encode_gif(arr) -> bytes:
    """uint8 (H, W, 3) array (≤256 distinct colors) → single-frame
    GIF89a with REAL LZW compression — the third compressed format
    produced with zero codec libraries."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    bits, table, min_code, blocks = _gif_frame_payload(a)
    h, w = a.shape[:2]
    lsd_flags = 0x80 | ((bits - 1) & 0x07)  # GCT present, size 2^bits
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, lsd_flags, 0, 0)
        + table
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code])
        + blocks
        + b"\x3b"
    )


def encode_gif_animated(frames, delay_cs: int = 4, loop: int = 0) -> bytes:
    """List of same-shape uint8 (H, W, 3) arrays → animated GIF89a:
    NETSCAPE 2.0 loop extension, a graphic-control block per frame
    (delay in centiseconds), and per-frame LOCAL color tables so each
    frame palette-quantizes independently — the compressed VIDEO
    container for the numpy backend (``sample_video_frames`` demuxes
    it), replacing the uncompressed concatenated-PPM stream."""
    import struct

    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_gif_animated needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != frames[0].shape for f in frames):
        raise ValueError("encode_gif_animated frames must share one shape")
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", w, h, 0, 0, 0))
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for f in frames:
        bits, table, min_code, blocks = _gif_frame_payload(f)
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, w, h, 0x80 | ((bits - 1) & 0x07)
        )
        out += table + bytes([min_code]) + blocks
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes):
    """GIF87a/89a → uint8 (H, W, 3) numpy array (first frame).

    Animation frames after the first are ignored — this is the
    still-image decode stage; frame SAMPLING belongs to
    sample_video_frames (via decode_gif_frames)."""
    return decode_gif_frames(payload, max_frames=1)[0]


def decode_gif_frames(payload: bytes, max_frames: int | None = None):
    """GIF87a/89a → list of composited uint8 (H, W, 3) frames.

    Full LZW decode (variable code width, clear/end codes, 12-bit
    dictionary), global and local color tables, interlaced frames
    (four-pass row shuffle), animation compositing: each frame rect is
    painted onto the running canvas, graphic-control transparency
    leaves prior canvas pixels through, disposal method 2 restores the
    frame rect to the logical-screen BACKGROUND COLOR (the LSD
    background index resolved through the global color table; black
    when there is no GCT), and disposal method 3 restores the rect to
    the canvas state BEFORE the frame was painted — both as a
    spec-compliant decoder composites foreign files (ADVICE r7;
    encode_gif_animated itself only emits disposal 0/2)."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg_idx, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    bg_rgb = (
        gct[bg_idx].copy()
        if gct is not None and bg_idx < len(gct)
        else np.zeros(3, dtype=np.uint8)
    )
    frames_out = []
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    transparent = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            label = payload[pos]
            if label == 0xF9:  # graphic control: flags, delay, transp idx
                gflags = payload[pos + 2]
                disposal = (gflags >> 2) & 0x07
                transparent = payload[pos + 5] if gflags & 0x01 else None
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"decode_gif: unexpected block 0x{block:02x}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(
                payload, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("decode_gif: frame has no color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1

        # -- LZW decode ------------------------------------------------------
        # dictionary entries are byte strings: appending a code's
        # expansion is one bytearray += and extending an entry is one
        # bytes concat — the classic fast-LZW layout, ~4x the
        # tuple-list form on real frames (byte-identity pinned in
        # tests against randomized payloads incl. KwKwK + exhaustion)
        clear, end = 1 << min_code, (1 << min_code) + 1
        width = min_code + 1
        roots = [bytes([i]) for i in range(clear)] + [b"", b""]
        dictionary = list(roots)
        acc = n = 0
        out_bytes = bytearray()
        prev = None
        done = False
        for byte in data:
            acc |= byte << n
            n += 8
            while n >= width:
                code = acc & ((1 << width) - 1)
                acc >>= width
                n -= width
                if code == clear:
                    dictionary = list(roots)
                    width = min_code + 1
                    prev = None
                    continue
                if code == end:
                    done = True
                    break
                if prev is None:
                    entry = dictionary[code]
                else:
                    if code < len(dictionary):
                        entry = dictionary[code]
                        dictionary.append(prev + entry[:1])
                    else:  # the KwKwK case
                        entry = prev + prev[:1]
                        dictionary.append(entry)
                    if len(dictionary) == (1 << width) and width < 12:
                        width += 1
                out_bytes += entry
                prev = entry
            if done:
                break
        idx = (
            np.frombuffer(bytes(out_bytes[: fw * fh]), dtype=np.uint8)
            .astype(np.int32)
            .reshape(fh, fw)
        )
        if iflags & 0x40:  # interlaced: four-pass row order
            order = (
                list(range(0, fh, 8))
                + list(range(4, fh, 8))
                + list(range(2, fh, 4))
                + list(range(1, fh, 2))
            )
            deinter = np.zeros_like(idx)
            deinter[order] = idx
            idx = deinter
        # foreign frames may overflow the logical screen — clip the
        # rect to the canvas (spec renderers crop) instead of dying in
        # a broadcast error; out-of-table pixel indices get a clean
        # ValueError (r8 review)
        vh = min(fh, max(0, h - top))
        vw = min(fw, max(0, w - left))
        idx = idx[:vh, :vw]
        if idx.size and int(idx.max()) >= len(ct):
            raise ValueError(
                f"decode_gif: pixel index {int(idx.max())} exceeds the "
                f"{len(ct)}-entry color table"
            )
        rect = canvas[top : top + vh, left : left + vw]
        prev_rect = rect.copy() if disposal == 3 else None
        if transparent is not None:
            opaque = idx != transparent
            rect[opaque] = ct[idx[opaque]]
        else:
            rect[:] = ct[idx]
        frames_out.append(canvas.copy())
        if max_frames is not None and len(frames_out) >= max_frames:
            return frames_out
        if disposal == 2:  # restore rect to the LSD background color
            canvas[top : top + vh, left : left + vw] = bg_rgb
        elif disposal == 3:  # restore rect to the pre-frame canvas
            canvas[top : top + vh, left : left + vw] = prev_rect
        transparent, disposal = None, 0
    if not frames_out:
        raise ValueError("decode_gif: no image descriptor found")
    return frames_out


def encode_wav_pcm16(samples, rate: int = 16_000) -> bytes:
    """float array in [-1, 1] → mono PCM16 WAV bytes (stdlib wave)."""
    import io
    import wave

    import numpy as np

    pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1, 1) * 32767).astype(
        "<i2"
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_wav_pcm16(payload: bytes):
    """Mono/stereo PCM16 WAV → (float64 samples in [-1, 1], rate).
    Stereo is averaged to mono."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError("only PCM16 WAV supported")
        n_ch, rate = wf.getnchannels(), wf.getframerate()
        raw = wf.readframes(wf.getnframes())
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32767.0
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


# IMA/DVI ADPCM quantizer tables (public spec: IMA "Recommended
# Practices for Enhancing Digital Audio Compatibility", rev 3.00)
_IMA_INDEX_TAB = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TAB = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635,
    13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


_IMA_ARRAYS = None


def _ima_arrays():
    """Cached numpy copies of the IMA quantizer tables."""
    global _IMA_ARRAYS
    if _IMA_ARRAYS is None:
        import numpy as np

        _IMA_ARRAYS = (
            np.array(_IMA_STEP_TAB, dtype=np.int64),
            np.array(_IMA_INDEX_TAB, dtype=np.int64),
        )
    return _IMA_ARRAYS


def _adpcm_encode_blocks(blocks):
    """Vectorized IMA ADPCM block encode: int64 (n, spb) sample matrix
    → (uint8 (n, (spb-1)//2) packed-nibble matrix, (n,) seed index
    vector for the block headers). Blocks are INDEPENDENT lanes (the
    4-byte block header re-seeds the decoder with pred + step index),
    so one sequential pass over the spb-1 intra-block sample positions
    encodes every block of every signal in a batch at once — the
    per-sample Python loop becomes a ~spb-step numpy loop over
    thousands of lanes, which is what makes a 100 TB audio corpus
    affordable on an executor's Python worker. Each block's seed step
    index is estimated from its own median |Δsample| (the header field
    exists precisely so the encoder may pick any seed), which matches
    carried-index quality without serializing blocks."""
    import numpy as np

    step_tab, index_tab = _ima_arrays()
    n, spb = blocks.shape
    pred = blocks[:, 0].astype(np.int64)
    index0 = np.clip(
        np.searchsorted(step_tab, np.median(np.abs(np.diff(blocks, axis=1)), axis=1)),
        0,
        88,
    ).astype(np.int64)
    index = index0.copy()
    nibs = np.empty((n, spb - 1), dtype=np.uint8)
    for t in range(1, spb):
        step = step_tab[index]
        diff = blocks[:, t] - pred
        sign = diff < 0
        diff = np.abs(diff)
        b4 = diff >= step
        diff -= np.where(b4, step, 0)
        half = step >> 1
        b2 = diff >= half
        diff -= np.where(b2, half, 0)
        b1 = diff >= (step >> 2)
        nib = (
            np.where(sign, 8, 0)
            | np.where(b4, 4, 0)
            | np.where(b2, 2, 0)
            | np.where(b1, 1, 0)
        )
        # decoder-mirrored reconstruction keeps predictor drift at zero
        dq = (
            (step >> 3)
            + np.where(b4, step, 0)
            + np.where(b2, half, 0)
            + np.where(b1, step >> 2, 0)
        )
        pred = np.clip(np.where(sign, pred - dq, pred + dq), -32768, 32767)
        index = np.clip(index + index_tab[nib & 7], 0, 88)
        nibs[:, t - 1] = nib
    return nibs[:, 0::2] | (nibs[:, 1::2] << 4), index0


def _adpcm_decode_blocks(raw):
    """Vectorized IMA ADPCM block decode: uint8 (n, block_align) raw
    block matrix → int64 (n, spb) sample matrix. Exact integer twin of
    the published per-sample recurrence (differentially tested against
    a scalar reference in tests/test_sources.py), run as one
    sequential pass over intra-block positions with every block as a
    numpy lane — blocks decode independently from their 4-byte seed
    header, so a whole Arrow batch of payloads decodes in one call."""
    import numpy as np

    step_tab, index_tab = _ima_arrays()
    n, ba = raw.shape
    raw = raw.astype(np.int64)
    pred = raw[:, 0] | (raw[:, 1] << 8)
    pred = np.where(pred >= 32768, pred - 65536, pred)
    index = np.clip(raw[:, 2], 0, 88)
    body = raw[:, 4:]
    nibs = np.empty((n, (ba - 4) * 2), dtype=np.int64)
    nibs[:, 0::2] = body & 0x0F
    nibs[:, 1::2] = body >> 4
    out = np.empty((n, 1 + (ba - 4) * 2), dtype=np.int64)
    out[:, 0] = pred
    for t in range(nibs.shape[1]):
        nib = nibs[:, t]
        step = step_tab[index]
        dq = (
            (step >> 3)
            + np.where(nib & 4, step, 0)
            + np.where(nib & 2, step >> 1, 0)
            + np.where(nib & 1, step >> 2, 0)
        )
        pred = np.clip(np.where(nib & 8, pred - dq, pred + dq), -32768, 32767)
        index = np.clip(index + index_tab[nib & 7], 0, 88)
        out[:, t + 1] = pred
    return out


def encode_wav_adpcm(samples, rate: int = 16_000, block_align: int = 256) -> bytes:
    """float array in [-1, 1] → mono IMA-ADPCM WAV bytes (format tag
    0x11): REAL 4:1 lossy audio compression with zero codec libraries
    — the compressed-audio twin of the PNG/JPEG/GIF image codecs.
    Standard block layout (4-byte header carrying the block's seed
    predictor + step index, then two samples per byte) and a ``fact``
    chunk with the true sample count so trailing block padding is
    trimmed on decode."""
    import struct

    import numpy as np

    pcm = (np.clip(np.asarray(samples, dtype=np.float64), -1, 1) * 32767).astype(
        np.int64
    )
    n_true = len(pcm)
    if n_true == 0:
        raise ValueError("encode_wav_adpcm: empty signal")
    spb = (block_align - 4) * 2 + 1  # samples per block
    n_blocks = max(1, -(-n_true // spb))
    pad = n_blocks * spb - n_true
    pcm = np.concatenate([pcm, np.repeat(pcm[-1], pad)])
    # Each block is SELF-CONTAINED (header seeds pred + step index) —
    # the layout every block-seekable ADPCM reader assumes, and what
    # lets encode/decode vectorize over all blocks of a batch at once
    # (_adpcm_encode_blocks lanes).
    blocks = pcm.reshape(n_blocks, spb)
    packed, index0 = _adpcm_encode_blocks(blocks)
    data = bytearray()
    for b in range(n_blocks):
        data += struct.pack("<hBB", int(blocks[b, 0]), int(index0[b]), 0)
        data += packed[b].tobytes()
    byte_rate = (rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, byte_rate, block_align, 4, 2, spb
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + len(data))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_true)
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )


def encode_wav_adpcm_batch(
    signals, rate: int = 16_000, block_align: int = 256
) -> list:
    """Batch twin of :func:`encode_wav_adpcm`: float (n, L) matrix of
    equal-length signals in [-1, 1] → list of n mono IMA-ADPCM WAV
    payloads. ALL blocks of ALL signals encode as lanes of ONE
    vectorized pass (_adpcm_encode_blocks), so a synthesis/encode
    mapInPandas stage pays the sequential quantizer recurrence once
    per Arrow batch instead of once per sample — byte-identical to
    calling encode_wav_adpcm per row."""
    import struct

    import numpy as np

    sig = np.asarray(signals, dtype=np.float64)
    if sig.ndim != 2 or sig.shape[1] == 0:
        raise ValueError("encode_wav_adpcm_batch expects a (n, L>0) matrix")
    n_sig, n_true = sig.shape
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int64)
    spb = (block_align - 4) * 2 + 1
    n_blocks = max(1, -(-n_true // spb))
    pad = n_blocks * spb - n_true
    if pad:
        pcm = np.concatenate([pcm, np.repeat(pcm[:, -1:], pad, axis=1)], axis=1)
    blocks = pcm.reshape(n_sig * n_blocks, spb)
    packed, index0 = _adpcm_encode_blocks(blocks)
    byte_rate = (rate * block_align + spb - 1) // spb
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, rate, byte_rate, block_align, 4, 2, spb)
    data_len = n_blocks * block_align
    head = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 4 + 8 + data_len)
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_true)
        + b"data" + struct.pack("<I", data_len)
    )
    out = []
    for s in range(n_sig):
        data = bytearray()
        for b in range(s * n_blocks, (s + 1) * n_blocks):
            data += struct.pack("<hBB", int(blocks[b, 0]), int(index0[b]), 0)
            data += packed[b].tobytes()
        out.append(head + bytes(data))
    return out


def _parse_wav_chunks(payload: bytes):
    """RIFF walk → (fmt_chunk_bytes, fact_sample_count_or_None,
    data_chunk_bytes). Shared by the scalar and batch decoders."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, fact_n, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, ln = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"fact":
            fact_n = struct.unpack_from("<I", body, 0)[0]
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise ValueError("decode_wav: missing fmt/data chunk")
    return fmt, fact_n, data


def _adpcm_data_to_samples(data: bytes, block_align: int, fact_n):
    """ADPCM data chunk → int64 sample vector (fact-trimmed): whole
    blocks decode as one vectorized lane matrix; a truncated trailing
    block (foreign encoders) pads to block width and trims back to the
    bytes actually present, which reproduces the scalar recurrence
    exactly (trailing zero-pad nibbles only produce samples BEYOND the
    real ones, which are sliced off before the fact trim)."""
    import numpy as np

    if block_align < 5:
        # 4-byte header + at least one nibble byte per block; a corrupt
        # header otherwise dies in divmod/indexing (r8 review)
        raise ValueError(
            f"ADPCM block_align must be >= 5, got {block_align}"
        )
    n_whole, rem = divmod(len(data), block_align)
    parts = []
    if n_whole:
        raw = np.frombuffer(
            data, dtype=np.uint8, count=n_whole * block_align
        ).reshape(n_whole, block_align)
        parts.append(_adpcm_decode_blocks(raw).ravel())
    if rem >= 4:  # partial trailing block: pad, decode, slice real samples
        tail = np.zeros((1, block_align), dtype=np.uint8)
        tail[0, :rem] = np.frombuffer(data, dtype=np.uint8, offset=n_whole * block_align)
        n_real = 1 + (rem - 4) * 2
        parts.append(_adpcm_decode_blocks(tail)[0, :n_real])
    out = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
    return out[:fact_n] if fact_n is not None else out


def decode_wav(payload: bytes):
    """WAV → (float64 mono samples in [-1, 1], rate), dispatching on
    the fmt tag: PCM16 (stdlib ``wave``) or IMA ADPCM (format 0x11,
    pure-numpy RIFF walk + vectorized quantizer reconstruction —
    every block of the payload decodes as a lane of one
    _adpcm_decode_blocks pass). The single audio decode entry point
    for the numpy backend."""
    import struct

    fmt, fact_n, data = _parse_wav_chunks(payload)
    tag, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    if tag == 1:  # PCM: the stdlib path handles widths/stereo
        return decode_wav_pcm16(payload)
    if tag != 0x11:
        raise ValueError(f"decode_wav: unsupported format tag 0x{tag:x}")
    if n_ch != 1:
        raise ValueError("decode_wav: only mono IMA ADPCM supported")
    block_align = struct.unpack_from("<H", fmt, 12)[0]
    x = _adpcm_data_to_samples(data, block_align, fact_n)
    return x.astype("float64") / 32767.0, rate


def decode_wav_batch(payloads):
    """List of WAV payloads → list of (float64 samples, rate).

    The ADPCM fast path stacks ALL whole blocks of ALL same-block_align
    payloads into one lane matrix and runs ONE vectorized decode pass
    for the entire Arrow batch — per-payload work drops to RIFF header
    parsing plus a row split. Payloads that aren't mono ADPCM (PCM16,
    stereo) fall back to :func:`decode_wav` individually. Result order
    matches input order; identical bytes to the scalar path."""
    import struct

    import numpy as np

    results: list = [None] * len(payloads)
    groups: dict = {}  # block_align -> list of (i, data, fact_n, rate)
    for i, payload in enumerate(payloads):
        try:
            fmt, fact_n, data = _parse_wav_chunks(payload)
            tag, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
            block_align = (
                struct.unpack_from("<H", fmt, 12)[0] if len(fmt) >= 14 else 0
            )
        except (ValueError, struct.error):
            results[i] = decode_wav(payload)  # raise with the scalar message
            continue
        if tag == 1 and n_ch in (1, 2) and len(fmt) >= 16:
            # PCM16 fast path: width check then a direct frombuffer —
            # same samples as the stdlib-wave scalar path without its
            # per-payload chunk re-parse
            bits = struct.unpack_from("<H", fmt, 14)[0]
            if bits != 16:
                results[i] = decode_wav(payload)  # scalar error surface
                continue
            x = (
                np.frombuffer(
                    data, dtype="<i2", count=(len(data) // (2 * n_ch)) * n_ch
                ).astype(np.float64)
                / 32767.0  # divide BEFORE the stereo mean: bit-parity
            )  # with decode_wav_pcm16's operation order
            if n_ch == 2:
                x = x.reshape(-1, 2).mean(axis=1)
            results[i] = (x, rate)
            continue
        if (
            tag != 0x11
            or n_ch != 1
            or block_align < 5
            or len(data) % block_align
        ):
            # non-PCM16/ADPCM, stereo ADPCM, malformed, or partial
            # trailing block: the scalar path decides (and raises its
            # own messages)
            results[i] = decode_wav(payload)
            continue
        groups.setdefault(block_align, []).append((i, data, fact_n, rate))
    for block_align, members in groups.items():
        counts = [len(d) // block_align for _, d, _, _ in members]
        raw = np.frombuffer(
            b"".join(d for _, d, _, _ in members), dtype=np.uint8
        ).reshape(sum(counts), block_align)
        samples = _adpcm_decode_blocks(raw)
        row = 0
        for (i, _d, fact_n, rate), nb in zip(members, counts):
            x = samples[row : row + nb].ravel()
            row += nb
            if fact_n is not None:
                x = x[:fact_n]
            results[i] = (x.astype("float64") / 32767.0, rate)
    return results


def decode_image_array(payload: bytes):
    """Dispatch on magic bytes → uint8 (H, W, 3): PPM (P6), BMP, PNG
    (stdlib zlib inflate — :func:`decode_png`), or JPEG — baseline AND
    progressive SOF2 (pure-numpy Huffman + IDCT —
    ``sources/jpeg.py:decode_jpeg``). All compressed formats decode
    with zero codec libraries."""
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    if payload.startswith(b"\x89PNG"):
        return decode_png(payload)
    if payload.startswith(b"\xff\xd8\xff"):
        from social_media_etl_spark.sources.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload.startswith(b"GIF8"):
        return decode_gif(payload)
    raise ValueError(
        "numpy backend decodes PPM(P6)/BMP/PNG/baseline-JPEG/GIF; "
        "other formats need backend='real' (PIL/opencv)"
    )


def _check_backend(fn: str, backend: str, allowed: tuple) -> None:
    """Backend dispatch guard (r8 review): an unknown string used to
    fall silently into whichever branch the if-chain ended on — a typo
    like 'Numpy' wrote FAKE metadata for a whole corpus with no error,
    and 'fake' on the hash stages silently ran the real decode."""
    if backend not in allowed:
        raise ValueError(
            f"{fn}: unknown backend {backend!r}; allowed: {allowed}"
        )


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    backend: str = "fake",
) -> DataFrame:
    """Decode stage: payload → (width, height, channels, mean_intensity).

    ``backend='numpy'`` REALLY decodes PPM/BMP/PNG/baseline-JPEG/GIF
    payloads (pure numpy + stdlib — see :func:`decode_image_array`)
    and reports true dimensions and the mean over all pixel values.
    ``backend='real'`` is the PIL/opencv call site for formats outside
    the from-scratch codecs — NotImplementedError here. Progressive
    JPEG (SOF2) decodes REALLY under ``backend='numpy'`` since r9
    (``sources/jpeg.py`` Annex-G decoder).
    ``backend='fake'`` derives deterministic pseudo-dimensions from the
    payload digest (synthetic corpora).
    """
    _check_backend("decode_images", backend, ("fake", "numpy", "real"))
    if backend == "real":
        raise NotImplementedError(
            "compressed-image decode requires PIL/opencv (not in this "
            "container); use backend='numpy' for PPM/BMP"
        )

    out_schema = (
        f"{id_col} long, width int, height int, channels int, mean_intensity double"
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, mi = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                ids.append(mid)
                if backend == "numpy":
                    img = decode_image_array(b)
                    ws.append(img.shape[1])
                    hs.append(img.shape[0])
                    cs.append(img.shape[2])
                    mi.append(round(float(img.mean()), 2))
                else:
                    ws.append(64 + _fake_u32(b, "w") % 1985)
                    hs.append(64 + _fake_u32(b, "h") % 1985)
                    cs.append(3)
                    mi.append(round((_fake_u32(b, "i") % 25600) / 100.0, 2))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": ws,
                    "height": hs,
                    "channels": cs,
                    "mean_intensity": mi,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, out_schema)


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (224, 224),
    payload_col: str = "payload",
    id_col: str = "media_id",
    backend: str = "fake",
) -> DataFrame:
    """Resize stage: payload → resized payload + new dims.

    ``backend='numpy'`` really resizes PPM/BMP pixels (nearest-neighbor
    via integer index maps — pure numpy) and re-encodes the result as
    PPM; ``backend='fake'`` emits a digest-stamped placeholder payload;
    ``backend='real'`` is the PIL/opencv call site."""
    _check_backend("resize_images", backend, ("fake", "numpy", "real"))
    if backend == "real":
        raise NotImplementedError("compressed-image resize requires PIL/opencv")
    tw, th = target
    out_schema = f"{id_col} long, payload binary, width int, height int"

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {id_col: [], "payload": [], "width": [], "height": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                rows[id_col].append(mid)
                if backend == "numpy":
                    img = decode_image_array(b)
                    h, w = img.shape[:2]
                    ys = (np.arange(th) * h) // th
                    xs = (np.arange(tw) * w) // tw
                    rows["payload"].append(encode_ppm(img[ys][:, xs]))
                else:
                    stamp = hashlib.sha256(b).digest()
                    rows["payload"].append(stamp + bytes(f"{tw}x{th}", "ascii"))
                rows["width"].append(tw)
                rows["height"].append(th)
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(_resize, out_schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
    backend: str = "fake",
) -> DataFrame:
    """Frame sampling: one input row → up to ``max_frames`` frame rows
    (1:N multiplicity through mapInPandas — the streaming-friendly
    explode).

    ``backend='numpy'`` REALLY demuxes the container — animated GIF
    (``decode_gif_frames``: LZW decode + animation compositing,
    dispatched on the GIF8 magic), MP4 with uncompressed ``raw ``
    RGB24 tracks (``sources/mp4.py``: full ISO-BMFF box walk +
    stsc/stsz/stco sample resolution, dispatched on the ftyp magic;
    compressed codecs raise naming the fourcc), WebM with
    ``V_UNCOMPRESSED`` tracks (``sources/webm.py``: EBML element walk
    + SimpleBlock demux, dispatched on the EBML magic; V_VP8/VP9/AV1
    raise naming the CodecID), or a concatenated-P6
    PPM stream (``encode_ppm_stream``) — samples every ``every_n``-th
    frame, and emits per-frame stats (digest of the canonical PPM
    frame bytes + mean pixel intensity); ``backend='fake'`` synthesizes
    a deterministic frame count from the payload; ``backend='real'``
    is the ffmpeg call site for codec-compressed tracks (H.264/VP9
    inside MP4/WebM)."""
    _check_backend("sample_video_frames", backend, ("fake", "numpy", "real"))
    if backend == "real":
        raise NotImplementedError(
            "codec-compressed frame sampling requires ffmpeg; "
            "use backend='numpy' for GIF / raw-track MP4 / PPM streams"
        )
    out_schema = (
        f"{id_col} long, frame_idx int, frame_digest string,"
        " mean_intensity double"
    )

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digs, means = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                if backend == "numpy":
                    if b.startswith(b"GIF8"):
                        # only the sampled prefix is ever read — bound
                        # the LZW decode + compositing by it instead of
                        # paying for every frame (r8 review)
                        need = (max_frames - 1) * every_n + 1
                        frames = decode_gif_frames(b, max_frames=need)
                    elif len(b) >= 8 and b[4:8] == b"ftyp":
                        from social_media_etl_spark.sources.mp4 import (
                            decode_mp4_frames,
                        )

                        need = (max_frames - 1) * every_n + 1
                        frames = decode_mp4_frames(b, max_frames=need)
                    elif b.startswith(b"\x1a\x45\xdf\xa3"):
                        from social_media_etl_spark.sources.webm import (
                            decode_webm_frames,
                        )

                        need = (max_frames - 1) * every_n + 1
                        frames = decode_webm_frames(b, max_frames=need)
                    else:
                        frames = decode_ppm_stream(b)
                    for k, frame_i in enumerate(
                        range(0, len(frames), every_n)
                    ):
                        if k >= max_frames:
                            break
                        fr = frames[frame_i]
                        ids.append(mid)
                        idxs.append(frame_i)
                        digs.append(
                            hashlib.sha256(encode_ppm(fr)).hexdigest()
                        )
                        means.append(round(float(fr.mean()), 2))
                else:
                    n_frames = 1 + _fake_u32(b, "nf") % (max_frames * every_n)
                    for k, frame in enumerate(range(0, n_frames, every_n)):
                        if k >= max_frames:
                            break
                        ids.append(mid)
                        idxs.append(frame)
                        digs.append(
                            hashlib.sha256(
                                b + frame.to_bytes(4, "big")
                            ).hexdigest()
                        )
                        means.append(
                            round((_fake_u32(b, f"mi{frame}") % 25600) / 100.0, 2)
                        )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "frame_digest": digs,
                    "mean_intensity": means,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_frames, out_schema)


def _group_by_length(decoded) -> dict:
    """Index (x, rate) decode results by sample length so equal-length
    signals (the overwhelmingly common case inside one corpus) batch
    into stacked rfft/band passes."""
    by_len: dict = {}
    for i, (x, _rate) in enumerate(decoded):
        by_len.setdefault(len(x), []).append(i)
    return by_len


def _band_log_energies(x_rows, n_bands: int):
    """(n, L) signal matrix → (n, n_bands) log1p spectral band
    energies, with band boundaries matching ``np.array_split``. One
    batched rfft + one ``np.add.reduceat`` replaces the per-payload
    band loop; falls back to the array_split reference when the
    spectrum is shorter than the band count (reduceat's repeated-
    offset semantics differ from array_split's empty segments there)."""
    import numpy as np

    x_rows = np.asarray(x_rows)
    if x_rows.shape[-1] == 0:
        # a degenerate payload (empty data chunk / fact_n=0) has no
        # spectrum; all-zero bands instead of an rfft crash that would
        # kill the whole Arrow batch (r8 review)
        return np.zeros((x_rows.shape[0], n_bands))
    mag2 = np.abs(np.fft.rfft(x_rows, axis=1)) ** 2
    nf = mag2.shape[1]
    if nf < n_bands:
        return np.stack(
            [
                np.array([np.log1p(b.sum()) for b in np.array_split(row, n_bands)])
                for row in mag2
            ]
        )
    div, mod = divmod(nf, n_bands)
    sizes = np.full(n_bands, div, dtype=np.int64)
    sizes[:mod] += 1
    offs = np.zeros(n_bands, dtype=np.int64)
    np.cumsum(sizes[:-1], out=offs[1:])
    return np.log1p(np.add.reduceat(mag2, offs, axis=1))


def extract_audio_features(
    df: DataFrame,
    n_mels: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
    backend: str = "fake",
) -> DataFrame:
    """Feature-extract stage: payload → fixed-dim float feature vector
    (the embedding-column shape similarity.py consumes).

    ``backend='numpy'`` really decodes WAV — PCM16 (stdlib ``wave``)
    or compressed IMA ADPCM (:func:`decode_wav` fmt-tag dispatch) —
    and computes ``n_mels`` log-spectral band energies from an rfft —
    a mel-filterbank-shaped feature with zero audio dependencies;
    ``backend='fake'`` emits a digest-derived vector; ``backend='real'``
    is the librosa call site (mp3/flac)."""
    _check_backend("extract_audio_features", backend, ("fake", "numpy", "real"))
    if backend == "real":
        raise NotImplementedError("compressed-audio features require librosa")
    out_schema = f"{id_col} long, features array<float>"

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if backend == "numpy":
                payloads = [bytes(p) for p in pdf[payload_col]]
                decoded = decode_wav_batch(payloads)  # one pass per batch
                feats: list = [None] * len(decoded)
                for L, idxs in _group_by_length(decoded).items():
                    e = _band_log_energies(
                        np.stack([decoded[i][0] for i in idxs]), n_mels
                    )
                    for j, i in enumerate(idxs):
                        feats[i] = np.round(e[j], 4).tolist()
                yield pd.DataFrame(
                    {id_col: pdf[id_col].to_numpy(), "features": feats}
                )
                continue
            ids, feats = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                vec = [
                    round((_fake_u32(b, f"m{j}") % 2000) / 1000.0 - 1.0, 4)
                    for j in range(n_mels)
                ]
                ids.append(mid)
                feats.append(vec)
            yield pd.DataFrame({id_col: ids, "features": feats})

    return df.select(id_col, payload_col).mapInPandas(_feat, out_schema)


def ahash_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    grid: int = 8,
    backend: str = "numpy",
) -> DataFrame:
    """Perceptual average-hash per image: decode (real pixels via the
    numpy codecs), nearest-neighbor downsample to ``grid``×``grid``,
    grayscale by channel mean, threshold every cell against the global
    mean → one ``grid``²-bit fingerprint packed into a long (row-major,
    bit 0 = top-left). Returns (id, sh) — the SAME shape as the text
    SimHash table, so ``dedup.simhash_pairs(sig_table=...)`` banding
    turns it into an image near-dup candidate join: the two families
    deliberately share one Hamming machinery.

    Arrow-batched mapInPandas; ``backend='real'`` is the PIL call site
    for compressed formats (NotImplementedError in this container).
    """
    _check_backend("ahash_images", backend, ("numpy", "real"))
    if backend == "real":
        raise NotImplementedError(
            "MP4/WebM decode requires PIL/opencv (not in this "
            "container); use backend='numpy' for "
            "PPM/BMP/PNG/JPEG(baseline+progressive)/GIF"
        )
    if grid * grid > 64:
        raise ValueError("ahash_images: grid**2 must fit in a 64-bit long")

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image_array(bytes(payload)).astype(np.float64)
                h, w = img.shape[0], img.shape[1]
                ys = (np.arange(grid) * h) // grid
                xs = (np.arange(grid) * w) // grid
                cells = img[np.ix_(ys, xs)].mean(axis=2)  # grayscale grid
                bits = (cells > cells.mean()).flatten()
                sh = 0
                for i, b in enumerate(bits):
                    if b:
                        sh |= 1 << i
                ids.append(mid)
                # pack as signed 64-bit (Spark long), matching simhash
                hashes.append(sh - (1 << 64) if sh >= (1 << 63) else sh)
            yield pd.DataFrame({id_col: ids, "sh": hashes})

    return df.select(id_col, payload_col).mapInPandas(
        _hash, f"{id_col} long, sh long"
    )


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_bands: int = 64,
    backend: str = "numpy",
) -> DataFrame:
    """Spectral-bitmap audio fingerprint: real decode (PCM16 or
    compressed IMA ADPCM via :func:`decode_wav`) → rfft → ``n_bands``
    log band energies → threshold each band against the mean → one
    ``n_bands``-bit signature packed into a long. The audio
    twin of :func:`ahash_images`, emitted in the same (id, sh) shape so
    ``dedup.simhash_pairs(sig_table=...)`` banding serves IMAGES,
    AUDIO, and TEXT with one Hamming machinery. ``backend='real'`` is
    the librosa/chromaprint call site (NotImplementedError here)."""
    _check_backend("audio_fingerprint", backend, ("numpy", "real"))
    if backend == "real":
        raise NotImplementedError(
            "compressed-audio fingerprints require librosa/chromaprint"
        )
    if n_bands > 64:
        raise ValueError("audio_fingerprint: n_bands must fit in a long")

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = [bytes(p) for p in pdf[payload_col]]
            decoded = decode_wav_batch(payloads)  # ONE ADPCM pass per batch
            sh = np.zeros(len(decoded), dtype=np.int64)
            for L, idxs in _group_by_length(decoded).items():
                e = _band_log_energies(
                    np.stack([decoded[i][0] for i in idxs]), n_bands
                )
                bits = e > e.mean(axis=1, keepdims=True)
                vals = (
                    (bits.astype(np.uint64) << np.arange(n_bands, dtype=np.uint64))
                    .sum(axis=1, dtype=np.uint64)
                    .view(np.int64)
                )
                sh[idxs] = vals
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "sh": sh})

    return df.select(id_col, payload_col).mapInPandas(
        _fp, f"{id_col} long, sh long"
    )
