"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata, with Arrow-batched decode/transform stages.

Design for 100 TB of media: the payload is an opaque ``binary`` column
(or a reference to object storage) carried alongside typed metadata;
everything metadata-only (sniffing, digests, sizes, filtering,
partitioning) stays JVM-side and codegen'd, and only the stages that
must touch pixels/samples cross into Python — as ``mapInPandas``
iterator UDFs, so one Arrow batch of payloads is decoded per call and
memory stays bounded by the batch size, never the partition.

The actual codec work (PIL/opencv/ffmpeg) is NOT available in this
container, so the decode kernels are STUBBED: ``backend='fake'``
derives deterministic pseudo-outputs from the payload bytes (stable
across runs/engines — testable), and ``backend='real'`` raises
``NotImplementedError`` at the exact point a codec library would be
called. The Spark-side plumbing — schemas, UDF signatures, batch
iteration, row multiplicity — is real and tested.
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
    "attach_media_metadata",
    "decode_images",
    "resize_images",
    "sample_video_frames",
    "extract_audio_features",
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
    # mp4: 'ftyp' sits at byte offset 5
    mp4 = F.lower(F.hex(F.substring(p, 5, 4)))
    expr = F.lit("application/octet-stream")
    expr = F.when(mp4 == "66747970", F.lit("video/mp4")).otherwise(expr)
    for magic, mtype in _MAGIC.items():
        if magic == "66747970":
            continue
        cond = (head == magic) if len(magic) == 8 else (head3 == magic)
        expr = F.when(cond, F.lit(mtype)).otherwise(expr)
    return expr


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


def decode_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    backend: str = "fake",
) -> DataFrame:
    """Decode stage: payload → (width, height, channels, mean_intensity).

    ``backend='real'`` is the PIL/opencv call site — NotImplementedError
    here (codec libs absent in this environment). ``backend='fake'``
    derives deterministic pseudo-dimensions from the payload digest so
    the full Spark plumbing (Arrow batches, schema, partitioning) runs
    and is assertable.
    """
    if backend == "real":
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "use backend='fake' for plumbing tests"
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
    """Resize stage: payload → resized payload + new dims. The fake
    backend emits a digest-stamped placeholder payload of the right
    conceptual shape (id, bytes, w, h); the real backend is the codec
    call site."""
    if backend == "real":
        raise NotImplementedError("resize requires PIL/opencv; use backend='fake'")
    tw, th = target
    out_schema = f"{id_col} long, payload binary, width int, height int"

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {id_col: [], "payload": [], "width": [], "height": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                stamp = hashlib.sha256(b).digest()
                rows[id_col].append(mid)
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
    explode). Fake backend synthesizes a deterministic frame count from
    the payload and digest-stamps each frame."""
    if backend == "real":
        raise NotImplementedError("frame sampling requires ffmpeg; use backend='fake'")
    out_schema = f"{id_col} long, frame_idx int, frame_digest string"

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digs = [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n_frames = 1 + _fake_u32(b, "nf") % (max_frames * every_n)
                for k, frame in enumerate(range(0, n_frames, every_n)):
                    if k >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(frame)
                    digs.append(
                        hashlib.sha256(b + frame.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_digest": digs}
            )

    return df.select(id_col, payload_col).mapInPandas(_frames, out_schema)


def extract_audio_features(
    df: DataFrame,
    n_mels: int = 16,
    payload_col: str = "payload",
    id_col: str = "media_id",
    backend: str = "fake",
) -> DataFrame:
    """Feature-extract stage: payload → fixed-dim float feature vector
    (the embedding-column shape similarity.py consumes). Fake backend
    emits a deterministic digest-derived vector with the right dtype/
    dimensionality."""
    if backend == "real":
        raise NotImplementedError("audio features require librosa; use backend='fake'")
    out_schema = f"{id_col} long, features array<float>"

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
