"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side design is real and tested — schema, Arrow batch shape,
partition sizing, UDF signatures. Image METADATA decode is real: a
pure-python PNG/JPEG/GIF header parser (`parse_image_header`) extracts
width/height/channels from any executor with no codec library; Pillow
is used instead when importable. PIXEL-level work (full JPEG decode,
audio resample, video frame extraction) remains STUBBED behind
clearly-marked deterministic fakes — the container has no codec
libraries. Swapping in a real decoder changes no plumbing.

Scale notes: binary payloads ride through Arrow record batches into
pandas; keep `spark.sql.files.maxPartitionBytes` (or an explicit
repartition) sized so a batch of payloads fits executor memory —
decode is CPU-bound, so more, smaller partitions parallelize better
than few fat ones.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Asset table schema: one opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image/jpeg, audio/wav, ...
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("source_uri", T.StringType(), True),
    ]
)

IMAGE_META_SCHEMA = (
    "asset_id long, media_type string, width int, height int, n_channels int, decode_ok boolean"
)
FRAME_SAMPLE_SCHEMA = "asset_id long, frame_idx int, frame_sha256 string"


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> sample channels (palette indexes into an RGB table)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}
# JPEG start-of-frame markers (0xC0-0xCF minus DHT/JPG/DAC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_header(payload: bytes) -> tuple[int, int, int] | None:
    """(width, height, n_channels) from PNG / JPEG / GIF header bytes,
    or None if the payload is not one of those. Pure Python over the
    file structure — no codec library, no pixel decode — so it is safe
    and cheap to run inside the Arrow batch loop on any executor.

    PNG: IHDR chunk is mandatory and first (width/height big-endian at
    fixed offsets, channels from the color type). JPEG: walk the
    marker stream to the first start-of-frame segment. GIF: logical
    screen descriptor at a fixed offset.
    """
    if payload is None:
        return None
    if payload.startswith(_PNG_SIG) and len(payload) >= 33 and payload[12:16] == b"IHDR":
        width = int.from_bytes(payload[16:20], "big")
        height = int.from_bytes(payload[20:24], "big")
        channels = _PNG_CHANNELS.get(payload[25])
        if width and height and channels:
            return width, height, channels
        return None
    if payload[:2] == b"\xff\xd8":  # JPEG SOI
        i, n = 2, len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None  # desynced marker stream
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone marker, no length field
                continue
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF:
                if i + 9 >= n:
                    return None
                height = int.from_bytes(payload[i + 5 : i + 7], "big")
                width = int.from_bytes(payload[i + 7 : i + 9], "big")
                channels = payload[i + 9]
                if width and height and channels:  # SOF with 0 components is malformed
                    return width, height, channels
                return None
            i += 2 + seg_len
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        width = int.from_bytes(payload[6:8], "little")
        height = int.from_bytes(payload[8:10], "little")
        if width and height:
            return width, height, 3
    return None


def parse_wav_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """Pure-python RIFF/WAVE header parse -> (n_channels, sample_rate,
    bits_per_sample, n_frames), or None for malformed bytes. Walks the
    chunk list (fmt before/after data both occur in the wild) — header
    fields only, no sample decode, so no audio library is required."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            block_align = int.from_bytes(body[12:14], "little")
            bits = int.from_bytes(body[14:16], "little")
            if channels >= 1 and rate >= 1 and block_align >= 1:
                fmt = (channels, rate, bits, block_align)
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize % 2)  # RIFF chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    channels, rate, bits, block_align = fmt
    return channels, rate, bits, data_size // block_align


AUDIO_META_SCHEMA = (
    "asset_id long, media_type string, n_channels int, sample_rate int, "
    "bits_per_sample int, n_frames long, duration_ms double, decode_ok boolean"
)


def decode_audio_meta(assets: DataFrame) -> DataFrame:
    """Per-asset audio metadata decode via mapInPandas — the audio
    sibling of `decode_image_meta`. WAV headers are parsed for real
    (pure python, `parse_wav_header`); compressed formats (mp3/ogg)
    would plug into the same loop with a real audio library and are
    reported decode_ok=False here. Malformed bytes are data, not bugs.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, mt, payload in zip(pdf["asset_id"], pdf["media_type"], pdf["payload"]):
                meta = (
                    parse_wav_header(bytes(payload)) if payload is not None else None
                )
                if meta is None:
                    out.append((aid, mt, None, None, None, None, None, False))
                else:
                    ch, rate, bits, frames = meta
                    out.append(
                        (aid, mt, ch, rate, bits, frames, frames * 1000.0 / rate, True)
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "media_type", "n_channels", "sample_rate",
                    "bits_per_sample", "n_frames", "duration_ms", "decode_ok",
                ],
            )

    return assets.mapInPandas(decode, schema=AUDIO_META_SCHEMA)


def fake_assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic binary asset table derived from the documents
    fixture (no real media in the container): payload = UTF-8 bytes of
    the text. Exercises the binary column path end-to-end."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        F.concat(F.lit("mem://doc/"), F.col("doc_id")).alias("source_uri"),
    )


def decode_image_meta(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Per-asset decode -> (width, height, channels). mapInPandas:
    payload bytes arrive as Arrow binary batches; the decode loop is
    pure Python per batch (the unavoidable slow path — this is exactly
    where a real codec library plugs in).

    Real payloads (fake=False or a non-`/fake` media type): dimensions
    come from Pillow when available, else from the pure-python
    PNG/JPEG/GIF header parser (`parse_image_header`) — header fields
    only, no pixel decode, so no codec library is required.
    Unparseable payloads get decode_ok=False rather than an error
    (bad bytes are data, not bugs). `/fake`-typed payloads keep the
    deterministic digest-derived dimensions for plumbing tests.
    """
    pil = _try_import_pil()

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, mt, payload in zip(pdf["asset_id"], pdf["media_type"], pdf["payload"]):
                mt = mt or ""  # NULL media_type is data, not a bug
                if payload is None:
                    out.append((aid, mt, None, None, None, False))
                    continue
                if not mt.endswith("/fake"):
                    if pil is not None:
                        import io

                        try:
                            img = pil.open(io.BytesIO(payload))
                            w, h = img.size
                            ch = len(img.getbands())
                            out.append((aid, mt, w, h, ch, True))
                            continue
                        except Exception:  # noqa: BLE001 — undecodable payload is data, not a bug
                            pass  # fall through to the header parser
                    meta = parse_image_header(bytes(payload))
                    if meta is not None:
                        out.append((aid, mt, meta[0], meta[1], meta[2], True))
                    else:
                        out.append((aid, mt, None, None, None, False))
                    continue
                if not fake:
                    # a /fake-typed payload has no real header to parse
                    out.append((aid, mt, None, None, None, False))
                    continue
                # deterministic fake: dimensions from the payload digest
                digest = hashlib.sha256(payload).digest()
                w = 64 + digest[0] % 192
                h = 64 + digest[1] % 192
                out.append((aid, mt, int(w), int(h), 3, True))
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id",
                    "media_type",
                    "width",
                    "height",
                    "n_channels",
                    "decode_ok",
                ],
            )

    return assets.mapInPandas(decode, schema=IMAGE_META_SCHEMA)


def frame_sample(assets: DataFrame, every_n: int = 4, max_frames: int = 3) -> DataFrame:
    """Video frame sampling stub: emits every_n-th 'frame' digest up to
    max_frames per asset (one->many mapInPandas — the real shape of a
    frame extractor; a real impl decodes with pyav/ffmpeg here)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                for k in range(max_frames):
                    chunk = payload[k * every_n :: max_frames * every_n]
                    if not chunk:
                        break
                    rows.append((aid, k, hashlib.sha256(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame_sha256"])

    return assets.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id long, media_type string, target_w int, target_h int, "
    "payload binary, resize_ok boolean"
)


def resize_images(assets: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Image resize plumbing (the normalize-before-embedding step of a
    multimodal training pipeline). With Pillow importable the resize
    is REAL (LANCZOS, re-encoded PNG); without codec libraries the
    pixel work is a documented deterministic stand-in (digest-derived
    bytes of the right conceptual shape) so the Spark-side contract —
    schema, Arrow batch shape, one-row-per-asset, null/garbage
    handling — is fully exercised either way. resize_ok=False marks
    payloads that could not even be header-parsed."""
    pil = _try_import_pil()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, mt, payload in zip(pdf["asset_id"], pdf["media_type"], pdf["payload"]):
                mt = mt or ""  # NULL media_type is data, not a bug
                if payload is None:
                    out.append((aid, mt, target_w, target_h, None, False))
                    continue
                raw = bytes(payload)
                if pil is not None:
                    import io

                    try:
                        img = pil.open(io.BytesIO(raw)).resize(
                            (target_w, target_h), pil.LANCZOS
                        )
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                        out.append((aid, mt, target_w, target_h, buf.getvalue(), True))
                        continue
                    except Exception:  # noqa: BLE001 — bad bytes are data
                        pass
                if parse_image_header(raw) is None and not mt.endswith("/fake"):
                    out.append((aid, mt, target_w, target_h, None, False))
                    continue
                # STUB pixel path: deterministic stand-in bytes sized
                # like a tiny encoded thumbnail (digest-expanded) — NOT
                # a real image; swap in a codec library for real output
                seed = hashlib.sha256(raw).digest()
                fake = (seed * ((target_w * target_h) // len(seed) + 1))[
                    : target_w * target_h // 8
                ]
                out.append((aid, mt, target_w, target_h, fake, True))
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id", "media_type", "target_w", "target_h",
                    "payload", "resize_ok",
                ],
            )

    return assets.mapInPandas(resize, schema=RESIZE_SCHEMA)


def extract_features(assets: DataFrame, dim: int = 64) -> DataFrame:
    """Binary payload -> unit-norm float feature vector (array<float>)
    — the embedding step that connects the multimodal column to the
    similarity-search operators (cosine_topk / lsh_bucketed_pairs /
    ivf_topk take its output directly).

    The 'model' is a deterministic stub: bytes are folded into `dim`
    buckets and normalized — a real encoder (CLIP, wav2vec, ...) slots
    into the same mapInPandas shape with identical schema/partitioning.
    """
    import numpy as np

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
                pad = (-len(arr)) % dim
                if pad:
                    arr = np.concatenate([arr, np.zeros(pad)])
                v = arr.reshape(-1, dim).sum(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    v = v / norm
                ids.append(aid)
                vecs.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return assets.mapInPandas(encode, schema="vec_id long, embedding array<float>")


def payload_stats(assets: DataFrame) -> DataFrame:
    """JVM-side metadata over binary columns (no Python): byte length
    and digest — the cheap pre-filter before any decode fan-out."""
    return assets.select(
        "asset_id",
        "media_type",
        F.octet_length("payload").cast("bigint").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha256"),
    )
