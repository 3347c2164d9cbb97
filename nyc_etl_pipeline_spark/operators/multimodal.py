"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side design is real and tested — schema, Arrow batch shape,
partition sizing, UDF signatures. The actual codec work (JPEG decode,
audio resample, video frame extraction) is STUBBED: the container has
no image/audio libraries, so each decode function first tries the real
library import and otherwise uses a clearly-marked deterministic fake
(or raises NotImplementedError when fake=False). Swapping in the real
decoder changes no plumbing.

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
    where a real codec library plugs in)."""
    pil = _try_import_pil()
    if pil is None and not fake:
        raise NotImplementedError(
            "image decode requires Pillow (not in this container); "
            "pass fake=True for the deterministic stub"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, mt, payload in zip(pdf["asset_id"], pdf["media_type"], pdf["payload"]):
                if payload is None:
                    out.append((aid, mt, None, None, None, False))
                    continue
                if pil is not None and not mt.endswith("/fake"):
                    import io

                    try:
                        img = pil.open(io.BytesIO(payload))
                        w, h = img.size
                        ch = len(img.getbands())
                        out.append((aid, mt, w, h, ch, True))
                        continue
                    except Exception:  # noqa: BLE001 — undecodable payload is data, not a bug
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
