"""Multimodal column plumbing: opaque binary payloads + typed metadata, with
decode / feature-extract / resize / frame-sample as Arrow-batched
`mapInPandas` stages.

Reference parity: the reference stores images as base64 strings in the same
row schema as text (`rag_search/vector_db.py:286,480`) and derives caption
columns from them via per-image model calls (F7/F8, `:547-596`). Here the
payload is a true `binary` column and every derivation is a columnar batch
UDF — the Spark-side contract (schema, batch shape, partitioning) is real
and tested; the actual pixel/audio decode is stubbed because image/audio
libraries are not in this container (clearly marked below).

Scale notes: binary payloads ride the same parquet row groups as their
metadata; `spark.sql.files.maxPartitionBytes` bounds task input so a task's
Arrow batches fit executor memory; decode stages are embarrassingly parallel
(no shuffle) and should run on the ingest pass, persisting derived features
so queries never re-decode.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata derived for any binary payload without decoding it.
BINARY_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("magic_hex", T.StringType()),
    ]
)

#: Schema a real image decoder would emit (width/height/channels/features).
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stand-in payload: utf-8 bytes of the text column as a `binary` column
    (the driver corpus has no real images). Real ingest replaces this with
    `spark.read.format('binaryFile')` content (see sources.binary_ingest)."""
    return df.select(
        F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("payload")
    )


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata over opaque bytes — JVM-side only (no decode):
    size, content hash, magic-number prefix."""
    return df.select(
        "doc_id",
        F.length(F.col(payload_col)).cast("bigint").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("payload_sha256"),
        F.hex(F.substring(F.col(payload_col), 1, 4)).alias("magic_hex"),
    )


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    feature_dim: int = 8,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Image decode + feature extraction as an Arrow-batched mapInPandas
    stage (the Spark shape of reference F3/F5/F7 image models,
    `rag_search/vector_db.py:473-527,547-563`).

    STUB: the real decoder (PIL/torchvision/ffmpeg) is not installed in this
    container. With ``deterministic_fake=True`` the stage emits
    deterministic pseudo-features derived from the payload bytes, so the
    pipeline (batching, schema, partitioning) is fully exercised; with
    ``deterministic_fake=False`` it raises NotImplementedError exactly where
    the decoder plugs in.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real image decode requires PIL/torchvision — plug the "
                    "decoder in here; this container ships no image libs"
                )
            out = {
                "doc_id": pdf[id_col],
                "width": [],
                "height": [],
                "channels": [],
                "features": [],
            }
            for payload in pdf[payload_col]:
                b = bytes(payload)
                digest = hashlib.sha256(b).digest()
                out["width"].append(64 + digest[0] % 192)
                out["height"].append(64 + digest[1] % 192)
                out["channels"].append(3)
                out["features"].append(
                    [float(digest[i] / 255.0) for i in range(feature_dim)]
                )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


CAPTION_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("caption", T.StringType()),
    ]
)


def caption_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Image → caption text derivation (reference F7 BLIP / F8 GPT-4o,
    `rag_search/vector_db.py:547-596`).

    DELIBERATE DIVERGENCE from the reference's retry semantics
    (`:312-340,394-414`: 3 attempts with a 1 s sleep, then the image row
    is kept with NO caption): here a failed caption lands in the
    quarantine column instead of being silently dropped, model-call
    retries belong INSIDE the UDF body (around the inference call), and
    Spark task retry is the outer layer — a sleep-loop per image in the
    driver thread does not survive contact with a 100 TB corpus.

    STUB: no vision model in this container. The fake caption is a
    deterministic function of the payload (size + content digest), so the
    derived-column dataflow — the same shape as real captioning, one
    batch-inference pass adding a text column that then flows into chunking
    /embedding like any text — is fully exercised and reproducible."""

    def caption(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real captioning requires a vision model (BLIP/GPT-4o) — "
                    "plug the batch-inference call in here"
                )
            out = {"doc_id": pdf[id_col], "caption": []}
            for payload in pdf[payload_col]:
                b = bytes(payload)
                d = hashlib.sha256(b).hexdigest()
                out["caption"].append(
                    f"this image shows content {d[:8]} of {len(b)} bytes"
                )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(caption, CAPTION_SCHEMA)


def frame_sample_plan(
    df: DataFrame, payload_col: str = "payload", *, every_n: int = 10
) -> DataFrame:
    """Video frame-sampling *plumbing*: one output row per sampled frame
    index, payload untouched (decode stub as above). Demonstrates the
    explode-based row multiplication pattern a real frame sampler uses;
    frame count here is a deterministic function of payload size."""
    n_frames = (F.length(F.col(payload_col)) % 100 + 1).cast("int")
    return df.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms_energy", T.DoubleType()),
        T.StructField("n_windows", T.IntegerType()),
    ]
)


def decode_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    window_ms: int = 1000,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Audio decode + signal features as an Arrow-batched mapInPandas
    stage — the audio twin of `decode_image_features` (duration,
    RMS energy, analysis-window count; a real pipeline adds MFCC/log-mel
    features through the same slot and they flow to embedding like any
    vector column).

    STUB: no audio codec (soundfile/librosa/ffmpeg) ships in this
    container. With ``deterministic_fake=True`` the payload bytes are
    treated as 8-bit PCM mono @ 16 kHz, so every derived number is an
    exact function of the bytes and the plumbing (batching, schema,
    windowing arithmetic) is fully exercised; ``deterministic_fake=False``
    raises NotImplementedError exactly where the decoder plugs in."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        rate = 16000
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real audio decode requires soundfile/librosa/ffmpeg — "
                    "plug the codec in here; this container ships no "
                    "audio libs"
                )
            out = {
                "doc_id": pdf[id_col],
                "sample_rate": [],
                "n_samples": [],
                "duration_ms": [],
                "rms_energy": [],
                "n_windows": [],
            }
            for payload in pdf[payload_col]:
                pcm = np.frombuffer(bytes(payload), dtype=np.uint8)
                centered = pcm.astype(np.float64) - 128.0
                n = int(pcm.size)
                dur_ms = n * 1000 // rate
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_ms"].append(dur_ms)
                out["rms_energy"].append(
                    round(float(np.sqrt((centered**2).mean())) if n else 0.0, 6)
                )
                out["n_windows"].append(-(-max(dur_ms, 1) // window_ms))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        decode, AUDIO_FEATURES_SCHEMA
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("target_w", T.IntegerType()),
        T.StructField("target_h", T.IntegerType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resized_sha", T.StringType()),
    ]
)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    *,
    target: tuple[int, int] = (224, 224),
    deterministic_fake: bool = True,
) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas stage — the
    preprocessing step every vision model ingest needs (the reference
    resizes implicitly inside its CLIP processors,
    `rag_search/vector_db.py:480,517`; at pipeline scale it is its own
    stage so the expensive decode+resample runs once, not per model).

    STUB (same contract as decode_image_features): no image libs in this
    container, so ``deterministic_fake=True`` emits the resized-artifact
    METADATA (target dims, deterministic synthetic output size + content
    digest derived from the payload), exercising batching/schema/
    partitioning; ``deterministic_fake=False`` raises NotImplementedError
    at the exact line PIL's ``Image.resize`` plugs in.
    """
    tw, th = target

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import struct

        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real resize requires PIL — plug Image.open(...)"
                    ".resize((tw, th)) in here"
                )
            out = {
                "doc_id": pdf[id_col],
                "target_w": [],
                "target_h": [],
                "resized_bytes": [],
                "resized_sha": [],
            }
            for payload in pdf[payload_col]:
                b = bytes(payload)
                # full 32-bit dims in the digest: a modulo-256 fold would
                # collide targets 256px apart, e.g. (224,224) vs (480,224)
                digest = hashlib.sha256(b + struct.pack(">II", tw, th))
                out["target_w"].append(tw)
                out["target_h"].append(th)
                # synthetic size model: 3 bytes/px before entropy coding
                out["resized_bytes"].append(tw * th * 3)
                out["resized_sha"].append(digest.hexdigest())
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(resize, RESIZE_SCHEMA)
