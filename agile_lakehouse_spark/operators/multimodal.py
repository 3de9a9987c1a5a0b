"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata (modality, mime,
width/height/duration), processed by Arrow-batched ``mapInPandas`` stages —
the one place Python is the right tool, because codecs are C libraries with
Python bindings, not SQL expressions.

The decode step itself is STUBBED (no image/audio libs in this container,
per the build brief): :func:`decode_stub` raises ``NotImplementedError``
when a real codec is requested, and :func:`extract_features` uses a
deterministic byte-level fake so the Spark-side plumbing — schema, batch
iteration, UDF signature, partition shape — is real and tested.

Scale notes: media bytes dominate row size, so ``mapInPandas`` batches are
capped by ``spark.sql.execution.arrow.maxRecordsPerBatch``; repartition by a
size-balanced key before heavy decode so one task doesn't get all the
4K videos.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("checksum", LongType(), False),  # deterministic byte fold
        StructField("head_byte", LongType(), True),
    ]
)


def decode_stub(payload: bytes, modality: str):
    """Real codec hook — not available in this environment."""
    raise NotImplementedError(
        f"no {modality} codec in this container; wire Pillow/librosa/pyav here"
    )


def as_media_table(df: DataFrame, id_col: str, payload_expr, modality: str = "image") -> DataFrame:
    """Lift any table into the media schema (payload as opaque binary)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(modality).alias("modality"),
        F.lit(f"application/x-{modality}").alias("mime"),
        payload_expr.cast("binary").alias("payload"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake decode (byte length / fold / head byte) standing in
    for "decode image -> embed"; swap the body for a real codec via
    :func:`decode_stub` without touching the Spark plumbing.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: 0 if b is None else sum(b) % 1_000_003
                    ).astype("int64"),
                    "head_byte": payloads.map(
                        lambda b: -1 if b is None or len(b) == 0 else b[0]
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize stage (1 row in -> 1 row out), Arrow-batched.

    The codec body is a STUB (deterministic byte subsampling stands in for
    Pillow's ``Image.resize``); the Spark plumbing — binary in/out schema,
    batch iteration, target-dims parameterization — is the real shape a
    production resize runs in.  Swap the body via :func:`decode_stub`.
    """
    n_out = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def fake_resize(b):
                if b is None or len(b) == 0:
                    return b
                # deterministic subsample to n_out bytes (STUB for decode->resize->encode)
                step = max(len(b) // n_out, 1)
                return bytes(b[::step][:n_out])

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(fake_resize),
                }
            )

    return media.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Video frame sampling (1 row in -> up to ``max_frames`` rows out).

    Demonstrates the row-expanding ``mapInPandas`` shape a real frame
    sampler (pyav keyframe iteration) uses: each output row is one frame
    payload with its index.  STUB codec: fixed-stride byte windows stand
    in for decoded frames.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None:
                    continue
                for k in range(min(max_frames, max(len(b) // every_n_bytes, 1))):
                    ids.append(mid)
                    idxs.append(k)
                    payloads.append(bytes(b[k * every_n_bytes : (k + 1) * every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "payload": payloads})

    return media.mapInPandas(_frames, schema=FRAME_SCHEMA)


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("energy", LongType(), False),  # integer sum-of-squares (exact)
    ]
)


def audio_frame_energy(media: DataFrame, frame_bytes: int = 128, hop_bytes: int = 64) -> DataFrame:
    """Audio frame analysis (1 row in -> N overlapping frames out) — the
    STFT windowing shape: frame width ``frame_bytes`` advancing by
    ``hop_bytes`` (50% overlap at the defaults), one output row per frame
    with its exact integer energy (sum of squared samples).

    STUB codec: payload bytes stand in for 8-bit PCM samples (a real
    pipeline decodes via librosa/soundfile in :func:`decode_stub` first);
    energy stays an INTEGER so results are bit-stable regardless of
    partitioning or batch boundaries.  Frames never cross payload rows,
    so the stage parallelizes per media row with no shuffle.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, energies = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None or len(b) == 0:
                    continue
                # one frame per hop start inside the payload — tail windows
                # shrink rather than drop, so every byte lands in a frame
                n_frames = (len(b) + hop_bytes - 1) // hop_bytes
                for k in range(n_frames):
                    chunk = b[k * hop_bytes : k * hop_bytes + frame_bytes]
                    if not chunk:
                        break
                    ids.append(mid)
                    idxs.append(k)
                    ns.append(len(chunk))
                    # center 8-bit samples at zero before squaring
                    energies.append(sum((s - 128) * (s - 128) for s in chunk))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "n_samples": ns, "energy": energies}
            )

    return media.mapInPandas(_frames, schema=AUDIO_FRAME_SCHEMA)
