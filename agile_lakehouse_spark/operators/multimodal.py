"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata (modality, mime,
width/height/duration), processed by Arrow-batched ``mapInPandas`` stages —
the one place Python is the right tool, because codecs are byte-layout
parsers and C libraries with Python bindings, not SQL expressions.

REAL decode paths (``functions/codecs.py``, dependency-free): 24-bit BMP
and binary PPM images (:func:`image_stats`, ``resize_images(codec="bmp")``)
and RIFF/WAVE 16-bit PCM audio (:func:`audio_stats`,
``audio_frame_energy(codec="wav")``).  Compressed formats (PNG/JPEG/MP3/
H.264) stay behind :func:`decode_stub` — their codecs are C libraries
absent from this container — and :func:`extract_features` keeps the
byte-level generic path for arbitrary payloads.

Scale notes: media bytes dominate row size, so ``mapInPandas`` batches are
capped by ``spark.sql.execution.arrow.maxRecordsPerBatch``; repartition by a
size-balanced key before heavy decode so one task doesn't get all the
4K videos.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from agile_lakehouse_spark.functions import codecs
from agile_lakehouse_spark.operators.dedup import spread

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
    """Codec hook for formats whose decoders are NOT in this environment
    (JPEG/MP3/H.264 ... — C libraries).  BMP/PPM/PNG images and PCM WAV
    audio decode for real via ``functions/codecs.py`` (PNG included:
    zlib is stdlib, so its inflate + filter pipeline needs no C lib)."""
    raise NotImplementedError(
        f"no compressed-{modality} codec in this container; wire Pillow/librosa/pyav "
        "here (BMP/PPM/PNG/WAV decode natively via agile_lakehouse_spark.functions.codecs)"
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


# --- real-codec paths (BMP/PPM images, PCM WAV audio) ----------------------

IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("n_pixels", LongType(), False),
        StructField("sum_r", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_b", LongType(), False),
    ]
)

IMAGE_STATS_RGBA_SCHEMA = StructType(
    IMAGE_STATS_SCHEMA.fields + [StructField("sum_a", LongType(), False)]
)

AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("energy", LongType(), False),  # exact Σ s², int64
        StructField("max_abs", LongType(), False),
    ]
)


def synthesize_image_media(
    df: DataFrame,
    id_col: str = "doc_id",
    width: int = 8,
    height: int = 8,
    container: str = "bmp",
) -> DataFrame:
    """Media table with REAL image payloads (``container`` = "bmp",
    "ppm", "png", "png_pal", or "png_adam7" — png is COMPRESSED: zlib
    deflate + scanline filters; png_pal additionally exercises the
    color-type-3 PLTE path, png_adam7 the seven-pass interlaced layout)
    whose pixel bytes are a deterministic function of the row
    id: flat RGB byte j of image ``id`` is ``(id * 31 + j * 7) % 256``.

    The generation rule is pure integer arithmetic so a SQL oracle can
    recompute any decoded aggregate without ever seeing the container —
    which is exactly what makes encode -> decode verifiable end-to-end
    (dq25/dq142): a single byte misplaced by the codec (BMP row padding,
    BGR order, bottom-up rows; PPM header walk) changes the channel sums
    and fails the hash gate.
    """
    encoders = {
        "bmp": codecs.encode_bmp,
        "ppm": codecs.encode_ppm,
        "png": codecs.encode_png,
        # color-type-3 PNG via exact palettization (<=256-pixel fixtures
        # always fit a 256-entry PLTE): same decoded RGB, same oracle
        "png_pal": codecs.encode_png_indexed,
        # Adam7-interlaced truecolor PNG: same decoded RGB, same oracle
        "png_adam7": codecs.encode_png_interlaced,
        # color-type-6 RGBA PNG: byte j is channel j%4 — the alpha plane
        # is generated by the SAME integer rule, so an oracle can sum it
        "png_rgba": codecs.encode_png_rgba,
    }
    if container not in encoders:
        raise ValueError(f"container must be one of {sorted(encoders)}, got {container!r}")
    channels = 4 if container == "png_rgba" else 3
    n = width * height * channels
    enc = encoders[container]
    mime = "image/png" if container.startswith("png_") else f"image/{container}"

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        j = np.arange(n, dtype=np.int64)
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "modality": "image",
                    "mime": mime,
                    "payload": [
                        enc(((int(i) * 31 + j * 7) % 256).astype(np.uint8).reshape(height, width, channels))
                        for i in ids
                    ],
                }
            )

    base = df.select(F.col(id_col).cast("long").alias("media_id"))
    if container.startswith("png"):
        # spread BEFORE the Python stage for the COMPRESSED containers
        # only (round 13, guide §2.5 input skew): a single-file scan
        # arrives as ~1 partition, so the deflate+filter encode — and
        # every downstream decode stage, which inherits this
        # partitioning — ran on one core.  Measured: png_pal 1.86→1.1 s,
        # png_rgba 1.12→0.87 s at sf0.1.  Raw containers (bmp/ppm) stay
        # unspread: their encode is 5-10x cheaper than the extra
        # exchange + per-task Arrow overhead (measured +0.17 s on dq25).
        # Fan-out scales with the cluster (quarter of the cores, floor
        # 8) — at real scale the input is already wide and spread
        # no-ops; tasks shorter than ~100 ms just waste scheduler time.
        par = df.sparkSession.sparkContext.defaultParallelism
        base = spread(base, min_partitions=max(8, par // 4))
    return base.mapInPandas(_gen, schema=MEDIA_SCHEMA)


def synthesize_bmp_media(df: DataFrame, id_col: str = "doc_id", width: int = 8, height: int = 8) -> DataFrame:
    """BMP shorthand for :func:`synthesize_image_media` (dq25's fixture)."""
    return synthesize_image_media(df, id_col, width, height, "bmp")


def synthesize_wav_media(df: DataFrame, id_col: str = "doc_id", n_samples: int = 256, sample_rate: int = 16_000) -> DataFrame:
    """Media table with REAL PCM-16 WAV payloads: sample i of row ``id``
    is ``((id * 1103515245 + i * 12345) % 65536) - 32768`` — full int16
    range, oracle-replayable (see :func:`synthesize_bmp_media`)."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "modality": "audio",
                    "mime": "audio/wav",
                    "payload": [
                        codecs.encode_wav(
                            (((int(m) * 1103515245 + i * 12345) % 65536) - 32768).astype(np.int16),
                            sample_rate,
                        )
                        for m in ids
                    ],
                }
            )

    # raw PCM encode is byte plumbing (no compression): measured at
    # fixture scale the spread exchange costs more than it saves — see
    # synthesize_image_media's container-conditional rebalance
    base = df.select(F.col(id_col).cast("long").alias("media_id"))
    return base.mapInPandas(_gen, schema=MEDIA_SCHEMA)


def image_stats(media: DataFrame) -> DataFrame:
    """REAL image decode (BMP, PPM, or PNG — truecolor/grey/16-bit/
    palette — magic-sniffed) -> per-image exact integer channel sums.
    All values are integers, so the output is bit-stable under any
    partitioning and hashable by the oracle gate (dq25/dq142/dq172/
    dq172b)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, nps, rs, gs, bs = [], [], [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                arr = codecs.decode_image(bytes(payload))
                h, w, _ = arr.shape
                sums = arr.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                nps.append(h * w)
                rs.append(int(sums[0]))
                gs.append(int(sums[1]))
                bs.append(int(sums[2]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_pixels": pd.Series(nps, dtype="int64"),
                    "sum_r": pd.Series(rs, dtype="int64"),
                    "sum_g": pd.Series(gs, dtype="int64"),
                    "sum_b": pd.Series(bs, dtype="int64"),
                }
            )

    return media.mapInPandas(_stats, schema=IMAGE_STATS_SCHEMA)


def image_stats_rgba(media: DataFrame) -> DataFrame:
    """:func:`image_stats` with the ALPHA plane retained (round 8):
    per-image exact integer sums over all four channels via
    :func:`codecs.decode_image_rgba` — alpha-free containers contribute
    the constant 255*n_pixels, PNG alpha (RGBA / grey+alpha / tRNS) its
    decoded values.  Same bit-stable integer contract as image_stats
    (dq172d)."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, nps = [], [], [], []
            sums4: list[list[int]] = [[], [], [], []]
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                arr = codecs.decode_image_rgba(bytes(payload))
                h, w, _ = arr.shape
                s = arr.reshape(-1, 4).sum(axis=0, dtype=np.int64)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                nps.append(h * w)
                for c in range(4):
                    sums4[c].append(int(s[c]))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_pixels": pd.Series(nps, dtype="int64"),
                    "sum_r": pd.Series(sums4[0], dtype="int64"),
                    "sum_g": pd.Series(sums4[1], dtype="int64"),
                    "sum_b": pd.Series(sums4[2], dtype="int64"),
                    "sum_a": pd.Series(sums4[3], dtype="int64"),
                }
            )

    return media.mapInPandas(_stats, schema=IMAGE_STATS_RGBA_SCHEMA)


def audio_stats(media: DataFrame) -> DataFrame:
    """REAL WAV decode -> per-clip exact integer sample statistics:
    count, rate, energy (Σ s², int64 — 256k 16-bit samples max out far
    below overflow), peak magnitude."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, rates, energies, peaks = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                samples, rate = codecs.decode_wav(bytes(payload))
                s = samples.astype(np.int64)
                ids.append(mid)
                ns.append(len(s))
                rates.append(rate)
                energies.append(int((s * s).sum()))
                peaks.append(int(np.abs(s).max()) if len(s) else 0)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "sample_rate": pd.Series(rates, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                    "max_abs": pd.Series(peaks, dtype="int64"),
                }
            )

    return media.mapInPandas(_stats, schema=AUDIO_STATS_SCHEMA)


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


def resize_images(
    media: DataFrame, width: int = 64, height: int = 64, codec: str | None = None
) -> DataFrame:
    """Image resize stage (1 row in -> 1 row out), Arrow-batched.

    ``codec="bmp"`` is the REAL path: decode (BMP/PPM, magic-sniffed) ->
    nearest-neighbor resample (deterministic integer source indices
    ``src = dst * in_dim // out_dim`` — no float filtering, so output
    pixels are exact copies of input pixels) -> re-encode BMP.  The
    default (``codec=None``) keeps the byte-subsampling stub for opaque
    payloads whose real decoder isn't in this container.
    """
    n_out = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def real_resize(b):
                if b is None or len(b) == 0:
                    return b
                arr = codecs.decode_image(bytes(b))
                in_h, in_w, _ = arr.shape
                rows = (np.arange(height, dtype=np.int64) * in_h) // height
                cols = (np.arange(width, dtype=np.int64) * in_w) // width
                return codecs.encode_bmp(arr[rows][:, cols])

            def fake_resize(b):
                if b is None or len(b) == 0:
                    return b
                # deterministic subsample to n_out bytes (stand-in for opaque formats)
                step = max(len(b) // n_out, 1)
                return bytes(b[::step][:n_out])

            fn = real_resize if codec == "bmp" else fake_resize
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(fn),
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


def audio_frame_energy(
    media: DataFrame,
    frame_bytes: int = 128,
    hop_bytes: int = 64,
    codec: str | None = None,
) -> DataFrame:
    """Audio frame analysis (1 row in -> N overlapping frames out) — the
    STFT windowing shape: frame width ``frame_bytes`` advancing by
    ``hop_bytes`` (50% overlap at the defaults), one output row per frame
    with its exact integer energy (sum of squared samples).

    ``codec="wav"`` is the REAL path: RIFF/PCM-16 decode first, then the
    same windowing over int16 SAMPLES (``frame_bytes``/``hop_bytes`` are
    then counted in samples).  Default treats raw payload bytes as 8-bit
    PCM (zero-centered) for opaque formats.  Energy stays an INTEGER so
    results are bit-stable regardless of partitioning or batch
    boundaries; frames never cross payload rows, so the stage
    parallelizes per media row with no shuffle.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, energies = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                if b is None or len(b) == 0:
                    continue
                if codec == "wav":
                    samples, _ = codecs.decode_wav(bytes(b))
                    vals = samples.astype(np.int64)
                else:
                    # zero-centered 8-bit interpretation of raw bytes
                    vals = np.frombuffer(bytes(b), dtype=np.uint8).astype(np.int64) - 128
                if len(vals) == 0:
                    continue
                # one frame per hop start — tail windows shrink rather
                # than drop, so every sample lands in a frame
                n_frames = (len(vals) + hop_bytes - 1) // hop_bytes
                for k in range(n_frames):
                    chunk = vals[k * hop_bytes : k * hop_bytes + frame_bytes]
                    if len(chunk) == 0:
                        break
                    ids.append(mid)
                    idxs.append(k)
                    ns.append(len(chunk))
                    energies.append(int((chunk * chunk).sum()))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "n_samples": ns, "energy": energies}
            )

    return media.mapInPandas(_frames, schema=AUDIO_FRAME_SCHEMA)
