"""Multimodal payload plumbing: image resize, audio/video stubs.

Task brief: treat image/audio/video as opaque ``binary`` columns with
typed metadata; decode / feature-extract / resize / frame-sample as
pandas UDFs over ``mapInPandas``. The image path is fully real (the
deterministic codec decodes to pixels); audio/video decoders do not exist
in this container, so those decode steps are clearly-marked
``NotImplementedError`` stubs while the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested
(tests/test_multimodal.py).
"""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .codec import decode_px, encode_px

# Real audio/video decode routes through ffmpeg. The probe is recorded so
# error messages can say WHY the real path is unavailable, but the guard
# below keys on whether the decoder is IMPLEMENTED: until decode_audio /
# decode_video_frames contain a real implementation, use_fake_decoder=False
# must fail CLEANLY at plan build (driver-side NotImplementedError), never
# as an executor-side PythonException mid-job — even on hosts where the
# ffmpeg binary happens to exist.
FFMPEG_PATH = shutil.which("ffmpeg")
REAL_DECODERS_IMPLEMENTED = False  # flip when decode_* gain real bodies


# ---------------------------------------------------------------------------
# Image: real resize (box downsample) — the thumbnail/training-resize op.
# ---------------------------------------------------------------------------

def resize_tiles(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode → box-resample to (out_w, out_h) → re-encode lossless.

    Nearest-neighbor index sampling (pure numpy) — deterministic across
    executors, no interpolation-library variance (the pinned-libjpeg
    lesson, SURVEY.md §7.3).
    """
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("resized_bytes", BinaryType()),
            StructField("resized_w", IntegerType()),
            StructField("resized_h", IntegerType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            out, ws, hs = [], [], []
            for buf in pdf["bytes"]:
                px = decode_px(buf)
                h, w = px.shape[:2]
                yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                small = px[yi][:, xi]
                out.append(encode_px(small, "png"))
                ws.append(out_w)
                hs.append(out_h)
            pdf = pdf.copy()
            pdf["resized_bytes"] = out
            pdf["resized_w"] = pd.array(ws, dtype="int32")
            pdf["resized_h"] = pd.array(hs, dtype="int32")
            yield pdf

    return df.mapInPandas(gen, schema=schema)


# ---------------------------------------------------------------------------
# Audio / video: typed-metadata schema + stubbed decode.
# ---------------------------------------------------------------------------

AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("bytes", BinaryType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("codec", IntegerType()),  # enum id, not a string blob
    ]
)

VIDEO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("bytes", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("fps_milli", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("codec", IntegerType()),
    ]
)


def decode_audio(buf: bytes) -> np.ndarray:
    raise NotImplementedError(
        "audio decode requires libsndfile/ffmpeg — not present in this "
        "container; plug the real decoder in here. The Spark plumbing "
        "(schema, batching, feature UDF signature) is exercised with the "
        "deterministic fake below."
    )


def decode_video_frames(buf: bytes, every_n: int) -> np.ndarray:
    raise NotImplementedError(
        "video decode requires ffmpeg — not present in this container; "
        "plug the real frame sampler in here."
    )


def _fake_samples(media_id: int, n: int) -> np.ndarray:
    """Deterministic stand-in waveform so the feature-extraction pipeline
    is testable end-to-end without a codec library."""
    rng = np.random.Generator(np.random.Philox(int(media_id)))
    return rng.standard_normal(n).astype(np.float32)


def _fake_frames(media_id: int, n_frames: int, w: int, h: int,
                 every_n: int) -> np.ndarray:
    """Deterministic stand-in frame stack (every_n-th frame of an n_frames
    clip) so the frame-sampling pipeline is testable end-to-end without
    ffmpeg. Shape: (ceil(n_frames/every_n), h, w) uint8 luma."""
    idx = np.arange(0, n_frames, every_n)
    rng = np.random.Generator(np.random.Philox(int(media_id)))
    return rng.integers(0, 256, size=(len(idx), h, w), dtype=np.uint8)


def video_frame_features(
    df: DataFrame, every_n: int = 10, use_fake_decoder: bool = True
) -> DataFrame:
    """Frame-sampling pipeline: decode every ``every_n``-th frame, emit
    per-clip sampled-frame count + mean/std luma (the training-data
    "frame-sample" op). ``use_fake_decoder=False`` routes through
    ``decode_video_frames`` (raises until ffmpeg is plugged in).

    Batch shape: one Arrow batch in → same rows out + 3 columns; frames
    never leave the executor (only scalar features cross the wire), which
    is what keeps this viable at 10^12 clips.
    """
    if not use_fake_decoder and not REAL_DECODERS_IMPLEMENTED:
        raise NotImplementedError(
            "real video decode is not implemented (requires ffmpeg; "
            f"binary {'found' if FFMPEG_PATH else 'absent'} on this host) — "
            "plug the real sampler into decode_video_frames and flip "
            "REAL_DECODERS_IMPLEMENTED"
        )
    decoder_tag = "fake" if use_fake_decoder else "real"
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("n_sampled_frames", LongType()),
            StructField("mean_luma_milli", LongType()),
            StructField("std_luma_milli", LongType()),
            StructField("decoder", StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ns, mean_l, std_l = [], [], []
            for mid, nf, w, h in zip(
                pdf["media_id"], pdf["n_frames"], pdf["width"], pdf["height"]
            ):
                if use_fake_decoder:
                    frames = _fake_frames(int(mid), int(nf), int(w), int(h),
                                          every_n)
                else:  # pragma: no cover - requires ffmpeg
                    frames = decode_video_frames(b"", every_n)
                ns.append(frames.shape[0])
                # zero-length clips (or all frames skipped) must not poison
                # the batch: emit zeros, not NaN
                if frames.size == 0:
                    mean_l.append(0)
                    std_l.append(0)
                else:
                    mean_l.append(int(frames.mean() * 1000))
                    std_l.append(int(frames.std() * 1000))
            pdf = pdf.copy()
            pdf["n_sampled_frames"] = pd.array(ns, dtype="int64")
            pdf["mean_luma_milli"] = pd.array(mean_l, dtype="int64")
            pdf["std_luma_milli"] = pd.array(std_l, dtype="int64")
            pdf["decoder"] = decoder_tag
            yield pdf

    return df.mapInPandas(gen, schema=schema)


def audio_features(df: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """Per-clip features: RMS energy + zero-crossing count over the first
    second. ``use_fake_decoder=False`` routes through ``decode_audio``
    (raises until a real codec is plugged in)."""
    if not use_fake_decoder and not REAL_DECODERS_IMPLEMENTED:
        raise NotImplementedError(
            "real audio decode is not implemented (requires ffmpeg/"
            f"libsndfile; ffmpeg {'found' if FFMPEG_PATH else 'absent'} on "
            "this host) — plug the real decoder into decode_audio and flip "
            "REAL_DECODERS_IMPLEMENTED"
        )
    decoder_tag = "fake" if use_fake_decoder else "real"
    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("rms_milli", LongType()),
            StructField("zero_crossings", LongType()),
            StructField("decoder", StringType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rms, zc = [], []
            for mid, sr in zip(pdf["media_id"], pdf["sample_rate"]):
                if use_fake_decoder:
                    x = _fake_samples(int(mid), int(sr))
                else:  # pragma: no cover - requires real codec
                    x = decode_audio(b"")
                if x.size == 0:  # zero-rate/empty clip: zeros, not NaN
                    rms.append(0)
                    zc.append(0)
                else:
                    rms.append(int(np.sqrt(np.mean(x * x)) * 1000))
                    zc.append(int(np.sum(np.abs(np.diff(np.signbit(x))))))
            pdf = pdf.copy()
            pdf["rms_milli"] = pd.array(rms, dtype="int64")
            pdf["zero_crossings"] = pd.array(zc, dtype="int64")
            pdf["decoder"] = decoder_tag
            yield pdf

    return df.mapInPandas(gen, schema=schema)
