"""Multimodal columns: binary payloads + typed metadata (image/audio/video).

Training-data pipelines carry media as opaque ``binary`` columns next to
typed metadata, exactly like the pages table carries ``html: binary``.
The Spark-side plumbing here is real and tested — schemas, Arrow batch
shapes, partition-size control — while the actual codec calls are behind
:func:`_decode_image_stub` etc., since no media libraries exist in this
container. A deployment swaps the stub body for PIL/ffmpeg calls; nothing
else changes (the mapInPandas contract is identical).

Deterministic-fake mode lets tests exercise the full path: the "decoded"
image is a seeded-by-content numpy array, so feature extraction and
resizing produce stable, assertable outputs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, width int, height int, channels int, format string"
)
FEATURE_SCHEMA = "doc_id long, mean_luma double, edge_density double, phash long"


def _decode_image_stub(payload: bytes, fake: bool) -> np.ndarray:
    """Decode an encoded image to HxWxC uint8.

    Real deployments replace this body with ``PIL.Image.open``/libvips.
    ``fake=True`` derives a deterministic 32x32x3 array from the payload
    bytes so the downstream plumbing is fully testable here.
    """
    if not fake:
        raise NotImplementedError(
            "image codec not available in this environment; pass fake=True "
            "or deploy with PIL/libvips"
        )
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    rng = np.random.default_rng(int(h.sum()) + len(payload))
    return rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)


def image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", fake: bool = True
) -> DataFrame:
    """binary payload -> (mean luma, edge density, perceptual hash).

    mapInPandas over Arrow batches: each batch decodes its images into one
    numpy block, computes features vectorized, emits a compact frame. At
    scale, partition sizing matters more than the codec — cap input split
    bytes so one task's batch of decoded frames fits executor memory
    (e.g. 32 MB splits for ~4 MB JPEGs decoding 50x larger).
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            lumas = np.empty(len(pdf))
            edges = np.empty(len(pdf))
            phashes = np.empty(len(pdf), dtype=np.int64)
            for i, payload in enumerate(pdf[payload_col]):
                img = _decode_image_stub(bytes(payload), fake)
                luma = (
                    0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
                )
                lumas[i] = float(luma.mean())
                gx = np.abs(np.diff(luma, axis=1)).mean()
                gy = np.abs(np.diff(luma, axis=0)).mean()
                edges[i] = float(gx + gy)
                small = luma[::4, ::4]  # 8x8 average-hash
                bits = (small > small.mean()).ravel()[:64]
                phashes[i] = int(
                    np.packbits(bits).view(">u8")[0].astype(np.int64)
                    if len(bits) == 64
                    else 0
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "mean_luma": np.round(lumas, 6),
                    "edge_density": np.round(edges, 6),
                    "phash": phashes,
                }
            )

    return df.mapInPandas(_feat, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    size: tuple[int, int] = (16, 16),
    fake: bool = True,
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode as raw RGB bytes.

    Output: (doc_id, width, height, channels, pixels binary). The resize
    itself is pure numpy striding (real for any decoded array); only the
    codec boundary is stubbed. Raw-RGB output keeps downstream feature
    UDFs codec-free.
    """
    h_out, w_out = size

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for _, row in pdf.iterrows():
                img = _decode_image_stub(bytes(row[payload_col]), fake)
                ys = (np.arange(h_out) * img.shape[0] // h_out).astype(int)
                xs = (np.arange(w_out) * img.shape[1] // w_out).astype(int)
                small = img[np.ix_(ys, xs)]
                ids.append(row[id_col])
                blobs.append(small.tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": w_out,
                    "height": h_out,
                    "channels": 3,
                    "pixels": blobs,
                }
            )

    return df.mapInPandas(
        _resize, "doc_id long, width int, height int, channels int, pixels binary"
    )


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
    fake: bool = True,
) -> DataFrame:
    """Video -> sampled frames as (<id_col>, frame_idx, frame binary) —
    the id column keeps its caller-given name and type.

    The fake path treats the payload as a concatenation of 1 KB "frames";
    real deployments swap in an ffmpeg demuxer. Output explodes rows, so
    repartition by a hash of the id downstream if frame counts are skewed.
    """
    id_type = df.schema[id_col].dataType.simpleString()

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col])
                if not fake:
                    raise NotImplementedError("video demuxer not available; use fake=True")
                n_frames = max(len(payload) // 1024, 1)
                for fi in range(0, n_frames, every_n):
                    out_id.append(row[id_col])
                    out_idx.append(fi)
                    out_frame.append(payload[fi * 1024 : (fi + 1) * 1024])
            yield pd.DataFrame(
                {id_col: out_id, "frame_idx": out_idx, "frame": out_frame}
            )

    return df.mapInPandas(
        _frames, f"{id_col} {id_type}, frame_idx int, frame binary"
    )


def sniff_format(payload) -> F.Column:
    """Container format from magic bytes — pure Column expr (no codec, no
    UDF, real logic): jpeg/png/gif/webp/wav/mp3/mp4/unknown.

    Works on binary columns JVM-side via hex prefixes; at scale this is a
    metadata pass that never decodes a payload.
    """
    hx = F.hex(F.substring(payload, 1, 12))
    return (
        F.when(hx.startswith("FFD8FF"), F.lit("jpeg"))
        .when(hx.startswith("89504E47"), F.lit("png"))
        .when(hx.startswith("47494638"), F.lit("gif"))
        .when(
            hx.startswith("52494646") & (F.substring(hx, 17, 8) == "57454250"),
            F.lit("webp"),  # RIFF....WEBP
        )
        .when(
            hx.startswith("52494646") & (F.substring(hx, 17, 8) == "57415645"),
            F.lit("wav"),  # RIFF....WAVE
        )
        .when(hx.startswith("494433") | hx.startswith("FFFB"), F.lit("mp3"))
        .when(F.substring(hx, 9, 8) == "66747970", F.lit("mp4"))  # ....ftyp
        .otherwise(F.lit("unknown"))
    )


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, duration_s double, rms double, "
    "zero_cross_rate double, spectral_centroid double"
)


def _decode_audio_stub(payload: bytes, fake: bool, sr: int = 8000) -> np.ndarray:
    """Decode an audio payload to mono float32 PCM at ``sr`` Hz.

    Real deployments replace the body with ffmpeg/soundfile. ``fake=True``
    derives a deterministic 1-second signal from the payload bytes
    (content-seeded mix of two tones + noise) so the DSP below is
    testable.
    """
    if not fake:
        raise NotImplementedError(
            "audio codec not available in this environment; pass fake=True "
            "or deploy with ffmpeg/soundfile"
        )
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    rng = np.random.default_rng(int(h.sum()) + len(payload))
    t = np.arange(sr, dtype=np.float32) / sr
    f1, f2 = rng.uniform(100, 1000), rng.uniform(1000, 3500)
    sig = (
        np.sin(2 * np.pi * f1 * t)
        + 0.5 * np.sin(2 * np.pi * f2 * t)
        + 0.1 * rng.standard_normal(sr)
    )
    return sig.astype(np.float32)


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
    sr: int = 8000,
) -> DataFrame:
    """binary audio -> (duration, rms, zero-crossing rate, spectral
    centroid).

    Decode is per-payload (the codec boundary); all DSP is one vectorized
    numpy pass over the stacked batch: same shape as image_features, so
    the 100 TB story is identical — Arrow batches in, compact features
    out, partition bytes capped upstream.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = np.stack(
                [
                    _decode_audio_stub(bytes(p), fake, sr)
                    for p in pdf[payload_col]
                ]
            )  # (n, sr) — batch-stacked, DSP below is one pass
            rms = np.sqrt((sigs**2).mean(axis=1))
            zcr = (np.diff(np.signbit(sigs), axis=1) != 0).mean(axis=1)
            spec = np.abs(np.fft.rfft(sigs, axis=1))
            freqs = np.fft.rfftfreq(sigs.shape[1], d=1.0 / sr)
            centroid = (spec * freqs).sum(axis=1) / np.maximum(
                spec.sum(axis=1), 1e-12
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "duration_s": np.round(
                        np.full(len(pdf), sigs.shape[1] / sr), 6
                    ),
                    "rms": np.round(rms, 6),
                    "zero_cross_rate": np.round(zcr, 6),
                    "spectral_centroid": np.round(centroid, 6),
                }
            )

    return df.mapInPandas(_feat, AUDIO_FEATURE_SCHEMA)


def synth_media(df: DataFrame, id_col: str = "doc_id", size: int = 4096) -> DataFrame:
    """Deterministic binary payload per id (test fixture for the stubs):
    repeated md5 bytes of the id — pure Column ops, no Python."""
    seed = F.md5(F.col(id_col).cast("string"))
    repeated = F.repeat(seed, size // 32 + 1)
    return df.withColumn(
        "payload", F.to_binary(F.substring(repeated, 1, size // 4), F.lit("hex"))
    )
