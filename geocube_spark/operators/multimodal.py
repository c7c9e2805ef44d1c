"""Multimodal (image/audio/video) column plumbing.

Media assets are opaque ``binary`` columns with a typed metadata struct —
the same pattern as the tile table's pixel payloads.  Decode/resize/frame-
sample kernels run as Arrow-batched ``mapInPandas`` so each task streams
batches without materializing a partition; the actual codec step is STUBBED
(no image/audio libs in this container) behind ``set_decoder`` with a
deterministic fake, while every Spark-side concern — schema, batch shape,
partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("meta", StructType(
            [
                StructField("width", IntegerType(), True),
                StructField("height", IntegerType(), True),
                StructField("channels", IntegerType(), True),
                StructField("sample_rate", IntegerType(), True),
                StructField("duration_ms", IntegerType(), True),
                StructField("codec", StringType(), True),
            ]
        ), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),
        StructField("feature", ArrayType(DoubleType()), False),
        StructField("payload_sha1", StringType(), False),
    ]
)


def _fake_decode(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in for a real codec: payload bytes -> pseudo pixel
    array seeded by the payload hash.  Replace via ``set_decoder`` when a
    real library (PIL/ffmpeg) is available."""
    h = int.from_bytes(hashlib.sha1(payload).digest()[:8], "big")
    rng = np.random.RandomState(h % (2**32))
    w = int(meta.get("width") or 16)
    hgt = int(meta.get("height") or 16)
    c = int(meta.get("channels") or 3)
    return rng.randint(0, 256, size=(hgt, w, c)).astype(np.float64)


def jpeg_decoder(payload: bytes, meta: dict) -> np.ndarray:
    """REAL image decoder for JPEG payloads, backed by the repo's own
    baseline codec (sources/jpeg.py — the one the TIFF compression-7 path
    uses).  Returns (h, w) or (h, w, 3) float64 pixels; 3-component
    streams are taken as JFIF YCbCr and converted to RGB."""
    from geocube_spark.sources.jpeg import decode_jpeg, ycbcr_to_rgb

    arr = decode_jpeg(payload)
    if arr.ndim == 3 and arr.shape[-1] == 3:
        arr = ycbcr_to_rgb(arr)
    return arr.astype(np.float64)


def _default_decode(payload: bytes, meta: dict) -> np.ndarray:
    """Route on content: real JPEG bytes decode for real (SOI magic or
    ``meta.codec == 'jpeg'``); anything else falls back to the
    deterministic fake so non-JPEG fixtures stay testable without PIL."""
    if payload[:2] == b"\xff\xd8" or (meta or {}).get("codec") == "jpeg":
        return jpeg_decoder(payload, meta)
    return _fake_decode(payload, meta)


_DECODER: Callable[[bytes, dict], np.ndarray] = _default_decode


def set_decoder(fn: Callable[[bytes, dict], np.ndarray]) -> None:
    """Install an external decoder (e.g. PIL-based).  The default routes
    JPEG payloads through the in-repo codec and everything else through
    the deterministic fake."""
    global _DECODER
    _DECODER = fn


def real_decoder_stub(payload: bytes, meta: dict) -> np.ndarray:
    """Where a broader implementation would go — PIL.Image.open /
    soundfile / pyav frame sampling.  Only JPEG has an in-repo codec;
    other formats are not available in this environment."""
    raise NotImplementedError(
        "non-JPEG media codecs are not installed in this container"
    )


def extract_features(media: DataFrame, pool: int = 4) -> DataFrame:
    """Decode + pooled-feature extraction via mapInPandas.

    Output feature = ``pool``×``pool``-mean-pooled grayscale grid (image) or
    windowed energy (audio) — cheap, deterministic, and shaped exactly like a
    real embedding extractor's output.  Arrow batches stream through each
    task; nothing driver-side.
    """

    # capture the installed decoder NOW: the closure ships to worker
    # processes via cloudpickle, whereas the module global would be
    # re-imported there and silently revert to the fake
    decoder = _DECODER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-wise zip, not iterrows: no per-row Series construction
            # — only the codec call itself is inherently per-row
            feats, sha1s = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                payload = bytes(payload)
                arr = decoder(payload, dict(meta) if meta is not None else {})
                feats.append(_pooled_feature(arr, pool))
                sha1s.append(hashlib.sha1(payload).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "feature": feats,
                    "payload_sha1": sha1s,
                },
                columns=[f.name for f in FEATURE_SCHEMA.fields],
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def _pooled_feature(arr: np.ndarray, pool: int) -> list[float]:
    """pool×pool mean-pooled grayscale grid; one vectorized reshape-mean
    when the image divides evenly (the common case), per-block views
    otherwise — identical values either way."""
    gray = arr.mean(axis=2) if arr.ndim == 3 else arr
    h, w = gray.shape
    ph, pw = max(h // pool, 1), max(w // pool, 1)
    if h == ph * pool and w == pw * pool:
        return (
            gray.reshape(pool, ph, pool, pw).mean(axis=(1, 3)).ravel().tolist()
        )
    return [
        float(gray[i * ph : (i + 1) * ph, j * pw : (j + 1) * pw].mean())
        for i in range(pool)
        for j in range(pool)
    ]


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: nearest-neighbor index remap on the decoded array —
    the same affine-index pattern the raster regrid (R2) uses."""
    out_schema = StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("px", ArrayType(DoubleType()), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )

    decoder = _DECODER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pxs = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                arr = decoder(
                    bytes(payload), dict(meta) if meta is not None else {}
                )
                gray = arr.mean(axis=2) if arr.ndim == 3 else arr
                sh, sw = gray.shape
                yi = (np.arange(height) * sh // height).clip(0, sh - 1)
                xi = (np.arange(width) * sw // width).clip(0, sw - 1)
                pxs.append(gray[np.ix_(yi, xi)].ravel().tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "px": pxs,
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                },
                columns=[f.name for f in out_schema.fields],
            )

    return media.mapInPandas(run, out_schema)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("t_ms", IntegerType(), False),
        StructField("feature", ArrayType(DoubleType()), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000, pool: int = 4) -> DataFrame:
    """Video frame sampling: one row per sampled frame at a fixed stride.

    The frame count comes from ``meta.duration_ms`` (ceil(duration/stride),
    at least 1); each frame is decoded independently — the fake decoder
    seeds on (payload, frame index) so frames differ deterministically, and
    a real pyav/ffmpeg decoder would seek to ``t_ms`` in its place.  Output
    rows fan out per frame INSIDE the Arrow batch (mapInPandas may return
    more rows than it received), so a 2-hour video never materializes as
    one driver-side list — each task streams its own frames.
    """

    decoder = _DECODER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            vids = pdf[pdf["kind"] == "video"]
            for mid, payload, meta in zip(
                vids["media_id"], vids["payload"], vids["meta"]
            ):
                payload = bytes(payload)
                meta = dict(meta) if meta is not None else {}
                duration = int(meta.get("duration_ms") or 0)
                n_frames = max(1, -(-duration // every_ms)) if duration else 1
                for i in range(n_frames):
                    frame = decoder(payload + i.to_bytes(4, "big"), meta)
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "t_ms": i * every_ms,
                            "feature": _pooled_feature(frame, pool),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(run, FRAME_SCHEMA)


def media_dedup_exact(media: DataFrame) -> DataFrame:
    """Exact media dedup by payload hash — JVM-side sha1 over the binary
    column, no decode needed."""
    return (
        media.select("media_id", F.sha1(F.col("payload")).alias("payload_sha1"))
        .groupBy("payload_sha1")
        .agg(F.count(F.lit(1)).alias("n"), F.sort_array(F.collect_list("media_id")).alias("media_ids"))
        .filter(F.col("n") > 1)
    )


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("phash", StringType(), False),
    ]
)


def perceptual_hash(media: DataFrame, method: str = "dhash") -> DataFrame:
    """Perceptual image hash per media row (public aHash/dHash schemes):
    decode -> grayscale -> nearest-resize to the hash grid -> 64 bits as
    16 hex chars.

    * ``ahash``: 8x8 mean threshold (each bit = pixel >= grid mean)
    * ``dhash``: 9x8 horizontal gradient (each bit = px[x] < px[x+1]) —
      more robust to global brightness shifts

    Re-encodes of the same image (JPEG quality changes, resizes) map to
    equal or near-equal hashes, so exact groupBy catches re-encoded
    duplicates and the 64-bit hamming near-dup machinery (the SimHash
    rotated-prefix tables in operators/dedup.py) extends it to
    perturbation-tolerant matching at corpus scale.
    """
    if method not in ("ahash", "dhash"):
        raise ValueError("method must be 'ahash' or 'dhash'")
    decoder = _DECODER

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                arr = decoder(
                    bytes(payload), dict(meta) if meta is not None else {}
                )
                gray = arr.mean(axis=2) if arr.ndim == 3 else arr
                sh, sw = gray.shape
                gw = 9 if method == "dhash" else 8
                yi = (np.arange(8) * sh // 8).clip(0, sh - 1)
                xi = (np.arange(gw) * sw // gw).clip(0, sw - 1)
                g = gray[np.ix_(yi, xi)]
                if method == "dhash":
                    bits = (g[:, :-1] < g[:, 1:]).ravel()
                else:
                    bits = (g >= g.mean()).ravel()
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                hashes.append(f"{val:016x}")
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].to_numpy(), "phash": hashes},
                columns=["media_id", "phash"],
            )

    return media.mapInPandas(run, PHASH_SCHEMA)


def media_near_duplicates(media: DataFrame, method: str = "dhash") -> DataFrame:
    """Exact perceptual-dup groups: media rows whose perceptual hash
    collides (re-encoded/re-compressed copies of the same image)."""
    return (
        perceptual_hash(media, method)
        .groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sort_array(F.collect_list("media_id")).alias("media_ids"),
        )
        .filter(F.col("n") > 1)
    )
