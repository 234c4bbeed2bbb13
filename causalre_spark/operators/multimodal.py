"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A large-scale training-data pipeline carries media alongside text; this
module provides the Spark-side plumbing — schema, partitioning,
Arrow-batched UDF signatures and batch shapes — with the actual codec
work STUBBED: the container has no image/audio libraries, so
``_decode_bytes`` produces a deterministic fake pixel/sample array from
the md5 stream of the payload (clearly marked; the PIL/ffmpeg path is
import-gated and raises NotImplementedError if reached without the
library). Everything around the stub — binary columns, metadata struct,
mapInPandas feature extraction, per-frame explode — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSETS_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, codec:string>"
)
FEATURES_SCHEMA = "asset_id long, kind string, feature array<float>"
FRAME_FEATURES_SCHEMA = "asset_id long, frame int, feature array<float>"

FEATURE_DIM = 16

try:  # pragma: no cover — production path; not in this container
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except Exception:  # pragma: no cover
    HAS_PIL = False


def _fake_payload(asset_id: int, kind: str, n: int = 256) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"asset:{kind}:{asset_id}:{i}".encode()).digest()
        i += 1
    return out[:n]


def synth_assets_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    """Deterministic fake asset table (pure function of asset_id)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                rows.append({
                    "asset_id": i,
                    "kind": kind,
                    "payload": _fake_payload(i, kind),
                    "meta": {"width": 64 + (i % 4) * 32 if kind == "image" else 0,
                             "height": 64 + (i % 3) * 32 if kind == "image" else 0,
                             "duration_ms": 1000 + (i % 10) * 500 if kind != "image" else 0,
                             "codec": {"image": "fakejpg", "audio": "fakepcm",
                                       "video": "fakeh264"}[kind]},
                })
            yield pd.DataFrame(rows)

    rng = spark.range(n)
    if partitions:
        rng = rng.repartition(partitions)
    return rng.mapInPandas(gen, schema=ASSETS_SCHEMA)


def _decode_bytes(payload: bytes, kind: str) -> np.ndarray:
    """STUB decoder. Real deployment: PIL / torchaudio / pyav decode here
    (import-gated above); in this container it derives a deterministic
    float array from the payload bytes so downstream plumbing is
    exercised with stable values."""
    if HAS_PIL and kind == "image":  # pragma: no cover — not in container
        raise NotImplementedError("real image decode path not wired in sandbox")
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return arr / 255.0 - 0.5


def _feature(arr: np.ndarray) -> list[float]:
    """Block mean/std pooling down to FEATURE_DIM floats (deterministic)."""
    blocks = np.array_split(arr, FEATURE_DIM // 2)
    feat: list[float] = []
    for b in blocks:
        feat.append(float(b.mean()) if b.size else 0.0)
        feat.append(float(b.std()) if b.size else 0.0)
    return feat[:FEATURE_DIM]


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction — one Arrow crossing, binary in,
    fixed-width float vector out (ANN/dedup-ready)."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _feature(_decode_bytes(bytes(p), k))
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].values,
                "kind": pdf["kind"].values,
                "feature": feats,
            })

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        udf, schema=FEATURES_SCHEMA)


BLOCK_STATS_SCHEMA = (
    "asset_id long, kind string, block long, byte_sum long, byte_sqsum long"
)


def block_byte_stats(assets: DataFrame, n_blocks: int = FEATURE_DIM // 2) -> DataFrame:
    """Per-asset, per-block integer byte statistics (sum, sum-of-squares).

    The driver-contract twin of :func:`extract_features`: the same
    binary-column -> Arrow -> NumPy plumbing, but the emitted feature is
    in exact integer basis (byte sums), so a DuckDB oracle can reproduce
    it bit-for-bit from the md5-deterministic stub payloads — no float
    rounding ties, no unhashable array columns (driver canonicalizer
    requirement). mean/std of the float feature are recoverable as
    byte_sum/n/255 - 0.5 and the usual sqsum identity."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "kind": [], "block": [], "byte_sum": [], "byte_sqsum": []}
            for aid, kind, p in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                arr = np.frombuffer(bytes(p), dtype=np.uint8).astype(np.int64)
                for b, blk in enumerate(np.array_split(arr, n_blocks)):
                    out["asset_id"].append(int(aid))
                    out["kind"].append(kind)
                    out["block"].append(b)
                    out["byte_sum"].append(int(blk.sum()))
                    out["byte_sqsum"].append(int((blk * blk).sum()))
            yield pd.DataFrame(out)

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        udf, schema=BLOCK_STATS_SCHEMA)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame sampling: per video, n_frames evenly spaced 'frames'
    (byte slices under the stub decoder) -> per-frame feature rows.
    Fan-out is bounded (n_frames per asset) and exploded INSIDE the UDF
    so only final rows cross Arrow."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame": [], "feature": []}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                step = max(1, len(raw) // n_frames)
                for fr in range(n_frames):
                    chunk = raw[fr * step: (fr + 1) * step]
                    if not chunk:
                        continue
                    out["asset_id"].append(int(aid))
                    out["frame"].append(fr)
                    out["feature"].append(_feature(_decode_bytes(chunk, "video")))
            yield pd.DataFrame(out)

    return assets.filter(F.col("kind") == "video").select(
        "asset_id", "payload").mapInPandas(udf, schema=FRAME_FEATURES_SCHEMA)


def resize_images(assets: DataFrame, target: int = 32) -> DataFrame:
    """Image resize stage (stub: deterministic byte downsampling; real
    path would be PIL resize). Returns the same asset schema with the
    payload replaced and meta width/height updated — demonstrating an
    in-place binary-column transform."""

    def udf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            new_payload = []
            new_meta = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                raw = bytes(p)
                stride = max(1, len(raw) // target)
                new_payload.append(raw[::stride][:target])
                m = dict(m)
                m["width"], m["height"] = target, target
                new_meta.append(m)
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].values,
                "kind": pdf["kind"].values,
                "payload": new_payload,
                "meta": new_meta,
            })

    return assets.filter(F.col("kind") == "image").mapInPandas(
        udf, schema=ASSETS_SCHEMA)
