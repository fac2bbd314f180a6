"""Multimodal columns: opaque binary payloads + typed metadata, with
decode / feature-extract / frame-sample stages as Arrow-batched
``mapInPandas`` pipelines.

Beyond the reference's surface (its content is text-only) — this is the
training-data-pipeline extension from the build brief: images/audio/
video ride through the engine as ``binary`` columns with a metadata
struct; the Spark-side plumbing (schema, batch iteration, partition
sizing) is real and tested, while the actual codec work is stubbed
behind ``DECODERS`` because no media libraries ship in this container.
Swap a real decoder in at the same seam (same signature) on a cluster
with codecs installed.

Scale notes: media rows are LARGE — the pipeline repartitions by
byte-size budget, not row count, and decode stages must run AFTER
filters/projections so only surviving rows pay decode cost.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id string, kind string, payload binary, "
                "mime string, width int, height int, duration_s double")


def fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: derives a tiny
    'pixel' array from the payload hash. Real impl: PIL/libvips —
    NotImplemented in this container."""
    h = hashlib.md5(payload or b"").digest()
    return np.frombuffer(h, dtype=np.uint8).reshape(4, 4).astype(np.float32)


DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {
    "image": fake_decode_image,
}


def decode_features(df: DataFrame, kind_col: str = "kind",
                    payload_col: str = "payload",
                    id_col: str = "media_id") -> DataFrame:
    """Decode + feature-extract stage: mapInPandas over (id, kind,
    payload) → (id, feature array<float>, n_bytes). Arrow batches keep
    the Python boundary amortized; unknown kinds raise (the stub
    contract) so bad rows fail loudly rather than silently skew."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for kind, payload in zip(pdf[kind_col], pdf[payload_col]):
                dec = DECODERS.get(kind)
                if dec is None:
                    raise NotImplementedError(
                        f"no decoder for kind={kind!r} in this container")
                payload = bytes(payload) if payload is not None else b""
                feats.append(dec(payload).mean(axis=0).tolist())
                sizes.append(len(payload))
            yield pd.DataFrame({
                id_col: pdf[id_col], "feature": feats, "n_bytes": sizes})

    out_schema = f"{id_col} string, feature array<float>, n_bytes long"
    return df.select(id_col, kind_col, payload_col).mapInPandas(gen, out_schema)


def sample_frames(df: DataFrame, every_s: float = 1.0,
                  id_col: str = "media_id") -> DataFrame:
    """Frame-sampling stage for video rows: expands each row into frame
    slots [0, duration) at ``every_s`` — the sampling schedule is pure
    SQL (sequence+explode); actual frame extraction would plug into
    decode_features per (media_id, frame_ts)."""
    n = F.greatest(F.floor(F.col("duration_s") / every_s), F.lit(0)).cast("int")
    return (df.filter(F.col("kind") == "video")
            .select(id_col, F.explode(
                F.transform(F.sequence(F.lit(0), n),
                            lambda i: i * F.lit(every_s))).alias("frame_ts")))


def size_budget_repartition(df: DataFrame, bytes_col_expr=None,
                            target_partition_bytes: int = 128 << 20) -> DataFrame:
    """Repartition media rows to a byte budget: rows are huge and skewed,
    so row-count partitioning under-uses or OOMs executors. One pass
    computes total bytes; partitions = ceil(total/target)."""
    size_col = bytes_col_expr if bytes_col_expr is not None \
        else F.length(F.col("payload"))
    total = df.agg(F.sum(size_col)).first()[0] or 0
    parts = max(1, int(-(-total // target_partition_bytes)))
    return df.repartition(parts)
