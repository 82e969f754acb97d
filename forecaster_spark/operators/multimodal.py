"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing — schemas, partitioning, kernel signatures, batch
shapes — is real and tested; the actual media decode is STUBBED because no
image/audio library ships in this container:

- ``decode="strict"`` raises ``NotImplementedError`` (the seam where
  PIL/librosa/pyav would plug in);
- ``decode="fake"`` derives deterministic pseudo-features from the payload
  bytes (seeded by content hash) so downstream plumbing, tests, and plans
  can run end to end.

Scale notes: payloads stay columnar (Parquet binary) and are only
materialized inside the kernel batch; feature extraction is
embarrassingly parallel, so the operator repartitions by asset hash —
uniform, no skew. ``maxRecordsPerBatch`` bounds Arrow batch memory when
payloads are large.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("mime", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = (
    "asset_id string, mime string, n_bytes long, width int, height int, "
    "n_frames int, mean_luma double, feature array<float>"
)


def synth_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic asset table (payload bytes derived from the
    id — no RNG state, partition-invariant)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=32).digest()
                mime = ["image/png", "audio/wav", "video/mp4"][i % 3]
                payload = (h * (8 + i % 17))[: 64 + (i % 512)]
                rows.append(
                    (
                        f"asset-{i:08d}",
                        mime,
                        payload,
                        {"w": str(16 + i % 64), "h": str(16 + (i * 7) % 64), "frames": str(1 + i % 24)},
                    )
                )
            yield pd.DataFrame(rows, columns=["asset_id", "mime", "payload", "meta"])

    return spark.range(n).mapInPandas(gen, schema=ASSET_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    h = hashlib.blake2b(payload, digest_size=8).digest()
    rng = np.random.default_rng(int.from_bytes(h, "big"))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(df: DataFrame, decode: str = "fake", dim: int = 16) -> DataFrame:
    """Decode/feature-extract kernel. Batch shape: one Arrow record batch of
    (asset_id, mime, payload, meta) in → one batch of typed features out.
    Real decoders slot into the ``strict`` branch per mime type."""

    def kernel(batches):
        for pdf in batches:
            if decode == "strict":
                raise NotImplementedError(
                    "media decode requires PIL/librosa/pyav — not in this container; "
                    "use decode='fake' for deterministic plumbing features"
                )
            metas = pdf["meta"]
            payloads = pdf["payload"]
            feats = [_fake_features(p, dim) for p in payloads]
            luma = [float(np.frombuffer(p[:32].ljust(32, b"\0"), dtype=np.uint8).mean()) for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": metas.map(lambda m: int(m.get("w", 0))).astype("int32"),
                    "height": metas.map(lambda m: int(m.get("h", 0))).astype("int32"),
                    "n_frames": metas.map(lambda m: int(m.get("frames", 1))).astype("int32"),
                    "mean_luma": luma,
                    "feature": feats,
                }
            )

    # uniform repartition by asset hash: payload sizes vary, ids don't skew
    return df.repartition(F.crc32(F.col("asset_id"))).mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Video frame sampling plan: explode per-frame rows (frame indices from
    metadata), keeping every ``every_n``-th frame. The decode of the frame
    itself stays behind the extract_features seam."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1)
    sampled = F.filter(frames, lambda i: i % every_n == 0)
    return (
        df.where(F.col("mime") == "video/mp4")
        .withColumn("n_frames", F.element_at(F.col("meta"), "frames").cast("int"))
        .select("asset_id", F.explode(sampled).alias("frame_idx"))
    )
