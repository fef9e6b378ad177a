"""Multimodal columns (SURVEY.md §2.12): image/audio/video as opaque
``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` operators.

The Spark-side plumbing (schemas, batch iteration, partitioning) is real
and tested; the actual codec calls are STUBBED — image/audio libraries are
not in this container. ``decode_stub=True`` routes to a deterministic
fake featureizer so the distributed path can be exercised end to end;
``decode_stub=False`` raises NotImplementedError where PIL/ffmpeg would
be invoked on a real deployment.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(no driver collect); ``repartition`` before the map keeps batches balanced
when payload sizes are skewed; metadata-only plans never touch the binary
column thanks to Parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

FEATURES_SCHEMA = (
    "media_id long, media_type string, n_bytes int, features array<double>"
)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoder+featureizer: md5-seeded values
    in [0, 1). Stable across runs/engines — usable in golden tests."""
    import hashlib

    out = []
    for i in range(dim):
        h = hashlib.md5(payload + i.to_bytes(2, "big")).digest()
        out.append(int.from_bytes(h[:8], "big") / 2**64)
    return out


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """payload -> fixed-dim feature vector via mapInPandas (Arrow batches).

    Real deployment: replace the stub branch with PIL/torchvision (image),
    torchaudio/ffmpeg (audio/video) decode + model inference per batch.
    """

    def _op(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries not in this container"
                )
            feats = [
                _fake_features(bytes(p)) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    cols = ["media_id", "payload", "media_type"]
    return media.select(*cols).mapInPandas(_op, schema=FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling PLUMBING: expands (media_id, duration_s) into
    one row per sampled timestamp with ``sequence`` (JVM-side); the decode
    of each frame is the stubbed step above. Demonstrates the explode
    pattern that keeps frame parallelism in Spark, not in the codec."""
    n = (F.col("duration_s") / every_s).cast("int")
    return (
        media.select("media_id", "media_type", "duration_s")
        .where(F.col("duration_s").isNotNull())
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n)))
        .withColumn("frame_ts_s", F.col("frame_idx") * every_s)
    )
