"""Multimodal column support (north star operator family).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (no PIL/av in this image — marked clearly below); everything
Spark-side is real: schemas, batching, partitioning, UDF signatures.

Scale notes: binary payloads ride in the same parquet row group as their
metadata — filter/order pushdown happens on the metadata columns, and only
surviving rows' bytes are decoded. mapInPandas streams Arrow batches so a
10 MB image never materializes more than batch_size rows at once; at 100 TB
partition by content hash prefix so decode fan-out is even.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_bytes int, mean_byte double"
)


def _decode_image_stub(content: bytes) -> dict:
    """STUB: real decode needs PIL/libvips (absent from this image).
    Deterministic fake: byte statistics stand in for pixel statistics so
    the pipeline shape (schema, batching) is fully exercised and testable.
    Swap this function for a real decoder in production."""
    if content is None:
        raise NotImplementedError("no content to decode")
    n = len(content)
    return {
        "width": None,          # unknown without a real decoder
        "height": None,
        "n_bytes": n,
        "mean_byte": (sum(content) / n) if n else 0.0,
    }


def extract_image_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """decode → feature-extract stage over image rows; Arrow-batched,
    metadata filters pushed down before any bytes are touched."""
    images = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_image_stub(c) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "width", "height", "n_bytes", "mean_byte"]]

    return images.select("media_id", "content").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: emits (media_id, frame_ts_ms) rows from the
    metadata duration — the decode of actual frames is the same stub
    boundary as _decode_image_stub. Pure expression (sequence + explode):
    no Python for the scheduling math."""
    videos = media.filter(F.col("kind") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
