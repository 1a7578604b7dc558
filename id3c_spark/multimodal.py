"""Multimodal column support (north star operator family).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. PNG decodes FOR REAL (stdlib zlib
inflate + scanline unfilter — decode_png below); other formats keep an
honestly-marked byte-statistics stub (no PIL/av in this image).
Everything Spark-side is real: schemas, batching, partitioning, UDF
signatures.

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


_PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type → channels


def _png_pixels(content: bytes) -> tuple[int, int, int, bytearray | None]:
    """Chunk-parse + inflate + unfilter a PNG (stdlib only, per the spec).
    Returns (width, height, channels, pixel bytes) — palette images come
    back dereferenced to RGB; unsupported encodings return pixels=None with
    real dimensions."""
    import struct
    import zlib

    if not content.startswith(_PNG_SIGNATURE):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIGNATURE)
    width = height = None
    bit_depth = color_type = None
    palette = b""
    idat = bytearray()
    while pos + 8 <= len(content):
        (length,), ctype = struct.unpack(">I", content[pos:pos + 4]), content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS:
        # header-only metadata for exotic encodings — still real dimensions
        return int(width), int(height), 0, None

    channels = _PNG_CHANNELS[color_type]
    bpp = channels  # bytes per pixel at depth 8
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:    # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out.extend(line)
        prev = line

    if color_type == 3 and palette:
        # dereference palette indexes → RGB bytes
        rgb = bytearray()
        for idx in out:
            rgb.extend(palette[idx * 3:idx * 3 + 3])
        out = rgb
        channels = 3
    return int(width), int(height), channels, out


def decode_png(content: bytes) -> dict:
    """Real PNG decode with the stdlib only: returns width, height and the
    mean decoded pixel-channel value. Supports 8-bit depth, color types
    0/2/3/4/6 (palette entries dereferenced through PLTE for the mean)."""
    width, height, _channels, out = _png_pixels(content)
    if out is None:
        return {"width": width, "height": height, "mean": None}
    mean = (sum(out) / len(out)) if out else 0.0
    return {"width": width, "height": height, "mean": mean}


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal stdlib PNG encoder: 8-bit gray/gray+alpha/RGB/RGBA, filter
    type 0 scanlines, single IDAT."""
    import struct
    import zlib

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    stride = width * channels
    raw = b"".join(
        b"\x00" + bytes(pixels[y * stride:(y + 1) * stride]) for y in range(height)
    )
    return (
        _PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_png(content: bytes, max_width: int, max_height: int) -> bytes:
    """Nearest-neighbor downscale preserving aspect ratio, re-encoded as
    PNG. Images already within bounds pass through byte-identical."""
    width, height, channels, pixels = _png_pixels(content)
    if pixels is None:
        raise ValueError("unsupported PNG encoding for resize")
    if width <= max_width and height <= max_height:
        return content
    scale = min(max_width / width, max_height / height)
    new_w = max(1, int(width * scale))
    new_h = max(1, int(height * scale))
    out = bytearray()
    for y in range(new_h):
        sy = min(height - 1, int(y / scale))
        row_off = sy * width * channels
        for x in range(new_w):
            sx = min(width - 1, int(x / scale))
            off = row_off + sx * channels
            out.extend(pixels[off:off + channels])
    return encode_png(new_w, new_h, channels, bytes(out))


def _decode_image(content: bytes) -> dict:
    """PNG decodes for real (decode_png, stdlib zlib); other formats keep
    the STUB byte-statistics path — JPEG/WebP need libs absent from this
    image. Swap the fallback for PIL/libvips in production; the Spark-side
    plumbing (schema, batching, pushdown) is identical either way."""
    if content is None:
        raise NotImplementedError("no content to decode")
    n = len(content)
    if content.startswith(_PNG_SIGNATURE):
        png = decode_png(content)
        return {
            "width": png["width"],
            "height": png["height"],
            "n_bytes": n,
            "mean_byte": png["mean"] if png["mean"] is not None else ((sum(content) / n) if n else 0.0),
        }
    return {
        "width": None,          # unknown without a real decoder for this format
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
            feats = [_decode_image(c) for c in pdf["content"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "width", "height", "n_bytes", "mean_byte"]]

    return images.select("media_id", "content").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_width: int, max_height: int) -> DataFrame:
    """Resize stage over image rows: PNGs downscale for real (nearest-
    neighbor + stdlib re-encode); other formats pass through untouched
    (their decoders are the same stub boundary as _decode_image). Arrow-
    batched; non-image rows never enter the Python stage."""
    images = media.filter(F.col("kind") == "image")
    others = media.filter(F.col("kind") != "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for content in pdf["content"]:
                if content is not None and bytes(content[:8]) == _PNG_SIGNATURE:
                    out.append(resize_png(bytes(content), max_width, max_height))
                else:
                    out.append(content)
            yield pdf.assign(content=out)

    resized = images.mapInPandas(run, media.schema)
    return resized.unionByName(others)


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
