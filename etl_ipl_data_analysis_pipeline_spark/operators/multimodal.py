"""Multimodal columns (SURVEY.md §2.11 X5): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not in this
container — see ``decode_image``): the Spark-side plumbing — schema,
batching, partition sizing, UDF signatures — is real and tested with
deterministic fake decoders.

Scale notes: binary payloads dominate partition size; size partitions by
``spark.sql.files.maxPartitionBytes`` and repartition by a content-hash so a
handful of 4K videos doesn't skew one task. Metadata-only operations (group
by format, length histograms) never touch ``content`` thanks to Parquet
column pruning — keep metadata and payload in the same table but distinct
columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, path string, format string, n_bytes long, content binary"
)

FEATURE_SCHEMA = "media_id long, format string, n_bytes long, width int, height int, feature array<float>"


def attach_metadata(binary_df: DataFrame) -> DataFrame:
    """Wrap a binaryFile scan (path, modificationTime, length, content) into
    the engine's media schema; format sniffed from magic bytes, JVM-side."""
    head = F.hex(F.substring(F.col("content"), 1, 4))
    fmt = (
        F.when(head.startswith("89504E47"), "png")
        .when(head.startswith("FFD8"), "jpeg")
        .when(head.startswith("52494646"), "riff")  # wav/avi containers
        .when(head.startswith("664C6143"), "flac")
        .otherwise("unknown")
    )
    return binary_df.select(
        F.xxhash64("path").alias("media_id"),
        F.col("path"),
        fmt.alias("format"),
        F.col("length").alias("n_bytes"),
        F.col("content"),
    )


def decode_image(content: bytes) -> tuple[int, int, list[float]]:
    """Decode an image payload to (width, height, feature_vector).

    STUB: real decoding needs PIL/libvips/ffmpeg, absent from this
    container. Raise so callers must opt into the fake via
    ``extract_features(fake=True)``; the fake is deterministic on content
    bytes so tests are stable.
    """
    raise NotImplementedError(
        "image decode requires PIL/libvips — not available in this environment; "
        "use extract_features(df, fake=True) for plumbing tests"
    )


def _fake_decode(content: bytes, dim: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic stand-in: 'dimensions' and 'features' derived from
    content bytes — stable across runs/partitionings (crc32, not Python
    hash(), which is salted per process)."""
    import zlib

    h = zlib.crc32(bytes(content[:64])) & 0x7FFFFFFF
    width, height = 16 + h % 1024, 16 + (h >> 10) % 1024
    feat = [((h >> (i % 24)) & 0xFF) / 255.0 for i in range(dim)]
    return width, height, feat


def extract_features(media: DataFrame, fake: bool = False, dim: int = 8) -> DataFrame:
    """Decode + featurize media rows via Arrow-batched mapInPandas.

    The UDF processes whole Arrow batches (not rows); decode failures yield
    null features rather than failing the task, which is the only sane
    behavior on a 100 TB crawl with corrupt members.
    """
    import pandas as pd

    decoder = _fake_decode if fake else decode_image

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "format": pdf["format"],
                "n_bytes": pdf["n_bytes"],
                "width": [],
                "height": [],
                "feature": [],
            }
            for content in pdf["content"]:
                try:
                    w, h, feat = (
                        decoder(content, dim) if decoder is _fake_decode else decoder(content)
                    )
                    out["width"].append(w)
                    out["height"].append(h)
                    out["feature"].append(feat)
                except Exception:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["feature"].append(None)
            yield pd.DataFrame(out)

    return media.select("media_id", "format", "n_bytes", "content").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video payloads: fan each media row out to
    frame rows (media_id, frame_idx, frame binary). Real extraction needs
    ffmpeg (stubbed); the fake emits byte-slices so downstream shape is real."""
    import pandas as pd

    if not fake:
        raise NotImplementedError("video frame extraction requires ffmpeg — not in this environment")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                n = max(1, len(content) // (every_n * 64))
                for i in range(min(n, 8)):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame"].append(bytes(content[i * 64 : (i + 1) * 64]))
            yield pd.DataFrame(rows)

    return media.select("media_id", "content").mapInPandas(
        _frames, schema="media_id long, frame_idx int, frame binary"
    )
