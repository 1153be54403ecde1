"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — binary schema, Arrow-batched
mapInPandas, deterministic partitioning; the actual media decoding is
stubbed (no image/audio libraries in this container) behind
``decode_image``/``fake_decode_image``: NotImplementedError for the real
path, a deterministic fake for tests.

Pattern at 100 TB: binaries live in parquet (or object-store paths in a
string column); decode/feature-extract runs as ``mapInPandas`` so each
Arrow batch crosses the JVM↔Python boundary once, not per row; outputs are
typed columns that downstream relational operators consume normally.
"""

from __future__ import annotations

from collections.abc import Iterator, Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = "id bigint, n_bytes bigint, content_md5 string"
IMAGE_FEATURE_SCHEMA = (
    "id bigint, width int, height int, n_frames int, mean_luma double"
)


def with_binary_column(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Manufacture an opaque binary payload column from a string column
    (UTF-8 bytes) — the fixture stand-in for real media bytes."""
    return df.select(
        F.col(id_col).alias("id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_binary_metadata(df: DataFrame, id_col: str = "id", bin_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads: byte size +
    content hash. One Python hop per batch; schema declared up front."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": pdf[bin_col].map(len).astype("int64"),
                    "content_md5": pdf[bin_col].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.mapInPandas(fn, MEDIA_META_SCHEMA)


def decode_image(payload: bytes) -> dict:
    """Real image decode — requires an imaging library not present in this
    container. The mapInPandas plumbing around it is real; swap this
    function for PIL/OpenCV in production."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. PIL); "
        "use fake_decode_image for deterministic tests"
    )


def fake_decode_image(payload: bytes) -> dict:
    """Deterministic stand-in decode: derives plausible image properties
    from the bytes alone. Same signature/shape as the real decoder."""
    n = len(payload)
    return {
        "width": 64 + (n % 512),
        "height": 64 + ((n * 31) % 512),
        "n_frames": 1,
        "mean_luma": round((sum(payload[:64]) % 2551) / 10.0, 1) if n else 0.0,
    }


def extract_image_features(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    decoder: Callable[[bytes], dict] = fake_decode_image,
) -> DataFrame:
    """Decode + feature-extract as an Arrow-batched pipeline stage. The
    ``decoder`` is injected so the stub/real swap is one argument."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(b)) for b in pdf[bin_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "id", pdf[id_col].values)
            yield out

    return df.mapInPandas(fn, IMAGE_FEATURE_SCHEMA)
