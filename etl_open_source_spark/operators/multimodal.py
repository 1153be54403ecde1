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
            # NULL payloads (encode(NULL) upstream) emit no row — same
            # contract as chunk_audio; map(len) would TypeError on None
            pdf = pdf[pdf[bin_col].notna()]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "n_bytes": pdf[bin_col].map(len).astype("int64"),
                    "content_md5": pdf[bin_col].map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                }
            )

    return df.mapInPandas(fn, MEDIA_META_SCHEMA)


def decode_image(payload: bytes) -> dict:
    """Dependency-free image header decode: PNG/APNG, GIF, BMP, JPEG.

    Parses real encoded bytes — width/height from the format header,
    frame count where the container carries it (APNG acTL; GIF via the
    one-graphic-control-extension-per-frame heuristic). ``mean_luma`` is
    NULL: pixel statistics need a full pixel decode (PIL/OpenCV in
    production — swap the ``decoder`` argument); header metadata is what
    a 100 TB triage/filter pass actually reads."""
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        # IHDR is mandatory-first: sig(8) len(4) 'IHDR'(4) width(4) height(4)
        w = int.from_bytes(b[16:20], "big")
        h = int.from_bytes(b[20:24], "big")
        i = b.find(b"acTL")  # APNG animation control: num_frames follows
        frames = int.from_bytes(b[i + 4 : i + 8], "big") if i != -1 else 1
        return {"width": w, "height": h, "n_frames": frames, "mean_luma": None}
    if b[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(b[6:8], "little")
        h = int.from_bytes(b[8:10], "little")
        frames = max(1, b.count(b"\x21\xf9\x04"))
        return {"width": w, "height": h, "n_frames": frames, "mean_luma": None}
    if b[:2] == b"BM":
        # BITMAPINFOHEADER at offset 14; height negative = top-down rows
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = abs(int.from_bytes(b[22:26], "little", signed=True))
        return {"width": w, "height": h, "n_frames": 1, "mean_luma": None}
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:
                # fill byte: the NEXT byte may itself start the real
                # marker (FF FF C0 ...) — advancing 2 here would consume
                # the marker's leading FF and skip SOF entirely
                i += 1
                continue
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                i += 2  # standalone markers have no length field
                continue
            seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
            # SOFn carry dimensions (excluding DHT/JPG/DAC pseudo-SOFs)
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h = int.from_bytes(b[i + 5 : i + 7], "big")
                w = int.from_bytes(b[i + 7 : i + 9], "big")
                return {"width": w, "height": h, "n_frames": 1, "mean_luma": None}
            i += 2 + seg_len
        raise ValueError("JPEG without SOF marker (truncated?)")
    raise ValueError(f"unsupported image format (magic: {b[:8]!r})")


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
            pdf = pdf[pdf[bin_col].notna()]  # NULL payload → no row
            feats = [decoder(bytes(b)) for b in pdf[bin_col]]
            # explicit columns: an all-NULL batch yields an EMPTY frame,
            # which must still carry the declared schema's column names
            out = pd.DataFrame(
                feats, columns=["width", "height", "n_frames", "mean_luma"]
            )
            out.insert(0, "id", pdf[id_col].values)
            yield out

    return df.mapInPandas(fn, IMAGE_FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "id bigint, src_w int, src_h int, out_w int, out_h int, resized_md5 string"
)


def letterbox_dims(src_w: int, src_h: int, tw: int, th: int) -> tuple[int, int]:
    """Aspect-preserving fit of (src_w, src_h) inside (tw, th): the larger
    relative dimension pins to the target, the other scales by the same
    ratio with round-half-up. Pure integer-comparison + one float divide —
    reproducible anywhere IEEE doubles are."""
    if src_w * th >= src_h * tw:  # source is relatively wider → pin width
        out_w = tw
        out_h = max(1, int(src_h * tw / src_w + 0.5))
    else:
        out_h = th
        out_w = max(1, int(src_w * th / src_h + 0.5))
    return out_w, out_h


def resize_images(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    target_w: int = 256,
    target_h: int = 256,
    decoder: Callable[[bytes], dict] = fake_decode_image,
) -> DataFrame:
    """Resize stage: decode dims, compute the letterbox fit, emit the
    resized payload. Arrow-batched mapInPandas — one Python hop per batch,
    binary in / binary-derived out, the exact shape a real PIL/libvips
    resize runs in at 100 TB (swap ``decoder`` and the payload line).

    The stub "resized payload" is the UTF-8 of ``"{id}:{out_w}x{out_h}"``
    — deterministic, so the whole stage (including the Python hop) is
    value-hash checkable against a SQL oracle; emitted as its md5."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                if b is None:  # NULL payload → no row (chunk_audio contract)
                    continue
                d = decoder(bytes(b))
                ow, oh = letterbox_dims(d["width"], d["height"], target_w, target_h)
                fake_resized = f"{i}:{ow}x{oh}".encode()
                rows.append(
                    (i, d["width"], d["height"], ow, oh,
                     hashlib.md5(fake_resized).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["id", "src_w", "src_h", "out_w", "out_h", "resized_md5"]
            )

    return df.mapInPandas(fn, RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str,
    duration_ms_col: str,
    fps: float = 24.0,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plan for video payloads: one row per sampled
    timestamp (every ``every_ms``), with the nearest source frame number
    at ``fps``. Pure JVM sequence+explode — the expensive per-frame decode
    then runs on exactly these (id, frame_no) rows, nothing else.
    Scan-local row generation; no shuffle."""
    ts = F.explode(
        F.sequence(F.lit(0), F.col(duration_ms_col).cast("bigint"), F.lit(every_ms))
    ).alias("ts_ms")
    out = df.select(F.col(id_col), ts)
    return out.select(
        id_col,
        "ts_ms",
        F.floor(F.col("ts_ms") * F.lit(fps) / F.lit(1000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("frame_no"),
    )


AUDIO_CHUNK_SCHEMA = "id bigint, chunk int, n_bytes int, energy bigint"


def chunk_audio(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    chunk_bytes: int = 100,
) -> DataFrame:
    """Audio windowing stage: split each payload into fixed-size byte
    chunks (a stand-in for fixed-duration PCM windows) and emit per-chunk
    size + energy (sum of byte values — the stub for RMS; a real librosa/
    scipy path swaps in behind the same schema). Arrow-batched
    mapInPandas, one Python hop per batch, rows explode Python-side so
    one input row → ceil(len/chunk) output rows inside the same batch.

    Deterministic byte arithmetic → the whole stage (batch plumbing
    included) is value-hash checkable against a SQL oracle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                # empty/null payloads emit NO chunk rows (matching the SQL
                # oracle's WHERE i <= length guard) — a zero-byte "chunk 0"
                # row would silently diverge the engine from the oracle.
                if b is None:
                    continue
                data = bytes(b)
                for c in range(0, len(data), chunk_bytes):
                    piece = data[c : c + chunk_bytes]
                    rows.append((i, c // chunk_bytes, len(piece), sum(piece)))
            yield pd.DataFrame(rows, columns=["id", "chunk", "n_bytes", "energy"])

    return df.mapInPandas(fn, AUDIO_CHUNK_SCHEMA)
