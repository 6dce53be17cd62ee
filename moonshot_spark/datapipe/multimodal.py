"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
decode/feature steps are Arrow-batched ``mapInPandas`` stages.  The actual
codec calls are STUBBED (image/audio libraries are not in this container):
``decode_stub=True`` produces a deterministic fake feature vector from the
payload bytes so the Spark-side plumbing — schema, batching, partitioning —
is real and testable; swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), True),     # image/audio/video
    StructField("payload", BinaryType(), True),        # opaque encoded bytes
    StructField("byte_len", LongType(), True),
    StructField("content_md5", StringType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("media_type", StringType(), True),
    StructField("byte_len", LongType(), True),
    StructField("feature", ArrayType(DoubleType()), True),
])


def docs_to_media(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Build a media table from documents (text bytes standing in for an
    encoded payload): exercises BinaryType end to end."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col(id_col) % 3 + 1).cast("int")).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("bigint").alias("byte_len"),
        F.md5(payload).alias("content_md5"),
    )


def extract_features(media: DataFrame, dim: int = 8,
                     decode_stub: bool = True) -> DataFrame:
    """Decode + featurize each payload via mapInPandas (Arrow batches).

    With ``decode_stub`` the "feature" is a deterministic byte-histogram
    projection of the payload — stable across runs/engines, no codec needed.
    With ``decode_stub=False`` the payload is decoded as an image with
    PIL (optional dependency) and the feature is the ``dim``-bucket
    grayscale-pixel-mean vector; both paths emit FEATURE_SCHEMA, so a
    cluster with codecs installed swaps in the real decode with no
    downstream change (the contract test pins this).
    """
    if not decode_stub:
        try:
            from PIL import Image  # noqa: F401 - optional dependency
        except ImportError as e:
            raise NotImplementedError(
                "real media decoding requires PIL (pip install pillow), "
                "which is not present in this environment; use "
                "decode_stub=True") from e

    def _featurize_payload(payload: bytes | None) -> list[float] | None:
        if payload is None:
            return None
        import numpy as np
        if decode_stub:
            arr = np.frombuffer(payload, dtype=np.uint8)
        else:
            import io

            from PIL import Image
            arr = np.asarray(
                Image.open(io.BytesIO(payload)).convert("L"),
                dtype=np.uint8).ravel()
        # per-bucket value means over `dim` strided buckets (bytes for the
        # stub, grayscale pixels for the real decode)
        hist = [float(arr[i::dim].mean()) if arr[i::dim].size else 0.0
                for i in range(dim)]
        return hist

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            out = pdf[["media_id", "media_type", "byte_len"]].copy()
            out["feature"] = pdf["payload"].map(_featurize_payload)
            yield out

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("payload", BinaryType(), True),
])


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  decode_stub: bool = True) -> DataFrame:
    """Resize stage for image payloads via mapInPandas.

    Stubbed resize: deterministic byte resampling of the payload to
    width×height bytes (stride sampling).  With ``decode_stub=False``
    the payload is decoded with PIL (optional dependency), resized to
    width×height, and re-emitted as raw grayscale bytes — both paths
    emit RESIZED_SCHEMA (pinned by the contract test).
    """
    if not decode_stub:
        try:
            from PIL import Image  # noqa: F401 - optional dependency
        except ImportError as e:
            raise NotImplementedError(
                "real image resize requires PIL (pip install pillow), which "
                "is not present in this environment; use "
                "decode_stub=True") from e

    target = width * height

    def _resample(payload):
        if payload is None:
            return None
        import numpy as np
        if not decode_stub:
            import io

            from PIL import Image
            img = Image.open(io.BytesIO(payload)).convert("L")
            return np.asarray(img.resize((width, height)),
                              dtype=np.uint8).tobytes()
        arr = np.frombuffer(payload, dtype=np.uint8)
        if arr.size == 0:
            return bytes(target)
        idx = (np.arange(target) * arr.size) // target
        return arr[idx].tobytes()

    def batches(it: Iterator) -> Iterator:
        for pdf in it:
            pdf = pdf[pdf["media_type"] == "image"]
            out = pdf[["media_id"]].copy()
            out["width"] = width
            out["height"] = height
            out["payload"] = pdf["payload"].map(_resample)
            yield out

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("frame_index", LongType(), False),
    StructField("frame_payload", BinaryType(), True),
])


def sample_frames(media: DataFrame, num_frames: int = 4,
                  decode_stub: bool = True) -> DataFrame:
    """Frame-sampling stage for video payloads: each payload expands to
    ``num_frames`` evenly spaced byte slices (1:N explode via mapInPandas —
    the real implementation swaps the slicer for an ffmpeg/pyav keyframe
    reader; the fan-out shape and schema are identical)."""
    if not decode_stub:
        raise NotImplementedError(
            "real frame sampling requires pyav/ffmpeg; use decode_stub=True")

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd
        for pdf in it:
            pdf = pdf[pdf["media_type"] == "video"]
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame(columns=["media_id", "frame_index",
                                            "frame_payload"])
                continue
            # vectorized 1:N fan-out: tile ids/frame indices with numpy,
            # then one zip pass slices payloads (bytes slicing itself is
            # not vectorizable without a codec, but the per-row Python
            # work is a single slice, no row-dict building)
            payloads = [p if p is not None else b""
                        for p in pdf["payload"].tolist()]
            ids = np.repeat(pdf["media_id"].to_numpy(), num_frames)
            idx = np.tile(np.arange(num_frames, dtype=np.int64), n)
            chunks = np.maximum(
                1, np.fromiter((len(p) for p in payloads), dtype=np.int64,
                               count=n) // num_frames)
            starts = np.repeat(chunks, num_frames) * idx
            ends = starts + np.repeat(chunks, num_frames)
            flat = np.repeat(np.arange(n), num_frames)
            frames = [payloads[j][s:e]
                      for j, s, e in zip(flat, starts, ends)]
            yield pd.DataFrame({"media_id": ids, "frame_index": idx,
                                "frame_payload": frames})

    return media.mapInPandas(batches, FRAME_SCHEMA)
