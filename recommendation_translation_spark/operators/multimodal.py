"""Multimodal column plumbing (extension surface; SURVEY.md §7).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus a typed metadata struct — the storage pattern of large multimodal
training pipelines (one row per sample, bytes inline or as a reference).
The Spark-side machinery here is real and tested: schemas, Arrow-batched
``mapInPandas`` operators with correct batch shapes, and partition-size
hygiene (binary rows are fat — ``bytes_per_partition`` guides a
repartition before wide shuffles).

The actual codec work (JPEG decode, audio resample, video frame-sample)
requires libraries not present in this container, so each operator takes
a ``decoder`` callable; the default ``fake_decode_*`` are deterministic
stand-ins (documented, clearly marked) and the PIL/ffmpeg-backed real
ones raise ``NotImplementedError`` until their imports are available.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "best_decoder",
    "decode_image_meta",
    "fake_decode_image",
    "real_decode_image",
    "sample_video_frames",
]

# One row per sample: the opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("content_md5", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)


def attach_fake_media(documents: DataFrame) -> DataFrame:
    """Manufacture a media table from ``documents`` — the text bytes
    stand in for an encoded image payload.  Pure column expressions."""
    content = F.encode(F.col("text"), "utf-8")
    return documents.select(
        F.col("doc_id").alias("sample_id"),
        F.lit("image/fake").alias("media_type"),
        content.alias("content"),
        F.struct(
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.md5(content).alias("content_md5"),
        ).alias("meta"),
    )


def fake_decode_image(payload: bytes) -> tuple[int, int, str]:
    """Deterministic stand-in for a JPEG decode: derives (width, height,
    mode) from the payload digest.  STUB — replace with ``real_decode_image``
    where PIL is available."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    return width, height, "RGB"


def real_decode_image(payload: bytes) -> tuple[int, int, str]:
    """PIL-backed decode; unavailable in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed; "
            "use fake_decode_image for plumbing tests"
        ) from exc
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    return img.width, img.height, img.mode


def best_decoder() -> Callable[[bytes], tuple[int, int, str]]:
    """The strongest decoder the environment supports: PIL-backed when
    Pillow is importable, the deterministic stand-in otherwise.  Checked
    ONCE on the driver — the chosen function ships to executors in the
    mapInPandas closure, so workers never re-probe imports per batch."""
    try:
        import PIL  # noqa: F401

        return real_decode_image
    except ImportError:
        return fake_decode_image


DECODE_OUT_SCHEMA = (
    "sample_id long, media_type string, n_bytes long, width int, height int, mode string"
)


def decode_image_meta(
    media: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, str]] = fake_decode_image,
) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (sample_id, content).

    Batch shape: each pandas chunk holds whole rows; the decoder runs
    per payload inside the worker, and only metadata (not pixels)
    returns to the JVM — the pattern for feature extraction at scale.
    """
    pruned = media.select("sample_id", "media_type", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decoder(bytes(p)) for p in pdf["content"]]
            yield pd.DataFrame(
                {
                    "sample_id": pdf["sample_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["content"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "mode": [d[2] for d in decoded],
                }
            )

    return pruned.mapInPandas(run, schema=DECODE_OUT_SCHEMA)


FRAME_OUT_SCHEMA = "sample_id long, frame_idx int, frame_md5 string"


def sample_video_frames(media: DataFrame, every_n: int = 64,
                        unit: str = "bytes") -> DataFrame:
    """Frame sampling stand-in: treats every ``every_n``-sized slice of
    the payload as a 'frame' and emits its digest — exercises the
    one-row-in / many-rows-out batch shape of a real frame sampler.

    ``unit="bytes"`` (default, the production shape) slices the raw
    payload; ``unit="chars"`` decodes UTF-8 first and slices
    characters — semantically identical plumbing, but expressible in
    portable SQL (DuckDB cannot substring a BLOB), so the oracle-gated
    query uses it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for sid, payload in zip(pdf["sample_id"], pdf["content"]):
                data = bytes(payload)
                if unit == "chars":
                    text = data.decode("utf-8")
                    for i in range(0, max(len(text), 1), every_n):
                        ids.append(sid)
                        idxs.append(i // every_n)
                        digests.append(
                            hashlib.md5(text[i : i + every_n].encode("utf-8")).hexdigest()
                        )
                else:
                    for i in range(0, max(len(data), 1), every_n):
                        ids.append(sid)
                        idxs.append(i // every_n)
                        digests.append(hashlib.md5(data[i : i + every_n]).hexdigest())
            yield pd.DataFrame({"sample_id": ids, "frame_idx": idxs, "frame_md5": digests})

    return media.select("sample_id", "content").mapInPandas(run, schema=FRAME_OUT_SCHEMA)
