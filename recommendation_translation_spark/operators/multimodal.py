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
    "chunk_audio_windows",
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


AUDIO_OUT_SCHEMA = (
    "sample_id long, window_idx int, start_ms long, end_ms long, "
    "n_in_window long, window_md5 string"
)


def chunk_audio_windows(media: DataFrame, sample_rate: int = 16_000,
                        window_ms: int = 400,
                        bytes_per_sample: int = 1) -> DataFrame:
    """Fixed-duration audio windowing over opaque PCM payloads: one row
    per ``window_ms`` window with its sample span, millisecond bounds,
    and a payload-slice digest — the front end of a feature-extraction
    (fbank/wav2vec-style) pipeline, exercising the same one-row-in /
    many-rows-out Arrow batch shape as the video frame sampler.

    Bytes are treated as ``bytes_per_sample``-wide PCM (the default 1
    is the deterministic stand-in; a real pipeline passes 2 for s16le
    and a real resampler as a decoder stage before this).  Window
    bounds are pure integer math on the payload length, so the
    oracle-gated query (queries.q_mm_audio_windows) reproduces every
    column except the digest in portable SQL; the digest path is
    pytest-pinned (DuckDB cannot substring a BLOB).  An empty payload
    yields ONE zero-sample window, mirroring the frame sampler's
    at-least-one-row contract."""
    spw = sample_rate * window_ms // 1000  # samples per window

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {
                "sample_id": [], "window_idx": [], "start_ms": [],
                "end_ms": [], "n_in_window": [], "window_md5": [],
            }
            for sid, payload in zip(pdf["sample_id"], pdf["content"]):
                data = bytes(payload)
                n_samples = len(data) // bytes_per_sample
                n_windows = max(-(-n_samples // spw), 1)
                for i in range(n_windows):
                    s0, s1 = i * spw, min(n_samples, (i + 1) * spw)
                    cols["sample_id"].append(sid)
                    cols["window_idx"].append(i)
                    cols["start_ms"].append(s0 * 1000 // sample_rate)
                    cols["end_ms"].append(s1 * 1000 // sample_rate)
                    cols["n_in_window"].append(s1 - s0)
                    cols["window_md5"].append(
                        hashlib.md5(
                            data[s0 * bytes_per_sample : s1 * bytes_per_sample]
                        ).hexdigest()
                    )
            yield pd.DataFrame(cols)

    return media.select("sample_id", "content").mapInPandas(
        run, schema=AUDIO_OUT_SCHEMA
    )
