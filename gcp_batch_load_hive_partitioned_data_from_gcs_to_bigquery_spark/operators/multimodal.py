"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages — the correct shape for
per-item Python work at scale (vectorized transfer, no per-row pickling,
executor-parallel).

The actual codec libraries (PIL/librosa/ffmpeg) are NOT in this
container, so the decode kernels are STUBBED: ``decode_image_meta`` uses
a clearly-marked deterministic fake (header sniff + byte stats) and
``decode_image_pixels`` raises ``NotImplementedError`` unless PIL is
importable. The Spark-side plumbing — schema, batching, partitioning,
UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("format_guess", T.StringType()),
        T.StructField("byte_checksum", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",
}


def _sniff(buf: bytes) -> str:
    for magic, name in _MAGIC.items():
        if buf[: len(magic)] == magic:
            return name
    return "unknown"


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter for testing: treat document text bytes as opaque media
    payloads (the container has no real image fixtures)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length("text").cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_image_meta(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """STUB decode: per-item metadata extraction over mapInPandas.

    Deterministic fake 'decode': header sniff + additive byte checksum +
    fake dimensions derived from the payload length. Swap `_kernel`'s body
    for a real PIL decode when the library exists; the Spark plumbing
    (Arrow batches, schema, partition parallelism) is unchanged.
    """

    # Spread payloads across all cores: media tables at scale are many
    # files, but a local single-file source would otherwise run the whole
    # Python decode in one task.
    media = media.repartition(media.sparkSession.sparkContext.defaultParallelism)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = pdf["content"]
            n_bytes = contents.map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "format_guess": contents.map(lambda b: _sniff(bytes(b or b""))),
                    "byte_checksum": contents.map(
                        lambda b: sum(bytes(b or b"")) % (1 << 31)
                    ).astype("int64"),
                    "fake_width": (n_bytes % 1024).astype("int32"),
                    "fake_height": (n_bytes // 1024 % 1024 + 1).astype("int32"),
                }
            )

    return media.select("media_id", "content").mapInPandas(_kernel, IMAGE_META_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("target_width", T.IntegerType()),
        T.StructField("target_height", T.IntegerType()),
        T.StructField("n_bytes_out", T.LongType()),
    ]
)


def resize_stub(media: DataFrame, width: int = 256, height: int = 256) -> DataFrame:
    """STUB resize: binary-in/binary-out mapInPandas — the shape of a real
    thumbnailing stage (decode → resample → re-encode). The fake kernel
    truncates/pads the payload to width*height/8 bytes deterministically;
    swap for a PIL resize when the codec lib exists. Output schema keeps
    the payload opaque-binary with typed size metadata, matching the
    engine's multimodal column convention."""
    target_len = width * height // 8

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["content"].map(
                lambda b: bytes(b or b"")[:target_len].ljust(target_len, b"\x00")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": out,
                    "target_width": pd.Series([width] * len(pdf), dtype="int32"),
                    "target_height": pd.Series([height] * len(pdf), dtype="int32"),
                    "n_bytes_out": out.map(len).astype("int64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(_kernel, RESIZE_SCHEMA)


def decode_image_pixels(media: DataFrame):  # pragma: no cover - needs PIL
    """Real pixel decode — requires PIL, absent in this container."""
    try:
        import PIL  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "pixel decode requires PIL, which is not installed in this environment; "
            "decode_image_meta provides the tested mapInPandas plumbing"
        ) from exc
    raise NotImplementedError("wire PIL decode kernel here")


def frame_sample_stub(media: DataFrame, every_n_bytes: int = 4096) -> DataFrame:
    """STUB frame sampler: emits one 'frame' row per N bytes of payload —
    the row-expanding mapInPandas shape of real video frame sampling
    (one input row → many output rows)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_offset", T.LongType()),
        ]
    )

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_off = [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                n = len(content) if content is not None else 0
                for i, off in enumerate(range(0, n, every_n_bytes)):
                    out_ids.append(media_id)
                    out_idx.append(i)
                    out_off.append(off)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out_ids, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_offset": pd.Series(out_off, dtype="int64"),
                }
            )

    return media.select("media_id", "content").mapInPandas(_kernel, schema)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_start", T.LongType()),
        T.StructField("win_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
    ]
)


def audio_features_stub(media: DataFrame, window_bytes: int = 1024) -> DataFrame:
    """STUB audio feature extraction: one row per fixed-size byte window
    of the payload — the row-expanding mapInPandas shape of real frame/
    hop feature extraction (MFCC, energy). librosa/soundfile are not in
    this container, so the kernel emits deterministic byte-window stats;
    swap the window body for a real DSP call when the library exists.
    Windowing is per-item Python but Arrow-batched and executor-parallel.
    """

    media = media.repartition(media.sparkSession.sparkContext.defaultParallelism)

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, starts, sizes, firsts = [], [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(content or b"")
                for off in range(0, max(len(buf), 1), window_bytes):
                    win = buf[off : off + window_bytes]
                    ids.append(mid)
                    starts.append(off)
                    sizes.append(len(win))
                    firsts.append(win[0] if win else -1)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "window_start": pd.Series(starts, dtype="int64"),
                    "win_bytes": pd.Series(sizes, dtype="int64"),
                    "first_byte": pd.Series(firsts, dtype="int32"),
                }
            )

    return media.select("media_id", "content").mapInPandas(_kernel, AUDIO_FEATURE_SCHEMA)
