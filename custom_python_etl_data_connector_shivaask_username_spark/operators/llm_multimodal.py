"""Multimodal column plumbing (SURVEY.md §2.11 L10, §2.1 S10).

Media are opaque ``BINARY`` columns + a typed metadata struct; all
per-blob compute is Arrow-batched ``mapInPandas`` so bytes cross the
JVM↔Python boundary once per batch, never per row. Image decode is
REAL when Pillow is importable (optional dependency — see
``decode_image`` / ``decode_image_dims``) and a clearly-raised
``NotImplementedError`` otherwise; the remaining codecs (resize,
audio/video demux) stay deterministic stand-ins in this container, but
the Spark-side contract (schema, batch shape, partitioning) is real
and tested, and a library-backed decoder drops in by replacing one
function.

100 TB notes: blobs ride the scan (binaryFile source or parquet BINARY);
feature extraction is a map-only stage, so it scales with executors and
the only knob that matters is input partition size (keep blob batches
under the Arrow batch budget via ``spark.sql.files.maxPartitionBytes``).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load_table

#: metadata carried beside every blob (shape mirrors image EXIF-ish use)
MEDIA_META_SCHEMA = (
    "media_id BIGINT, kind STRING, declared_bytes BIGINT, source STRING"
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("header_hex", T.StringType()),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S10: ingest a directory of media files as (path, length, content)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path"),
            F.col("length").alias("declared_bytes"),
            F.col("content"),
        )
    )


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Deterministic stand-in media: each document's text bytes play the
    role of an opaque blob, with a typed metadata struct beside it."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.col("doc_id").alias("media_id"),
            F.lit("synthetic/blob").alias("kind"),
            F.length("text").cast("long").alias("declared_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


try:  # optional dependency: real image decode when present
    from PIL import Image as _PIL_IMAGE  # type: ignore
except ImportError:  # pragma: no cover - exercised via decode tests' skip
    _PIL_IMAGE = None


def decode_image(content: bytes) -> "object":
    """Decode one image blob — REAL via Pillow when importable
    (optional-import, round 6), a clearly-raised NotImplementedError
    otherwise (this container ships no media libraries; callers wanting
    codec-free pipelines use extract_features).

    Returns a loaded ``PIL.Image.Image`` (``load()`` forces the full
    decode so corrupt blobs fail HERE, not lazily inside a downstream
    transform)."""
    if _PIL_IMAGE is None:
        raise NotImplementedError(
            "image decode requires Pillow (or swap in libvips); not "
            "present in this environment — the Spark plumbing around it "
            "is real, see decode_image_dims/extract_features"
        )
    import io

    img = _PIL_IMAGE.open(io.BytesIO(content))
    img.load()
    return img


IMAGE_DIMS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mode", T.StringType()),
        T.StructField("format", T.StringType()),
    ]
)


def decode_image_dims(
    media: DataFrame, content_col: str = "content"
) -> DataFrame:
    """L10 decode stage: blob → (width, height, mode, format) via a real
    Pillow decode inside Arrow-batched ``mapInPandas`` — the same batch
    shape as extract_features, so swapping the codec never touches the
    Spark plan. Raises up front (driver-side) when Pillow is absent
    rather than exploding per-task on the executors."""
    if _PIL_IMAGE is None:
        raise NotImplementedError(
            "decode_image_dims requires Pillow; not present in this "
            "environment (test is skip-marked accordingly)"
        )

    def batches(it: Iterator) -> Iterator:
        import io

        import pandas as pd
        from PIL import Image

        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf[content_col]):
                with Image.open(io.BytesIO(bytes(blob))) as img:
                    img.load()
                    out.append(
                        (
                            int(mid),
                            int(img.width),
                            int(img.height),
                            img.mode,
                            img.format or "",
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "mode", "format"],
            )

    cols = media.select(
        F.col("meta.media_id").alias("media_id"), F.col(content_col)
    )
    return cols.mapInPandas(batches, IMAGE_DIMS_SCHEMA)


def extract_features(media: DataFrame, content_col: str = "content") -> DataFrame:
    """Codec-free per-blob features via Arrow-batched mapInPandas:
    byte count, Shannon byte entropy, leading-bytes hex (magic number)."""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf[content_col]):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                if arr.size:
                    counts = np.bincount(arr, minlength=256)
                    p = counts[counts > 0] / arr.size
                    entropy = float(-(p * np.log2(p)).sum())
                else:
                    entropy = 0.0
                out.append(
                    (
                        int(mid),
                        int(arr.size),
                        round(entropy, 6),
                        bytes(blob[:4]).hex(),
                    )
                )
            yield pd.DataFrame(
                out, columns=["media_id", "n_bytes", "byte_entropy", "header_hex"]
            )

    cols = media.select(
        F.col("meta.media_id").alias("media_id"), F.col(content_col)
    )
    return cols.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("new_bytes", T.LongType()),
    ]
)


def resize_media(
    media: DataFrame, factor: int = 4, content_col: str = "content"
) -> DataFrame:
    """Binary→binary transform plumbing (the 'resize' stage shape).

    A real deployment swaps the body for PIL/libvips thumbnailing; here
    the deterministic stand-in keeps every ``factor``-th byte, which
    exercises the contract that matters Spark-side: BINARY in, BINARY
    out, new size metadata, Arrow batches both directions, map-only.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf[content_col]):
                raw = bytes(blob)
                small = raw[::factor]
                out.append((int(mid), small, len(raw), len(small)))
            yield pd.DataFrame(
                out, columns=["media_id", "content", "orig_bytes", "new_bytes"]
            )

    cols = media.select(
        F.col("meta.media_id").alias("media_id"), F.col(content_col)
    )
    return cols.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)

FRAME_SIZE = 64
FRAME_STRIDE = 4  # emit every 4th frame


def sample_frames(
    media: DataFrame,
    frame_size: int = FRAME_SIZE,
    stride: int = FRAME_STRIDE,
    content_col: str = "content",
) -> DataFrame:
    """1→many frame sampling plumbing (the video 'frame-sample' shape).

    The blob is treated as a sequence of fixed-size frames and every
    ``stride``-th frame is emitted as its own row — the real-codec
    version replaces the slicing with a container demuxer (pyav/ffmpeg),
    while the row-expansion contract (one blob in, N frame rows out,
    Arrow-batched) is exactly what ships.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = []
            for mid, blob in zip(pdf["media_id"], pdf[content_col]):
                raw = bytes(blob)
                n_frames = max((len(raw) + frame_size - 1) // frame_size, 0)
                for fno in range(0, n_frames, stride):
                    frame = raw[fno * frame_size : (fno + 1) * frame_size]
                    out.append((int(mid), fno, frame, len(frame)))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_no", "frame", "frame_bytes"]
            )

    cols = media.select(
        F.col("meta.media_id").alias("media_id"), F.col(content_col)
    )
    return cols.mapInPandas(batches, FRAME_SCHEMA)


_MULTIMODAL_ORACLE = """
WITH b AS (
  SELECT doc_id, lang, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
hist AS (
  SELECT doc_id, substring(hx, CAST(2*i - 1 AS BIGINT), 2) AS byte_hex,
         COUNT(*) AS c
  FROM b, unnest(range(1, n + 1)) AS t(i)
  GROUP BY doc_id, substring(hx, CAST(2*i - 1 AS BIGINT), 2)
),
ent AS (
  SELECT h.doc_id,
         ROUND(-SUM((CAST(c AS DOUBLE) / b.n) * log2(CAST(c AS DOUBLE) / b.n)),
               6) AS byte_entropy
  FROM hist h JOIN b ON h.doc_id = b.doc_id
  GROUP BY h.doc_id, b.n
)
SELECT b.lang,
       COUNT(*) AS n_media,
       ROUND(CAST(SUM(CAST(e.byte_entropy AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 4) AS avg_entropy,
       MAX(b.n) AS max_bytes
FROM b JOIN ent e ON b.doc_id = e.doc_id
GROUP BY b.lang
ORDER BY b.lang
"""


@query("q_multimodal_features", oracle=_MULTIMODAL_ORACLE)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10 end-to-end: blob column + metadata → Arrow batches → features →
    relational aggregation back on the JVM side.

    Oracle-checked: the synthetic blobs are the documents' UTF-8 bytes,
    so DuckDB reproduces byte count and Shannon byte entropy exactly
    (hex-sliced byte histogram + log2). Per-media entropies round to 6
    before an exact-decimal mean, so the only float comparisons cross
    engines at rounded values — the repo's standard determinism recipe.
    """
    docs = load_table(spark, sf_dir, "documents")
    media = synth_media_table(docs)
    feats = extract_features(media)
    return (
        feats.join(
            docs.select(F.col("doc_id").alias("media_id"), "lang"),
            "media_id",
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.round(
                F.sum(F.col("byte_entropy").cast("decimal(18,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                4,
            ).alias("avg_entropy"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .orderBy("lang")
    )
