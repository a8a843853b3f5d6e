"""Python UDTFs (SURVEY.md §2.10 F5) — one-row→many-rows generators.

The chunker UDTF mirrors functions.text.chunk_text (the HOF variant used
in hot paths); the UDTF form exists for the SQL entry point and for
generators whose logic genuinely needs Python. Registration is
per-session via :func:`register_udtfs` (F6).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id INT, chunk_text STRING, n_words INT")
class ChunkTextUDTF:
    """Overlapping word-window chunks of one document."""

    def eval(self, text: str, chunk_size: int = 20, stride: int = 15):
        if not text:
            return
        words = [w for w in text.split() if w]
        i = 0
        chunk_id = 0
        while i < len(words):
            chunk = words[i : i + chunk_size]
            yield chunk_id, " ".join(chunk), len(chunk)
            chunk_id += 1
            i += stride


@udtf(returnType="page INT, start_row INT, end_row INT")
class PageRangeUDTF:
    """Expand a row-count into page windows (the S2 pagination shape,
    exposed to SQL)."""

    def eval(self, total_rows: int, page_size: int = 100):
        page = 1
        for start in range(0, int(total_rows), int(page_size)):
            yield page, start, min(start + int(page_size), int(total_rows)) - 1
            page += 1


def register_udtfs(spark: SparkSession) -> None:
    """F6: expose the UDTFs to spark.sql."""
    spark.udtf.register("chunk_text_udtf", ChunkTextUDTF)
    spark.udtf.register("page_ranges", PageRangeUDTF)
