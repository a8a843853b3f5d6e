"""L10 multimodal plumbing + F5 UDTF surface."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from custom_python_etl_data_connector_shivaask_username_spark.functions.udtfs import (
    register_udtfs,
)
from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_multimodal import (
    decode_image,
    extract_features,
    read_binary_dir,
    synth_media_table,
)
from custom_python_etl_data_connector_shivaask_username_spark.registry import (
    QUERIES,
    load_all,
)

load_all()


def test_extract_features_entropy_and_magic(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="aaaaaaaaaa", source="s"),  # zero entropy
            Row(doc_id=1, text="abcdefghij", source="s"),  # max for 10 distinct
        ]
    )
    feats = {
        r["media_id"]: r
        for r in extract_features(synth_media_table(docs)).collect()
    }
    assert feats[0]["byte_entropy"] == 0.0
    assert abs(feats[1]["byte_entropy"] - 3.321928) < 1e-5
    assert feats[0]["n_bytes"] == 10
    assert feats[0]["header_hex"] == "61616161"


def test_binary_file_source_roundtrip(spark, tmp_path):
    blob = bytes(range(256))
    (tmp_path / "a.bin").write_bytes(blob)
    (tmp_path / "b.bin").write_bytes(b"PNG!fakeheader")
    df = read_binary_dir(spark, str(tmp_path), "*.bin")
    rows = {r["path"].split("/")[-1]: r for r in df.collect()}
    assert rows["a.bin"]["declared_bytes"] == 256
    assert bytes(rows["b.bin"]["content"])[:4] == b"PNG!"


def test_decode_stub_raises():
    # superseded by the optional-import pair at the bottom of this file:
    # with Pillow absent the stub raises; with Pillow present decode is
    # real and pinned by the PNG round-trip test
    import custom_python_etl_data_connector_shivaask_username_spark.operators.llm_multimodal as mm

    if mm._PIL_IMAGE is not None:
        pytest.skip("Pillow installed; decode is real here")
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image(b"\x89PNG")


def test_resize_media_binary_roundtrip(spark):
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_multimodal import (
        resize_media,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=0, text="abcdefghijkl", source="s")]
    )
    out = resize_media(synth_media_table(docs), factor=4).collect()[0]
    assert bytes(out["content"]) == b"aei"  # every 4th byte
    assert out["orig_bytes"] == 12 and out["new_bytes"] == 3


def test_sample_frames_expands_rows(spark):
    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_multimodal import (
        sample_frames,
    )

    # 300 bytes = 5 frames of 64 (last partial); stride 2 -> frames 0,2,4
    docs = spark.createDataFrame(
        [Row(doc_id=7, text="x" * 300, source="s")]
    )
    rows = sorted(
        sample_frames(
            synth_media_table(docs), frame_size=64, stride=2
        ).collect(),
        key=lambda r: r["frame_no"],
    )
    assert [r["frame_no"] for r in rows] == [0, 2, 4]
    assert [r["frame_bytes"] for r in rows] == [64, 64, 44]
    assert all(r["media_id"] == 7 for r in rows)


def test_multimodal_query_runs(spark, sf_dir):
    out = QUERIES["q_multimodal_features"](spark, sf_dir).collect()
    assert len(out) == 5  # one row per lang
    assert all(r["avg_entropy"] > 0 for r in out)


def test_chunk_udtf_matches_hof_chunker(spark):
    register_udtfs(spark)
    text = " ".join(f"w{i}" for i in range(47))
    spark.createDataFrame([Row(doc_id=0, text=text)]).createOrReplaceTempView(
        "udtf_docs"
    )
    rows = spark.sql(
        "SELECT c.* FROM udtf_docs, "
        "LATERAL chunk_text_udtf(text, 20, 15) c ORDER BY chunk_id"
    ).collect()
    assert [r["chunk_id"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["n_words"] == 20 and rows[3]["n_words"] == 2


def test_page_range_udtf(spark):
    register_udtfs(spark)
    rows = spark.sql("SELECT * FROM page_ranges(25, 10)").collect()
    assert [(r["page"], r["start_row"], r["end_row"]) for r in rows] == [
        (1, 0, 9),
        (2, 10, 19),
        (3, 20, 24),
    ]


def test_decode_image_real_pillow_roundtrip(spark):
    """L10 decode with a REAL codec: generate PNGs with Pillow in-test,
    run them through the decode_image_dims mapInPandas stage, and check
    dimensions/mode/format survive the decode. Skips where Pillow is
    not installed (this container) — the stub path below still runs."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from custom_python_etl_data_connector_shivaask_username_spark.operators.llm_multimodal import (
        decode_image,
        decode_image_dims,
    )

    def png_bytes(w, h, color):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), color).save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, png_bytes(32, 16, (255, 0, 0))),
        (2, png_bytes(8, 64, (0, 255, 0))),
    ]
    media = spark.createDataFrame(
        rows, "media_id LONG, content BINARY"
    ).select(
        "content",
        F.struct(
            F.col("media_id"),
            F.lit("image/png").alias("kind"),
            F.length("content").cast("long").alias("declared_bytes"),
            F.lit("test").alias("source"),
        ).alias("meta"),
    )
    got = {
        r["media_id"]: (r["width"], r["height"], r["mode"], r["format"])
        for r in decode_image_dims(media).collect()
    }
    assert got == {1: (32, 16, "RGB", "PNG"), 2: (8, 64, "RGB", "PNG")}
    img = decode_image(png_bytes(5, 7, (0, 0, 255)))
    assert (img.width, img.height) == (5, 7)


def test_decode_image_raises_clearly_without_pillow():
    """Without Pillow both decode entry points raise NotImplementedError
    driver-side (never an executor-side explosion)."""
    import custom_python_etl_data_connector_shivaask_username_spark.operators.llm_multimodal as mm

    if mm._PIL_IMAGE is not None:
        import pytest

        pytest.skip("Pillow installed; stub path not reachable")
    import pytest

    with pytest.raises(NotImplementedError, match="Pillow"):
        mm.decode_image(b"\x89PNG")
