"""Multimodal plumbing (mapInPandas over binary payloads) vs DuckDB oracle;
decoder stubs must raise cleanly."""

from __future__ import annotations

import pytest

from polarify_spark.operators.multimodal import (
    QUERIES,
    decode_audio,
    decode_image,
    resize_image,
    sample_video_frames,
)

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_multimodal_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


@pytest.mark.parametrize(
    "stub",
    [decode_image, decode_audio, sample_video_frames, lambda b: resize_image(b, 8, 8)],
)
def test_decoder_stubs_raise(stub):
    with pytest.raises(NotImplementedError):
        stub(b"\x00\x01")


def test_thumbnail_binary_column_roundtrips(spark):
    """The binary thumb column itself (dropped from the oracle projection)
    must round-trip through Arrow intact: digest(thumb) == thumb_md5."""
    import hashlib

    from polarify_spark.operators.multimodal import _thumbnail_batch_fn

    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    out = payloads.mapInPandas(
        _thumbnail_batch_fn,
        schema="doc_id long, thumb binary, thumb_len int, thumb_md5 string",
    )
    for row in out.limit(50).collect():
        assert hashlib.md5(bytes(row["thumb"])).hexdigest() == row["thumb_md5"]
        assert len(row["thumb"]) == row["thumb_len"]
