"""Multimodal plumbing (mapInPandas over binary payloads) vs DuckDB oracle;
decoder stubs must raise cleanly."""

from __future__ import annotations

import pytest

from polarify_spark.operators.multimodal import (
    QUERIES,
    decode_audio,
    decode_image,
    sample_video_frames,
)

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_multimodal_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


@pytest.mark.parametrize("stub", [decode_image, decode_audio, sample_video_frames])
def test_decoder_stubs_raise(stub):
    with pytest.raises(NotImplementedError):
        stub(b"\x00\x01")
