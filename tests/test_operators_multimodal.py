"""Multimodal plumbing (mapInPandas over binary payloads) vs DuckDB oracle;
pure-stdlib codecs (PPM/BMP/WAV/PPM-stream video) round-trip exactly."""

from __future__ import annotations

import numpy as np
import pytest

from polarify_spark.operators.multimodal import (
    QUERIES,
    decode_audio,
    decode_image,
    encode_bmp,
    encode_ppm,
    encode_wav,
    resize_image,
    sample_video_frames,
)

from .oracle_harness import compare_query

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", list(QUERIES), ids=list(QUERIES))
def test_multimodal_matches_oracle(spark, name):
    fn, sql = QUERIES[name]
    compare_query(spark, SF_DIR, fn, sql)


def _rng():
    return np.random.default_rng(1234)


def test_ppm_roundtrip_and_comments():
    arr = _rng().integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (decode_image(encode_ppm(arr)) == arr).all()
    # netpbm headers allow comments and arbitrary whitespace between tokens
    with_comments = b"P6\n# c1\n7 5\n# c2\n255\n" + arr.tobytes()
    assert (decode_image(with_comments) == arr).all()


@pytest.mark.parametrize("shape", [(5, 7, 3), (4, 8, 3), (3, 1, 3), (1, 3, 3), (2, 5, 3)])
def test_bmp_roundtrip_row_padding(shape):
    """Widths 7/1/3/5 force nonzero 4-byte row padding; 8 has none. Decode
    must also undo the bottom-up row order and BGR channel swap."""
    arr = _rng().integers(0, 256, size=shape, dtype=np.uint8)
    assert (decode_image(encode_bmp(arr)) == arr).all()


def test_wav_roundtrip_mono_and_stereo():
    rng = _rng()
    mono = rng.integers(-32768, 32767, size=64, dtype=np.int16)
    arr, rate = decode_audio(encode_wav(mono, 8000))
    assert rate == 8000 and arr.shape == (64, 1) and (arr[:, 0] == mono).all()
    stereo = rng.integers(-32768, 32767, size=(32, 2), dtype=np.int16)
    arr2, rate2 = decode_audio(encode_wav(stereo, 16000))
    assert rate2 == 16000 and arr2.shape == (32, 2) and (arr2 == stereo).all()


def test_resize_nearest_neighbor_exact():
    src = _rng().integers(0, 256, size=(4, 8, 3), dtype=np.uint8)
    # 2x downscale on both axes == stride-2 slicing under floor mapping
    assert (resize_image(encode_ppm(src), 4, 2) == src[::2, ::2]).all()
    # upscale duplicates pixels: dst col c -> src col c*8//16 = c//2
    up = resize_image(encode_ppm(src), 16, 4)
    assert up.shape == (4, 16, 3)
    assert (up == src[:, np.arange(16) * 8 // 16]).all()


def test_video_stream_frame_boundaries():
    rng = _rng()
    frames = [rng.integers(0, 256, size=(2, 4, 3), dtype=np.uint8) for _ in range(5)]
    video = b"".join(encode_ppm(f) for f in frames)
    kept = sample_video_frames(video, 2)
    assert len(kept) == 3
    for got, want in zip(kept, [frames[0], frames[2], frames[4]]):
        assert (got == want).all()


def test_decoders_reject_garbage():
    with pytest.raises(ValueError):
        decode_image(b"\x00\x01\x02")
    with pytest.raises(Exception):  # wave raises wave.Error on bad RIFF
        decode_audio(b"\x00\x01\x02\x03")


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


# --- property-based codec round-trips (hypothesis) --------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False

if _HAS_HYPOTHESIS:

    @st.composite
    def _images(draw):
        h = draw(st.integers(min_value=1, max_value=9))
        w = draw(st.integers(min_value=1, max_value=9))
        data = draw(
            st.binary(min_size=h * w * 3, max_size=h * w * 3)
        )
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)

    @settings(max_examples=40, deadline=None)
    @given(img=_images())
    def test_ppm_roundtrip_property(img):
        assert (decode_image(encode_ppm(img)) == img).all()

    @settings(max_examples=40, deadline=None)
    @given(img=_images())
    def test_bmp_roundtrip_property(img):
        """Any geometry (including widths needing 1-3 pad bytes) survives
        the bottom-up/BGR/padded encode-decode cycle."""
        assert (decode_image(encode_bmp(img)) == img).all()

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=200),
        channels=st.integers(min_value=1, max_value=2),
        rate=st.sampled_from([8000, 16000, 44100]),
        data=st.data(),
    )
    def test_wav_roundtrip_property(n, channels, rate, data):
        raw = data.draw(st.binary(min_size=n * channels * 2, max_size=n * channels * 2))
        samples = np.frombuffer(raw, dtype="<i2").reshape(n, channels)
        arr, got_rate = decode_audio(encode_wav(samples, rate))
        assert got_rate == rate and arr.shape == (n, channels)
        assert (arr == samples).all()
