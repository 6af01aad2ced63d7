"""Multimodal column handling: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted through Arrow-batched ``mapInPandas``.

The container has no media libraries, so the decoders are pure-stdlib
implementations of simple container formats: PPM (P6) and uncompressed
24-bit BMP for images, RIFF/WAV PCM for audio, and a concatenated-PPM
frame stream for video. Each decoder is a real parser (magic sniffing,
header fields, row padding, bottom-up row order, sample widths) — only the
*formats* are simple; swapping in Pillow/ffmpeg-backed parsers would not
change any schema, partitioning, or batch shape. A deterministic fake
feature extractor (``payload_features``) additionally exercises the
plumbing over arbitrary bytes.

Scale design: ``mapInPandas`` streams Arrow record batches through the
Python worker per partition — no per-row ser/de, no driver involvement;
binary payloads ride along untouched until the UDF touches them. At 100 TB
the pattern is: keep payloads in their own parquet column (Spark reads only
the columns the UDF asks for), partition by content-hash band for balanced
decode work, and size ``spark.sql.execution.arrow.maxRecordsPerBatch``
against payload size so a batch stays in worker memory.

The reference (Quantco/polarify) has no multimodal surface (SURVEY.md
section 2.5); north-star extension.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Callable, Iterator

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame, SparkSession

N_HIST_BUCKETS = 8

META_SCHEMA = (
    "doc_id long, n_bytes int, first_byte int, payload_md5 string, "
    + ", ".join(f"h{k} int" for k in range(N_HIST_BUCKETS))
)


# --- real pure-stdlib codecs ------------------------------------------------
#
# PPM (P6) and 24-bit uncompressed BMP cover the two interesting layout
# regimes: PPM is row-major top-down RGB with a whitespace-tokenized ASCII
# header; BMP is bottom-up BGR with 4-byte row padding and a little-endian
# binary header. WAV is RIFF chunks + interleaved PCM. Encoders live here
# too so payload synthesis (queries, tests) shares one definition.


def encode_ppm(arr: "object") -> bytes:
    """Encode an HxWx3 uint8 array as a binary PPM (P6, maxval 255)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 array, got shape {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def _parse_ppm_stream(payload: bytes, offset: int = 0) -> "tuple[object, int]":
    """Parse one P6 image starting at ``offset``; return (HxWx3 uint8 array,
    offset just past the pixel data). Handles comments and any whitespace
    between header tokens, per the netpbm spec."""
    import numpy as np

    if payload[offset : offset + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = offset + 2

    def _next_token(pos: int) -> "tuple[int, int]":
        while True:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment to end of line
                while pos < len(payload) and payload[pos] != 0x0A:
                    pos += 1
                continue
            break
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        return int(payload[start:pos]), pos

    w, pos = _next_token(pos)
    h, pos = _next_token(pos)
    maxval, pos = _next_token(pos)
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    pos += 1  # single whitespace byte after maxval, then raster
    n = w * h * 3
    raster = payload[pos : pos + n]
    if len(raster) != n:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3), pos + n


def encode_bmp(arr: "object") -> bytes:
    """Encode an HxWx3 uint8 RGB array as an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB, bottom-up rows, rows padded to 4 bytes)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 array, got shape {a.shape}")
    h, w, _ = a.shape
    row_size = (w * 3 + 3) & ~3
    bgr = a[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    rows = bytearray()
    pad = b"\x00" * (row_size - w * 3)
    for r in range(h):
        rows += bgr[r].tobytes() + pad
    pixel_bytes = bytes(rows)
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixel_bytes), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_bytes), 2835, 2835, 0, 0)
    return header + pixel_bytes


def _parse_bmp(payload: bytes) -> "object":
    """Parse an uncompressed 24-bit BMP into an HxWx3 uint8 RGB array
    (top-down), honoring the pixel-data offset, row padding, and the
    negative-height top-down variant."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})")
    h = abs(h_signed)
    row_size = (w * 3 + 3) & ~3
    raster = payload[data_offset : data_offset + row_size * h]
    if len(raster) != row_size * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_size)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb if h_signed < 0 else rgb[::-1]  # bottom-up unless height < 0


def decode_image(payload: bytes) -> "object":
    """Decode an image payload (PPM P6 or 24-bit BMP, sniffed by magic) to an
    HxWx3 uint8 RGB array, rows top-down."""
    if payload[:2] == b"P6":
        arr, _end = _parse_ppm_stream(payload)
        return arr
    if payload[:2] == b"BM":
        return _parse_bmp(payload)
    raise ValueError(f"unsupported image magic {payload[:2]!r}")


def encode_wav(samples: "object", sample_rate: int = 8000) -> bytes:
    """Encode an (n_samples,) or (n_samples, n_channels) int16 array as a
    PCM WAV file via the stdlib ``wave`` module."""
    import io
    import wave

    import numpy as np

    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(a.shape[1])
        wv.setsampwidth(2)
        wv.setframerate(sample_rate)
        wv.writeframes(a.tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes) -> "tuple[object, int]":
    """Decode a PCM WAV payload to ((n_samples, n_channels) int16 array,
    sample_rate) via the stdlib ``wave`` module (RIFF chunk walk, fmt/data
    parsing, interleaved frames)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wv:
        if wv.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported, got {8 * wv.getsampwidth()}-bit")
        n_channels = wv.getnchannels()
        rate = wv.getframerate()
        raw = wv.readframes(wv.getnframes())
    arr = np.frombuffer(raw, dtype="<i2").reshape(-1, n_channels)
    return arr, rate


def resize_image(payload: bytes, width: int, height: int) -> "object":
    """Decode + nearest-neighbor resize to (height, width, 3).

    src index = floor(dst index * src_extent / dst_extent) — the standard
    nearest-neighbor mapping, expressed as pure integer arithmetic so the
    DuckDB oracle can reproduce it exactly."""
    import numpy as np

    src = decode_image(payload)
    src_h, src_w = src.shape[0], src.shape[1]
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    return src[rows][:, cols]


def sample_video_frames(payload: bytes, every_n: int = 30) -> "list":
    """Decode a concatenated-PPM frame stream (an MJPEG-style container with
    P6 frames back-to-back) and keep every ``every_n``-th frame. Each frame
    is parsed with the full PPM header parser, so frame boundaries come from
    the headers, not fixed strides."""
    frames = []
    offset, idx = 0, 0
    while offset < len(payload):
        arr, offset = _parse_ppm_stream(payload, offset)
        if idx % every_n == 0:
            frames.append(arr)
        idx += 1
    return frames


# --- the real, tested plumbing ---------------------------------------------


def _features_batch_fn(pdf_iter: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    """Arrow-batch feature extraction: byte length, first byte, md5, and an
    8-bucket byte histogram (deterministic fake for 'decode + featurize')."""
    import hashlib

    import numpy as np
    import pandas as pd

    for pdf in pdf_iter:
        payloads = pdf["payload"]
        out = {
            "doc_id": pdf["doc_id"],
            "n_bytes": payloads.map(len),
            "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
            "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
        }
        hists = np.stack(
            [
                np.bincount(
                    np.frombuffer(b, dtype=np.uint8) % N_HIST_BUCKETS,
                    minlength=N_HIST_BUCKETS,
                )
                for b in payloads
            ]
        )
        for k in range(N_HIST_BUCKETS):
            out[f"h{k}"] = hists[:, k]
        yield pd.DataFrame(out)


def payload_features(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Treat document text as an opaque binary payload (stand-in for
    image/audio bytes) and extract features via ``mapInPandas``."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(_features_batch_fn, schema=META_SCHEMA)


# histogram chars via a DOTALL class ('(?s).') so newlines are counted like
# any other byte, matching the Python-side np.frombuffer over raw bytes
_HIST_SQL = ", ".join(
    f"CAST(len(list_filter(regexp_extract_all(text, '(?s).'), "
    f"c -> ascii(c) % {N_HIST_BUCKETS} = {k})) AS INTEGER) AS h{k}"
    for k in range(N_HIST_BUCKETS)
)

# first_byte sentinel: Python emits -1 for an empty payload; DuckDB's
# ascii('') is 0, which collides with a real NUL byte — align on -1.
PAYLOAD_FEATURES_SQL = f"""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(CASE WHEN length(text) = 0 THEN -1
                 ELSE ascii(substr(text, 1, 1)) END AS INTEGER) AS first_byte,
       md5(text) AS payload_md5,
       {_HIST_SQL}
FROM documents
"""


FRAME_BYTES = 16  # fake "frame" size
FRAME_STRIDE = 4  # keep every 4th frame


def _frame_sample_batch_fn(
    pdf_iter: "Iterator[pd.DataFrame]",
) -> "Iterator[pd.DataFrame]":
    """Arrow-batch frame sampling: chunk each payload into fixed-size frames,
    keep every ``FRAME_STRIDE``-th, emit (doc_id, frame_idx, frame_md5) rows.
    The row-expansion shape (one input row -> many output rows) is exactly a
    video frame-sampler's; a real decoder would replace the byte-slicing."""
    import hashlib

    import pandas as pd

    for pdf in pdf_iter:
        doc_ids: list[int] = []
        idxs: list[int] = []
        digests: list[str] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                doc_ids.append(doc_id)
                idxs.append(i)
                digests.append(
                    hashlib.md5(
                        payload[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    ).hexdigest()
                )
        yield pd.DataFrame(
            {"doc_id": doc_ids, "frame_idx": idxs, "frame_md5": digests}
        )


def frame_sample(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Frame-sampling plumbing over opaque payloads (the ``sample_video_frames``
    stub's tested stand-in): every 4th 16-byte frame of the payload, with a
    per-frame digest. The testdata payloads are ASCII text bytes, so the
    DuckDB oracle can slice with character ``substring``; the Python side
    slices raw bytes (identical for ASCII by construction)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(
        _frame_sample_batch_fn, schema="doc_id long, frame_idx int, frame_md5 string"
    )


FRAME_SAMPLE_SQL = f"""
WITH f AS (
  SELECT doc_id, text,
         CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS INT) AS n_frames
  FROM documents
),
idx AS (
  SELECT doc_id, text,
         unnest(range(0, n_frames, {FRAME_STRIDE})) AS frame_idx
  FROM f
)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       md5(substring(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
FROM idx
"""


THUMB_STRIDE = 8  # keep every 8th byte: the fake "resize"


def _thumbnail_batch_fn(
    pdf_iter: "Iterator[pd.DataFrame]",
) -> "Iterator[pd.DataFrame]":
    """Arrow-batch 'resize': stride-downsample each payload (the 1-D stand-in
    for image resizing — same schema/partitioning/batch shape a Pillow-backed
    resize would have), emitting the thumbnail as a real ``binary`` column
    plus its digest."""
    import hashlib

    import pandas as pd

    for pdf in pdf_iter:
        thumbs = pdf["payload"].map(lambda b: bytes(b[::THUMB_STRIDE]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "thumb": thumbs,
                "thumb_len": thumbs.map(len),
                "thumb_md5": thumbs.map(lambda b: hashlib.md5(b).hexdigest()),
            }
        )


def thumbnail(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Resize plumbing over opaque payloads: every ``THUMB_STRIDE``-th byte,
    returned as a binary column (+ length and digest for the oracle — DuckDB
    compares the digest; the binary column round-trips through Arrow)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    out = payloads.mapInPandas(
        _thumbnail_batch_fn,
        schema="doc_id long, thumb binary, thumb_len int, thumb_md5 string",
    )
    # the oracle compares scalar columns; the binary column is exercised by
    # tests (round-trip + digest consistency) but excluded from the hash
    return out.select("doc_id", "thumb_len", "thumb_md5")


THUMBNAIL_SQL = f"""
WITH s AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
)
SELECT doc_id,
       CAST(ceil(n / {THUMB_STRIDE}.0) AS INTEGER) AS thumb_len,
       md5(array_to_string(
             list_transform(range(1, n + 1, {THUMB_STRIDE}),
                            i -> substring(text, i, 1)), '')) AS thumb_md5
FROM s
"""


# --- decoder queries (real codecs, DuckDB-verifiable) -----------------------
#
# The testdata ships no media payloads, so each query *synthesizes* the
# payload deterministically from the document text bytes (cycled to the
# needed length), encodes it with the real encoder, decodes it with the real
# decoder, and emits integer/digest summaries. The DuckDB oracle reproduces
# the same summaries straight from character arithmetic — any header,
# row-order, padding, or sample-width bug in the codec breaks the match.
# Texts are ASCII (verified in testdata), so char position == byte position.

IMG_W, IMG_H = 8, 4  # synthesized image: 8x4x3 = 96 pixel bytes
AUDIO_N = 64  # synthesized audio: 64 mono int16 samples
AUDIO_RATE = 8000
VIDEO_FRAMES = 4  # synthesized video: 4 frames of 4x2, sample every 2nd
VIDEO_W, VIDEO_H = 4, 2
VIDEO_OFFSET = 7  # frame f reads text bytes starting at f*7
VIDEO_EVERY_N = 2
RESIZE_W, RESIZE_H = 4, 2


def _cycled_bytes(text: bytes, n: int, offset: int = 0) -> "object":
    """First ``n`` bytes of ``text`` cycled from ``offset`` (uint8 array)."""
    import numpy as np

    b = np.frombuffer(text, dtype=np.uint8)
    return b[(np.arange(offset, offset + n)) % len(b)]


def _decode_image_batch_fn(pdf_iter: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    import hashlib

    import pandas as pd

    for pdf in pdf_iter:
        rows: dict[str, list] = {
            k: []
            for k in ("doc_id", "fmt", "width", "height", "sum_r", "sum_g", "sum_b", "pixels_md5")
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            px = _cycled_bytes(bytes(payload), IMG_W * IMG_H * 3).reshape(IMG_H, IMG_W, 3)
            fmt = "ppm" if doc_id % 2 == 0 else "bmp"
            encoded = encode_ppm(px) if fmt == "ppm" else encode_bmp(px)
            arr = decode_image(encoded)
            rows["doc_id"].append(doc_id)
            rows["fmt"].append(fmt)
            rows["width"].append(arr.shape[1])
            rows["height"].append(arr.shape[0])
            sums = arr.reshape(-1, 3).sum(axis=0, dtype="int64")
            rows["sum_r"].append(int(sums[0]))
            rows["sum_g"].append(int(sums[1]))
            rows["sum_b"].append(int(sums[2]))
            rows["pixels_md5"].append(hashlib.md5(arr.tobytes()).hexdigest())
        yield pd.DataFrame(rows)


def decode_image_query(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Synthesize a PPM (even doc_id) / BMP (odd doc_id) image per document
    from cycled text bytes, round-trip through the real codec, and summarize
    the decoded pixels. The BMP path exercises bottom-up row order + BGR
    swap; identical summaries on both formats prove layout-correct decode."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(
        _decode_image_batch_fn,
        schema=(
            "doc_id long, fmt string, width int, height int, "
            "sum_r long, sum_g long, sum_b long, pixels_md5 string"
        ),
    )


_N_PX = IMG_W * IMG_H * 3

DECODE_IMAGE_SQL = f"""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt,
       CAST({IMG_W} AS INTEGER) AS width,
       CAST({IMG_H} AS INTEGER) AS height,
       CAST(list_sum(list_transform(range(0, {IMG_W * IMG_H}), k ->
         ascii(substr(text, CAST((3*k) % length(text) AS INT) + 1, 1)))) AS BIGINT) AS sum_r,
       CAST(list_sum(list_transform(range(0, {IMG_W * IMG_H}), k ->
         ascii(substr(text, CAST((3*k + 1) % length(text) AS INT) + 1, 1)))) AS BIGINT) AS sum_g,
       CAST(list_sum(list_transform(range(0, {IMG_W * IMG_H}), k ->
         ascii(substr(text, CAST((3*k + 2) % length(text) AS INT) + 1, 1)))) AS BIGINT) AS sum_b,
       md5(array_to_string(list_transform(range(0, {_N_PX}), i ->
         substr(text, CAST(i % length(text) AS INT) + 1, 1)), '')) AS pixels_md5
FROM documents
"""


def _decode_audio_batch_fn(pdf_iter: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    import pandas as pd

    for pdf in pdf_iter:
        rows: dict[str, list] = {
            k: []
            for k in ("doc_id", "sample_rate", "n_channels", "n_samples", "sum_amp", "min_amp", "max_amp")
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = (
                _cycled_bytes(bytes(payload), AUDIO_N).astype("int64") - 128
            ) * 256
            wav = encode_wav(samples.astype("<i2"), AUDIO_RATE)
            arr, rate = decode_audio(wav)
            rows["doc_id"].append(doc_id)
            rows["sample_rate"].append(rate)
            rows["n_channels"].append(arr.shape[1])
            rows["n_samples"].append(arr.shape[0])
            rows["sum_amp"].append(int(arr.sum(dtype="int64")))
            rows["min_amp"].append(int(arr.min()))
            rows["max_amp"].append(int(arr.max()))
        yield pd.DataFrame(rows)


def decode_audio_query(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Synthesize a mono 16-bit PCM WAV per document (sample k = (byte_k -
    128) * 256 over cycled text bytes), round-trip through the wave codec,
    and summarize the decoded waveform."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(
        _decode_audio_batch_fn,
        schema=(
            "doc_id long, sample_rate int, n_channels int, n_samples int, "
            "sum_amp long, min_amp int, max_amp int"
        ),
    )


DECODE_AUDIO_SQL = f"""
WITH s AS (
  SELECT doc_id,
         list_transform(range(0, {AUDIO_N}), k ->
           (ascii(substr(text, CAST(k % length(text) AS INT) + 1, 1)) - 128) * 256) AS amps
  FROM documents
)
SELECT doc_id,
       CAST({AUDIO_RATE} AS INTEGER) AS sample_rate,
       CAST(1 AS INTEGER) AS n_channels,
       CAST({AUDIO_N} AS INTEGER) AS n_samples,
       CAST(list_sum(amps) AS BIGINT) AS sum_amp,
       CAST(list_min(amps) AS INTEGER) AS min_amp,
       CAST(list_max(amps) AS INTEGER) AS max_amp
FROM s
"""


def _resize_image_batch_fn(pdf_iter: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    import pandas as pd

    for pdf in pdf_iter:
        rows: dict[str, list] = {
            k: [] for k in ("doc_id", "out_width", "out_height", "rsum_r", "rsum_g", "rsum_b")
        }
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            px = _cycled_bytes(bytes(payload), IMG_W * IMG_H * 3).reshape(IMG_H, IMG_W, 3)
            resized = resize_image(encode_ppm(px), RESIZE_W, RESIZE_H)
            rows["doc_id"].append(doc_id)
            rows["out_width"].append(resized.shape[1])
            rows["out_height"].append(resized.shape[0])
            sums = resized.reshape(-1, 3).sum(axis=0, dtype="int64")
            rows["rsum_r"].append(int(sums[0]))
            rows["rsum_g"].append(int(sums[1]))
            rows["rsum_b"].append(int(sums[2]))
        yield pd.DataFrame(rows)


def resize_image_query(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Synthesize an 8x4 PPM per document and nearest-neighbor resize to 4x2;
    the oracle recomputes the exact floor-mapped source pixels, so an
    off-by-one in the index mapping breaks the hash."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(
        _resize_image_batch_fn,
        schema=(
            "doc_id long, out_width int, out_height int, "
            "rsum_r long, rsum_g long, rsum_b long"
        ),
    )


# dst (r, c) -> src (r * IMG_H // RESIZE_H, c * IMG_W // RESIZE_W); flattened
# over k in range(RESIZE_W * RESIZE_H) with r = k // RESIZE_W, c = k % RESIZE_W.
_RESIZE_SRC_IDX = (
    f"(((k // {RESIZE_W}) * {IMG_H} // {RESIZE_H}) * {IMG_W} "
    f"+ ((k % {RESIZE_W}) * {IMG_W} // {RESIZE_W})) * 3"
)

RESIZE_IMAGE_SQL = f"""
SELECT doc_id,
       CAST({RESIZE_W} AS INTEGER) AS out_width,
       CAST({RESIZE_H} AS INTEGER) AS out_height,
       CAST(list_sum(list_transform(range(0, {RESIZE_W * RESIZE_H}), k ->
         ascii(substr(text, CAST(({_RESIZE_SRC_IDX}) % length(text) AS INT) + 1, 1)))) AS BIGINT) AS rsum_r,
       CAST(list_sum(list_transform(range(0, {RESIZE_W * RESIZE_H}), k ->
         ascii(substr(text, CAST(({_RESIZE_SRC_IDX} + 1) % length(text) AS INT) + 1, 1)))) AS BIGINT) AS rsum_g,
       CAST(list_sum(list_transform(range(0, {RESIZE_W * RESIZE_H}), k ->
         ascii(substr(text, CAST(({_RESIZE_SRC_IDX} + 2) % length(text) AS INT) + 1, 1)))) AS BIGINT) AS rsum_b
FROM documents
"""


def _video_frames_batch_fn(pdf_iter: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    import hashlib

    import pandas as pd

    n_px = VIDEO_W * VIDEO_H * 3
    for pdf in pdf_iter:
        rows: dict[str, list] = {k: [] for k in ("doc_id", "frame_idx", "frame_sum", "frame_md5")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            text = bytes(payload)
            video = b"".join(
                encode_ppm(
                    _cycled_bytes(text, n_px, offset=f * VIDEO_OFFSET).reshape(
                        VIDEO_H, VIDEO_W, 3
                    )
                )
                for f in range(VIDEO_FRAMES)
            )
            for i, frame in enumerate(sample_video_frames(video, VIDEO_EVERY_N)):
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(i * VIDEO_EVERY_N)
                rows["frame_sum"].append(int(frame.sum(dtype="int64")))
                rows["frame_md5"].append(hashlib.md5(frame.tobytes()).hexdigest())
        yield pd.DataFrame(rows)


def video_frames_query(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Synthesize a 4-frame concatenated-PPM 'video' per document (frame f
    reads cycled text bytes starting at f*{VIDEO_OFFSET}) and sample every
    2nd frame through the real stream parser; frame boundaries come from the
    PPM headers, so a header-length bug shifts every later frame's digest."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return payloads.mapInPandas(
        _video_frames_batch_fn,
        schema="doc_id long, frame_idx int, frame_sum long, frame_md5 string",
    )


_VID_N_PX = VIDEO_W * VIDEO_H * 3

VIDEO_FRAMES_SQL = f"""
WITH fr AS (
  SELECT doc_id, text, unnest(range(0, {VIDEO_FRAMES}, {VIDEO_EVERY_N})) AS frame_idx
  FROM documents
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(list_sum(list_transform(range(0, {_VID_N_PX}), i ->
         ascii(substr(text, CAST((frame_idx * {VIDEO_OFFSET} + i) % length(text) AS INT) + 1, 1)))) AS BIGINT) AS frame_sum,
       md5(array_to_string(list_transform(range(0, {_VID_N_PX}), i ->
         substr(text, CAST((frame_idx * {VIDEO_OFFSET} + i) % length(text) AS INT) + 1, 1)), '')) AS frame_md5
FROM fr
"""


# --- perceptual image dedup (aHash) ------------------------------------------

AHASH_BITS = IMG_W * IMG_H  # 32-bit average hash over the 8x4 synthetic image


def _ahash_batch_fn(pdf_iter: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    import numpy as np
    import pandas as pd

    for pdf in pdf_iter:
        rows: dict[str, list] = {"doc_id": [], "ahash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            px = _cycled_bytes(bytes(payload), IMG_W * IMG_H * 3).reshape(
                IMG_H, IMG_W, 3
            )
            fmt_ppm = doc_id % 2 == 0
            encoded = encode_ppm(px) if fmt_ppm else encode_bmp(px)
            arr = decode_image(encoded)
            # integer grayscale keeps the hash bit-identical to the oracle's
            # character arithmetic — no float luminance weights
            gray = arr.astype("int64").sum(axis=2) // 3
            flat = gray.reshape(-1)
            bits = (flat * AHASH_BITS >= flat.sum()).astype("int64")
            rows["doc_id"].append(doc_id)
            rows["ahash"].append(int((bits << np.arange(AHASH_BITS)).sum()))
        yield pd.DataFrame(rows)


def image_ahash_dedup(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Perceptual image dedup via average hash: decode each (synthesized,
    real-codec round-tripped) image, threshold every grayscale pixel
    against the image mean into a bit, and group documents by the
    resulting 32-bit aHash — the cheap perceptual fingerprint image
    pipelines use before any embedding model. Output per document:
    (doc_id, ahash, group_size, keeper) with the lowest doc_id the
    canonical keeper of its perceptual group.

    Shape at scale: the decode+hash is Arrow-batched ``mapInPandas``
    (stateless, shuffle-free); grouping is one uniform groupBy on the
    64-bit-bounded hash — exactly the ``dedup_exact`` shape with a
    perceptual key. Near-dup (hamming-banded) pairing would reuse the
    SimHash banding machinery on this same column."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    hashed = payloads.mapInPandas(
        _ahash_batch_fn, schema="doc_id long, ahash long"
    )
    groups = hashed.groupBy("ahash").agg(
        F.count("*").alias("group_size"),
        F.min("doc_id").alias("keeper_id"),
    )
    return hashed.join(groups, "ahash").select(
        "doc_id",
        "ahash",
        "group_size",
        (F.col("doc_id") == F.col("keeper_id")).alias("keeper"),
    )


_GRAY_SQL = (
    f"list_transform(range(0, {AHASH_BITS}), k -> ("
    "ascii(substr(text, CAST((3*k) % length(text) AS INT) + 1, 1))"
    " + ascii(substr(text, CAST((3*k + 1) % length(text) AS INT) + 1, 1))"
    " + ascii(substr(text, CAST((3*k + 2) % length(text) AS INT) + 1, 1))"
    ") // 3)"
)

IMAGE_AHASH_DEDUP_SQL = f"""
WITH g AS (
  SELECT doc_id, {_GRAY_SQL} AS gs FROM documents
),
h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, {AHASH_BITS}), k ->
           CASE WHEN {AHASH_BITS} * gs[CAST(k AS INT) + 1] >= list_sum(gs)
                THEN CAST(1 AS BIGINT) << CAST(k AS INT) ELSE 0 END))
           AS BIGINT) AS ahash
  FROM g
),
grp AS (
  SELECT ahash, COUNT(*) AS group_size, MIN(doc_id) AS keeper_id
  FROM h GROUP BY 1
)
SELECT h.doc_id, h.ahash, CAST(grp.group_size AS BIGINT) AS group_size,
       h.doc_id = grp.keeper_id AS keeper
FROM h JOIN grp USING (ahash)
"""


# --- perceptual audio dedup (frame-energy fingerprint) -----------------------

AUDIO_FRAMES = 16  # 64 samples -> 16 frames of 4
AUDIO_FRAME_LEN = AUDIO_N // AUDIO_FRAMES


def _audio_fp_batch_fn(pdf_iter: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
    import numpy as np
    import pandas as pd

    for pdf in pdf_iter:
        rows: dict[str, list] = {"doc_id": [], "audio_fp": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples = (
                _cycled_bytes(bytes(payload), AUDIO_N).astype("int64") - 128
            ) * 256
            wav = encode_wav(samples.astype("<i2"), AUDIO_RATE)
            arr, _rate = decode_audio(wav)
            # integer frame energies keep the fingerprint bit-identical to
            # the oracle's character arithmetic
            energy = (
                np.abs(arr.astype("int64").reshape(-1))
                .reshape(AUDIO_FRAMES, AUDIO_FRAME_LEN)
                .sum(axis=1)
            )
            bits = (energy * AUDIO_FRAMES >= energy.sum()).astype("int64")
            rows["doc_id"].append(doc_id)
            rows["audio_fp"].append(int((bits << np.arange(AUDIO_FRAMES)).sum()))
        yield pd.DataFrame(rows)


def audio_fingerprint_dedup(spark: "SparkSession", sf_dir: str) -> "DataFrame":
    """Perceptual audio dedup via a frame-energy fingerprint: decode each
    (synthesized, real-codec round-tripped) WAV, split the waveform into
    fixed frames, threshold every frame's absolute energy against the
    clip mean into a bit, and group clips by the resulting fingerprint —
    the audio twin of :func:`image_ahash_dedup` (Shazam-class
    constellation hashing reduced to its mean-threshold core). Output per
    document: (doc_id, audio_fp, group_size, keeper).

    Same scale shape as the image path: stateless Arrow-batched decode +
    hash, one uniform groupBy on the bounded fingerprint."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    payloads = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    hashed = payloads.mapInPandas(
        _audio_fp_batch_fn, schema="doc_id long, audio_fp long"
    )
    groups = hashed.groupBy("audio_fp").agg(
        F.count("*").alias("group_size"),
        F.min("doc_id").alias("keeper_id"),
    )
    return hashed.join(groups, "audio_fp").select(
        "doc_id",
        "audio_fp",
        "group_size",
        (F.col("doc_id") == F.col("keeper_id")).alias("keeper"),
    )


AUDIO_FP_DEDUP_SQL = f"""
WITH s AS (
  SELECT doc_id,
         list_transform(range(0, {AUDIO_N}), k ->
           (ascii(substr(text, CAST(k % length(text) AS INT) + 1, 1)) - 128)
           * 256) AS amps
  FROM documents
),
e AS (
  SELECT doc_id,
         list_transform(range(0, {AUDIO_FRAMES}), f ->
           list_sum(list_transform(range(0, {AUDIO_FRAME_LEN}), j ->
             abs(amps[CAST(f * {AUDIO_FRAME_LEN} + j AS INT) + 1])))) AS en
  FROM s
),
h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, {AUDIO_FRAMES}), f ->
           CASE WHEN {AUDIO_FRAMES} * en[CAST(f AS INT) + 1] >= list_sum(en)
                THEN CAST(1 AS BIGINT) << CAST(f AS INT) ELSE 0 END))
           AS BIGINT) AS audio_fp
  FROM e
),
grp AS (
  SELECT audio_fp, COUNT(*) AS group_size, MIN(doc_id) AS keeper_id
  FROM h GROUP BY 1
)
SELECT h.doc_id, h.audio_fp, CAST(grp.group_size AS BIGINT) AS group_size,
       h.doc_id = grp.keeper_id AS keeper
FROM h JOIN grp USING (audio_fp)
"""


QUERIES: dict[str, tuple[Callable, str]] = {
    "multimodal_payload_features": (payload_features, PAYLOAD_FEATURES_SQL),
    "multimodal_image_ahash_dedup": (image_ahash_dedup, IMAGE_AHASH_DEDUP_SQL),
    "multimodal_audio_fp_dedup": (audio_fingerprint_dedup, AUDIO_FP_DEDUP_SQL),
    "multimodal_frame_sample": (frame_sample, FRAME_SAMPLE_SQL),
    "multimodal_thumbnail": (thumbnail, THUMBNAIL_SQL),
    "multimodal_decode_image": (decode_image_query, DECODE_IMAGE_SQL),
    "multimodal_decode_audio": (decode_audio_query, DECODE_AUDIO_SQL),
    "multimodal_resize_image": (resize_image_query, RESIZE_IMAGE_SQL),
    "multimodal_video_frames": (video_frames_query, VIDEO_FRAMES_SQL),
}
