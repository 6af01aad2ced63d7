"""Multimodal column handling: opaque ``binary`` payloads with typed
metadata, decoded / feature-extracted through Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the real decoders are STUBS
(clearly marked, raising ``NotImplementedError``); the Spark-side plumbing —
binary columns, schemas, Arrow batch shapes, partition-parallel UDF
execution — is real and oracle-tested via a deterministic fake feature
extractor over the payload bytes.

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


# --- stubbed real decoders (no media libs in this container) ----------------


def decode_image(payload: bytes) -> "object":
    """STUB: decode an image payload to HxWxC uint8.

    Requires an image library (e.g. Pillow) not present in this container;
    the Spark-side plumbing is exercised via ``payload_features`` instead.
    """
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "container; use payload_features for the plumbing-tested fake path"
    )


def decode_audio(payload: bytes) -> "object":
    """STUB: decode an audio payload to a waveform array (see decode_image)."""
    raise NotImplementedError("audio decoding not available in this container")


def sample_video_frames(payload: bytes, every_n: int = 30) -> "object":
    """STUB: sample every-n-th frame of a video payload (see decode_image)."""
    raise NotImplementedError("video decoding not available in this container")


def resize_image(payload: bytes, width: int, height: int) -> "object":
    """STUB: decode + resize an image payload (see decode_image); the
    plumbing-tested stand-in is ``thumbnail`` (byte-stride downsampling)."""
    raise NotImplementedError("image decoding not available in this container")


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


QUERIES: dict[str, tuple[Callable, str]] = {
    "multimodal_payload_features": (payload_features, PAYLOAD_FEATURES_SQL),
    "multimodal_frame_sample": (frame_sample, FRAME_SAMPLE_SQL),
    "multimodal_thumbnail": (thumbnail, THUMBNAIL_SQL),
}
