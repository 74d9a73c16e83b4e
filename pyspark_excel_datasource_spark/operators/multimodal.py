"""Multimodal column handling (SURVEY.md §2.4).

Convention: a modality payload is an opaque ``binary`` column plus a typed
metadata struct — the schema pattern that scales (payload bytes never pass
through Python unless a stage needs them; metadata predicates prune at the
parquet/row-group level).

Real here: schemas, partitioning, Arrow batch flow, UDF signatures, the
byte-level feature extractor, and the frame-sampling plumbing. Stubbed
here: actual image/audio decode (no codec libraries in this container) —
``decode_payload`` raises ``NotImplementedError`` unless
``deterministic_fake=True``, which produces a documented fake decode that
keeps the pipeline executable and testable end-to-end.

The testdata has no binary table, so payloads derive from ``documents``
text (utf-8 bytes) — byte semantics are identical to real media payloads
from the engine's point of view.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import query

try:  # real image decode lights up when a codec library exists
    from PIL import Image as _PILImage

    _HAVE_PIL = True
except ImportError:  # not in this container — the documented stub applies
    _PILImage = None
    _HAVE_PIL = False

#: fixed feature dimensionality for the byte-histogram extractor
_FEATURE_DIM = 16


@query(
    "q_multimodal_cols",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
           MD5(text) AS payload_md5,
           UPPER(HEX(ENCODE(SUBSTR(text, 1, 8)))) AS head_hex,
           CASE WHEN n_chars > 300 THEN 'large' ELSE 'small' END AS size_class,
           source AS media_source
    FROM documents
    """,
)
def q_multimodal_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata: byte length, content hash,
    magic-bytes prefix, and a metadata-derived partition class. These are
    exactly the operations a media pipeline runs *without* decoding —
    dedup by hash, routing by size/kind, header sniffing."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.upper(F.hex(F.encode(F.substring("text", 1, 8), "UTF-8"))).alias("head_hex"),
        F.when(F.col("n_chars") > 300, "large").otherwise("small").alias("size_class"),
        F.col("source").alias("media_source"),
    )


def with_payload(df: DataFrame) -> DataFrame:
    """documents → multimodal convention: (doc_id, payload binary, meta struct)."""
    return df.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, mime: str, deterministic_fake: bool = False):
    """Decode one payload to a (height, width, channels, pixel-sum) tuple.

    Dispatch, in order:

    1. ``deterministic_fake=True`` → seeded, documented fake deriving a
       plausible shape + checksum purely from the bytes (keeps the
       distributed plumbing testable in codec-less environments).
    2. PIL importable and the mime is an image → real decode (shape +
       exact pixel sum). Not exercised in this container (no PIL) but the
       path is live wherever a codec library exists.
    3. Otherwise → NotImplementedError: real decode needs a codec library.
    """
    if deterministic_fake:
        h = 1 + len(payload) % 64
        w = 1 + (len(payload) * 7) % 64
        c = 3
        pixel_sum = int(np.frombuffer(payload, dtype=np.uint8).sum())
        return h, w, c, pixel_sum
    if _HAVE_PIL and mime.startswith("image/"):
        import io

        img = _PILImage.open(io.BytesIO(payload))
        arr = np.asarray(img)
        h, w = arr.shape[0], arr.shape[1]
        c = arr.shape[2] if arr.ndim == 3 else 1
        return h, w, c, int(arr.astype(np.int64).sum())
    raise NotImplementedError(
        "payload decode needs a codec library (PIL/av); not available here"
    )


def decode_batches(
    batches: Iterator[pd.DataFrame], deterministic_fake: bool = True
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: payload → decoded shape metadata. Arrow batches
    stream through; one Python round-trip per batch, never per row."""
    for pdf in batches:
        decoded = [
            decode_payload(p, m, deterministic_fake)
            for p, m in zip(pdf["payload"], pdf["mime"])
        ]
        out = pd.DataFrame(decoded, columns=["height", "width", "channels", "pixel_sum"])
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def decode_dataframe(df: DataFrame) -> DataFrame:
    """Distributed decode: payload+meta → shape metadata (fake decode)."""
    src = df.select("doc_id", "payload", F.col("meta.mime").alias("mime"))
    return src.mapInPandas(
        decode_batches,
        schema="doc_id long, height int, width int, channels int, pixel_sum long",
    )


def byte_histogram_features(df: DataFrame, dim: int = _FEATURE_DIM) -> DataFrame:
    """Feature extraction: normalized byte histogram (``dim`` buckets) as
    ``array<double>`` — a real, deterministic feature extractor with the
    same signature a CNN/CLIP embedder UDF would have."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> int(8 - np.log2(dim)), minlength=dim)
                total = max(1, int(hist.sum()))
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "payload").mapInPandas(
        extract, schema=f"doc_id long, features array<double>"
    )


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame sampling plumbing: one payload row → N 'frame' rows (offset +
    fixed-width byte window), the same explode shape video frame-sampling
    produces. Pure built-ins (posexplode over a computed offset array)."""
    n_frames = (F.col("meta.n_bytes") / every_n_bytes).cast("int")
    offsets = F.transform(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i * every_n_bytes,
    )
    return (
        df.select(
            "doc_id",
            "payload",
            F.posexplode(offsets).alias("frame_idx", "byte_offset"),
        )
        # second select: the offset column must exist before the window
        # slice — each frame reads ITS window, not the first one's.
        .select(
            "doc_id",
            "frame_idx",
            "byte_offset",
            F.expr(f"substring(payload, byte_offset + 1, {every_n_bytes})").alias(
                "frame_bytes"
            ),
        )
        .select(
            "doc_id",
            "frame_idx",
            "byte_offset",
            F.octet_length("frame_bytes").alias("frame_size"),
            F.md5("frame_bytes").alias("frame_md5"),
        )
    )


@query("q_multimodal_features")  # byte-level features → rows-only check
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: payload convention → streamed
    Arrow decode (fake) → byte-histogram features, joined on doc_id."""
    docs = with_payload(table(spark, sf_dir, "documents"))
    decoded = decode_dataframe(docs)
    feats = byte_histogram_features(docs)
    return (
        decoded.join(feats, "doc_id")
        .select("doc_id", "height", "width", "pixel_sum", "features")
    )
