"""Multimodal column handling (SURVEY.md §2.4).

Convention: a modality payload is an opaque ``binary`` column plus a typed
metadata struct — the schema pattern that scales (payload bytes never pass
through Python unless a stage needs them; metadata predicates prune at the
parquet/row-group level).

Real here: schemas, partitioning, Arrow batch flow, UDF signatures, the
byte-level feature extractor, the frame-sampling plumbing, and stdlib
PNG/JPEG *header* decode (``parse_image_header``: real width/height/
channels from IHDR / SOFn, no codec needed). Stubbed here: pixel-level
image/audio decode (no codec libraries in this container) —
``decode_payload`` raises ``NotImplementedError`` for non-PNG/JPEG bytes
unless ``deterministic_fake=True``, which produces a documented fake
decode that keeps the pipeline executable and testable end-to-end.

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

from ..catalog import spread, table
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


#: PNG color type → channel count (IHDR byte 25)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: JPEG SOFn markers that carry frame dimensions (C4/C8/CC are not SOFs)
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes) -> tuple[int, int, int] | None:
    """Pure-stdlib (height, width, channels) from a PNG IHDR or JPEG SOFn
    header; ``None`` if the bytes are neither.

    This is a *real* decode of the container header — the part of image
    decoding that needs no codec math — so shape metadata (resize
    planning, aspect filtering, thumbnail routing) works in environments
    without PIL. Pixel data still needs a codec library.
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        color_type = payload[25] if len(payload) > 25 else 6
        return h, w, _PNG_CHANNELS.get(color_type, 3)
    if payload[:2] == b"\xff\xd8":  # JPEG SOI; walk the marker segments
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                return None  # corrupt marker stream
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if marker in _JPEG_SOF_MARKERS:
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return h, w, payload[i + 9]
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:
                return None
            i += 2 + seg_len
    return None


def decode_payload(payload: bytes, mime: str, deterministic_fake: bool = False):
    """Decode one payload to a (height, width, channels, pixel-sum) tuple.

    Dispatch, in order:

    1. ``deterministic_fake=True`` → seeded, documented fake deriving a
       plausible shape + checksum purely from the bytes (keeps the
       distributed plumbing testable in codec-less environments).
    2. PIL importable and the mime is an image → real decode (shape +
       exact pixel sum). Not exercised in this container (no PIL) but the
       path is live wherever a codec library exists.
    3. PNG/JPEG magic bytes → stdlib header parse (real dimensions +
       channels from IHDR / SOFn; pixel_sum None — pixel data genuinely
       needs a codec).
    4. Otherwise → NotImplementedError: real decode needs a codec library.
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
    header = parse_image_header(payload)
    if header is not None:
        h, w, c = header
        return h, w, c, None
    raise NotImplementedError(
        "payload decode needs a codec library (PIL/av); not available here"
    )


def decode_batches(
    batches: Iterator[pd.DataFrame], deterministic_fake: bool = True
) -> Iterator[pd.DataFrame]:
    """mapInPandas body: payload → decoded shape metadata. Arrow batches
    stream through; one Python round-trip per batch, never per row.

    Real PNG/JPEG payloads always get the real stdlib header decode;
    ``deterministic_fake`` only governs what happens to payloads no
    codec-less decode exists for (text-derived fixtures → documented
    fake; ``False`` → raise at the codec boundary).
    """
    for pdf in batches:
        decoded = []
        for p, m in zip(pdf["payload"], pdf["mime"]):
            header = parse_image_header(p)
            if header is not None:
                decoded.append((*header, None))
            else:
                decoded.append(decode_payload(p, m, deterministic_fake))
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


@query(
    "q_multimodal_features",
    oracle="""
    WITH bytes AS (
        SELECT doc_id,
               LIST_TRANSFORM(STR_SPLIT(text, ''), c -> ASCII(c)) AS bs,
               OCTET_LENGTH(ENCODE(text)) AS nb
        FROM documents
    ),
    feat AS (
        SELECT doc_id, nb,
               LIST_TRANSFORM(RANGE(0, 16), i -> CAST(FLOOR(
                   CAST(LEN(LIST_FILTER(bs, x -> x // 16 = i)) AS DOUBLE)
                   / GREATEST(nb, 1) * 1000000000 + 0.5) AS BIGINT)) AS fp,
               CAST(LIST_SUM(bs) AS BIGINT) AS pixel_sum
        FROM bytes
    )
    SELECT doc_id,
           CAST(1 + nb % 64 AS INT) AS height,
           CAST(1 + (nb * 7) % 64 AS INT) AS width,
           pixel_sum,
           MD5(ARRAY_TO_STRING(fp, ',')) AS features_md5,
           CAST(LIST_SUM(fp) AS BIGINT) AS features_l1_fp,
           CAST(LIST_POSITION(fp, LIST_MAX(fp)) AS INT) AS argmax_bucket
    FROM feat
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline: payload convention → streamed
    Arrow decode (fake) → byte-histogram features, joined on doc_id.

    Hash-verified end to end even though the decode runs in Python
    (mapInPandas): the documented deterministic-fake decode and the
    byte-histogram extractor are both pure integer/byte arithmetic, and
    the fixture payloads are ASCII, so the DuckDB oracle reproduces the
    Arrow pipeline's exact outputs from SQL — any drift in the Pandas
    UDF batch handling (dtype coercion, batch boundaries, ordering)
    breaks the hash. The feature vector is presented as scalar columns:
    an md5 digest over the 9-decimal fixed-point elements joined with
    ',' (one canonical spelling in both engines), its L1 norm, and the
    argmax bucket (first-occurrence tie rule in both engines).
    """
    docs = with_payload(table(spark, sf_dir, "documents"))
    decoded = decode_dataframe(docs)
    fp = F.transform(
        "features", lambda v: F.floor(v * F.lit(1e9) + F.lit(0.5)).cast("long")
    )
    feats = byte_histogram_features(docs).select(
        "doc_id",
        F.md5(F.array_join(fp, ",")).alias("features_md5"),
        F.aggregate(
            fp, F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("features_l1_fp"),
        F.expr(
            "array_position(features, array_max(features))"
        ).cast("int").alias("argmax_bucket"),
    )
    return (
        decoded.join(feats, "doc_id")
        .select(
            "doc_id",
            "height",
            "width",
            F.col("pixel_sum").cast("long").alias("pixel_sum"),
            "features_md5",
            "features_l1_fp",
            "argmax_bucket",
        )
    )


@query(
    "q_multimodal_dedup",
    oracle="""
    SELECT MD5(text) AS payload_md5,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies,
           CAST(MIN(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS n_bytes
    FROM documents
    GROUP BY MD5(text)
    """,
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact payload deduplication by content hash — the first pass of
    every multimodal ingest (byte-identical images/audio recur constantly
    in crawls; SimHash/pHash near-dup only runs on the survivors).

    Scale shape: the ONE shuffle moves 16-byte md5 keys + tiny metadata,
    never payload bytes — at 100 TB of media the exchange is ~0.1% of
    input. Hashing runs JVM-side inside the scan stage (no Python); the
    min-doc_id keeper rule is deterministic. Payload = utf-8 bytes of
    ``text`` (the container's binary stand-in; byte semantics identical).
    """
    return payload_dedup(table(spark, sf_dir, "documents"))


def payload_dedup(d: DataFrame) -> DataFrame:
    """Exact payload-hash dedup plan over a documents frame (see
    ``q_multimodal_dedup``); reused by ``tools/scale_stress.py``."""
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        d.select(
            F.md5(payload).alias("payload_md5"),
            "doc_id",
            F.octet_length(payload).cast("long").alias("nb"),
        )
        .groupBy("payload_md5")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
            F.min("nb").alias("n_bytes"),
        )
    )


@query(
    "q_multimodal_frames",
    oracle="""
    SELECT doc_id,
           CAST(g.i AS INT) AS frame_idx,
           CAST(g.i * 64 AS INT) AS byte_offset,
           CAST(OCTET_LENGTH(ENCODE(SUBSTR(text, g.i * 64 + 1, 64)))
                AS INT) AS frame_size,
           MD5(SUBSTR(text, g.i * 64 + 1, 64)) AS frame_md5
    FROM documents,
         UNNEST(GENERATE_SERIES(0,
             GREATEST(CAST(OCTET_LENGTH(ENCODE(text)) // 64 AS INT) - 1, 0)
         )) AS g(i)
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling as a registered, hash-verified operator: one
    payload row → N fixed-width byte-window 'frame' rows with offsets
    and content digests — the exact explode shape video frame-sampling
    and audio windowing produce (``sample_frames`` plumbing; the decode
    of each window is the codec-stub boundary, its addressing is not).

    Pure built-ins: posexplode over a computed offset array + substring
    on the binary payload — codegen'd generator, no Python, no shuffle
    (map-only). The oracle reproduces the byte windows character-wise
    (the fixture corpus is pure ASCII, asserted cheaply by frame_size
    itself: any multi-byte character would break the size match).
    """
    docs = with_payload(table(spark, sf_dir, "documents"))
    return sample_frames(docs, every_n_bytes=64).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("byte_offset").cast("int").alias("byte_offset"),
        F.col("frame_size").cast("int").alias("frame_size"),
        "frame_md5",
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (the storage-dedup boundary primitive)
# ---------------------------------------------------------------------------

#: rolling 4-byte polynomial (base-31) and the boundary modulus — a chunk
#: boundary lands wherever hash % 64 == 0, giving ~64-byte expected chunks
_CDC_MOD = 64


@query(
    "q_content_chunking",
    oracle=f"""
    WITH c AS (
        SELECT doc_id,
               LIST_TRANSFORM(STRING_SPLIT(text, ''), ch -> ASCII(ch))
                   AS codes
        FROM documents
    ),
    b AS (
        SELECT doc_id, LEN(codes) AS n_bytes,
               LIST_FILTER(RANGE(4, LEN(codes) + 1),
                   i -> (codes[i-3]*29791 + codes[i-2]*961
                         + codes[i-1]*31 + codes[i]) % {_CDC_MOD} = 0)
                   AS bnd
        FROM c
    )
    SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(LEN(bnd) + 1 AS BIGINT) AS n_chunks,
           CAST(n_bytes AS DOUBLE) / (LEN(bnd) + 1) AS avg_chunk,
           MD5(COALESCE(ARRAY_TO_STRING(bnd, ','), '')) AS layout_hash
    FROM b
    """,
)
def q_content_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (Rabin-style): chunk boundaries land
    wherever a rolling 4-byte polynomial hash ≡ 0 (mod 64), so
    boundaries follow CONTENT, not offsets — insert one byte and only
    the chunks around the edit change, which is what makes dedup
    storage (and multimodal payload dedup beyond exact-match) work.
    Reported per payload: size, chunk count, mean chunk size, and an
    md5 of the boundary layout (hash-verifying the exact cut points
    without shipping them).

    Entirely row-local higher-order array math — ONE pass builds the
    byte-code array (O(n) via char split, no quadratic substring
    scanning), one filtered index sequence finds boundaries; no
    shuffle, no Python: a map-only stage at scan bandwidth, like every
    payload op in this module. Payloads are the documents' utf-8 bytes
    (the module convention); a binary column chunks identically.
    """
    d = spread(table(spark, sf_dir, "documents"))
    codes = F.expr("transform(split(text, ''), ch -> ascii(ch))")
    with_codes = d.select("doc_id", codes.alias("codes"))
    bnd = F.expr(
        f"filter(sequence(4, size(codes)),"
        f" i -> (element_at(codes, i-3)*29791 + element_at(codes, i-2)*961"
        f"       + element_at(codes, i-1)*31 + element_at(codes, i))"
        f" % {_CDC_MOD} = 0)"
    )
    out = with_codes.select(
        "doc_id",
        F.size("codes").cast("long").alias("n_bytes"),
        bnd.alias("bnd"),
    )
    n_chunks = F.size("bnd") + 1
    return out.select(
        "doc_id",
        "n_bytes",
        n_chunks.cast("long").alias("n_chunks"),
        (F.col("n_bytes").cast("double") / n_chunks).alias("avg_chunk"),
        F.md5(F.concat_ws(",", F.transform(F.col("bnd"), lambda i: i.cast("string")))).alias(
            "layout_hash"
        ),
    )


@query(
    "q_chunk_dedup",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, source, text,
               LIST_TRANSFORM(STRING_SPLIT(text, ''), ch -> ASCII(ch))
                   AS codes
        FROM documents
    ),
    b AS (
        SELECT doc_id, source, text, LEN(codes) AS n,
               LIST_PREPEND(1, LIST_TRANSFORM(
                   LIST_FILTER(RANGE(4, LEN(codes) + 1),
                       i -> (codes[i-3]*29791 + codes[i-2]*961
                             + codes[i-1]*31 + codes[i]) % {_CDC_MOD} = 0),
                   x -> x + 1)) AS starts
        FROM c
    ),
    ch AS (
        SELECT source,
               MD5(SUBSTR(text, starts[k],
                          COALESCE(starts[k+1], n+1) - starts[k])) AS h,
               COALESCE(starts[k+1], n+1) - starts[k] AS clen
        FROM b CROSS JOIN UNNEST(RANGE(1, LEN(starts) + 1)) AS t(k)
        WHERE COALESCE(starts[k+1], n+1) - starts[k] > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS uniq_chunks,
           CAST(SUM(clen) AS BIGINT) AS total_bytes,
           1.0 - CAST(COUNT(DISTINCT h) AS DOUBLE) / COUNT(*) AS dup_ratio
    FROM ch GROUP BY source
    """,
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup census over the content-defined chunks of
    ``q_content_chunking``: per source, how many chunks exist, how many
    are distinct, and the duplicate ratio — the number that says what a
    content-addressed store would actually save (exact-doc dedup sees
    0% here; chunk-level sees the shared substrings inside near-dups).

    Chunks never leave their task as text: each one reduces to its md5
    at the scan and the census shuffles 16-byte hashes keyed per
    source. The boundary pass is the same O(n) higher-order scan as
    ``q_content_chunking``; chunk extraction here re-substrings per
    chunk (fine at document sizes — a production payload pipeline
    fuses boundary + extract in one ``mapInArrow`` pass, which
    ``byte_histogram_features`` demonstrates the plumbing for).
    """
    return chunk_census(spread(table(spark, sf_dir, "documents")))


def chunk_frame(d: DataFrame) -> DataFrame:
    """(doc_id, source, chunk md5, chunk length) rows from the
    content-defined chunking of each document (shared plan: the census
    and the chunk-based near-dup both build on it)."""
    # One self-contained expression computes the whole chunk list per doc.
    # The single-element-array + lambda trick (transform(array(e), v -> ...))
    # BINDS each intermediate (codes, starts) to a lambda variable so it is
    # evaluated once per document -- without it, projection collapse inlines
    # the O(n) boundary scan into every element_at reference (measured 20x
    # slower). The generator then explodes the finished struct array. Note
    # the [0] subscripts: Spark's [] operator is 0-based (element_at is the
    # 1-based one).
    chunks = F.expr(
        f"""
        transform(array(transform(split(text, ''), ch -> ascii(ch))), codes ->
          transform(array(concat(array(1), transform(
              filter(sequence(4, size(codes)),
                  i -> (element_at(codes, i-3)*29791 + element_at(codes, i-2)*961
                        + element_at(codes, i-1)*31 + element_at(codes, i))
                       % {_CDC_MOD} = 0),
              x -> x + 1))), starts ->
            transform(sequence(1, size(starts)), k ->
              named_struct(
                'clen', coalesce(try_element_at(starts, k+1), size(codes)+1)
                        - element_at(starts, k),
                'h', md5(substring(text, element_at(starts, k),
                         coalesce(try_element_at(starts, k+1), size(codes)+1)
                         - element_at(starts, k)))))
          )[0]
        )[0]
        """
    )
    return (
        d.select("doc_id", "source", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            "source",
            F.col("c.clen").alias("clen"),
            F.col("c.h").alias("h"),
        )
        .filter(F.col("clen") > 0)
    )


def chunk_census(d: DataFrame) -> DataFrame:
    """Per-source chunk dedup census over ``chunk_frame``."""
    ch = chunk_frame(d)
    return ch.groupBy("source").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.count_distinct("h").cast("long").alias("uniq_chunks"),
        F.sum("clen").cast("long").alias("total_bytes"),
        (1.0 - F.count_distinct("h").cast("double") / F.count("*")).alias(
            "dup_ratio"
        ),
    )


#: posting-list cap for chunk-based candidate generation: chunks shared by
#: more docs than this are boilerplate and generate quadratic pairs
_CHUNK_MAX_DF = 32
#: containment floor for a reported near-dup pair
_CHUNK_CONTAIN = 0.5


@query(
    "q_dedup_chunks",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, text,
               LIST_TRANSFORM(STRING_SPLIT(text, ''), ch -> ASCII(ch))
                   AS codes
        FROM documents
    ),
    b AS (
        SELECT doc_id, text, LEN(codes) AS n,
               LIST_PREPEND(1, LIST_TRANSFORM(
                   LIST_FILTER(RANGE(4, LEN(codes) + 1),
                       i -> (codes[i-3]*29791 + codes[i-2]*961
                             + codes[i-1]*31 + codes[i]) % {_CDC_MOD} = 0),
                   x -> x + 1)) AS starts
        FROM c
    ),
    ch AS (
        SELECT DISTINCT doc_id,
               MD5(SUBSTR(text, starts[k],
                          COALESCE(starts[k+1], n+1) - starts[k])) AS h
        FROM b CROSS JOIN UNNEST(RANGE(1, LEN(starts) + 1)) AS t(k)
        WHERE COALESCE(starts[k+1], n+1) - starts[k] > 0
    ),
    df AS (SELECT h, COUNT(*) AS df FROM ch GROUP BY h),
    rare AS (
        SELECT ch.doc_id, ch.h FROM ch JOIN df ON ch.h = df.h
        WHERE df.df <= {_CHUNK_MAX_DF}
    ),
    counts AS (SELECT doc_id, COUNT(*) AS nc FROM ch GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS shared
        FROM rare a JOIN rare b2 ON a.h = b2.h AND a.doc_id < b2.doc_id
        GROUP BY 1, 2
    )
    SELECT p.doc_a, p.doc_b, p.shared,
           CAST(p.shared AS DOUBLE) / ca.nc AS containment
    FROM pairs p JOIN counts ca ON p.doc_a = ca.doc_id
    WHERE CAST(p.shared AS DOUBLE) / ca.nc >= {_CHUNK_CONTAIN}
    """,
)
def q_dedup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-based near-dup detection — the storage-level sibling of
    MinHash: two documents are near-dups when they SHARE most of their
    content-defined chunks (containment = shared ÷ doc_a's chunks ≥
    0.5). Because boundaries follow content, an edited copy still
    shares every chunk outside the edit — the same property that makes
    ``q_chunk_dedup``'s store save bytes finds the neighbors here.

    Scale shape: candidates come ONLY from shared-chunk posting lists
    (an equi-join on 16-byte chunk hashes — never all pairs), and
    posting lists are df-capped at 32 (a chunk shared by more docs is
    boilerplate; its pairs are quadratic noise — the same cap strategy
    as the char-gram and inverted-index operators, mirrored in the
    oracle). Per-doc chunk sets are DISTINCT'd before joining so a
    repeated chunk inside one doc can't double-count containment.
    """
    d = spread(table(spark, sf_dir, "documents"))
    ch = chunk_frame(d).select("doc_id", "h").distinct()
    df_tbl = ch.groupBy("h").agg(F.count("*").alias("df"))
    rare = ch.join(
        df_tbl.filter(F.col("df") <= _CHUNK_MAX_DF), "h"
    ).select("doc_id", "h")
    counts = ch.groupBy("doc_id").agg(F.count("*").alias("nc"))
    a = rare.alias("a")
    b = rare.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("shared"))
    )
    contained = pairs.join(
        F.broadcast(counts.withColumnRenamed("doc_id", "doc_a")), "doc_a"
    ).select(
        "doc_a",
        "doc_b",
        "shared",
        (F.col("shared").cast("double") / F.col("nc")).alias("containment"),
    )
    return contained.filter(F.col("containment") >= _CHUNK_CONTAIN)
