"""ORC + Avro source/sink queries (SURVEY §2.3 source-matrix breadth
beyond the reference's single Excel format; see also ``text_formats``
for the line-delimited half of the matrix).

ORC is Spark's second first-class columnar format: like parquet it has
stripe-level min/max statistics (so predicate pushdown skips stripes),
a self-describing schema (no inference pass), and splittable stripes
(one task per stripe range at 100 TB). Unlike the CSV/JSONL bridges, the
interesting claim here is that the SAME pushdown/pruning contract the
repo pins for parquet holds for ORC — ``tests/test_columnar_formats.py``
asserts ``PushedFilters`` reaches the ORC scan.

The fixture materializes once per SF from the testdata parquet via a
Spark write (deterministic content, parallel part files), and the
DuckDB oracle reads the ORIGINAL parquet table — so the comparison
exercises the full ORC encode+decode path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..plans.registry import query
from .excel_queries import _fixture_dir


def _materialize_orders_orc(spark: SparkSession, sf_dir: str) -> str:
    """orders.parquet → orders.orc/ (multi-part directory), idempotent."""
    out = os.path.join(_fixture_dir(sf_dir), "orders.orc")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .write.mode("overwrite")
            .orc(out)
        )
    return out


@query(
    "q_scan_orc",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def q_scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC scan with predicate pushdown + column pruning, then a grouped
    aggregate. The status filter reaches the ORC reader as a pushed
    filter (stripe stats skip non-matching stripes — the ORC analogue of
    parquet row-group skipping) and only the three referenced columns
    are decoded. The decimal sum keeps the money aggregate engine-exact.
    """
    path = _materialize_orders_orc(spark, sf_dir)
    return (
        spark.read.orc(path)
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("sum_price"),
        )
    )


@query(
    "q_sink_orc",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,0)))
                AS DECIMAL(38,0)) AS VARCHAR) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sink_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink roundtrip: aggregate → snappy ORC directory write → read
    back. The write is one file per partition (native parallel layout,
    no driver funnel) and the readback re-reads through the vectorized
    ORC reader, so every encoder/decoder in the path is exercised; the
    aggregate upstream of the sink keeps the fixture small while the
    row-level values (exact decimals, two grouping strings) make any
    encode corruption hash-visible.
    """
    out = os.path.join(_fixture_dir(sf_dir), "pricing_summary_orc")
    src = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,0)"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("sum_qty"),
        )
    )
    src.write.mode("overwrite").option("compression", "snappy").orc(out)
    return spark.read.orc(out)


@query(
    "q_scan_file_lineage",
    oracle="""
    SELECT 'documents.parquet' AS file_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents
    """,
)
def q_scan_file_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level file lineage via Spark's hidden ``_metadata`` column:
    every row reports which physical file produced it, aggregated to a
    per-file census — the provenance primitive that debugging a bad
    row at 100 TB starts from (which of the 10⁵ input files shipped
    it?).

    ``_metadata.file_path`` is populated by the scan itself — no join,
    no extra read, constant-width per row; the census aggregates on
    file names (key space = file count). The oracle pins the testdata
    layout's single-file-per-table shape, so the hash check proves the
    lineage column reports the real file.
    """
    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return (
        d.select(
            F.regexp_extract(
                F.col("_metadata.file_path"), r"([^/]+\.parquet)", 1
            ).alias("file_name"),
            "doc_id",
        )
        .groupBy("file_name")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
    )


@query(
    "q_sink_parquet_bloom",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE user_id IN (1, 2, 3)
    """,
)
def q_sink_parquet_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filtered, stat-clustered parquet layout + point-lookup scan.

    The point-lookup layout decision at 100 TB: rewrite the fact table
    clustered by the lookup key (``repartition(key)`` +
    ``sortWithinPartitions``) so min/max row-group stats become
    selective, AND embed parquet bloom filters on that key
    (``parquet.bloom.filter.enabled#user_id``) so row groups whose
    stat range covers the probe but don't contain it are skipped by the
    bloom probe instead of decoded. The readback pushes ``In(user_id,
    ...)`` into the scan (visible as PushedFilters); at 100 TB this is
    the difference between touching 3 row groups and decoding the
    whole table. Write path is idempotent-overwrite into the
    sf-namespaced fixture dir (same convention as
    ``q_sink_parquet_partitioned``).

    Note parquet-mr only EMITS a bloom for chunks that fall out of
    dictionary encoding (a fully dictionary-encoded chunk already
    filters point probes exactly via its dictionary) — so small test
    fixtures carry dictionaries, 100 TB row groups carry blooms, and the
    probe path is covered either way (mechanism proven by size delta in
    ``tests/test_round7_ops.py``).
    """
    out = os.path.join(_fixture_dir(sf_dir), "events_bloom_by_user")
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    (
        ev.repartition(4, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .option("parquet.bloom.filter.enabled#user_id", "true")
        .option("parquet.bloom.filter.expected.ndv#user_id", "100000")
        .parquet(out)
    )
    return (
        spark.read.parquet(out)
        .filter(F.col("user_id").isin(1, 2, 3))
        .select("event_id", "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# Avro (pyavro Python DataSource, sources/avrofile.py)
# ---------------------------------------------------------------------------


def _materialize_orders_avro(spark: SparkSession, sf_dir: str) -> str:
    """orders.parquet → orders.avro/ (multi-part directory written by the
    pyavro staged-commit writer), idempotent per SF."""
    from .avrofile import register_pyavro

    register_pyavro(spark)
    out = os.path.join(_fixture_dir(sf_dir), "orders.avro")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .repartition(4)
            .write.format("pyavro")
            .mode("overwrite")
            .save(out)
        )
    return out


@query(
    "q_scan_avro",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS VARCHAR) AS sum_price,
           CAST(MIN(o_orderdate) AS VARCHAR) AS first_order
    FROM orders
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def q_scan_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro scan through the pure-Python ``pyavro`` container-file source
    (``sources/avrofile.py``: spec-clean codec, sync-marker byte-range
    splits, Arrow-batch decode), then a filtered grouped aggregate. The
    fixture is written by the pyavro writer itself from the original
    parquet, and the DuckDB oracle reads that original parquet — so the
    hash check exercises the FULL Avro encode+decode path including the
    timestamp-micros logical type (surfaced via the min-order-date
    column). Filters/pruning stay Spark-side (the Python DataSource API
    has no pushdown hook yet); the scan parallelism comes from
    file × byte-range splits like the JVM file formats.
    """
    from .avrofile import register_pyavro

    register_pyavro(spark)
    path = _materialize_orders_avro(spark, sf_dir)
    # source_read memoizes the inferred schema per fixture path (r14):
    # the Python source's schema() round trip measured ~130 ms per load,
    # re-paid on every bench sample; the fixture is _SUCCESS-guarded
    # write-once so the schema cannot drift.
    from ..catalog import source_read

    return (
        source_read(spark, "pyavro", path)
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("sum_price"),
            F.min("o_orderdate").cast("string").alias("first_order"),
        )
    )


@query(
    "q_sink_avro",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sink_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro sink roundtrip: aggregate → deflate-compressed Avro directory
    write (staged parts + commit rename, so a failed task never leaves a
    half-written file) → read back through the splittable reader. The
    deflate codec path and the decimal-as-string row values make any
    encode corruption hash-visible; the upstream aggregate keeps the
    fixture small while still exercising one file per partition.
    """
    from .avrofile import register_pyavro

    register_pyavro(spark)
    out = os.path.join(_fixture_dir(sf_dir), "pricing_summary_avro")
    src = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("sum_price"),
        )
    )
    (
        src.write.format("pyavro")
        .mode("overwrite")
        .option("compression", "deflate")
        .save(out)
    )
    return spark.read.format("pyavro").load(out)


@query(
    "q_stream_avro",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS VARCHAR) AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q_stream_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro file-arrival micro-batch stream: the directory of pyavro
    part files drains through ``readStream.format("pyavro")``
    (replayable manifest offsets + the same byte-range splits as the
    batch reader — one task per file range), and the per-status census
    of the streamed rows must match the parquet the files were derived
    from. Exactly-once restart behavior is pinned in
    ``tests/test_avro.py``; this is the Kafka-adjacent drop-directory
    ingest loop for the Avro ecosystem.
    """
    import uuid

    from .avrofile import register_pyavro

    register_pyavro(spark)
    d = _materialize_orders_avro(spark, sf_dir)
    sink = f"stream_avro_{uuid.uuid4().hex[:10]}"
    stream = (
        spark.readStream.format("pyavro")
        .schema(
            "o_orderkey long, o_custkey long, o_orderstatus string,"
            " o_totalprice double, o_orderdate timestamp_ntz,"
            " o_orderpriority string"
        )
        .load(d)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(120):
            raise TimeoutError("q_stream_avro: drain did not finish in 120s")
    finally:
        q.stop()
    return (
        spark.table(sink)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("sum_price"),
        )
    )


def _materialize_docs_bin(sf_dir: str) -> str:
    """Every 5th document's text → one UTF-8 ``doc_<id>.txt`` file —
    the opaque-blob fixture for the binaryFile source (idempotent)."""
    import pyarrow.parquet as pq

    out_dir = os.path.join(_fixture_dir(sf_dir), "docs_bin")
    done = os.path.join(out_dir, "_done")
    if not os.path.exists(done):
        os.makedirs(out_dir, exist_ok=True)
        t = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        )
        for doc_id, text in zip(
            t.column("doc_id").to_pylist(), t.column("text").to_pylist()
        ):
            if doc_id % 5 != 0:
                continue
            with open(
                os.path.join(out_dir, f"doc_{doc_id}.txt"), "wb"
            ) as fh:
                fh.write(text.encode("utf-8"))
        with open(done, "w") as fh:
            fh.write("ok")
    return out_dir


@query(
    "q_scan_binaryfile",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS BIGINT) AS n_bytes,
           MD5(text) AS content_md5
    FROM documents
    WHERE doc_id % 5 = 0
    """,
)
def q_scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's ``binaryFile`` source over a directory of opaque blobs —
    the ingestion front door for multimodal corpora (images, audio,
    archives) where the payload is bytes and the only structure is the
    path. Each file arrives as (path, modificationTime, length,
    content); the query parses the id out of the filename, verifies the
    byte length, and content-addresses the payload with MD5 — exactly
    the (id, size, digest) manifest a 100 TB media-ingest job builds
    first, because every downstream dedup/decode step keys on the
    digest instead of re-shuffling the bytes (``q_multimodal_dedup``'s
    convention).

    Scale: binaryFile is a standard FileScan — files split across
    tasks, ``pathGlobFilter`` prunes at listing time, and the digest
    reduces each blob to 16 bytes before anything shuffles.
    """
    bin_dir = _materialize_docs_bin(sf_dir)
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(bin_dir)
        .select(
            F.regexp_extract(F.col("path"), r"doc_(\d+)\.txt", 1)
            .cast("long")
            .alias("doc_id"),
            F.col("length").cast("long").alias("n_bytes"),
            F.lower(F.md5(F.col("content"))).alias("content_md5"),
        )
    )
