"""Scalar function suite (SURVEY.md §2.3 M2): string / date / math /
conditional / array / JSON / map expression families.

The reference's only type-level function surface is its pandas-dtype →
Spark-type map (reference ``connector.py:23-44``); every scalar capability
below is what its users reach through Spark after loading. All expressions
here are built-in ``pyspark.sql.functions`` — JVM-side, inside whole-stage
codegen, no Python in the hot path.

Cross-engine notes (Spark vs DuckDB oracle):

- regex patterns kept to the common Java/RE2 subset;
- ``log`` means natural log in Spark but base-10 in DuckDB → oracle uses
  ``ln``;
- ``ceil/floor`` return BIGINT in Spark, DOUBLE in DuckDB → cast;
- ``dayofweek`` is 1=Sunday in Spark, 0=Sunday in DuckDB → normalize;
- transcendentals (pow/exp/log) may differ by 1 ulp between libm
  implementations → dround.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.determinism import canon, dround, sql_canon, sql_dround
from ..plans.registry import query


@query(
    "q_fn_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           CAST(LENGTH(c_name) AS INT) AS name_len,
           TRIM(CONCAT('  ', c_name, '  ')) AS name_trimmed,
           CONCAT(c_name, '#', c_mktsegment) AS name_seg,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
           CONTAINS(c_name, '001') AS has_001,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded
    FROM customer
    """,
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over customer names."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.concat(F.col("c_name"), F.lit("#"), F.col("c_mktsegment")).alias("name_seg"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
        F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
        F.contains(F.col("c_name"), F.lit("001")).alias("has_001"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
    )


@query(
    "q_fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
                AS INT) AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
               AS plus_3_months,
           LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS date_str
    FROM orders
    """,
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family over order dates (NTZ timestamps)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.to_date(d).alias("order_date"),
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).cast("int").alias("order_quarter"),
        F.to_date(F.date_trunc("month", d)).alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.to_date(d))
        .cast("int")
        .alias("days_to_y2k"),
        F.add_months(F.to_date(d), 3).alias("plus_3_months"),
        F.last_day(F.to_date(d)).alias("month_end"),
        F.date_format(d, "yyyy-MM-dd").alias("date_str"),
    )


@query(
    "q_fn_math",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_rounded,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
           CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS price_k_floor,
           {sql_canon(sql_dround('POW(1.0 + l_discount, 2)', 10))} AS growth_sq,
           CAST(CAST(l_quantity AS BIGINT) % 7 AS BIGINT) AS qty_mod7,
           {sql_canon(sql_dround('LN(l_extendedprice)', 10))} AS price_ln,
           {sql_canon(sql_dround('LOG(l_extendedprice)', 10))} AS price_log10,
           SQRT(l_quantity) AS qty_sqrt,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem
    WHERE l_orderkey <= 2000
    """,
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family. sqrt/abs/sign are IEEE-exact cross-engine;
    pow/ln/log10 go through libm → rounded (dround)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_rounded"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_extendedprice") / 1000.0).cast("long").alias("price_k_ceil"),
        F.floor(F.col("l_extendedprice") / 1000.0).cast("long").alias("price_k_floor"),
        canon(dround(F.pow(F.lit(1.0) + F.col("l_discount"), 2), 10)).alias("growth_sq"),
        (F.col("l_quantity").cast("long") % 7).cast("long").alias("qty_mod7"),
        canon(dround(F.log(F.col("l_extendedprice")), 10)).alias("price_ln"),
        canon(dround(F.log10(F.col("l_extendedprice")), 10)).alias("price_log10"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "q_fn_cond",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0.0 THEN 'debt'
                WHEN c_acctbal < 5000.0 THEN 'low'
                WHEN c_acctbal < 9000.0 THEN 'mid'
                ELSE 'high' END AS bal_tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS seg_or_default,
           NULLIF(c_nationkey, 0) AS nation_or_null,
           IFNULL(NULLIF(c_nationkey, 0), -1) AS nation_filled,
           IF(c_acctbal >= 0.0, 'credit', 'debit') AS bal_kind
    FROM customer
    """,
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / nvl / if."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0.0, "debt")
        .when(F.col("c_acctbal") < 5000.0, "low")
        .when(F.col("c_acctbal") < 9000.0, "mid")
        .otherwise("high")
        .alias("bal_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT"))
        .alias("seg_or_default"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nation_or_null"),
        F.nvl(F.nullif(F.col("c_nationkey"), F.lit(0)), F.lit(-1)).alias(
            "nation_filled"
        ),
        F.when(F.col("c_acctbal") >= 0.0, "credit").otherwise("debit").alias(
            "bal_kind"
        ),
    )


@query(
    "q_fn_array",
    oracle="""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INT) AS n_tokens,
           STRING_SPLIT(text, ' ')[1] AS first_token,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS mentions_spark,
           ARRAY_TO_STRING(LIST_SORT(STRING_SPLIT(SUBSTR(text, 1, 40), ' ')), ',')
               AS head_tokens_sorted
    FROM documents
    """,
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family: split/size/element/contains/sort."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.array_contains(toks, "spark").alias("mentions_spark"),
        # joined to a string so the cross-engine hash never depends on
        # arrow list-representation details (the sort itself is the test)
        F.array_join(F.sort_array(F.split(F.substring("text", 1, 40), " ")), ",")
        .alias("head_tokens_sorted"),
    )


@query(
    "q_fn_array_agg",
    oracle="""
    SELECT n_nationkey,
           ARRAY_TO_STRING(LIST(s_suppkey ORDER BY s_suppkey), ',') AS supp_keys,
           CAST(LEN(LIST(s_suppkey)) AS INT) AS n_supps
    FROM (
        SELECT n.n_nationkey, s.s_suppkey
        FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
    )
    GROUP BY n_nationkey
    """,
)
def q_fn_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg / collect_list with deterministic (sorted) element order."""
    n = table(spark, sf_dir, "nation")
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_suppkey")), ",").alias(
                "supp_keys"
            ),
            F.count("s_suppkey").cast("int").alias("n_supps"),
        )
    )


@query(
    "q_fn_explode",
    oracle="""
    SELECT doc_id, UNNEST(STRING_SPLIT(SUBSTR(text, 1, 30), ' ')) AS token
    FROM documents
    WHERE doc_id < 100
    """,
)
def q_fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (UNNEST) — the table-generating arm of the array family."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.explode(F.split(F.substring("text", 1, 30), " ")).alias("token"),
    )


@query(
    "q_fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           json_extract_string(props, '$.missing') AS missing_field,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid_json
    FROM events
    """,
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props JSON-string column."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
        # Spark: a parseable json object ⇒ get_json_object('$') non-null.
        F.get_json_object("props", "$").isNotNull().alias("is_valid_json"),
    )


@query(
    "q_fn_map",
    oracle="""
    SELECT event_id, event_type,
           CASE event_type
                WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.5
                WHEN 'purchase' THEN 10.0 WHEN 'signup' THEN 5.0
                ELSE 0.0 END::DOUBLE AS type_weight,
           value * CASE event_type
                WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.5
                WHEN 'purchase' THEN 10.0 WHEN 'signup' THEN 5.0
                ELSE 0.0 END AS weighted_value
    FROM events
    """,
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map creation + lookup (element_at over a literal map; the oracle
    spells the same lookup as CASE since DuckDB map types don't survive
    the arrow comparison canonically)."""
    ev = table(spark, sf_dir, "events")
    weights = F.create_map(
        F.lit("click"), F.lit(1.0),
        F.lit("view"), F.lit(0.5),
        F.lit("purchase"), F.lit(10.0),
        F.lit("signup"), F.lit(5.0),
    )
    weight = F.coalesce(F.element_at(weights, F.col("event_type")), F.lit(0.0))
    return ev.select(
        "event_id",
        "event_type",
        weight.alias("type_weight"),
        (F.col("value") * weight).alias("weighted_value"),
    )


@query(
    "q_fn_variant",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT))
                AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT))
                AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT columns (Spark 4 native): ``parse_json``
    once into the binary variant encoding, then typed ``variant_get``
    paths — the open-ended-schema answer that beats per-query JSON
    string re-parsing (the variant decode is a columnar binary read,
    not a text parse, and survives schema drift without migrations).
    The DuckDB oracle reads the same values via its JSON path functions.
    """
    ev = table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


_URL_EXPR = (
    "CONCAT('https://', upper(source), '.Example.COM/', lang, '/doc/', "
    "CAST(doc_id % 97 AS STRING), '?utm_source=feed&id=', "
    "CAST(doc_id % 97 AS STRING), '&ref=rss#sec-', CAST(doc_id % 5 AS STRING))"
)

_SQL_URL_EXPR = (
    "CONCAT('https://', upper(source), '.Example.COM/', lang, '/doc/', "
    "CAST(doc_id % 97 AS VARCHAR), '?utm_source=feed&id=', "
    "CAST(doc_id % 97 AS VARCHAR), '&ref=rss#sec-', CAST(doc_id % 5 AS VARCHAR))"
)


@query(
    "q_fn_url",
    oracle=f"""
    SELECT doc_id, url,
           REGEXP_EXTRACT(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           REGEXP_EXTRACT(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           REGEXP_EXTRACT(url, '\\?([^#]*)', 1) AS query,
           REGEXP_EXTRACT(url, '#(.*)$', 1) AS fragment,
           REGEXP_EXTRACT(url, '[?&]id=([^&#]*)', 1) AS id_param
    FROM (SELECT doc_id, {_SQL_URL_EXPR} AS url FROM documents)
    """,
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL structural decomposition with the built-in ``parse_url``
    (JVM-side, codegen'd — the web-corpus analogue of the date/JSON
    families; the reference has no URL surface at all). The URLs are
    built deterministically from document columns so both engines parse
    byte-identical inputs; the DuckDB oracle mirrors each component with
    an anchored regexp. ``parse_url(..., 'QUERY', 'id')`` extracts one
    parameter without materializing a map — the hot-path idiom for
    pulling a tracking id out of trillions of crawl records.
    """
    docs = table(spark, sf_dir, "documents")
    url = F.expr(_URL_EXPR)
    return docs.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("REF")).alias("fragment"),
        F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )


@query(
    "q_fn_xml",
    oracle="""
    WITH x AS (
        SELECT o_orderkey,
               '<order id="' || o_orderkey || '"><priority>'
                   || o_orderpriority || '</priority><total>'
                   || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
                   || '</total></order>' AS doc
        FROM orders WHERE o_orderstatus = 'F'
    )
    SELECT o_orderkey,
           CAST(REGEXP_EXTRACT(doc, 'id="([0-9]+)"', 1) AS BIGINT) AS xml_id,
           REGEXP_EXTRACT(doc, '<priority>([^<]*)</priority>', 1)
               AS priority,
           CAST(CAST(REGEXP_EXTRACT(doc, '<total>([^<]*)</total>', 1)
                AS DECIMAL(18,2)) AS VARCHAR) AS total
    FROM x
    """,
)
def q_fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML field extraction (Spark's Hive-inherited ``xpath_*`` family
    plus the Spark 4 ``from_xml`` parser): a synthesized XML payload —
    the message-bus format older enterprise feeds still ship — parses
    back to typed columns entirely JVM-side.

    ``from_xml`` binds an explicit schema (the same
    no-inference-at-scale rule as the CSV/JSONL scans); ``xpath_string``
    pulls the attribute the schema'd parser doesn't cover. DuckDB has
    no XML support, so the oracle extracts the same fields with
    anchored regexps over the identical synthesized document — the
    round-trip (build → parse → compare) is what the hash check
    verifies. Map-only, no shuffle, no Python.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    doc = F.concat(
        F.lit('<order id="'),
        F.col("o_orderkey").cast("string"),
        F.lit('"><priority>'),
        F.col("o_orderpriority"),
        F.lit("</priority><total>"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        F.lit("</total></order>"),
    )
    x = o.select("o_orderkey", doc.alias("doc"))
    parsed = x.select(
        "o_orderkey",
        F.expr("xpath_string(doc, '/order/@id')").cast("long").alias("xml_id"),
        F.expr("from_xml(doc, 'priority STRING, total DECIMAL(18,2)')").alias("s"),
    )
    return parsed.select(
        "o_orderkey",
        "xml_id",
        F.col("s.priority").alias("priority"),
        F.col("s.total").cast("string").alias("total"),
    )


@query(
    "q_fn_collation",
    oracle="""
    WITH mangled AS (
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN UPPER(o_orderpriority)
                    ELSE LOWER(o_orderpriority) END AS pri,
               o_totalprice
        FROM orders
    )
    SELECT LOWER(pri) AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(38,2)) AS VARCHAR) AS total_price
    FROM mangled GROUP BY LOWER(pri)
    """,
)
def q_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive aggregation via Spark 4 COLLATIONS: the group key
    is the raw mixed-case string under ``COLLATE UTF8_LCASE`` — the
    engine's comparator, not a ``lower()`` rewrite, does the folding,
    which is the correct tool when the data arrives case-mangled from
    heterogeneous feeds (and generalizes to locale-aware collations no
    ``lower()`` call can express).

    The case-mangling is synthesized deterministically (orderkey
    parity), and the OUTPUT key is presented lowercased so the result
    is representative-independent (which concrete casing a collated
    group keeps is engine-internal). The oracle folds with LOWER —
    same groups, same counts, exact decimal sums.
    """
    o = table(spark, sf_dir, "orders")
    mangled = o.select(
        F.when(
            F.col("o_orderkey") % 2 == 0, F.upper("o_orderpriority")
        )
        .otherwise(F.lower("o_orderpriority"))
        .alias("pri"),
        "o_totalprice",
    )
    return (
        mangled.groupBy(F.expr("pri COLLATE UTF8_LCASE").alias("prik"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .cast("string")
            .alias("total_price"),
        )
        .select(
            F.lower(F.col("prik")).cast("string").alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "q_fn_try",
    oracle="""
    WITH dirty AS (
        SELECT o_orderkey,
               CASE o_orderkey % 5
                   WHEN 0 THEN CAST(o_orderkey AS VARCHAR)
                   WHEN 1 THEN ' ' || CAST(o_orderkey AS VARCHAR) || ' '
                   WHEN 2 THEN 'id-' || CAST(o_orderkey AS VARCHAR)
                   WHEN 3 THEN ''
                   ELSE CAST(o_orderkey AS VARCHAR) || 'x'
               END AS raw_id,
               CASE o_orderkey % 3
                   WHEN 0 THEN '2024-01-' || LPAD(CAST(o_orderkey % 28 + 1
                                                       AS VARCHAR), 2, '0')
                   WHEN 1 THEN 'not-a-date'
                   ELSE '2024-13-40'
               END AS raw_date
        FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(TRY_CAST(raw_id AS BIGINT)) AS BIGINT) AS ok_ids,
           CAST(SUM(COALESCE(TRY_CAST(raw_id AS BIGINT), 0)) AS BIGINT)
               AS id_sum,
           CAST(COUNT(TRY_CAST(raw_date AS DATE)) AS BIGINT) AS ok_dates,
           CAST(MAX(TRY_CAST(raw_date AS DATE)) AS VARCHAR) AS max_date
    FROM dirty
    """,
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casting (`try_cast`): a deterministically dirtied feed
    — padded numbers, prefixed ids, empties, decimals-where-ints,
    malformed dates — parses to NULL-on-failure instead of job-failure,
    the ANSI-mode ingest behavior every raw feed needs (a single bad
    row must never kill a 100 TB load; quarantine counts, don't crash).
    Reported as a parse-health census: rows, parseable ids/dates, the
    sum over parsed ids, and the max parsed date.

    Every dirty value is synthesized from ``o_orderkey`` arithmetic, so
    both engines dirty and re-parse the identical strings — the hash
    check pins that Spark's and DuckDB's TRY_CAST agree on every edge
    class (whitespace YES, prefix NO, empty NO, trailing-garbage NO,
    out-of-range date NO. One edge the engines genuinely DISAGREE on —
    decimal strings into integers, which DuckDB rounds and Spark nulls
    — is deliberately excluded; a portable pipeline must cast through
    DECIMAL for that class). Map-only, one aggregate.
    """
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    raw_id = (
        F.when(k % 5 == 0, k.cast("string"))
        .when(k % 5 == 1, F.concat(F.lit(" "), k.cast("string"), F.lit(" ")))
        .when(k % 5 == 2, F.concat(F.lit("id-"), k.cast("string")))
        .when(k % 5 == 3, F.lit(""))
        .otherwise(F.concat(k.cast("string"), F.lit("x")))
    )
    raw_date = (
        F.when(
            k % 3 == 0,
            F.concat(
                F.lit("2024-01-"),
                F.lpad((k % 28 + 1).cast("string"), 2, "0"),
            ),
        )
        .when(k % 3 == 1, F.lit("not-a-date"))
        .otherwise(F.lit("2024-13-40"))
    )
    dirty = o.select(raw_id.alias("raw_id"), raw_date.alias("raw_date"))
    tid = F.col("raw_id").try_cast("long")
    tdt = F.col("raw_date").try_cast("date")
    return dirty.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count(tid).cast("long").alias("ok_ids"),
        F.sum(F.coalesce(tid, F.lit(0))).cast("long").alias("id_sum"),
        F.count(tdt).cast("long").alias("ok_dates"),
        F.max(tdt).cast("string").alias("max_date"),
    )


@query(
    "q_fn_higher_order",
    oracle="""
    WITH base AS (
        SELECT s_suppkey,
               LIST_TRANSFORM(GENERATE_SERIES(1, 1 + s_suppkey % 7),
                              i -> CAST(s_suppkey * i % 97 AS BIGINT)) AS xs
        FROM supplier
    )
    SELECT s_suppkey,
           CAST(LEN(xs) AS INT) AS n,
           ARRAY_TO_STRING(LIST_TRANSFORM(xs, x -> x * 2), ',') AS doubled,
           CAST(LEN(LIST_FILTER(xs, x -> x % 2 = 0)) AS INT) AS n_even,
           CAST(LEN(LIST_FILTER(xs, x -> x > 50)) > 0 AS BOOLEAN)
               AS any_gt50,
           CAST(LEN(LIST_FILTER(xs, x -> x >= 10)) = LEN(xs) AS BOOLEAN)
               AS all_ge10,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), xs),
                            (acc, x) -> acc + x * x) AS BIGINT)
               AS sum_sq,
           ARRAY_TO_STRING(
               LIST_TRANSFORM(LIST_ZIP(xs, LIST_REVERSE(xs)),
                              t -> t[1] + t[2]), ',') AS zip_sums
    FROM base
    """,
)
def q_fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order (lambda) array function family — transform, filter,
    exists, forall, aggregate (fold), zip_with — over a per-supplier
    deterministic integer array. These are the functions that keep
    per-row collection logic JVM-side at 100 TB where a Python UDF
    would fall off the Arrow fast path; all-integer arithmetic, arrays
    presented as joined strings so the hash never depends on list
    encoding."""
    s = table(spark, sf_dir, "supplier")
    xs = F.expr(
        "transform(sequence(1, 1 + s_suppkey % 7),"
        " i -> CAST(s_suppkey * i % 97 AS BIGINT))"
    )
    b = s.select("s_suppkey", xs.alias("xs"))
    return b.select(
        "s_suppkey",
        F.size("xs").cast("int").alias("n"),
        F.array_join(F.expr("transform(xs, x -> x * 2)"), ",").alias(
            "doubled"
        ),
        F.size(F.expr("filter(xs, x -> x % 2 = 0)"))
        .cast("int")
        .alias("n_even"),
        F.expr("exists(xs, x -> x > 50)").alias("any_gt50"),
        F.expr("forall(xs, x -> x >= 10)").alias("all_ge10"),
        F.expr("aggregate(xs, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)")
        .alias("sum_sq"),
        F.array_join(
            F.expr("zip_with(xs, reverse(xs), (a, b) -> a + b)"), ","
        ).alias("zip_sums"),
    )
