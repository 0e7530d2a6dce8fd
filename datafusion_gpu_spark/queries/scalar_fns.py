"""Scalar-function packs (SURVEY §2.7): string, math, datetime, conditional,
crypto/encoding, array, struct/map, JSON, unnest/lateral.

Where Spark and DuckDB names differ (CAST targets, strpos/instr, sha2 vs
sha256, time_bucket vs date_bin, LATERAL VIEW vs unnest) the two sides get
separate strings; semantics are pinned equal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_gpu_spark.functions import date_bin
from datafusion_gpu_spark.queries import load, sql_query

_STRING_SPARK = """
SELECT p_partkey AS pk,
       lower(p_name)                         AS lo,
       upper(p_brand)                        AS up,
       substr(p_name, 1, 5)                  AS s5,
       length(p_name)                        AS len,
       replace(p_type, ' ', '_')             AS rep,
       concat_ws('-', p_brand, p_type)       AS cw,
       lpad(p_brand, 12, '*')                AS lp,
       rpad(p_brand, 12, '.')                AS rp,
       trim('  pad  ')                       AS tr,
       reverse(p_brand)                      AS rev,
       left(p_name, 3)                       AS l3,
       right(p_name, 3)                      AS r3,
       split_part(p_type, ' ', 1)            AS sp1,
       instr(p_name, 'a')                    AS pos_a,
       startswith(p_name, 'p')               AS st,
       endswith(p_name, 's')                 AS en,
       repeat('ab', 3)                       AS rp3,
       levenshtein(p_brand, 'Brand#1')       AS lev,
       ascii(p_brand)                        AS asc_b
FROM part
"""

_STRING_DUCK = """
SELECT p_partkey AS pk,
       lower(p_name)                         AS lo,
       upper(p_brand)                        AS up,
       substr(p_name, 1, 5)                  AS s5,
       CAST(length(p_name) AS INT)           AS len,
       replace(p_type, ' ', '_')             AS rep,
       concat_ws('-', p_brand, p_type)       AS cw,
       lpad(p_brand, 12, '*')                AS lp,
       rpad(p_brand, 12, '.')                AS rp,
       trim('  pad  ')                       AS tr,
       reverse(p_brand)                      AS rev,
       left(p_name, 3)                       AS l3,
       right(p_name, 3)                      AS r3,
       split_part(p_type, ' ', 1)            AS sp1,
       CAST(strpos(p_name, 'a') AS INT)      AS pos_a,
       starts_with(p_name, 'p')              AS st,
       ends_with(p_name, 's')                AS en,
       repeat('ab', 3)                       AS rp3,
       CAST(levenshtein(p_brand, 'Brand#1') AS INT) AS lev,
       ascii(p_brand)                        AS asc_b
FROM part
"""

_MATH = """
SELECT l_orderkey AS ok, l_linenumber AS ln,
       ROUND(abs(l_extendedprice - 50000), 2)        AS a,
       CAST(ceil(l_extendedprice / 1000) AS BIGINT)  AS c,
       CAST(floor(l_discount * 100) AS BIGINT)       AS f,
       ROUND(exp(l_discount), 8)                     AS e,
       ROUND(ln(l_extendedprice), 8)                 AS lg,
       ROUND(log10(l_extendedprice), 8)              AS l10,
       ROUND(power(l_quantity, 2), 2)                AS p2,
       ROUND(sqrt(l_quantity), 8)                    AS sq,
       CAST(sign(l_quantity - 25) AS INT)            AS sg,
       ROUND(sin(l_discount), 8)                     AS sn,
       ROUND(cos(l_discount), 8)                     AS cs,
       ROUND(atan2(l_quantity, 10), 8)               AS at2,
       CAST(l_quantity AS BIGINT) % 7                AS md
FROM lineitem
WHERE l_orderkey < 2000
"""

_DT_SPARK = """
SELECT o_orderkey AS ok,
       year(o_orderdate)                         AS y,
       month(o_orderdate)                        AS m,
       day(o_orderdate)                          AS d,
       quarter(o_orderdate)                      AS q,
       dayofweek(o_orderdate) - 1                AS dow,
       date_trunc('month', o_orderdate)          AS mon,
       CAST(o_orderdate AS DATE)                 AS dt,
       datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS dd,
       unix_timestamp(o_orderdate)               AS epoch_s,
       o_orderdate + INTERVAL '7' DAY            AS plus7,
       make_date(1995, 1, 1)                     AS md
FROM orders
WHERE o_orderkey < 2000
"""

_DT_DUCK = """
SELECT o_orderkey AS ok,
       CAST(year(o_orderdate) AS INT)            AS y,
       CAST(month(o_orderdate) AS INT)           AS m,
       CAST(day(o_orderdate) AS INT)             AS d,
       CAST(quarter(o_orderdate) AS INT)         AS q,
       CAST(dayofweek(o_orderdate) AS INT)       AS dow,
       date_trunc('month', o_orderdate)          AS mon,
       CAST(o_orderdate AS DATE)                 AS dt,
       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS dd,
       CAST(epoch(o_orderdate) AS BIGINT)        AS epoch_s,
       o_orderdate + INTERVAL 7 DAY              AS plus7,
       make_date(1995, 1, 1)                     AS md
FROM orders
WHERE o_orderkey < 2000
"""


def _date_bin_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFusion date_bin parity: 7-day bins anchored at 1995-01-01,
    via the engine's codegen-friendly date_bin shim."""
    load(spark, sf_dir)
    week = date_bin(7 * 86400, F.col("o_orderdate"), "1995-01-01 00:00:00")
    return (
        spark.table("orders")
        .groupBy(week.alias("bin_start"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_DATE_BIN_DUCK = """
SELECT make_timestamp(
         ((epoch_us(o_orderdate) - epoch_us(TIMESTAMP '1995-01-01'))
          // 604800000000) * 604800000000
         + epoch_us(TIMESTAMP '1995-01-01')) AS bin_start,
       COUNT(*) AS n_orders
FROM orders
GROUP BY 1
"""

_COND = """
SELECT o_orderkey AS ok,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END                        AS tier,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status2,
       GREATEST(o_custkey, o_orderkey % 1000)     AS g,
       LEAST(o_custkey, o_orderkey % 1000)        AS l,
       TRY_CAST(o_orderpriority AS INT)           AS bad_cast,
       IFNULL(NULLIF(o_orderstatus, o_orderstatus), 'same') AS ifn
FROM orders
WHERE o_orderkey < 2000
"""

# Bitwise pack (SURVEY §2.7 — the operators behind every hash/bucket/
# bitmask idiom in the engine: simhash bit_count, z-order interleave,
# LSH band packing all reduce to these). Spark spells shifts as
# shiftleft/shiftright functions and xor as ^; DuckDB spells shifts as
# << / >> and xor as xor() (its ^ is exponentiation). Everything is
# pinned to BIGINT on both sides so the schema hash agrees.
_BITWISE_SPARK = """
SELECT l_orderkey AS ok, l_linenumber AS ln,
       CAST(l_partkey & l_suppkey AS BIGINT)            AS b_and,
       CAST(l_partkey | l_suppkey AS BIGINT)            AS b_or,
       CAST(l_partkey ^ l_suppkey AS BIGINT)            AS b_xor,
       CAST(~l_partkey AS BIGINT)                       AS b_not,
       CAST(shiftleft(l_partkey, 3) AS BIGINT)          AS b_shl,
       CAST(shiftright(l_partkey, 2) AS BIGINT)         AS b_shr,
       CAST(bit_count(CAST(l_partkey AS BIGINT)) AS INT) AS b_pop,
       CAST(getbit(CAST(l_partkey AS BIGINT), 0) AS INT) AS b_lsb
FROM lineitem
WHERE l_orderkey < 2000
"""

_BITWISE_DUCK = """
SELECT l_orderkey AS ok, l_linenumber AS ln,
       CAST(l_partkey & l_suppkey AS BIGINT)            AS b_and,
       CAST(l_partkey | l_suppkey AS BIGINT)            AS b_or,
       CAST(xor(l_partkey, l_suppkey) AS BIGINT)        AS b_xor,
       CAST(~l_partkey AS BIGINT)                       AS b_not,
       CAST(l_partkey << 3 AS BIGINT)                   AS b_shl,
       CAST(l_partkey >> 2 AS BIGINT)                   AS b_shr,
       CAST(bit_count(CAST(l_partkey AS BIGINT)) AS INT) AS b_pop,
       CAST(l_partkey & 1 AS INT)                       AS b_lsb
FROM lineitem
WHERE l_orderkey < 2000
"""

_CRYPTO_SPARK = """
SELECT c_custkey AS ck,
       md5(c_name)                              AS h_md5,
       sha2(c_name, 256)                        AS h_sha256,
       base64(CAST(c_name AS BINARY))           AS b64,
       lower(hex(c_name))                       AS hx
FROM customer
WHERE c_custkey < 200
"""

_CRYPTO_DUCK = """
SELECT c_custkey AS ck,
       md5(c_name)                              AS h_md5,
       sha256(c_name)                           AS h_sha256,
       to_base64(encode(c_name))                AS b64,
       lower(hex(c_name))                       AS hx
FROM customer
WHERE c_custkey < 200
"""

_ARRAY_SPARK = """
SELECT doc_id,
       size(split(text, ' '))                                  AS n_words,
       size(array_distinct(split(text, ' ')))                  AS n_uniq,
       array_contains(split(text, ' '), 'data')                AS has_data,
       array_join(slice(sort_array(array_distinct(split(text, ' '))), 1, 5), ',') AS first5,
       element_at(split(text, ' '), 1)                         AS w1,
       size(array_intersect(split(text, ' '), array('data', 'row', 'table'))) AS n_kw
FROM documents
"""

_ARRAY_DUCK = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT)               AS n_words,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
       list_contains(string_split(text, ' '), 'data')          AS has_data,
       array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',') AS first5,
       string_split(text, ' ')[1]                              AS w1,
       CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
                               ['data', 'row', 'table'])) AS INT) AS n_kw
FROM documents
"""

_JSON_SPARK = """
SELECT event_type,
       SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""

_JSON_DUCK = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""

_UNNEST_SPARK = """
SELECT word, COUNT(*) AS n
FROM documents
LATERAL VIEW explode(split(text, ' ')) t AS word
GROUP BY word
"""

_UNNEST_DUCK = """
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
GROUP BY word
"""

_STRUCT_SPARK = """
SELECT s.id AS id, s.seg AS seg, m['bal'] AS bal
FROM (
  SELECT named_struct('id', c_custkey, 'seg', c_mktsegment) AS s,
         map('bal', ROUND(c_acctbal, 2)) AS m
  FROM customer WHERE c_custkey < 100
) t
"""

# The oracle states the expected RESULT directly — the struct/map round-trip
# under test is the Spark side's.
_STRUCT_DUCK = """
SELECT c_custkey AS id, c_mktsegment AS seg, ROUND(c_acctbal, 2) AS bal
FROM customer WHERE c_custkey < 100
"""

_REGEX_SPARK = """
SELECT p_partkey AS pk,
       p_type RLIKE '^[a-z]+ [a-z]+$'                  AS matches,
       regexp_replace(p_type, '[aeiou]', '_')          AS repl,
       regexp_extract(p_type, '([a-z]+)', 1)           AS first_word,
       CAST(regexp_count(p_type, 'a') AS INT)          AS n_a
FROM part
"""

_REGEX_DUCK = """
SELECT p_partkey AS pk,
       regexp_matches(p_type, '^[a-z]+ [a-z]+$')       AS matches,
       regexp_replace(p_type, '[aeiou]', '_', 'g')     AS repl,
       regexp_extract(p_type, '([a-z]+)', 1)           AS first_word,
       CAST(len(regexp_extract_all(p_type, 'a')) AS INT) AS n_a
FROM part
"""

def _fn_alias_shims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The name-gap shim surface (functions/aliases.py): strpos and
    arrow_typeof, exercised through the DataFrame API."""
    from datafusion_gpu_spark.functions import arrow_typeof, strpos

    load(spark, sf_dir)
    return spark.table("customer").select(
        F.col("c_custkey").alias("custkey"),
        strpos("c_name", "1").alias("pos_one"),
        arrow_typeof(F.col("c_acctbal")).alias("bal_type"),
    )


# strpos is native DuckDB with identical 1-based/0-absent semantics;
# arrow_typeof's engine-level type NAME differs by engine, so the oracle
# states the expected Spark name as a literal (self-validating column).
_ALIAS_SHIMS_DUCK = """
SELECT c_custkey AS custkey,
       strpos(c_name, '1')::INT AS pos_one,
       'double' AS bal_type
FROM customer
"""

# Null-semantics pack: IS [NOT] DISTINCT FROM, TRY_CAST, NULLIF, IFNULL
# — identical text runs on DuckDB.
_NULL_SEMANTICS = """
SELECT c_custkey AS ck,
       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
       (NULLIF(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM NULL)
         AS is_building,
       (c_mktsegment IS DISTINCT FROM 'MACHINERY') AS not_machinery,
       TRY_CAST(c_name AS INT) AS bad_cast,
       IFNULL(NULLIF(c_mktsegment, 'BUILDING'), 'was-building') AS filled
FROM customer
"""


def _fn_udtf_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface: SQL-registered table function consumed via
    LATERAL — row-at-a-time Python by design (the codegen twin is
    fn_unnest_wordcount)."""
    from datafusion_gpu_spark.functions.udtfs import register_udtfs

    load(spark, sf_dir)
    register_udtfs(spark)
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.wlen
        FROM documents d, LATERAL split_words(d.text) t
        WHERE d.doc_id < 20
        """
    )


_UDTF_SPLIT_DUCK = """
SELECT doc_id, word, CAST(length(word) AS INT) AS wlen
FROM (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE doc_id < 20
)
WHERE word != ''
"""

# Spark 4 VARIANT type: parse_json -> open binary JSON, variant_get with
# a typed path — schema-on-read over semi-structured columns without a
# UDF or a fixed struct schema (the shredded scan path at scale). The
# oracle replays with DuckDB's JSON extraction.
_VARIANT_SPARK = """
SELECT event_type,
       COUNT(*) AS n,
       SUM(variant_get(parse_json(props), '$.k', 'int')) AS sum_k,
       SUM(CASE WHEN variant_get(parse_json(props), '$.k', 'int') > 50
                THEN 1 ELSE 0 END) AS n_high
FROM events GROUP BY event_type
"""

_VARIANT_DUCK = """
SELECT event_type,
       COUNT(*) AS n,
       SUM(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
       SUM(CASE WHEN json_extract(props, '$.k')::INT > 50
                THEN 1 ELSE 0 END)::BIGINT AS n_high
FROM events GROUP BY event_type
"""

# Edit distance: the fuzzy-join primitive (entity resolution, typo-tolerant
# matching). Self-join nation names, nearest non-self neighbor by
# levenshtein with a name tiebreak — integer distances replay exactly.
_EDIT_DISTANCE = """
SELECT name, best_match, dist
FROM (
  SELECT a.n_name AS name, b.n_name AS best_match,
         levenshtein(a.n_name, b.n_name) AS dist,
         ROW_NUMBER() OVER (PARTITION BY a.n_name
                            ORDER BY levenshtein(a.n_name, b.n_name), b.n_name)
           AS rn
  FROM nation a JOIN nation b ON a.n_name != b.n_name
) t
WHERE rn = 1
"""

#: DuckDB's levenshtein returns BIGINT where Spark returns INT — pin it
_EDIT_DISTANCE_DUCK = _EDIT_DISTANCE.replace(
    "levenshtein(a.n_name, b.n_name) AS dist",
    "levenshtein(a.n_name, b.n_name)::INT AS dist",
)

_URL_SPARK = """
WITH urls AS (
  SELECT doc_id,
         concat('https://www.', source, '.example.com/docs/', doc_id,
                '?lang=', lang, '&v=2#frag') AS url
  FROM documents WHERE doc_id < 500
)
SELECT doc_id,
       parse_url(url, 'HOST')                                   AS host,
       parse_url(url, 'PATH')                                   AS path,
       parse_url(url, 'QUERY')                                  AS query,
       parse_url(url, 'QUERY', 'lang')                          AS q_lang,
       parse_url(url, 'PROTOCOL')                               AS proto,
       parse_url(url, 'REF')                                    AS frag,
       regexp_replace(parse_url(url, 'HOST'), '^www\\.', '')    AS apex_host
FROM urls
"""

# DuckDB has no parse_url — the oracle replays each component with
# explicit regexes over the same constructed URL (a stricter check than
# reusing one parser on both sides)
_URL_DUCK = """
WITH urls AS (
  SELECT doc_id,
         concat('https://www.', source, '.example.com/docs/', doc_id,
                '?lang=', lang, '&v=2#frag') AS url
  FROM documents WHERE doc_id < 500
)
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)            AS host,
       regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1)     AS path,
       regexp_extract(url, '\\?([^#]*)', 1)                     AS query,
       regexp_extract(url, '[?&]lang=([^&#]*)', 1)              AS q_lang,
       regexp_extract(url, '^([a-z]+)://', 1)                   AS proto,
       regexp_extract(url, '#(.*)$', 1)                         AS frag,
       regexp_replace(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
                      '^www\\.', '')                             AS apex_host
FROM urls
"""


# Spark 4 COLLATIONS: case-/accent-insensitive comparison semantics as a
# COLUMN TYPE property, not an expression rewrite — filters, GROUP BY and
# DISTINCT all honor it. The oracle replays with explicit lower(): exact
# equality of the grouped result proves UTF8_LCASE groups the same keys.
_COLLATION = """
WITH m AS (
  SELECT CAST(n_name AS STRING COLLATE UTF8_LCASE) AS name_ci, n_nationkey
  FROM nation
  UNION ALL
  SELECT CAST(lower(n_name) AS STRING COLLATE UTF8_LCASE), n_nationkey + 100
  FROM nation
),
g AS (
  SELECT name_ci, COUNT(*) AS n, MIN(n_nationkey) AS min_key
  FROM m GROUP BY name_ci
)
SELECT lower(CAST(name_ci AS STRING)) AS name_lower_key, n, min_key FROM g
"""

_COLLATION_DUCK = """
WITH m AS (
  SELECT n_name AS nm, n_nationkey FROM nation
  UNION ALL
  SELECT lower(n_name), n_nationkey + 100 FROM nation
)
SELECT lower(nm) AS name_lower_key, COUNT(*) AS n,
       MIN(n_nationkey) AS min_key
FROM m GROUP BY lower(nm)
"""


QUERIES = {
    "fn_string_pack": sql_query(_STRING_SPARK),
    "fn_collation": sql_query(_COLLATION),
    "fn_alias_shims": _fn_alias_shims,
    "fn_null_semantics": sql_query(_NULL_SEMANTICS),
    "fn_udtf_split": _fn_udtf_split,
    "fn_math_pack": sql_query(_MATH),
    "fn_datetime_pack": sql_query(_DT_SPARK),
    "fn_date_bin": _date_bin_q,
    "fn_conditional": sql_query(_COND),
    "fn_crypto_pack": sql_query(_CRYPTO_SPARK),
    "fn_url_pack": sql_query(_URL_SPARK),
    "fn_array_pack": sql_query(_ARRAY_SPARK),
    "fn_json_extract": sql_query(_JSON_SPARK),
    "fn_variant_json": sql_query(_VARIANT_SPARK),
    "fn_edit_distance": sql_query(_EDIT_DISTANCE),
    "fn_unnest_wordcount": sql_query(_UNNEST_SPARK),
    "fn_struct_map": sql_query(_STRUCT_SPARK),
    "fn_regex_pack": sql_query(_REGEX_SPARK),
    "fn_bitwise_pack": sql_query(_BITWISE_SPARK),
}

ORACLES = {
    "fn_string_pack": _STRING_DUCK,
    "fn_alias_shims": _ALIAS_SHIMS_DUCK,
    "fn_null_semantics": _NULL_SEMANTICS,
    "fn_collation": _COLLATION_DUCK,
    "fn_udtf_split": _UDTF_SPLIT_DUCK,
    "fn_math_pack": _MATH,
    "fn_datetime_pack": _DT_DUCK,
    "fn_date_bin": _DATE_BIN_DUCK,
    "fn_conditional": _COND,
    "fn_crypto_pack": _CRYPTO_DUCK,
    "fn_url_pack": _URL_DUCK,
    "fn_array_pack": _ARRAY_DUCK,
    "fn_json_extract": _JSON_DUCK,
    "fn_variant_json": _VARIANT_DUCK,
    "fn_edit_distance": _EDIT_DISTANCE_DUCK,
    "fn_unnest_wordcount": _UNNEST_DUCK,
    "fn_struct_map": _STRUCT_DUCK,
    "fn_regex_pack": _REGEX_DUCK,
    "fn_bitwise_pack": _BITWISE_DUCK,
}


# -- higher-order (lambda) functions over arrays ----------------------------
# Spark's transform/filter/exists/aggregate/zip_with vs DuckDB's
# list_transform/list_filter/list_reduce/list_zip — same lambda semantics,
# different names (reference parity: DataFusion exposes the identical
# family as array_transform / array_filter / array_agg lambdas). The
# per-customer array is BOUNDED (one customer's orders), built once and
# folded entirely inside the row — no explode/re-aggregate round trip, so
# the lambda pack costs one groupBy, not three. All arithmetic is bigint
# cents; zip_with(arr, reverse(arr), +) summing to exactly 2*total is the
# self-check that both engines fold the same pairing.
_HIGHER_ORDER_SPARK = """
WITH per_cust AS (
  SELECT c.c_mktsegment AS seg,
         sort_array(collect_list(CAST(ROUND(o.o_totalprice * 100, 0)
                                      AS BIGINT))) AS arr
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, c.c_custkey
),
lam AS (
  SELECT seg,
         size(arr) AS n,
         aggregate(arr, CAST(0 AS BIGINT), (a, x) -> a + x) AS tot,
         size(filter(arr, x -> x >= 15000000)) AS n_big,
         CASE WHEN exists(arr, x -> x % 2 = 0) THEN 1 ELSE 0 END AS has_even,
         aggregate(zip_with(arr, reverse(arr), (x, y) -> x + y),
                   CAST(0 AS BIGINT), (a, v) -> a + v) AS zsum
  FROM per_cust
)
SELECT seg,
       CAST(SUM(n) AS BIGINT) AS n_orders,
       CAST(SUM(tot) AS BIGINT) AS sum_cents,
       CAST(SUM(n_big) AS BIGINT) AS n_big_orders,
       CAST(SUM(has_even) AS BIGINT) AS n_cust_with_even,
       CAST(SUM(zsum) AS BIGINT) AS zip_sum_cents
FROM lam GROUP BY seg
"""

_HIGHER_ORDER_DUCK = """
WITH per_cust AS (
  SELECT c.c_mktsegment AS seg,
         list_sort(list(CAST(ROUND(o.o_totalprice * 100, 0)
                             AS BIGINT))) AS arr
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_mktsegment, c.c_custkey
),
lam AS (
  SELECT seg,
         len(arr) AS n,
         list_reduce(list_prepend(CAST(0 AS BIGINT), arr),
                     (a, x) -> a + x) AS tot,
         len(list_filter(arr, x -> x >= 15000000)) AS n_big,
         CASE WHEN len(list_filter(arr, x -> x % 2 = 0)) > 0
              THEN 1 ELSE 0 END AS has_even,
         list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(list_zip(arr, list_reverse(arr)),
                                      p -> p[1] + p[2])),
                     (a, v) -> a + v) AS zsum
  FROM per_cust
)
SELECT seg,
       CAST(SUM(n) AS BIGINT) AS n_orders,
       CAST(SUM(tot) AS BIGINT) AS sum_cents,
       CAST(SUM(n_big) AS BIGINT) AS n_big_orders,
       CAST(SUM(has_even) AS BIGINT) AS n_cust_with_even,
       CAST(SUM(zsum) AS BIGINT) AS zip_sum_cents
FROM lam GROUP BY seg
"""

QUERIES["fn_higher_order"] = sql_query(_HIGHER_ORDER_SPARK)
ORACLES["fn_higher_order"] = _HIGHER_ORDER_DUCK
