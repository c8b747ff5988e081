"""Scalar function surface (SURVEY §2B.8): string / date / math / case /
array / json / hash expression families.

All JVM-side built-ins (pyspark.sql.functions) — these stay inside
WholeStageCodegen, no Python boundary crossing; at 100 TB this is the
difference between wire-speed projection and a 10-100× Python UDF tax.

Cross-engine gotchas handled here (probe-verified):
- Spark ceil/floor(double) -> BIGINT, DuckDB -> DOUBLE: cast explicitly.
- DuckDB SUM(int)/list_aggregate 'sum' -> DECIMAL128: CAST AS BIGINT.
- Regex patterns kept POSIX-simple so both dialects agree.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from gvcf_hbase_spark.registry import register
from gvcf_hbase_spark.sources.tables import load_table


@register(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           substr(p_name, 1, 8) AS name_prefix,
           concat_ws('|', p_brand, p_type) AS brand_type,
           regexp_extract(p_type, '^([A-Z]+)', 1) AS type_first_word,
           regexp_replace(p_name, ' ', '_') AS name_snake,
           levenshtein(p_brand, 'Brand#1') AS brand_dist,
           trim(p_name) AS name_trim
    FROM part
    """,
    tags=("fn",),
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_first_word"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.levenshtein("p_brand", F.lit("Brand#1")).alias("brand_dist"),
        F.trim("p_name").alias("name_trim"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS o_year,
           month(o_orderdate) AS o_month,
           day(o_orderdate) AS o_day,
           date_trunc('month', o_orderdate) AS month_start,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS TIMESTAMP) AS plus_30d,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
    tags=("fn",),
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family (timestamp_ntz column; date casts keep
    both engines at the same granularity). DATE-typed results are cast
    back to TIMESTAMP on BOTH sides before comparison: pandas has no date
    dtype, so a DATE column round-trips differently per engine
    (datetime.date objects vs datetime64) and a strict value-hash could
    see two encodings of the same day — midnight timestamps are the one
    representation every layer agrees on (the pattern all driver-green
    time queries already use)."""
    o = load_table(spark, sf_dir, "orders")
    odate = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(odate, F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
        F.date_add(odate, 30).cast("timestamp_ntz").alias("plus_30d"),
        F.last_day(odate).cast("timestamp_ntz").alias("month_end"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT c_custkey,
           round(c_acctbal, 1) AS bal_round,
           abs(c_acctbal) AS bal_abs,
           CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           round(ln(abs(c_acctbal) + 1), 9) AS bal_ln,
           round(log10(abs(c_acctbal) + 1), 9) AS bal_log10,
           round(pow(c_acctbal, 2), 4) AS bal_sq,
           CAST(sign(c_acctbal) AS INT) AS bal_sign,
           c_custkey % 7 AS key_mod,
           greatest(c_acctbal, 0.0) AS bal_pos,
           least(c_acctbal, 0.0) AS bal_neg
    FROM customer
    """,
    tags=("fn",),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family. ceil/floor cast to BIGINT on both sides
    (Spark returns BIGINT, DuckDB DOUBLE — probe-verified)."""
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.round(bal, 1).alias("bal_round"),
        F.abs(bal).alias("bal_abs"),
        F.ceil(bal).cast("bigint").alias("bal_ceil"),
        F.floor(bal).cast("bigint").alias("bal_floor"),
        # transcendentals: libm last-ulp differences across engines -> round
        F.round(F.log(F.abs(bal) + 1), 9).alias("bal_ln"),
        F.round(F.log10(F.abs(bal) + 1), 9).alias("bal_log10"),
        # pow() drifts in the last ulp between engines for SOME inputs
        # (surfaced only at sf0.1 — a value absent from smaller SFs);
        # balances carry 2 decimals so the square is exact at 4
        F.round(F.pow(bal, 2), 4).alias("bal_sq"),
        F.signum(bal).cast("int").alias("bal_sign"),
        (F.col("c_custkey") % 7).alias("key_mod"),
        F.greatest(bal, F.lit(0.0)).alias("bal_pos"),
        F.least(bal, F.lit(0.0)).alias("bal_neg"),
    )


@register(
    "fn_case_null",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_bucket,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_nationkey % 2 = 0 THEN NULL ELSE c_nationkey END AS odd_nation
    FROM customer
    """,
    tags=("fn",),
)
def fn_case_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif family."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_bucket"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.when(F.col("c_nationkey") % 2 == 0, F.lit(None).cast("int"))
        .otherwise(F.col("c_nationkey"))
        .alias("odd_nation"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct,
           list_contains(string_split(text, ' '), 'the') AS has_the,
           array_to_string(list_sort(string_split(text, ' '))[1:3], ',') AS first3_sorted,
           CAST(list_aggregate(list_transform(string_split(text, ' '), t -> length(t)), 'sum') AS BIGINT) AS total_token_chars
    FROM documents
    """,
    tags=("fn", "array"),
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order function family (transform/aggregate — the
    same machinery the vector ops in §2B.9 use for dot products).

    Output columns are all scalar: the sorted-prefix array is flattened
    with array_join because the driver's canonicalizer sorts raw pandas
    columns and cannot hash ndarray cells (SURVEY §5.4 hashable-output
    rule; r03 driver ERR)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_contains(toks, "the").alias("has_the"),
        F.array_join(F.slice(F.sort_array(toks), 1, 3), ",").alias("first3_sorted"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("bigint")
        .alias("total_token_chars"),
    )


@register(
    "fn_map_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
    FROM events
    """,
    tags=("fn", "json"),
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path access (get_json_object — JVM-side, no UDF)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", k.alias("k"), (k % 10).alias("k_bucket"))


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
    FROM documents
    """,
    tags=("fn", "hash"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic fingerprints (the dedup building block). Engine-
    portable md5/sha256 only — Spark's xxhash64/hash are Spark-specific
    and never appear in oracle-checked output (SURVEY §2B.8)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
    )


@register(
    "fn_map_ops",
    oracle="""
    WITH ks AS (
      SELECT doc_id,
             list_sort(list_distinct(string_split(text, ' ')))[1:3] AS keys3
      FROM documents
    )
    SELECT doc_id,
           CAST(len(keys3) AS INT) AS n_entries,
           array_to_string(keys3, ',') AS keys_sorted,
           CAST(length(keys3[1]) AS INT) AS first_key_len
    FROM ks
    """,
    tags=("fn", "map"),
)
def fn_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a token->length map per document
    (map_from_arrays), then size / map_keys / element_at lookups — the
    dynamic-schema cell model the reference gets from HBase qualifiers
    (SURVEY §1.1), expressed as a first-class Spark type. The oracle
    recomputes the flattened outputs independently (DuckDB's map
    extraction returns lists, so the check targets values, not the map
    mechanism). All JVM-side; maps stay inside Tungsten rows — no
    shuffle added. Output columns are all scalar: keys_sorted is
    flattened with concat_ws because the driver's canonicalizer cannot
    hash ndarray cells (SURVEY §5.4 hashable-output rule; r03 ERR)."""
    d = load_table(spark, sf_dir, "documents")
    keys3 = F.slice(F.sort_array(F.array_distinct(F.split("text", " "))), 1, 3)
    m = F.map_from_arrays(keys3, F.transform(keys3, lambda t: F.length(t)))
    return d.select(
        "doc_id",
        F.size(m).alias("n_entries"),
        F.concat_ws(",", F.sort_array(F.map_keys(m))).alias("keys_sorted"),
        F.element_at(m, F.element_at(F.sort_array(F.map_keys(m)), 1)).alias("first_key_len"),
    )


@register(
    "fn_explode_pos",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS pos, string_split(text, ' ')[i] AS tok
    FROM documents,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS u(i)
    """,
    tags=("fn", "array"),
)
def fn_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinal expansion (posexplode): one row per token with its
    1-based position — the row-generator the gVCF block expansion
    (win_expand_blocks) and the shingle UDTF are built on. Generate is
    pipelined inside the scan stage: no shuffle, output fan-out scales
    with data not with driver memory."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "tok")


@register(
    "fn_struct_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status,
           round(o_totalprice, 2) AS price,
           o_orderstatus || ':' || CAST(round(o_totalprice, 2) AS VARCHAR) AS packed
    FROM orders
    WHERE o_totalprice > 350000
    """,
    tags=("fn", "struct"),
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType surface: pack columns into a struct (the engine's A3
    'encoded record' — SURVEY §2A: schema replaces byte encoding), access
    fields back out, and serialize deterministically. The struct lives
    inside the Tungsten row; packing/unpacking is free projection, which
    is exactly why the Spark data model needs no HBase-style cell
    encoder."""
    o = load_table(spark, sf_dir, "orders")
    rec = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.round("o_totalprice", 2).alias("price"),
    )
    return (
        o.filter(F.col("o_totalprice") > 350000)
        .withColumn("rec", rec)
        .select(
            "o_orderkey",
            F.col("rec.status").alias("status"),
            F.col("rec.price").alias("price"),
            F.concat_ws(":", F.col("rec.status"), F.col("rec.price").cast("string")).alias("packed"),
        )
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           user_id & 255 AS low_byte,
           user_id | 4096 AS with_flag,
           xor(user_id, event_id) AS mixed,
           user_id << 2 AS shifted_l,
           user_id >> 1 AS shifted_r,
           CAST(bit_count(user_id) AS INT) AS popcount
    FROM events
    """,
    tags=("fn",),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family (&, |, XOR, shifts, popcount) — the ops
    key-salting, bucket masks, and bitmap-index style predicates are
    built from. All pure codegen expressions; DuckDB spells XOR as a
    function and shifts as operators, results are identical BIGINTs."""
    ev = load_table(spark, sf_dir, "events")
    u, e = F.col("user_id"), F.col("event_id")
    return ev.select(
        "event_id",
        u.bitwiseAND(F.lit(255)).alias("low_byte"),
        u.bitwiseOR(F.lit(4096)).alias("with_flag"),
        u.bitwiseXOR(e).alias("mixed"),
        F.shiftleft(u, 2).alias("shifted_l"),
        F.shiftright(u, 1).alias("shifted_r"),
        F.bit_count(u).alias("popcount"),
    )


@register(
    "fn_try_arith",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice / NULLIF(CAST(o_orderkey % 4 AS DOUBLE), 0.0), 4)
             AS price_per_bucket,
           TRY_CAST(o_orderpriority AS INT) AS prio_as_int,
           TRY_CAST(regexp_extract(o_orderpriority, '^([0-9]+)', 1) AS INT) AS prio_num,
           o_orderkey + 1 AS next_key
    FROM orders
    """,
    tags=("fn",),
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic family (try_divide / try_cast / try_add):
    NULL instead of a job-killing exception on divide-by-zero or a
    malformed cast — what a 100 TB ingest needs when one poisoned row
    must not fail a 10^6-task job. DuckDB replays try_divide as
    ``/ NULLIF(den, 0)`` and try_cast natively; Spark's ANSI mode (4.x
    default) makes the non-try forms THROW, so these are the sanctioned
    dirty-data spellings, not a stylistic choice."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(
            F.try_divide(F.col("o_totalprice"), (F.col("o_orderkey") % 4).cast("double")),
            4,
        ).alias("price_per_bucket"),
        F.col("o_orderpriority").try_cast("int").alias("prio_as_int"),
        F.regexp_extract("o_orderpriority", r"^([0-9]+)", 1)
        .try_cast("int")
        .alias("prio_num"),
        F.try_add(F.col("o_orderkey"), F.lit(1)).alias("next_key"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("agg", "sketch"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmaps (Spark 3.5+ bitmap family) —
    the two-level pattern for persisted/incremental exact distincts:
    keys bucket into fixed 32k-bit bitmaps (`bitmap_bucket_number` /
    `bitmap_bit_position`), each (group, bucket) aggregates to one
    bitmap, and the group's distinct count is the SUM of per-bucket
    `bitmap_count`s. Unlike count(DISTINCT) — whose Expand doubles the
    shuffle — the bitmap form shuffles ≤ one 4 KB bitmap per (group,
    bucket), and the per-bucket bitmaps are MERGEABLE (`bitmap_or_agg`),
    so incremental refreshes and rollups reuse stored bitmaps exactly
    like the HLL-sketch pattern but with zero error. Oracle: plain
    count(DISTINCT)."""
    o = load_table(spark, sf_dir, "orders")
    per_bucket = (
        o.select(
            "o_orderstatus",
            F.bitmap_bucket_number(F.col("o_custkey")).alias("bucket"),
            F.bitmap_bit_position(F.col("o_custkey")).alias("pos"),
        )
        .groupBy("o_orderstatus", "bucket")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
    )
    return per_bucket.groupBy("o_orderstatus").agg(
        F.sum(F.bitmap_count(F.col("bm"))).alias("n_customers")
    )


@register(
    "fn_explode_outer",
    oracle="""
    WITH arr AS (
      SELECT p_partkey,
             CASE WHEN p_size < 5 THEN []
                  ELSE string_split(p_type, ' ') END AS words
      FROM part
    )
    SELECT p_partkey, w AS word
    FROM arr LEFT JOIN LATERAL (SELECT unnest(words) AS w) t ON TRUE
    """,
    tags=("fn", "array"),
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer``: rows with an EMPTY (or null) array survive the
    expansion with a NULL element instead of vanishing — the difference
    between 'unnest as inner join' and 'unnest as left join'. Dropping
    empty-array parents silently is the classic explode() data-loss bug
    in flattening pipelines (a doc with no attachments disappears from
    the per-attachment table AND every downstream count). The oracle
    spells the same semantics as DuckDB's LEFT JOIN LATERAL unnest."""
    p = load_table(spark, sf_dir, "part")
    words = F.when(F.col("p_size") < 5, F.array().cast("array<string>")).otherwise(
        F.split(F.col("p_type"), " ")
    )
    return p.select("p_partkey", F.explode_outer(words).alias("word"))


@register(
    "fn_collation",
    oracle="""
    SELECT lower(mixed) AS source_ci,
           count(*) AS n_docs,
           count(DISTINCT mixed) AS n_case_variants
    FROM (
      SELECT CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END AS mixed
      FROM documents
    )
    GROUP BY 1
    """,
    tags=("fn", "string"),
)
def fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations: group under the UTF8_LCASE collation so case
    variants ('SRC1' vs 'src1', constructed deterministically from the
    fixture) merge WITHOUT rewriting the data — comparison semantics
    live in the type, and every comparison/join/group on the column
    inherits them (vs sprinkling lower() at each use site and hoping no
    one forgets). The group representative is engine-chosen, so the
    output canonicalizes with lower() — which is also how the oracle
    (which has no UTF8_LCASE) replays the semantics."""
    d = load_table(spark, sf_dir, "documents")
    mixed = F.when(F.col("doc_id") % 2 == 0, F.upper("source")).otherwise(
        F.col("source")
    )
    return (
        d.select(mixed.alias("mixed"))
        .groupBy(F.collate(F.col("mixed"), "UTF8_LCASE").alias("k"))
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("mixed").alias("n_case_variants"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("source_ci"),
            "n_docs",
            "n_case_variants",
        )
    )


@register(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           CAST(json_extract_string(props, '$.missing') AS INT) AS absent
    FROM events
    """,
    tags=("fn", "json", "variant"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT ingestion of semi-structured payloads:
    ``parse_json`` once into the binary VARIANT encoding, then typed
    path extraction with ``try_variant_get`` (absent path → NULL, not an
    error). VARIANT's point at scale is parse-once/extract-many — the
    JSON text is decoded a single time per row into a traversable binary
    form, instead of one full ``get_json_object`` string parse per
    extracted path; shredding into columnar storage then makes repeated
    extraction a column scan. The oracle replays the same paths with
    DuckDB's independent JSON machinery."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k"),
        (F.try_variant_get(v, "$.k", "int") % 10).alias("k_bucket"),
        F.try_variant_get(v, "$.missing", "int").alias("absent"),
    )


_REGEXP_EXTRACT_ALL_ORACLE = """
    SELECT doc_id,
           coalesce(array_to_string(regexp_extract_all(text, '[a-z]{6,}'), ','), '')
             AS long_words,
           CAST(len(regexp_extract_all(text, '[a-z]{6,}')) AS INT) AS n_long,
           coalesce(regexp_extract_all(text, '[a-z]{6,}')[1], '') AS first_long
    FROM documents
"""


@register("fn_regexp_extract_all", oracle=_REGEXP_EXTRACT_ALL_ORACLE, tags=("fn", "text"))
def fn_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-match regex extraction into an array column (every ≥6-letter
    word per document) — the one-to-many sibling of regexp_extract that
    log parsing and PII scanning lean on constantly.

    Per-row JVM regex; no explode, so the op composes downstream without
    a row-count change. The match list is flattened with array_join in
    the oracle-checked OUTPUT (driver hashable-output rule, §5.4) —
    in-pipeline composition keeps the raw array form.
    Spark's third argument selects the capture group and must be 0 for
    whole-match semantics (its default is group 1, which would throw on
    a groupless pattern); DuckDB's group argument defaults to 0 — the
    asymmetry is exactly the kind of dialect trap this oracle pins.
    first_long coalesces to '' on both sides: under ANSI mode Spark's
    element_at THROWS on an empty array, so the null-yielding
    try_element_at is the correct accessor; DuckDB's out-of-range list
    index yields NULL natively.
    """
    d = load_table(spark, sf_dir, "documents")
    arr = F.regexp_extract_all(F.col("text"), F.lit("[a-z]{6,}"), 0)
    return d.select(
        "doc_id",
        F.array_join(arr, ",").alias("long_words"),
        F.size(arr).alias("n_long"),
        F.coalesce(F.try_element_at(arr, F.lit(1)), F.lit("")).alias("first_long"),
    )


_URL_PARSE_ORACLE = """
    SELECT doc_id,
           source || '.example.com' AS host,
           '/docs/' || CAST(doc_id AS VARCHAR) AS path,
           'lang=' || lang || '&page=' || CAST(doc_id % 7 AS VARCHAR) AS query,
           lang AS q_lang,
           CAST(doc_id % 7 AS VARCHAR) AS q_page
    FROM documents
"""


@register("fn_url_parse", oracle=_URL_PARSE_ORACLE, tags=("fn",))
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition with the JVM ``parse_url`` family: HOST, PATH,
    QUERY, and per-parameter QUERY:key extraction — the clickstream /
    referrer-log workhorse. URLs are synthesized deterministically from
    the documents table, so the oracle can state the expected parts
    directly from the source columns instead of re-implementing a URL
    parser in SQL — a construction-inverse oracle, like the codec
    round trips.

    All five extractions are per-row JVM expressions inside one
    whole-stage-codegen span: no UDF, no regex in Python, column-pruned
    scan (doc_id, source, lang only). ``try_parse_url`` (Spark 4) is the
    ANSI-safe variant that yields NULL on malformed input instead of
    killing the job — the right default when the URL column is scraped
    web data rather than synthesized, and what this op uses.
    """
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&page="),
        (F.col("doc_id") % 7).cast("string"),
    )
    return d.select(
        "doc_id",
        F.try_parse_url(url, F.lit("HOST")).alias("host"),
        F.try_parse_url(url, F.lit("PATH")).alias("path"),
        F.try_parse_url(url, F.lit("QUERY")).alias("query"),
        F.try_parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.try_parse_url(url, F.lit("QUERY"), F.lit("page")).alias("q_page"),
    )


_MASKING_ORACLE = """
    SELECT c_custkey,
           'Customer#' || right(md5(CAST(c_custkey AS VARCHAR) || ':px'), 12)
             AS masked_name,
           CAST(round(c_acctbal / 100, 0) * 100 AS BIGINT) AS balance_band,
           CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY')
                THEN c_mktsegment ELSE 'OTHER' END AS segment_coarse
    FROM customer
"""


@register("fn_data_masking", oracle=_MASKING_ORACLE, tags=("fn", "curation"))
def fn_data_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governance masking surface: pseudonymization (keyed-hash token that
    is DETERMINISTIC — the same customer masks identically across tables
    and runs, so joins still work on masked data), numeric generalization
    (balance rounded to 100-currency bands), and category coarsening
    (rare segments collapsed to OTHER) — the k-anonymity-style transforms
    a data-sharing pipeline applies before export.

    All three are per-row JVM expressions in one codegen span — masking a
    100 TB table is exactly one scan+write, nothing shuffles. The token
    is md5 over key+salt (md5 exists on both engines, making the oracle a
    true independent replay; production would swap in sha2/aes_encrypt —
    same plan, different expression). round-half-up banding on positive
    and negative balances matches because both engines round |x|/100 on
    exactly-representable cents-derived doubles.
    """
    c = load_table(spark, sf_dir, "customer")
    token = F.concat(
        F.lit("Customer#"),
        F.substring(F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit(":px"))), -12, 12),
    )
    return c.select(
        "c_custkey",
        token.alias("masked_name"),
        (F.round(F.col("c_acctbal") / 100, 0) * 100).cast("bigint").alias("balance_band"),
        F.when(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY"), F.col("c_mktsegment")
        )
        .otherwise(F.lit("OTHER"))
        .alias("segment_coarse"),
    )


@register(
    "fn_datetime_extra",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP) AS plus_2m,
           quarter(o_orderdate) AS o_quarter,
           isodow(o_orderdate) AS iso_dow,
           CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS week_start,
           dayofyear(o_orderdate) AS doy,
           weekofyear(o_orderdate) AS iso_week
    FROM orders
    """,
    tags=("fn",),
)
def fn_datetime_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-navigation function family, complementing `fn_date`'s
    component extraction: month arithmetic WITH end-of-month clamping
    (add_months: Jan 31 + 2m = Mar 31, Jan 31 + 1m = Feb 28/29 — both
    engines clamp identically), quarter, ISO day-of-week (Spark's
    weekday() is 0=Monday; +1 matches DuckDB's isodow 1=Monday — the
    one encoding both engines can express without branches), ISO-week
    Monday truncation, day-of-year, and ISO week number. All map-side
    expression work; DATE-typed results ride the cast-to-TIMESTAMP
    comparison convention `fn_date` documents."""
    o = load_table(spark, sf_dir, "orders")
    odate = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.add_months(odate, 2).cast("timestamp_ntz").alias("plus_2m"),
        F.quarter("o_orderdate").alias("o_quarter"),
        (F.weekday(odate) + 1).alias("iso_dow"),
        F.date_trunc("week", odate).alias("week_start"),
        F.dayofyear(odate).alias("doy"),
        F.weekofyear(odate).alias("iso_week"),
    )


@register(
    "fn_codec_roundtrip",
    oracle="""
    SELECT p_partkey,
           base64(encode(p_name)) AS name_b64,
           decode(from_base64(base64(encode(p_name)))) = p_name AS b64_roundtrip_ok,
           to_hex(p_partkey) AS key_hex,
           md5(p_name) AS name_md5
    FROM part
    """,
    tags=("fn",),
)
def fn_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary codec function family: base64 encode with a verified
    decode round trip (the cell-value transport encoding an HBase-style
    store would apply — the string twin of `gvcf_encode_roundtrip`'s
    struct cycle), integer-to-hex rendering (rowkey debugging), and the
    md5 content fingerprint. All map-side JVM expressions; the
    round-trip flag is computed IN the query so the oracle hash
    certifies losslessness on every row, not a sampled claim. Dialect
    note: Spark's hex() and DuckDB's to_hex() agree on uppercase
    no-padding for non-negative BIGINTs — negative keys would diverge
    (two's-complement width differs) and are absent by fixture
    contract."""
    p = load_table(spark, sf_dir, "part")
    b64 = F.base64(F.encode("p_name", "UTF-8"))
    return p.select(
        "p_partkey",
        b64.alias("name_b64"),
        (F.decode(F.unbase64(b64), "UTF-8") == F.col("p_name")).alias("b64_roundtrip_ok"),
        F.hex(F.col("p_partkey")).alias("key_hex"),
        F.md5(F.encode("p_name", "UTF-8")).alias("name_md5"),
    )


# CIDR dimension: block j covers [j<<28, j<<28 + 2^(32-(4+j))) — disjoint
# by construction (each range sits inside its aligned /4 block).
_CIDR_DIM = [(j, (j << 28), 4 + j) for j in range(8)]

_CIDR_VALUES_SQL = ", ".join(f"({j}, {net}, {bits})" for j, net, bits in _CIDR_DIM)

_CIDR_ORACLE = f"""
    WITH ips AS (
      SELECT user_id,
             (user_id * 2654435761) % 4294967296 AS ip
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    cidrs AS (SELECT * FROM (VALUES {_CIDR_VALUES_SQL}) AS t(cidr_id, net, bits)),
    hits AS (
      SELECT c.cidr_id, c.bits, i.ip
      FROM ips i JOIN cidrs c
        ON i.ip >= c.net AND i.ip < c.net + (1::BIGINT << (32 - c.bits))
    )
    SELECT cidr_id, CAST(bits AS BIGINT) AS bits,
           CAST(count(*) AS BIGINT) AS n_matched,
           CAST(min(ip) AS BIGINT) AS min_ip,
           CAST(max(ip) AS BIGINT) AS max_ip,
           concat(CAST(min(ip) // 16777216 AS VARCHAR), '.',
                  CAST((min(ip) // 65536) % 256 AS VARCHAR), '.',
                  CAST((min(ip) // 256) % 256 AS VARCHAR), '.',
                  CAST(min(ip) % 256 AS VARCHAR)) AS min_ip_dotted
    FROM hits GROUP BY cidr_id, bits
"""


@register("fn_cidr_match", oracle=_CIDR_ORACLE, tags=("function", "join"))
def fn_cidr_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CIDR containment matching — the network-log enrichment join
    (geo-IP, allowlists, subnet attribution): synthesize a 32-bit IP per
    user (Knuth multiplicative hash, exact int64 on both engines), match
    against an 8-entry CIDR dimension by integer RANGE containment
    (ip ∈ [net, net + 2^(32−bits))), and report per-subnet hit stats
    with a dotted-quad rendering built from pure integer div/mod.

    The CIDR side is a literal dim — Spark broadcasts it, so the match
    is a broadcast range join with NO shuffle of the fact side, followed
    by one small aggregate on cidr_id (8 keys). The standard scale trick
    when the dim grows past broadcast (thousands of prefixes) is
    documented: join on the aligned /k prefix bucket (exact equi-key)
    then verify the range — same shape as `join_geo_grid`."""
    ev = load_table(spark, sf_dir, "events").select("user_id").distinct()
    ip = (F.col("user_id") * 2654435761) % 4294967296
    ips = ev.select("user_id", ip.alias("ip"))
    cidrs = spark.createDataFrame(
        [(j, net, bits) for j, net, bits in _CIDR_DIM], "cidr_id long, net long, bits long"
    )
    hits = ips.join(
        F.broadcast(cidrs),
        (F.col("ip") >= F.col("net"))
        & (F.col("ip") < F.col("net") + F.expr("shiftleft(cast(1 as bigint), cast(32 - bits as int))")),
    )
    dotted = F.concat_ws(
        ".",
        (F.min("ip") / 16777216).cast("bigint").cast("string"),
        ((F.min("ip") / 65536).cast("bigint") % 256).cast("string"),
        ((F.min("ip") / 256).cast("bigint") % 256).cast("string"),
        (F.min("ip") % 256).cast("string"),
    )
    return hits.groupBy("cidr_id", "bits").agg(
        F.count("*").alias("n_matched"),
        F.min("ip").cast("bigint").alias("min_ip"),
        F.max("ip").cast("bigint").alias("max_ip"),
        dotted.alias("min_ip_dotted"),
    )


_AES_ORACLE = """
    SELECT doc_id, text,
           CAST(16 * (octet_length(encode(text)) // 16 + 1) AS BIGINT)
             AS cipher_len
    FROM documents
"""


@register("fn_aes_roundtrip", oracle=_AES_ORACLE, tags=("fn", "security"))
def fn_aes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: aes_encrypt → aes_decrypt must
    be the identity (the oracle checks the decrypted text against the
    plaintext — an engine-independent contract, not a replay of our own
    ciphertext), plus the PKCS#7 ciphertext length law (16·⌊n/16+1⌋)
    which IS deterministic under ECB. ECB is used precisely because the
    roundtrip must be testable — GCM's random IV is the right call in
    production and is one literal away; the at-rest pattern (encrypt on
    write, decrypt behind a view) works identically.

    Scale: pure codegen'd map work, zero shuffle; the key arrives as a
    literal here but would come from a KMS-backed conf in production."""
    d = load_table(spark, sf_dir, "documents")
    # 16-byte AES-128 demo key, inlined in the exprs below
    cipher = F.expr(
        "aes_encrypt(text, '0123456789abcdef', 'ECB', 'PKCS')"
    )
    plain = F.expr(
        "CAST(aes_decrypt(aes_encrypt(text, '0123456789abcdef', 'ECB', 'PKCS'),"
        " '0123456789abcdef', 'ECB', 'PKCS') AS STRING)"
    )
    return d.select(
        "doc_id",
        plain.alias("text"),
        F.octet_length(cipher).cast("bigint").alias("cipher_len"),
    )
