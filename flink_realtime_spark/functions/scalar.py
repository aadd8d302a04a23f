"""Scalar function library — SURVEY.md §2.8.

Reference capability: the Flink SQL built-in function library (string,
temporal, math, collection, JSON families) that every 实时数仓 job leans on
for the ODS→DWD cleanse step (provenance FLINK/ARCH; snapshot is
README-only, /root/reference/README.md:1-2). The engine surface is the whole
``pyspark.sql.functions`` namespace — JVM expressions inside whole-stage
codegen, never Python-row UDFs; each query here is one oracle-checked
representative per family.

Cross-engine notes baked into the oracles: DuckDB regexp_replace needs the
'g' flag to match Spark's replace-all; DuckDB has no initcap; Spark
year()/ceil() type quirks are normalized with BIGINT casts; transcendental
results (exp/ln) are rounded to 6 decimals since libm may differ in the last
ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_spark.exprs import (
    bigint,
    dsum,
    dsum_sql,
    dtrunc,
    json_k_path_sql,
    json_k_struct_sql,
    json_k_variant_sql,
    json_strict_unique_sql,
    nonfinite,
    nonfinite_sql,
    sum_bigint_safe,
    try_sum_bigint_sql,
)
from flink_realtime_spark.registry import query
from flink_realtime_spark.tables import Warehouse


@query(
    "scalar_string",
    """
    SELECT
      p_partkey,
      upper(p_name) AS name_upper,
      lower(p_brand) AS brand_lower,
      substring(p_type, 1, 7) AS type_prefix,
      split_part(p_type, ' ', 1) AS type_head,
      lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
      CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
      regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
      translate(p_brand, '#', '-') AS brand_dashed,
      CAST(levenshtein(p_brand, 'Brand#00') AS BIGINT) AS lev_to_base,
      md5(p_name) AS name_md5,
      CAST(length(p_name) AS BIGINT) AS name_len,
      concat(p_brand, ':', trim(p_type)) AS brand_type
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring/split, pad/trim, regex extract +
    replace-all, translate, levenshtein, md5, length, concat."""
    wh = Warehouse(spark, sf_dir)
    return wh.part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_type", 1, 7).alias("type_prefix"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_brand", "([0-9]+)", 1).cast("long").alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.levenshtein("p_brand", F.lit("Brand#00")).cast("long").alias("lev_to_base"),
        F.md5("p_name").alias("name_md5"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat("p_brand", F.lit(":"), F.trim("p_type")).alias("brand_type"),
    )


@query(
    "scalar_datetime",
    """
    SELECT
      o_orderkey,
      CAST(year(o_orderdate) AS BIGINT) AS yr,
      CAST(month(o_orderdate) AS BIGINT) AS mo,
      CAST(day(o_orderdate) AS BIGINT) AS dy,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
      CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
        AS days_since_epoch_start,
      CAST(epoch(o_orderdate) AS BIGINT) AS unix_ts,
      o_orderdate + INTERVAL 6 HOUR AS noon_ish,
      CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS weekday_iso
    FROM orders
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal family: extract, truncate, date add/diff, epoch seconds,
    interval arithmetic, ISO weekday (Spark weekday()+1 == DuckDB isodow)."""
    wh = Warehouse(spark, sf_dir)
    return wh.orders.select(
        "o_orderkey",
        bigint(F.year("o_orderdate")).alias("yr"),
        bigint(F.month("o_orderdate")).alias("mo"),
        bigint(F.dayofmonth("o_orderdate")).alias("dy"),
        dtrunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp_ntz")
        .alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        (F.col("o_orderdate") + F.expr("INTERVAL 6 HOURS")).alias("noon_ish"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("weekday_iso"),
    )


@query(
    "scalar_calendar_dow",
    """
    SELECT
      event_id,
      CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
      CAST(dayofweek(ts) + 1 AS BIGINT) AS dow_sun1,
      CAST(isodow(ts) AS BIGINT) AS dow_iso,
      CAST(weekofyear(ts) AS BIGINT) AS iso_week
    FROM events
    """,
)
def scalar_calendar_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week/day-of-week calendar semantics, pinned: Spark's dayofweek is
    1=Sunday..7=Saturday while DuckDB's is 0=Sunday..6=Saturday (the
    oracle adds 1), and Spark's weekday is 0=Monday..6 while DuckDB's
    isodow is 1=Monday..7 (the Spark side adds 1) — off-by-one DOW bugs
    are a classic silent-corruption source in weekly rollups. date_trunc
    week (Monday-start) and ISO week numbers agree natively."""
    wh = Warehouse(spark, sf_dir)
    return wh.events.select(
        "event_id",
        dtrunc("week", "ts").alias("week_start"),
        F.dayofweek("ts").cast("long").alias("dow_sun1"),
        (F.weekday("ts") + 1).cast("long").alias("dow_iso"),
        F.weekofyear("ts").cast("long").alias("iso_week"),
    )


@query(
    "scalar_div_mod",
    """
    SELECT
      o_orderkey,
      CAST(CAST(o_orderkey - 7500 AS DOUBLE) / 7 AS DOUBLE) AS fdiv,
      CAST(TRUNC(CAST(o_orderkey - 7500 AS DOUBLE) / 7) AS BIGINT)
        AS idiv_trunc,
      CAST((o_orderkey - 7500) % 7 AS BIGINT) AS mod_signed,
      CAST((((o_orderkey - 7500) % 7) + 7) % 7 AS BIGINT) AS mod_positive
    FROM orders
    """,
)
def scalar_div_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Division/modulo semantics on signed integers, pinned across
    engines — two REAL divergences hide here: DuckDB's `//` FLOORS
    (-7 // 2 = -4) while Spark's `DIV` truncates toward zero
    (-7 DIV 2 = -3), so the oracle spells truncation out as
    TRUNC(double-div); and Spark's pmod (always-positive modulo, the form
    every hash-partitioner wants) has no DuckDB builtin, so the oracle
    writes ((a % b) + b) % b. Plain `%` agrees (dividend-signed in both).
    The 7500-shifted orderkey spans [-7499, 7500], so both sign rules
    are actually exercised."""
    wh = Warehouse(spark, sf_dir)
    x = F.col("o_orderkey") - 7500
    return wh.orders.select(
        "o_orderkey",
        (x.cast("double") / 7).alias("fdiv"),
        F.expr("(o_orderkey - 7500) DIV 7").cast("long").alias("idiv_trunc"),
        (x % 7).cast("long").alias("mod_signed"),
        F.pmod(x, F.lit(7)).cast("long").alias("mod_positive"),
    )


@query(
    "scalar_math",
    f"""
    SELECT
      c_custkey,
      CAST(abs(c_acctbal) AS DOUBLE) + 0 AS abs_bal,
      CAST(round(c_acctbal, 1) AS DOUBLE) + 0 AS bal_round1,
      CASE WHEN NOT {nonfinite_sql('c_acctbal')} THEN
        CAST(ceil(CAST(c_acctbal AS DOUBLE)) AS BIGINT) END AS bal_ceil,
      CASE WHEN NOT {nonfinite_sql('c_acctbal')} THEN
        CAST(floor(CAST(c_acctbal AS DOUBLE)) AS BIGINT) END AS bal_floor,
      CAST(sqrt(abs(c_acctbal)) AS DOUBLE) + 0 AS bal_sqrt,
      ROUND(ln(abs(c_acctbal) + 1), 6) AS bal_ln,
      ROUND(exp(c_acctbal / 10000), 6) AS bal_exp,
      CASE WHEN isnan(c_acctbal) THEN CAST('NaN' AS DOUBLE)
           ELSE CAST(sign(c_acctbal + 0) AS DOUBLE) END AS bal_sign,
      CAST(greatest(c_acctbal + 0, 0.0) AS DOUBLE) AS bal_pos,
      CAST(least(c_acctbal + 0, 1000.0) AS DOUBLE) AS bal_capped,
      CAST(((CAST(c_custkey AS BIGINT) % 7) + 7) % 7 AS BIGINT) AS key_mod7
    FROM customer
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/round/ceil/floor/sqrt/ln/exp/sign/greatest/least and
    positive modulo (Spark pmod == the ((x%n)+n)%n rewrite).

    SPECIALS (r10 tier): ceil/floor of a non-finite double have no BIGINT
    value (both engines throw) → NULL; round keeps the engines'
    sign-of-zero split (+0 normalizer); sign pins NaN explicitly (Java
    signum(NaN)=NaN vs utf8proc-side 0) and normalizes -0.0 before the
    comparison chain; greatest/least normalize -0.0 so an equal-compare
    tie can't keep a different zero per engine; abs/sqrt get +0 because
    DuckDB's abs keeps -0.0 (x<0 ? -x : x) where Java's clears it, and
    IEEE sqrt(-0.0) is -0.0."""
    wh = Warehouse(spark, sf_dir)
    bal = F.col("c_acctbal")
    return wh.customer.select(
        "c_custkey",
        (F.abs("c_acctbal").cast("double") + F.lit(0.0)).alias("abs_bal"),
        (F.round("c_acctbal", 1).cast("double") + F.lit(0.0)).alias("bal_round1"),
        F.when(~nonfinite(bal), F.ceil(bal.cast("double")).cast("long")).alias(
            "bal_ceil"
        ),
        F.when(~nonfinite(bal), F.floor(bal.cast("double")).cast("long")).alias(
            "bal_floor"
        ),
        (F.sqrt(F.abs("c_acctbal")).cast("double") + F.lit(0.0)).alias("bal_sqrt"),
        F.round(F.log(F.abs("c_acctbal") + 1), 6).alias("bal_ln"),
        F.round(F.exp(F.col("c_acctbal") / 10000), 6).alias("bal_exp"),
        F.when(F.isnan(bal), F.lit(float("nan")))
        .otherwise(F.signum(bal + F.lit(0.0)).cast("double"))
        .alias("bal_sign"),
        F.greatest(bal + F.lit(0.0), F.lit(0.0)).cast("double").alias("bal_pos"),
        F.least(bal + F.lit(0.0), F.lit(1000.0)).cast("double").alias("bal_capped"),
        F.pmod(F.col("c_custkey").cast("long"), F.lit(7)).cast("long").alias("key_mod7"),
    )


@query(
    "scalar_array",
    """
    SELECT
      vec_id,
      CAST(len(embedding) AS BIGINT) AS dim,
      CAST(embedding[1] AS DOUBLE) AS first_dim,
      CAST(embedding[len(embedding)] AS DOUBLE) AS last_dim,
      CAST(list_max(embedding) AS DOUBLE) AS max_dim,
      CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
      CAST(len(list_distinct([label % 3, label % 5, label % 3])) AS BIGINT)
        AS n_distinct_mods,
      CAST(list_sum(generate_series(1, CAST(label AS BIGINT) + 1)) AS BIGINT)
        AS tri_sum
    FROM embeddings
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/collection family incl. higher-order functions: size, index
    access, max, lambda filter, distinct, sequence + aggregate (all
    JVM-side codegen — the idiomatic replacement for per-row UDF loops)."""
    wh = Warehouse(spark, sf_dir)
    e = wh.embeddings
    lbl = F.col("label").cast("long")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
        F.element_at("embedding", F.size("embedding")).cast("double").alias(
            "last_dim"
        ),
        F.array_max("embedding").cast("double").alias("max_dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias(
            "n_positive"
        ),
        # DuckDB list_distinct REMOVES NULL elements; Spark array_distinct
        # keeps one NULL — a null label made the counts 0 vs 1
        # (nulls-tier find). Both sides therefore count DISTINCT NON-NULL
        # (the SQL COUNT(DISTINCT) convention): the filter is a no-op on
        # non-null labels.
        F.size(
            F.filter(
                F.array_distinct(F.array(lbl % 3, lbl % 5, lbl % 3)),
                lambda x: x.isNotNull(),
            )
        )
        .cast("long")
        .alias("n_distinct_mods"),
        F.aggregate(
            F.sequence(F.lit(1).cast("long"), lbl + 1),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        .cast("long")
        .alias("tri_sum"),
    )


@query(
    "scalar_map",
    """
    SELECT
      event_id,
      'etype,uid' AS key_list,
      event_type AS etype_val,
      CAST(user_id AS VARCHAR) AS uid_val,
      CAST(TRUE AS BOOLEAN) AS has_etype,
      CAST(2 AS BIGINT) AS map_size
    FROM events
    """,
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: construct, keys (sorted), element_at lookup, contains,
    size. The oracle states the expected scalars directly — DuckDB's MAP
    indexing semantics differ, so the check is on the extracted values."""
    wh = Warehouse(spark, sf_dir)
    m = F.create_map(
        F.lit("etype"),
        F.col("event_type"),
        F.lit("uid"),
        F.col("user_id").cast("string"),
    )
    return wh.events.select(
        "event_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("key_list"),
        F.element_at(m, "etype").alias("etype_val"),
        F.element_at(m, "uid").alias("uid_val"),
        F.map_contains_key(m, "etype").alias("has_etype"),
        F.size(m).cast("long").alias("map_size"),
    )


@query(
    "scalar_json_props",
    f"""
    SELECT
      event_id,
      {json_k_path_sql('props')} AS k_path,
      {json_k_struct_sql('props')} AS k_struct,
      {json_k_variant_sql('props')} AS k_variant,
      CAST(to_json(struct_pack(user_id := user_id, event_type := event_type))
           AS VARCHAR) AS rowjson
    FROM events
    """,
)
def scalar_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family — the ODS→DWD signature op: path extraction
    (get_json_object), schema-ful parse (from_json), Spark 4 VARIANT
    (try_parse_json + try_variant_get), and serialization (to_json).
    On benign payloads the three extraction routes agree; on adversarial
    ones (extremes tier, r10) they are three DIFFERENT pinned contracts
    — lenient integral path / strict unique-key schema / variant numeric
    coercion (exprs.json_k_*_sql document each mirror). parse_json is
    the try_ form because Spark's variant builder THROWS on duplicate
    object keys."""
    wh = Warehouse(spark, sf_dir)
    return wh.events.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("long").alias("k_path"),
        F.when(
            F.try_parse_json("props").isNotNull(),
            F.from_json("props", "k LONG").getField("k"),
        ).alias("k_struct"),
        F.try_variant_get(
            F.try_parse_json("props"), "$.k", "long"
        ).alias("k_variant"),
        # ignoreNullFields=false: Spark's to_json DROPS null fields by
        # default while SQL to_json serializes them as `"k":null` — the
        # payloads diverge the moment a field is nullable (nulls-tier
        # find). Emitting nulls is also the round-trippable contract a
        # downstream from_json consumer needs.
        F.to_json(
            F.struct("user_id", "event_type"),
            {"ignoreNullFields": "false"},
        ).alias("rowjson"),
    )


@query(
    "scalar_bitwise",
    """
    SELECT
      o_orderkey,
      CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
      CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
      CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
      CAST(o_orderkey << 2 AS BIGINT) AS shl2,
      CAST(o_orderkey >> 3 AS BIGINT) AS shr3,
      CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
    FROM orders
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount — the bit-packing
    primitives the SimHash/banding operators build on."""
    wh = Warehouse(spark, sf_dir)
    k = F.col("o_orderkey")
    return wh.orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).cast("long").alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).cast("long").alias("xored"),
        F.shiftleft(k, 2).cast("long").alias("shl2"),
        F.shiftright(k, 3).cast("long").alias("shr3"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@query(
    "scalar_url",
    """
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=1' AS url
      FROM documents
    )
    SELECT
      doc_id,
      CASE WHEN regexp_full_match(
             regexp_extract(url, 'https://([^/]+)/', 1), '[A-Za-z0-9.-]*')
           THEN regexp_extract(url, 'https://([^/]+)/', 1)
      END AS host,
      regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
      regexp_extract(url, 'lang=([^&]+)', 1) AS lang_param
    FROM u
    """,
)
def scalar_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family (Flink SQL PARSE_URL): host/path/query-param
    extraction via Spark's parse_url — the oracle re-derives the parts
    with regexes for engine independence. Narrow map, scan speed.

    HOST contract (uni-tier find, r09): Spark's parse_url is
    java.net.URI-backed, and URI's server-based authority parsing yields a
    NULL host for any authority outside RFC-2396 hostname characters
    (alphanumerics, '-', '.') — a raw-IRI host like 'srç….example.com' is
    NOT parsed (real engines punycode hosts before this point). PATH and
    QUERY still parse (they're regex-extracted past the authority). The
    oracle mirrors the hostname-charset gate explicitly."""
    wh = Warehouse(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=1"),
    )
    return wh.documents.select("doc_id", url.alias("url")).select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@query(
    "dwd_clean_route",
    f"""
    WITH raw AS (
      SELECT event_type,
             CASE WHEN user_id % 7 = 0
                  THEN substr(props, 1, len(props) - 1)
                  ELSE props END AS p
      FROM events
    )
    SELECT
      event_type,
      COUNT(*) FILTER (WHERE {json_strict_unique_sql('p')}) AS n_clean,
      COUNT(*) FILTER (WHERE NOT {json_strict_unique_sql('p')}) AS n_dirty,
      {try_sum_bigint_sql(json_k_variant_sql('p'))} AS k_sum
    FROM raw
    GROUP BY event_type
    """,
)
def dwd_clean_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ODS→DWD cleaning with dirty-data routing (the Flink side-output
    pattern for malformed records): rows whose payload fails the STRICT
    parse are quarantined and counted instead of silently dropped. A
    seventh of the rows are deterministically corrupted (truncated
    brace) to exercise the dirty path; parse-failure detection tests
    payload validity itself on BOTH sides — try_parse_json → NULL
    (Spark) vs json_valid + unique-keys (DuckDB), independent mechanisms
    with genuinely equivalent predicates (extremes tier, r10: strict
    validity includes KEY UNIQUENESS — Spark's variant builder rejects
    duplicate-key documents, so they route dirty; a valid payload with a
    missing/null "k" still counts clean on both). k extraction is the
    variant coercion contract and the sum is overflow-safe (the
    wide-decimal sum_bigint_safe — an int64-max k in a group must NULL
    the sum deterministically, not throw). In
    streaming this is two filtered branches of one DataFrame, the §1.1
    side-output mapping."""
    wh = Warehouse(spark, sf_dir)
    p = F.when(
        F.col("user_id") % 7 == 0,
        F.expr("substr(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    v = F.try_parse_json(p)
    # dirty requires a present-but-unparseable payload: a NULL payload is
    # neither clean nor dirty, matching the oracle, whose json_valid(NULL)
    # is NULL and therefore excluded from BOTH filtered counts.
    return (
        wh.events.select(
            "event_type",
            v.isNotNull().alias("clean"),
            (p.isNotNull() & v.isNull()).alias("dirty"),
            F.try_variant_get(v, "$.k", "long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.when(F.col("clean"), 1)).alias("n_clean"),
            F.count(F.when(F.col("dirty"), 1)).alias("n_dirty"),
            sum_bigint_safe(F.when(F.col("clean"), F.col("k"))).alias(
                "k_sum"
            ),
        )
    )


@query(
    "scalar_variant",
    f"""
    SELECT
      event_id,
      {json_k_variant_sql('props')} AS k,
      {json_k_variant_sql('props')} % 10 AS k_mod
    FROM events
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured data: try_parse_json once
    into a VariantType column, then typed try_variant_get extraction —
    the shredded-JSON answer to repeated get_json_object calls (each of
    which re-parses the string). The try_ forms are load-bearing
    (extremes tier, r10): plain parse_json THROWS on duplicate object
    keys and plain variant_get on any non-coercible value (a double
    beyond int64). The oracle mirrors the variant coercion contract
    (exprs.json_k_variant_sql)."""
    wh = Warehouse(spark, sf_dir)
    v = F.try_parse_json("props")
    return wh.events.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k"),
        (F.try_variant_get(v, "$.k", "bigint") % 10).alias("k_mod"),
    )


@query(
    "scalar_encode",
    """
    SELECT
      doc_id,
      to_base64(encode(source)) AS b64,
      decode(from_base64(to_base64(encode(source)))) AS b64_roundtrip,
      to_hex(CAST(doc_id AS BIGINT)) AS id_hex,
      regexp_replace(regexp_replace(regexp_replace(
        source, '\\p{Lu}', 'X', 'g'), '\\p{Ll}', 'x', 'g'),
        '\\p{Nd}', 'n', 'g')
        AS masked
    FROM documents
    """,
)
def scalar_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding/masking family (Flink SQL TO_BASE64/HEX + data masking):
    base64 roundtrip, hex rendering, and character-class masking. Spark's
    mask() and DuckDB's regexp cascade express the same masking rule;
    hex output is normalized to Spark's uppercase. The mask classes are
    UNICODE-aware on both sides (uni-tier, r09): Spark's mask() uses Java
    Character.isUpperCase/isLowerCase/isDigit, which the oracle mirrors
    with RE2's \\p{Lu}/\\p{Ll}/\\p{Nd} — ASCII-only [A-Z] classes
    left a non-ASCII 'ç' unmasked where mask() masks it. (Titlecase ǅ and
    Other_Uppercase Ⅸ are 'other' on both sides — probed.)"""
    wh = Warehouse(spark, sf_dir)
    return wh.documents.select(
        "doc_id",
        F.base64(F.col("source").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("source").cast("binary")))
        .cast("string")
        .alias("b64_roundtrip"),
        F.hex(F.col("doc_id").cast("long")).alias("id_hex"),
        F.mask("source", F.lit("X"), F.lit("x"), F.lit("n"), F.lit(None)).alias(
            "masked"
        ),
    )


@query(
    "dwd_try_safety",
    f"""
    WITH t AS (
      SELECT
        event_type,
        {json_k_path_sql('props')} AS k,
        value
      FROM events
    )
    SELECT
      event_type,
      COUNT(*) AS n_rows,
      COUNT(*) FILTER (WHERE k IS NULL) AS n_k_null,
      {try_sum_bigint_sql('k')} AS sum_k,
      COUNT(*) FILTER (WHERE k IS NULL OR k % 5 = 0) AS n_div_null,
      {dsum_sql("CASE WHEN k IS NOT NULL AND k % 5 <> 0 THEN value / (k % 5) END")}
        AS sum_ratio
    FROM t GROUP BY event_type
    """,
)
def dwd_try_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family (Flink SQL TRY_CAST parity) at the
    ODS→DWD boundary: Spark 4 runs ANSI mode by default, where a bad cast
    or zero divisor THROWS — the try_* forms (try_cast, try_divide)
    return NULL instead, which is what a cleansing layer wants for dirty
    rows. get_json_object already yields NULL on invalid JSON; try_cast
    nulls non-numeric payloads; try_divide nulls the manufactured zero
    divisors (k % 5). The oracle mirrors every null with the pinned
    integral-path contract (exprs.json_k_path_sql). sum_k is the
    overflow-safe wide-decimal sum (extremes tier, r10: an int64-max
    payload must NULL the group's sum, not throw ANSI
    ARITHMETIC_OVERFLOW — and Spark's own try_sum is partition-order
    nondeterministic on mixed-sign overflow). Per-row narrow ops + one
    two-phase agg."""
    wh = Warehouse(spark, sf_dir)
    # Column.try_cast is the API in this build (F.try_cast absent).
    k = F.get_json_object("props", "$.k").try_cast("long")
    return (
        wh.events.select("event_type", k.alias("k"), "value")
        .withColumn("ratio", F.try_divide(F.col("value"), F.col("k") % 5))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("n_k_null"),
            sum_bigint_safe(F.col("k")).alias("sum_k"),
            F.count(
                F.when(F.col("k").isNull() | (F.col("k") % 5 == 0), 1)
            ).alias("n_div_null"),
            dsum(F.col("ratio")).alias("sum_ratio"),
        )
    )
