"""§2 H — Scalar function families, one composite query per family.

All expressions are JVM-side built-ins inside whole-stage codegen — the
fast path. Known cross-engine traps handled inline: Spark dayofweek is
1=Sunday vs DuckDB 0=Sunday (oracle adds 1); round() boundaries avoided
on .5; regex kept to the RE2-common subset; log = natural log in both.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from adlspark import tables
from adlspark.registry import query


@query(
    "fn_string",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS up_name,
       lower(p_type) AS low_type,
       -- || not concat(): DuckDB's concat() IGNORES NULL args (NULL
       -- name -> '') where Spark's concat is NULL-propagating; || has
       -- Spark's semantics on both engines
       trim('  ' || p_name || '  ') AS trimmed,
       substring(p_name, 1, 5) AS pfx,
       length(p_name) AS name_len,
       concat_ws('/', p_type, p_brand) AS type_brand,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
       replace(p_name, ' ', '_') AS snake,
       len(string_split(p_name, ' ')) AS n_words
FROM part
""",
)
def fn_string(spark, sf_dir):
    p = tables.load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_type").alias("low_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.substring("p_name", 1, 5).alias("pfx"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws("/", "p_type", "p_brand").alias("type_brand"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
    )


@query(
    "fn_regex",
    oracle="""
SELECT p_partkey, p_name, p_brand,
       regexp_extract(p_brand, '[0-9]+') AS brand_num,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
       regexp_matches(p_name, '^(small|large)') AS sized
FROM part
WHERE regexp_matches(p_type, '^(PROMO|ECONOMY)$')
""",
)
def fn_regex(spark, sf_dir):
    """regexp trap: Spark regexp_replace is global by default; DuckDB
    needs the 'g' flag. Spark regexp_extract needs an explicit group 0."""
    p = tables.load(spark, sf_dir, "part")
    return p.filter(F.col("p_type").rlike("^(PROMO|ECONOMY)$")).select(
        "p_partkey",
        "p_name",
        "p_brand",
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("devoweled"),
        F.col("p_name").rlike("^(small|large)").alias("sized"),
    )


@query(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mon,
       dayofmonth(o_orderdate) AS dom,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
       CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom,
       dayofweek(o_orderdate) + 1 AS dow,
       round(12 * (year(o_orderdate) - 1995) + (month(o_orderdate) - 1)
             + (dayofmonth(o_orderdate) - 1) / 31.0, 4) AS months_since_approx
FROM orders
""",
)
def fn_date(spark, sf_dir):
    """Date family. dayofweek: Spark 1=Sunday, DuckDB 0=Sunday → oracle
    +1. months_between is NOT cross-comparable (different day-fraction
    conventions), so an explicit arithmetic months-since is used on both
    sides instead."""
    o = tables.load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mon"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).cast("long").alias(
            "days_since"
        ),
        (d + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.last_day(d).cast("string").alias("eom"),
        F.dayofweek(d).cast("long").alias("dow"),
        F.round(
            12 * (F.year(d) - 1995)
            + (F.month(d) - 1)
            + (F.dayofmonth(d) - 1) / 31.0,
            4,
        ).alias("months_since_approx"),
    )


@query(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 1) AS price_r1,
       floor(l_extendedprice) AS price_floor,
       ceil(l_extendedprice) AS price_ceil,
       abs(l_discount - 0.05) AS disc_dev,
       round(pow(l_quantity, 2), 6) AS qty_sq,
       round(sqrt(l_extendedprice), 6) AS price_sqrt,
       round(ln(l_extendedprice), 6) AS price_ln,
       round(log10(l_extendedprice), 6) AS price_log10,
       pmod_result AS qty_mod5,
       CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign
FROM (SELECT *, CAST(l_quantity AS BIGINT) % 5 AS pmod_result FROM lineitem)
""",
)
def fn_math(spark, sf_dir):
    """Math family. floor/ceil return DOUBLE in DuckDB but LONG in Spark →
    cast to double on the Spark side; % on positive ints ≡ pmod."""
    li = tables.spread(tables.load(spark, sf_dir, "lineitem"), key="l_orderkey")
    p = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(p, 1).alias("price_r1"),
        F.floor(p).cast("double").alias("price_floor"),
        F.ceil(p).cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.sqrt(p), 6).alias("price_sqrt"),
        F.round(F.log(p), 6).alias("price_ln"),
        F.round(F.log10(p), 6).alias("price_log10"),
        F.pmod(F.col("l_quantity").cast("long"), F.lit(5)).alias("qty_mod5"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
    )


@query(
    "fn_cond",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END AS band,
       coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_or_default,
       greatest(o_totalprice, 250000.0) AS at_least,
       least(o_totalprice, 250000.0) AS at_most
FROM orders
""",
)
def fn_cond(spark, sf_dir):
    o = tables.load(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.when(tp > 300000, "high")
        .when(tp > 100000, "mid")
        .otherwise("low")
        .alias("band"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")
        ).alias("status_or_default"),
        F.greatest(tp, F.lit(250000.0)).alias("at_least"),
        F.least(tp, F.lit(250000.0)).alias("at_most"),
    )


@query(
    "fn_cast",
    oracle="""
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(o_totalprice AS BIGINT) AS price_int,
       CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
       CAST(o_orderdate AS DATE) AS order_date,
       TRY_CAST(o_orderpriority AS BIGINT) AS bad_int,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_num,
       CAST(o_totalprice AS DOUBLE) AS price_dbl
FROM orders
""",
)
def fn_cast(spark, sf_dir):
    """Casts incl. try_cast of unparseable strings → NULL."""
    o = tables.spread(tables.load(spark, sf_dir, "orders"), key="o_orderkey")
    # DuckDB CAST(DOUBLE AS BIGINT) rounds HALF_EVEN (measured: 262188.5 →
    # 262188); Spark cast truncates and round() is HALF_UP — bround is the
    # matching half-even form.
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.bround(F.col("o_totalprice"), 0).cast("long").alias("price_int"),
        F.col("o_orderkey").cast("string").cast("long").alias("key_roundtrip"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.expr("try_cast(o_orderpriority AS BIGINT)").alias("bad_int"),
        F.expr("try_cast(substring(o_orderpriority, 1, 1) AS BIGINT)").alias(
            "prio_num"
        ),
        F.col("o_totalprice").cast("double").alias("price_dbl"),
    )


@query(
    "fn_array",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
       round(CAST(embedding[64] AS DOUBLE), 6) AS last_elem,
       len(list_transform(embedding, x -> x * 2)) AS doubled_len,
       round(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)[1], 6) AS doubled_first,
       list_contains(list_transform(embedding, x -> x > 0), true) AS has_pos,
       -- list_distinct DROPS NULLs where Spark's array_distinct keeps
       -- one: add it back for a NULL label ([NULL, NULL, 0] has two
       -- distinct members on the Spark side)
       len(list_distinct([label % 3, label % 2, 0]))
         + CASE WHEN label IS NULL THEN 1 ELSE 0 END AS n_distinct_small,
       round(list_sort(list_transform(embedding, x -> CAST(x AS DOUBLE)))[1], 6) AS min_elem
FROM embeddings
""",
)
def fn_array(spark, sf_dir):
    """Array family over the embedding vector column. Element access is
    1-based in both engines; out-of-bounds / empty-array access is NULL
    on both (DuckDB's [i] is natively NULL there, Spark needs
    try_element_at — ANSI element_at aborts the job).

    NULL-element discipline (round-8 hardening, same class as
    fn_higher_order): DuckDB's list_contains IGNORES null elements where
    Spark's array_contains is 3VL-NULL when the value is absent and a
    null is present, and DuckDB's list_sort puts NULLs LAST where
    Spark's sort_array puts them FIRST (so [1] vs element 1 diverge) —
    has_pos and min_elem therefore run on the null-filtered array.
    Unreachable on the fixtures (no null elements); pinned by
    tests/test_embed_robustness.py::test_null_element_parity."""
    e = tables.load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.round(
            F.try_element_at(emb, F.lit(1)).cast("double"), 6
        ).alias("first_elem"),
        F.round(
            F.try_element_at(emb, F.lit(64)).cast("double"), 6
        ).alias("last_elem"),
        F.size(F.transform(emb, lambda x: x * 2)).cast("long").alias("doubled_len"),
        F.round(
            F.try_element_at(
                F.transform(emb, lambda x: x.cast("double") * 2), F.lit(1)
            ),
            6,
        ).alias("doubled_first"),
        F.array_contains(
            F.filter(
                F.transform(emb, lambda x: x > 0), lambda b: b.isNotNull()
            ),
            True,
        ).alias("has_pos"),
        F.size(
            F.array_distinct(
                F.array(
                    F.col("label") % 3, F.col("label") % 2, F.lit(0)
                )
            )
        )
        .cast("long")
        .alias("n_distinct_small"),
        F.round(
            F.try_element_at(
                F.sort_array(
                    F.filter(
                        F.transform(emb, lambda x: x.cast("double")),
                        lambda x: x.isNotNull(),
                    )
                ),
                F.lit(1),
            ),
            6,
        ).alias("min_elem"),
    )


@query(
    "fn_explode",
    oracle="""
SELECT vec_id, pos, round(val, 6) AS val
FROM (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
)
WHERE vec_id < 100
""",
)
def fn_explode(spark, sf_dir):
    """posexplode → relational (vec_id, pos, val) form; 0-based pos."""
    e = tables.load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id", F.posexplode(F.col("embedding"))
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.round(F.col("col").cast("double"), 6).alias("val"),
    )


@query(
    "fn_json",
    oracle="""
SELECT k_val, count(*) AS n, count(DISTINCT user_id) AS n_users
FROM (
  -- integral-regex guard before the cast: DuckDB TRY_CAST ROUNDS
  -- varchar floats ('1.5' -> 2, '200.0' -> 200) where Spark's
  -- try_cast of a non-integral string is NULL (round-8 JSON-extremes
  -- find); extraction itself agrees token-for-token on both engines
  SELECT CASE WHEN json_valid(props)
              THEN TRY_CAST(CASE WHEN regexp_matches(
                       json_extract_string(props, '$.k'), '^\\s*[+-]?[0-9]+\\s*$')
                     THEN json_extract_string(props, '$.k') END AS BIGINT)
         END AS k_val, user_id
  FROM events
)
GROUP BY k_val
""",
)
def fn_json(spark, sf_dir):
    """JSON extraction from the props string column + group on it.

    Malformed / non-numeric payloads are NULL keys on both engines:
    Spark's get_json_object is already NULL on bad JSON but its ANSI
    cast would abort on a non-numeric extract (try_cast instead), and
    DuckDB's json_extract_string ERRORS on bad JSON (json_valid guard)
    while its CAST errors on non-numeric strings (TRY_CAST).

    JSON DOMAIN (round-10 giant-props probe): documents are parsed by
    Jackson under its default StreamReadConstraints — object NAMES are
    capped at 50,000 chars (a 49,999-char key parses identically on
    both engines, pinned by the json_extreme corpus; a >50k key NULLs
    the whole Spark extract where DuckDB still parses — out of
    domain), string VALUES up to 20M chars, nesting to depth 1000,
    number literals to 1000 chars. Payloads beyond those Jackson
    limits are declared malformed for this engine."""
    ev = tables.load(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k")
            .try_cast("long")
            .alias("k_val"),
            "user_id",
        )
        .groupBy("k_val")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "fn_map",
    oracle="""
SELECT event_id,
       -- integral-regex guard: see fn_json (DuckDB TRY_CAST rounds
       -- varchar floats; Spark's is NULL for non-integral strings)
       CASE WHEN json_valid(props)
            THEN TRY_CAST(CASE WHEN regexp_matches(
                     json_extract_string(props, '$.k'), '^\\s*[+-]?[0-9]+\\s*$')
                   THEN json_extract_string(props, '$.k') END AS BIGINT)
       END AS k_from_map,
       CASE WHEN json_valid(props)
            THEN CAST(len(json_keys(props)) AS BIGINT)
       END AS n_keys,
       CASE WHEN json_valid(props) THEN json_keys(props)[1] END AS first_key
FROM events
""",
)
def fn_map(spark, sf_dir):
    """MapType surface: props JSON parsed into a MapType column, then
    map_keys/size/element access (oracle = DuckDB json functions, since
    DuckDB has no MAP from JSON).

    Robust-input semantics, identical on both engines: NULL / empty /
    malformed props → all-NULL outputs (from_json is NULL there;
    json_valid guards DuckDB, whose json functions ERROR on bad JSON);
    a non-numeric value under 'k' → NULL k_from_map but keys still
    counted (hence map<string,string> + try_cast, NOT
    map<string,bigint>, which would null the WHOLE map and hide the
    keys); an empty map → try_element_at NULL first_key where ANSI
    element_at(…, 1) on a 0-element array aborts the job."""
    ev = tables.load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.try_element_at(m, F.lit("k")).try_cast("long").alias("k_from_map"),
        F.size(m).cast("long").alias("n_keys"),
        F.try_element_at(F.map_keys(m), F.lit(1)).alias("first_key"),
    )


@query(
    "fn_hash",
    oracle="""
SELECT o_orderkey,
       md5(CAST(o_orderkey AS VARCHAR)) AS key_md5,
       sha256(CAST(o_orderkey AS VARCHAR)) AS key_sha256,
       length(md5(o_orderpriority)) AS md5_len
FROM orders
""",
)
def fn_hash(spark, sf_dir):
    """Deterministic hash functions shared by both engines (md5/sha2 on
    utf-8 bytes); the backbone of dedup keys and fingerprints."""
    o = tables.load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.md5(F.col("o_orderkey").cast("string").cast("binary")).alias("key_md5"),
        F.sha2(F.col("o_orderkey").cast("string").cast("binary"), 256).alias(
            "key_sha256"
        ),
        F.length(F.md5(F.col("o_orderpriority").cast("binary")))
        .cast("long")
        .alias("md5_len"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS low_byte,
       o_orderkey | 4096 AS with_flag,
       xor(o_orderkey, 21845) AS xored,
       o_orderkey << 2 AS shl,
       o_orderkey >> 3 AS shr,
       CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
FROM orders
""",
)
def fn_bitwise(spark, sf_dir):
    """Bitwise family on int64 keys (partition routing / bloom hashing
    building blocks)."""
    o = tables.load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@query(
    "fn_struct",
    oracle="""
WITH s AS (
  SELECT o_orderkey,
         {'key': o_orderkey, 'price': o_totalprice,
          'status': o_orderstatus} AS rec
  FROM orders
)
SELECT o_orderkey,
       rec.key AS rec_key,
       rec.price AS rec_price,
       upper(rec.status) AS rec_status,
       (rec.price > 100000) AS is_big
FROM s
""",
)
def fn_struct(spark, sf_dir):
    """Struct family: named_struct construction, field access through the
    struct, and expressions over extracted fields. The struct exists only
    INSIDE the plan — output is flattened scalars, so the cross-engine
    value hash stays on plain types while the query still proves
    constructor + accessor semantics. Catalyst collapses the whole thing
    into one projection (structs are free at the Tungsten level — no
    serialization until a sink demands it)."""
    o = tables.load(spark, sf_dir, "orders")
    rec = F.struct(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    s = o.select("o_orderkey", rec.alias("rec"))
    return s.select(
        "o_orderkey",
        F.col("rec.key").alias("rec_key"),
        F.col("rec.price").alias("rec_price"),
        F.upper(F.col("rec.status")).alias("rec_status"),
        (F.col("rec.price") > 100000).alias("is_big"),
    )


@query(
    "fn_url",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/' || lang || '/doc-'
           || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&n='
           || CAST(n_chars AS VARCHAR) AS url
  FROM documents
)
SELECT doc_id, url,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
       regexp_extract(url, '^([a-z]+):', 1) AS protocol
FROM u
""",
)
def fn_url(spark, sf_dir):
    """URL parsing family over synthesized-but-deterministic URLs (the
    fixture corpus has no URL column, so one is constructed from stable
    fields — the parsing is what is under test). Spark's ``parse_url``
    is the JVM-side fast path for host/path/query extraction — a web
    crawl curation pipeline's first step (domain-level filtering,
    URL dedup, per-site rate stats all key on these fields); the oracle
    cross-checks it against pure-regex extraction semantics.
    Narrow projection, codegen'd, zero shuffle at any scale.
    """
    d = tables.load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    return d.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "fn_unpivot",
    oracle="""
SELECT p_partkey, 'retailprice' AS metric,
       CAST(p_retailprice AS DOUBLE) AS value
FROM part
UNION ALL
SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
""",
)
def fn_unpivot(spark, sf_dir):
    """Unpivot / melt: wide part metrics to long (key, metric, value)
    rows — the inverse of ``agg_pivot`` and the standard reshape before
    a generic per-metric aggregation or plotting export. Spark's native
    ``DataFrame.unpivot`` (SQL ``UNPIVOT``) expands columns to rows in
    one narrow projection — no shuffle, no UDF; the oracle spells the
    same relation as UNION ALL, certifying the reshape semantics.
    Values cast to DOUBLE on both sides (mixed int/double metric columns
    would otherwise widen differently per engine).
    """
    p = tables.load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "fn_higher_order",
    oracle="""
WITH e AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT vec_id,
       -- empty/NULL-vector discipline: list_reduce ERRORS on an empty
       -- list and a CASE does NOT protect it against parquet-sourced
       -- rows (DuckDB 1.0 evaluates the reduce before the branch
       -- resolves), so the list is made never-empty by PREPENDING the
       -- fold seed — list_prepend(0.0, products) is exactly Spark's
       -- aggregate(…, 0.0, +) IEEE sequence, and empty folds to the
       -- seed on both engines. The NULL-v CASE stays (prepend onto
       -- NULL yields [0.0] here where Spark's aggregate(NULL) is NULL)
       CASE WHEN v IS NULL THEN NULL
            ELSE round(list_reduce(
                   list_prepend(0.0, list_transform(list_zip(v, v),
                                                    p -> p[1] * p[2])),
                   (a, b) -> a + b), 6) END AS dot_self,
       CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
       list_contains(list_transform(v, x -> x > 0.5), true) AS any_gt_half,
       NOT list_contains(list_transform(v, x -> x >= -1.0), false)
         AS all_ge_neg1,
       -- list_aggregate('max') is NULL on both empty and NULL lists,
       -- order-independent, and ranks NaN greatest — the exact
       -- semantics of Spark's guarded when(x > acc) fold
       round(CAST(list_aggregate(v, 'max') AS DOUBLE), 6) AS max_elem
FROM e
""",
)
def fn_higher_order(spark, sf_dir):
    """Higher-order array function surface: fold (aggregate), zip_with,
    exists, forall, filter — the lambda-expression family that keeps
    array math JVM-side instead of dropping to Python (``fn_array``
    covers transform/sort/contains; this key pins the folding half).

    The dot-product fold runs the identical left-to-right IEEE add
    sequence in both engines (Spark aggregate from 0.0, DuckDB
    list_reduce from the first element — equal because 0.0 + x == x),
    so even the unrounded fold agrees; round(6) is belt-and-braces.
    All lambdas compile into whole-stage codegen — zero Python, zero
    shuffle, a pure narrow map over the vector column."""
    e = tables.load(spark, sf_dir, "embeddings")
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # NULL-element discipline: the oracle's list_aggregate('max') and
    # list_contains both SKIP null elements, but a raw fold seeded with
    # a NULL first element stays NULL forever (x > NULL → NULL →
    # otherwise(acc)) and exists/forall return 3VL NULL where DuckDB's
    # list_contains returns false/true — so max/exists/forall run on
    # the null-filtered array. The dot fold stays on the raw array:
    # both engines propagate NULL through the + fold identically.
    vn = F.filter(v, lambda x: x.isNotNull())
    dot = F.aggregate(
        F.zip_with(v, v, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    # Empty-vector semantics pinned against the oracle: the dot fold
    # seeds 0.0, so an empty vector's dot_self is 0.0 on both engines
    # (the oracle prepends the same seed); the max fold has no seed —
    # NULL on empty/NULL/all-null vectors (oracle: list_aggregate
    # 'max'), with try_element_at so the guarded branch can't abort.
    nonempty = F.size(vn) >= 1
    return e.select(
        "vec_id",
        F.round(dot, 6).alias("dot_self"),
        F.size(F.filter(v, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.exists(vn, lambda x: x > 0.5).alias("any_gt_half"),
        F.forall(vn, lambda x: x >= -1.0).alias("all_ge_neg1"),
        F.when(
            nonempty,
            F.round(
                F.aggregate(
                    vn,
                    F.try_element_at(vn, F.lit(1)),
                    lambda acc, x: F.when(x > acc, x).otherwise(acc),
                ),
                6,
            ),
        ).alias("max_elem"),
    )


@query(
    "fn_try_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice / nullif(l_discount, 0.0), 4) AS price_per_disc,
       try_cast(l_returnflag AS BIGINT) AS flag_as_int,
       try_cast(CAST(CAST(trunc(l_quantity) AS INT) AS VARCHAR) AS BIGINT)
         AS qty_as_int,
       coalesce(round(l_tax / nullif(l_discount, 0.0), 4), -1.0)
         AS tax_ratio_defaulted
FROM lineitem
WHERE l_orderkey % 97 = 0
""",
)
def fn_try_arith(spark, sf_dir):
    """Error-safe arithmetic surface: division that yields NULL instead
    of raising on zero denominators, try_cast that yields NULL for
    unparseable strings (a flag letter vs a numeric string), and
    COALESCE defaulting — the ANSI-mode-safe idioms a production
    pipeline uses so one bad row can't kill a 100 TB job. All narrow
    JVM expressions in whole-stage codegen; the row filter keeps the
    fixture output reviewable.

    Cross-engine note: Spark try_divide(x, 0) and DuckDB x / nullif(d,
    0) both produce NULL; integral casts of exact doubles agree; ratio
    outputs round at 4."""
    li = tables.load(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 97 == 0
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_extendedprice", "l_discount"), 4).alias(
            "price_per_disc"
        ),
        F.col("l_returnflag").try_cast("bigint").alias("flag_as_int"),
        F.col("l_quantity").cast("int").cast("string").try_cast("bigint")
        .alias("qty_as_int"),
        F.coalesce(
            F.round(F.try_divide("l_tax", "l_discount"), 4), F.lit(-1.0)
        ).alias("tax_ratio_defaulted"),
    )
