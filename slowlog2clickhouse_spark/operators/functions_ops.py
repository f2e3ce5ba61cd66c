"""Scalar function surface — SURVEY.md §2 H.

String, regex, fingerprint/digest, date/time, math, JSON, array,
higher-order and NULL functions — every op is a thin declarative
projection so the whole row stays inside whole-stage codegen (no
Python in any hot path; the UDF variants live in udfs.py and exist
for parity with the reference's exact semantics, not for speed).

Cross-engine type notes baked in below (SURVEY.md §7 G):
  * Spark length/size/year/... return INT, DuckDB BIGINT → cast long;
  * Spark floor/ceil(double) return BIGINT, DuckDB DOUBLE → cast both;
  * DuckDB date_trunc('day'|'month', ts) returns DATE → cast TIMESTAMP;
  * Spark dayofweek is 1=Sunday; use weekday()+1 == DuckDB isodow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from slowlog2clickhouse_spark.functions.fingerprint import (
    digest_col,
    digest_duckdb,
    fingerprint_col,
    fingerprint_duckdb,
)
from slowlog2clickhouse_spark.io import load_table
from slowlog2clickhouse_spark.registry import op

# ---------------------------------------------------------------------------
# Strings & regex
# ---------------------------------------------------------------------------


@op(
    "str_basic",
    oracle="""
    SELECT c_custkey,
           lower(c_name) AS lname,
           upper(c_mktsegment) AS useg,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           substring(c_name, 1, 8) AS prefix,
           cast(length(c_name) AS BIGINT) AS name_len,
           lpad(string_split(c_name, '#')[2], 12, '0') AS padded_id,
           concat_ws('-', c_mktsegment, c_name) AS joined
    FROM customer
    """,
)
def str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/upper/trim/substring/concat/length/lpad/split (the
    building blocks of fingerprint normalization, [go-mysql]
    query/query.go [R:H])."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.element_at(F.split("c_name", "#"), 2), 12, "0").alias("padded_id"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("joined"),
    )


@op(
    "str_regex_extract",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '^(\w+)', 1) AS first_word,
           regexp_extract(text, '(\d+)', 1) AS first_number,
           regexp_matches(text, 'table') AS mentions_table
    FROM documents
    """,
)
def str_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture — the slow-log header-field extraction pattern
    ([go-mysql] log/slow/parser.go:~30-60 compiled header regexes)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("text", r"(\d+)", 1).alias("first_number"),
        F.col("text").rlike("table").alias("mentions_table"),
    )


_SYNTH_SQL_SPARK = [
    # two statement shapes whose literals vary per row but whose
    # fingerprints collapse: a predicate query and an IN-list query
    lambda o: F.concat(
        F.lit("SELECT * FROM orders WHERE o_orderkey = "),
        o.o_orderkey.cast("string"),
        F.lit(" AND o_orderstatus = '"),
        o.o_orderstatus,
        F.lit("' AND o_totalprice > "),
        o.o_totalprice.cast("string"),
        F.lit(" -- plan note"),
    ),
    lambda o: F.concat(
        F.lit("SELECT c FROM t WHERE id IN ("),
        o.o_orderkey.cast("string"),
        F.lit(", "),
        o.o_custkey.cast("string"),
        F.lit(", 3)"),
    ),
]

_SYNTH_SQL_DUCK = [
    "'SELECT * FROM orders WHERE o_orderkey = ' || cast(o_orderkey AS VARCHAR)"
    " || ' AND o_orderstatus = ''' || o_orderstatus || ''' AND o_totalprice > '"
    " || cast(o_totalprice AS VARCHAR) || ' -- plan note'",
    "'SELECT c FROM t WHERE id IN (' || cast(o_orderkey AS VARCHAR) || ', '"
    " || cast(o_custkey AS VARCHAR) || ', 3)'",
]


@op(
    "fn_fingerprint_sql",
    oracle=f"""
    WITH raw AS (
      SELECT {_SYNTH_SQL_DUCK[0]} AS q FROM orders
      UNION ALL
      SELECT {_SYNTH_SQL_DUCK[1]} AS q FROM orders
    ),
    fp AS (SELECT {fingerprint_duckdb("q")} AS fingerprint FROM raw)
    SELECT fingerprint, {digest_duckdb("fingerprint")} AS digest, count(*) AS n
    FROM fp GROUP BY 1, 2
    """,
)
def fn_fingerprint_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query normalization as a regexp_replace chain ([go-mysql]
    query/query.go:Fingerprint:~40-400 [R:H]): literals → ?, comments
    stripped, IN-lists collapsed — every distinct literal binding maps
    to one (fingerprint, digest) class.

    Scale: pure codegen'd string expressions; this is the 100 TB
    ingest path (the pandas-UDF variant exists only for the edge-case
    grammar — see udf_fingerprint ops).
    """
    o = load_table(spark, sf_dir, "orders")
    raw = _SYNTH_SQL_SPARK[0](o).alias("q")
    raw2 = _SYNTH_SQL_SPARK[1](o).alias("q")
    both = o.select(raw).unionByName(o.select(raw2))
    fp = both.select(fingerprint_col(F.col("q")).alias("fingerprint"))
    return fp.groupBy("fingerprint").agg(F.count("*").alias("n")).select(
        "fingerprint", digest_col("fingerprint").alias("digest"), "n"
    )


@op(
    "fn_digest_md5",
    oracle=f"""
    SELECT doc_id, {digest_duckdb("text")} AS digest
    FROM documents
    """,
)
def fn_digest_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class id = upper(substr(md5(x),17,16)) — byte-identical across
    engines ([go-mysql] query/query.go:Id:~20-30 [R:H])."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", digest_col("text").alias("digest"))


@op(
    "fn_hash64",
    # r6 partial oracle (VERDICT r5 #7): the md5-derived portable
    # 64-bit hash is value-checked; the engine hashes (xxhash64/hash/
    # crc32) stay IN the plan but surface only as a non-null witness
    # (their raw values are engine-specific by design — G8);
    # tests/test_stitched.py::test_xxhash64_value_pins_and_partition_invariance
    # pins xxhash64's actual values and partitioning-independence
    oracle="""
    SELECT doc_id,
           CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS h64_portable,
           (text IS NOT NULL) AS engine_hashes_ok
    FROM documents
    """,
)
def fn_hash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit hashing for shuffle/dedup keys — xxhash64 stays JVM-side
    and is the scale path for MinHash/SimHash (operators/dedup.py);
    the md5-derived portable variant is the cross-engine-checkable
    form the LSH family standardized on in round 5."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("text").cast("binary")), 1, 15), 16, 10)
        .cast("long")
        .alias("h64_portable"),
        # coalesce → FALSE: crc32(NULL) is NULL and would propagate
        # through the conjunction, while the oracle's (text IS NOT
        # NULL) is FALSE for a NULL row (ADVICE r6, low)
        F.coalesce(
            F.xxhash64("text").isNotNull()
            & F.hash("text").isNotNull()
            & F.crc32(F.col("text").cast("binary")).isNotNull(),
            F.lit(False),
        ).alias("engine_hashes_ok"),
    )


# ---------------------------------------------------------------------------
# Dates & times
# ---------------------------------------------------------------------------


@op(
    "date_parse",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS formatted,
           strptime(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
                    '%Y-%m-%d %H:%M:%S') AS reparsed,
           make_timestamp(epoch_us(o_orderdate)) AS via_epoch
    FROM orders
    """,
)
def date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp formatting + parsing round-trip + epoch conversion —
    the slow-log `# Time:` / `SET timestamp=` parse surface
    ([go-mysql] log/slow/parser.go:~200-260 [R:H]; the actual slow-log
    formats are exercised in sources/slowlog.py golden tests)."""
    o = load_table(spark, sf_dir, "orders")
    # parquet ms-timestamps surface as TIMESTAMP_NTZ in Spark 4; cast to
    # session-TZ timestamp (UTC via ensure_compat) for epoch functions
    ts = F.col("o_orderdate").cast("timestamp")
    fmt = F.date_format(ts, "yyyy-MM-dd HH:mm:ss")
    return o.select(
        "o_orderkey",
        fmt.alias("formatted"),
        F.to_timestamp(fmt, "yyyy-MM-dd HH:mm:ss").alias("reparsed"),
        F.timestamp_micros(F.unix_micros(ts)).alias("via_epoch"),
    )


@op(
    "date_parts",
    oracle="""
    SELECT event_id,
           cast(year(ts) AS BIGINT) AS y, cast(month(ts) AS BIGINT) AS mo,
           cast(day(ts) AS BIGINT) AS d, cast(hour(ts) AS BIGINT) AS h,
           cast(minute(ts) AS BIGINT) AS mi, cast(quarter(ts) AS BIGINT) AS q,
           cast(dayofyear(ts) AS BIGINT) AS doy,
           cast(isodow(ts) AS BIGINT) AS iso_dow,
           cast(datediff('day', DATE '2024-01-01', ts::DATE) AS BIGINT) AS days_since,
           ts + INTERVAL 7 DAY AS ts_plus_week
    FROM events
    """,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction & arithmetic. dow convention differs
    across engines (Spark dayofweek 1=Sunday, DuckDB dow 0=Sunday —
    G9); ISO dow (1=Monday) via weekday()+1 is portable."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("mo"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.minute("ts").cast("long").alias("mi"),
        F.quarter("ts").cast("long").alias("q"),
        F.dayofyear("ts").cast("long").alias("doy"),
        (F.weekday("ts") + 1).cast("long").alias("iso_dow"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.expr("ts + INTERVAL 7 DAY").alias("ts_plus_week"),
    )


@op(
    "date_trunc_bucket",
    oracle="""
    SELECT date_trunc('minute', ts) AS minute_start,
           date_trunc('day', ts)::TIMESTAMP AS day_start,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def date_trunc_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """period_start truncation (main.go:~125 ts.Truncate(time.Minute)
    [R:M]) at minute and day granularity."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("minute", "ts").alias("minute_start"),
        F.date_trunc("day", "ts").alias("day_start"),
    ).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Math / JSON / arrays / higher-order / NULL
# ---------------------------------------------------------------------------


@op(
    "math_funcs",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice) AS rounded,
           cast(floor(p_retailprice) AS BIGINT) AS floored,
           cast(ceil(p_retailprice) AS BIGINT) AS ceiled,
           abs(p_retailprice - 1000.0) AS dist_1000,
           round(ln(p_retailprice), 8) AS ln_price,
           round(log10(p_retailprice), 8) AS log10_price,
           sqrt(p_retailprice) AS sqrt_price,
           pow(p_size, 2) AS size_sq,
           mod(p_partkey, 7) AS m7,
           p_retailprice / 60.0 AS per_sec_rate
    FROM part
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/floor/ceil/abs/ln/log10/sqrt/pow/mod + rate derivation
    (per-second = value/period_length — the QAN load metric).

    sqrt is IEEE-correctly-rounded (cross-engine exact); ln/log10 are
    not guaranteed to the last ulp → rounded to 8 decimals.
    """
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice").alias("rounded"),
        F.floor("p_retailprice").cast("long").alias("floored"),
        F.ceil("p_retailprice").cast("long").alias("ceiled"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("dist_1000"),
        F.round(F.log("p_retailprice"), 8).alias("ln_price"),
        F.round(F.log10("p_retailprice"), 8).alias("log10_price"),
        F.sqrt("p_retailprice").alias("sqrt_price"),
        F.pow("p_size", F.lit(2)).alias("size_sq"),
        (F.col("p_partkey") % 7).alias("m7"),
        (F.col("p_retailprice") / 60.0).alias("per_sec_rate"),
    )


@op(
    "json_funcs",
    oracle="""
    SELECT event_id,
           cast(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the props column (the reference's
    labels / extra k-v escape hatch, main.go:~100 [R:L])."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@op(
    "array_funcs",
    oracle="""
    SELECT doc_id,
           cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           string_split(text, ' ')[2] AS second_token,
           array_to_string(string_split(text, ' ')[1:3], ' ') AS first3,
           list_sort(string_split(text, ' '))[1] AS min_token
    FROM documents
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/size/contains/element_at/slice/sort_array/array_join."""
    d = load_table(spark, sf_dir, "documents")
    arr = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(arr).cast("long").alias("n_tokens"),
        F.array_contains(arr, "spark").alias("has_spark"),
        F.element_at(arr, 2).alias("second_token"),
        F.array_join(F.slice(arr, 1, 3), " ").alias("first3"),
        F.element_at(F.sort_array(arr), 1).alias("min_token"),
    )


@op(
    "higher_order_fns",
    oracle="""
    SELECT vec_id,
           round(list_sum(list_filter(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), x -> x > 0)), 4) AS pos_sum,
           cast(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS norm_sq
    FROM embeddings
    """,
)
def higher_order_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform/filter/aggregate/zip_with lambdas over array columns —
    the JVM-side vector path (no Python serialization at 100 TB;
    SURVEY.md §7 G11)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb_d = F.transform("embedding", lambda x: x.cast("double"))
    add = lambda a, x: a + x  # noqa: E731
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(F.filter(emb_d, lambda x: x > 0), F.lit(0.0), add), 4
        ).alias("pos_sum"),
        F.size(F.filter(emb_d, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(
            F.aggregate(F.zip_with(emb_d, emb_d, lambda x, y: x * y), F.lit(0.0), add),
            4,
        ).alias("norm_sq"),
    )


@op(
    "null_funcs",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'none') AS seg_or_none,
           nullif(c_mktsegment, 'BUILDING') AS seg,
           least(c_acctbal, 1000.0) AS bal_capped,
           greatest(c_acctbal, 0.0) AS bal_floor,
           nullif(c_mktsegment, 'BUILDING') IS NULL AS is_building
    FROM customer
    """,
)
def null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif/least/greatest — the missing-metric defaulting
    path (main.go:~160 [R:M])."""
    c = load_table(spark, sf_dir, "customer")
    seg = F.expr("nullif(c_mktsegment, 'BUILDING')")
    return c.select(
        "c_custkey",
        F.coalesce(seg, F.lit("none")).alias("seg_or_none"),
        seg.alias("seg"),
        F.least("c_acctbal", F.lit(1000.0)).alias("bal_capped"),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor"),
        seg.isNull().alias("is_building"),
    )


@op(
    "map_funcs",
    oracle="""
    SELECT doc_id,
           cast(cardinality(m) AS BIGINT) AS m_size,
           m['lang'][1] AS m_lang,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
           cast(len(list_filter(map_values(m), x -> x IS NOT NULL))
                AS BIGINT) AS n_nonnull
    FROM (SELECT doc_id, map(['lang', 'src'], [lang, source]) AS m
          FROM documents) t
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: create_map / size / element access /
    map_keys / map_values + lambda filter — the k-v escape hatch the
    class table's `labels` column uses (qan-api2 labels lineage,
    SURVEY §1.1 [R:H]). Output is scalarized (the driver canonicalizer
    hashes plain columns), but the map operations themselves are the
    ones under test. All JVM-side codegen — no Python.
    """
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("src"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.size(m).cast("long").alias("m_size"),
        m.getItem("lang").alias("m_lang"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.size(F.filter(F.map_values(m), lambda v: v.isNotNull()))
        .cast("long")
        .alias("n_nonnull"),
    )


@op(
    "json_variant",
    oracle="""
    SELECT event_id,
           cast(json_extract(props, '$.k') AS BIGINT) AS k_long,
           json_extract_string(props, '$.k') AS k_str,
           cast(json_extract(props, '$.nope') AS BIGINT) AS missing
    FROM events
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type: parse_json once into a binary variant,
    then typed path extraction (variant_get) and missing-path
    tolerance (try_variant_get → NULL). Variant beats repeated
    get_json_object at scale: the JSON parses ONCE per row into a
    shredded binary form, and every extraction is an O(1) walk, not a
    re-parse — the semi-structured analog of columnar pruning. Oracle
    compares against DuckDB's JSON extraction of the same paths."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "long").alias("k_long"),
        F.variant_get(v, "$.k", "string").alias("k_str"),
        F.try_variant_get(v, "$.nope", "long").alias("missing"),
    )


@op(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority, cast(count(*) AS BIGINT) AS n
    FROM orders WHERE o_totalprice > 250000.0
    GROUP BY 1
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 3.4+ named-argument binding): the
    injection-safe query template surface a QAN-style API layer uses —
    values bind as literals in the parsed plan, never by string
    concatenation, so the SAME plan cache entry serves every threshold."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n
        FROM orders WHERE o_totalprice > :threshold
        GROUP BY 1
        """,
        args={"threshold": 250000.0},
    )


@op(
    "observe_metrics",
    oracle="""
    SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS n_groups,
           count(*) AS n_rows,
           round(sum(value), 4) AS sum_value,
           CAST(coalesce(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_null_user
    FROM events
    """,
)
def observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via df.observe(Observation): metric
    accumulators (row count, sum, null count) collected DURING the
    main action — zero extra scans, the 100-TB way to get data-quality
    counters out of an ingest job (a second aggregation pass over the
    input would double the read). Returns the observed metrics as a
    one-row DataFrame beside the job's own output count."""
    from pyspark.sql import Observation

    ev = load_table(spark, sf_dir, "events")
    obs = Observation("ingest_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("value"), 4).alias("sum_value"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("n_null_user"),
    )
    # the "job": a normal aggregation whose action populates the metrics
    out_rows = observed.groupBy("event_type").count().count()
    m = obs.get
    return spark.createDataFrame(
        [(int(out_rows), int(m["n_rows"]), float(m["sum_value"]), int(m["n_null_user"]))],
        "n_groups long, n_rows long, sum_value double, n_null_user long",
    )


@op(
    "agg_corr_cov",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qty_price,
           round(stddev_samp(l_quantity), 6) AS sd_qty
    FROM lineitem GROUP BY 1
    """,
)
def agg_corr_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: Pearson correlation, sample covariance,
    sample stddev per group — single-pass mergeable moments (partial
    agg carries (n, Σx, Σy, Σxy, Σx², Σy²)), so the shuffle stays
    |groups|-sized at any SF. Float-order drift is below the rounding
    grain (G8: round 4-6, values are nowhere near decimal halves)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "cov_qty_price"
        ),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
    )


@op(
    "ansi_try_funcs",
    oracle="""
    SELECT o_orderkey,
           try_cast(o_orderpriority AS BIGINT) AS bad_cast,
           try_cast(substr(o_orderpriority, 1, 1) AS BIGINT) AS good_cast,
           CASE WHEN (o_custkey % 100) = 0 THEN NULL
                ELSE o_totalprice / (o_custkey % 100) END AS safe_div
    FROM orders
    """,
)
def ansi_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode error tolerance (Spark 4 runs ANSI ON by default, so
    bad casts/div-by-zero THROW unless handled): try_cast returns NULL
    on malformed input, try_divide on zero denominators — the
    row-survival contract an ingest pipeline needs when one bad record
    must not kill a 100-TB job."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("bigint").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("bigint").alias(
            "good_cast"
        ),
        F.try_divide("o_totalprice", F.col("o_custkey") % 100).alias("safe_div"),
    )


@op(
    "agg_string_concat",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS members
    FROM nation GROUP BY 1
    """,
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (ClickHouse groupArray / SQL
    listagg analog): deterministic ORDER BY inside the aggregate via
    sorted collect_list + concat_ws — order-stable across engines and
    partitionings (G7: never an unsorted collect)."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias(
            "members"
        )
    )


@op(
    "agg_median_mode",
    oracle="""
    SELECT event_type,
           cast(count(*) AS BIGINT) AS n,
           median(value) AS med,
           quantile_cont(value, 0.25) AS q1
    FROM events GROUP BY 1
    """,
)
def agg_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median() (exact continuous, = percentile 0.5 interpolated — the
    Spark 3.4+ builtin) and a companion exact quartile per group. Exact
    medians buffer per-group values (G6); the documented 100-TB default
    is approx_percentile — this op is the correctness baseline that
    sketch variants are tested against (agg_percentile_approx)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.median("value").alias("med"),
        F.percentile("value", 0.25).alias("q1"),
    )


@op(
    "str_array_funcs2",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source, string_split(text, ' ') AS toks
      FROM documents WHERE len(string_split(text, ' ')) >= 10)
    SELECT doc_id,
           levenshtein(toks[1], toks[-1]) AS lev_first_last,
           lpad(lang, 5, '*') AS lang_pad,
           translate(source, 'src', 'xyz') AS src_tr,
           coalesce(array_to_string(list_sort(list_intersect(toks[1:5],
                                                    toks[-5:])), ','), '')
             AS head_tail_common,
           list_has_any(toks[1:5], toks[-5:]) AS overlaps
    FROM t
    """,
)
def str_array_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string/array function battery: levenshtein edit distance
    (the fuzzy-match primitive), lpad/translate, and array set algebra
    (array_intersect + arrays_overlap between a document's head and
    tail token windows). Set-op results are SORTED before
    stringification — Spark and DuckDB build the intersection in
    different internal orders (G7)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    d = d.where(F.size(toks) >= 10).select(
        "doc_id", "lang", "source", toks.alias("toks")
    )
    head = F.slice("toks", 1, 5)
    tail = F.slice("toks", -5, 5)
    return d.select(
        "doc_id",
        F.levenshtein(
            F.element_at("toks", 1), F.element_at("toks", -1)
        ).alias("lev_first_last"),
        F.lpad("lang", 5, "*").alias("lang_pad"),
        F.translate("source", "src", "xyz").alias("src_tr"),
        F.array_join(
            F.array_sort(F.array_intersect(head, tail)), ","
        ).alias("head_tail_common"),
        F.arrays_overlap(head, tail).alias("overlaps"),
    )


@op(
    "agg_bool",
    oracle="""
    SELECT event_type,
           bool_and(value > 1) AS all_above_1,
           bool_or(value > 99) AS any_above_99,
           cast(count(*) FILTER (WHERE value > 50) AS BIGINT) AS n_above_50
    FROM events GROUP BY 1
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any — ClickHouse min/max-of-UInt8
    analog) plus the FILTER clause form of conditional counting."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.every(F.col("value") > 1).alias("all_above_1"),
        F.some(F.col("value") > 99).alias("any_above_99"),
        F.count(F.when(F.col("value") > 50, 1)).alias("n_above_50"),
    )


@op(
    "win_nth_value",
    oracle="""
    SELECT user_id, event_id,
           nth_value(value, 2) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_val
    FROM events
    """,
)
def win_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value window function (running 2nd observation per user —
    NULL until the partition has seen two rows); completes the
    first/last/nth value-navigation family. event_id tiebreak keeps
    the frame deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


@op(
    "agg_skew_kurt",
    oracle="""
    WITH m AS (
      SELECT event_type, avg(value) AS mu FROM events GROUP BY 1),
    c AS (
      SELECT e.event_type,
             sum(pow(value - mu, 2)) / count(*) AS m2,
             sum(pow(value - mu, 3)) / count(*) AS m3,
             sum(pow(value - mu, 4)) / count(*) AS m4
      FROM events e JOIN m USING (event_type) GROUP BY 1)
    SELECT event_type,
           round(m3 / pow(m2, 1.5), 6) AS skew,
           round(m4 / pow(m2, 2) - 3, 6) AS kurt
    FROM c
    """,
)
def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment aggregates: skewness and excess kurtosis per
    group (latency distributions are long-tailed; these are the shape
    signals a p95 alone hides). Spark computes POPULATION moments
    (g1, g2−3) single-pass; DuckDB's builtins are sample-adjusted
    (G1), so the oracle derives the same population moments explicitly
    from central sums — definition parity, not comparator loosening."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.skewness("value"), 6).alias("skew"),
        F.round(F.kurtosis("value"), 6).alias("kurt"),
    )


@op(
    "explode_outer_nulls",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> length(x) > 6)
               AS longs
      FROM documents)
    SELECT t.doc_id, u.token
    FROM t LEFT JOIN LATERAL (SELECT unnest(t.longs) AS token) u ON TRUE
    """,
)
def explode_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows whose array is EMPTY survive the fan-out as
    a NULL row (plain explode silently drops them — a correctness trap
    in join pipelines where 'document with no long tokens' must still
    appear downstream). Oracle emulates with LEFT JOIN LATERAL unnest."""
    d = load_table(spark, sf_dir, "documents")
    longs = F.filter(F.split("text", " "), lambda x: F.length(x) > 6)
    return d.select("doc_id", F.explode_outer(longs).alias("token"))


@op(
    "str_regex_extract_all",
    oracle="""
    SELECT doc_id,
           cast(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
             AS n_number_runs,
           coalesce(array_to_string(regexp_extract_all(text, '[0-9]+'), ','),
                    '') AS number_runs,
           cast(len(regexp_extract_all(text, '[a-z]{6,}')) AS BIGINT)
             AS n_long_words
    FROM documents
    """,
)
def str_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all: ALL matches as an array (single-match
    extract is str_regex_extract) — the tokenizer/masker primitive for
    pulling every number run or long word out of a document in one
    codegen'd pass. Match order is left-to-right in both engines, so
    the joined string is deterministic without sorting."""
    d = load_table(spark, sf_dir, "documents")
    nums = F.regexp_extract_all("text", F.lit("[0-9]+"), 0)
    return d.select(
        "doc_id",
        F.size(nums).cast("long").alias("n_number_runs"),
        F.array_join(nums, ",").alias("number_runs"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{6,}"), 0))
        .cast("long")
        .alias("n_long_words"),
    )


@op(
    "agg_bitwise",
    oracle="""
    SELECT event_type,
           bit_and(event_id) AS band,
           bit_or(event_id) AS bor,
           bit_xor(event_id) AS bxor,
           max(greatest(user_id, event_id % 1000)) AS gmax,
           min(least(user_id, event_id % 1000)) AS lmin
    FROM events GROUP BY 1
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (bit_and/or/xor — flag-mask rollups, e.g.
    ClickHouse groupBitAnd analogs) plus row-wise greatest/least.
    All order-independent integer ops — exact cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("event_id").alias("band"),
        F.bit_or("event_id").alias("bor"),
        F.bit_xor("event_id").alias("bxor"),
        F.max(F.greatest("user_id", F.col("event_id") % 1000)).alias("gmax"),
        F.min(F.least("user_id", F.col("event_id") % 1000)).alias("lmin"),
    )


@op(
    "str_hex_base64",
    oracle="""
    SELECT doc_id,
           hex(doc_id) AS id_hex,
           base64(encode(substr(text, 1, 24))) AS head_b64,
           md5(substr(text, 1, 24)) AS head_md5
    FROM documents
    """,
)
def str_hex_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-text encodings: hex of an integer id, base64 of a byte
    window, md5 beside them — the content-addressing/uri-safe
    primitives every artifact store needs; all codegen'd."""
    d = load_table(spark, sf_dir, "documents")
    head = F.substring("text", 1, 24)
    return d.select(
        "doc_id",
        F.hex("doc_id").alias("id_hex"),
        F.base64(F.encode(head, "utf-8")).alias("head_b64"),
        F.md5(head).alias("head_md5"),
    )


@op(
    "agg_product",
    oracle="""
    SELECT l_orderkey,
           cast(count(*) AS BIGINT) AS n_items,
           cast(list_reduce(list(cast(round((1 - l_discount) * 100, 0)
                                      AS HUGEINT)), (a, b) -> a * b)
                AS VARCHAR) AS keep_product_pct
    FROM lineitem GROUP BY 1
    """,
)
def agg_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative aggregate: compound retained fraction after
    chained per-line discounts, kept EXACT — factors are integer
    percent points folded in arbitrary-precision arithmetic
    (decimal(38) here, HUGEINT in the oracle) and compared as the
    integer product string. Groups reach 12 items at sf0.1, so
    100^n > 2^53 and ANY double-product formulation drifts by
    multiplication order (measured: 127/147k groups at round-6);
    exact integers sidestep the whole class. The float
    `compound = product / 100^n` form is what a consumer derives —
    division is their display step, not the stored aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round((1 - F.col("l_discount")) * 100, 0).cast("decimal(38,0)")
    prod = F.aggregate(
        F.collect_list(cents),
        F.lit(1).cast("decimal(38,0)"),
        lambda acc, x: (acc * x).cast("decimal(38,0)"),
    )
    return li.groupBy("l_orderkey").agg(
        F.count("*").alias("n_items"),
        prod.cast("string").alias("keep_product_pct"),
    )


@op(
    "date_try_parse",
    oracle=r"""
    SELECT o_orderkey,
           try_strptime(cast(o_orderdate AS VARCHAR), '%Y-%m-%d %H:%M:%S')
             AS parsed_ok,
           try_strptime('not-a-date', '%Y-%m-%d') AS parsed_bad
    FROM orders
    """,
)
def date_try_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-timestamp tolerance: try_to_timestamp returns NULL on
    garbage instead of throwing under ANSI mode — the ingest-side
    sibling of ansi_try_funcs (one bad log line must not kill the
    batch)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_to_timestamp(
            F.col("o_orderdate").cast("string"),
            F.lit("yyyy-MM-dd HH:mm:ss"),
        ).alias("parsed_ok"),
        F.try_to_timestamp(F.lit("not-a-date"), F.lit("yyyy-MM-dd")).alias(
            "parsed_bad"
        ),
    )


@op(
    "str_regex_backref",
    oracle=r"""
    SELECT doc_id,
           regexp_replace(substr(text, 1, 40),
                          '([a-z]+) ([a-z]+)', '\2 \1', 'g') AS swapped
    FROM documents
    """,
)
def str_regex_backref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture-group backreferences in regexp_replace (swap the first
    two words) — the rewrite primitive behind query-text normalizers.
    Replacement syntax differs per engine (Java $1 vs RE2 \\1); the
    SEMANTICS are pinned equal by the hash."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_replace(
            F.substring("text", 1, 40), r"([a-z]+) ([a-z]+)", r"$2 $1"
        ).alias("swapped"),
    )


@op(
    "win_ratio_to_report",
    oracle="""
    SELECT event_id, event_type, value,
           round(value / sum(value) OVER (PARTITION BY event_type), 8)
             AS share_of_type
    FROM events
    """,
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each row's share of its partition total (a
    whole-partition window aggregate, no ordering/frame) — the
    percent-of-total column every report has. One shuffle on the
    partition key; sums are order-dependent doubles → G8 round on the
    RATIO (value magnitudes keep drift far below 1e-8)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.col("value") / F.sum("value").over(w), 8).alias(
            "share_of_type"
        ),
    )


@op(
    "date_month_arith",
    oracle="""
    SELECT o_orderkey,
           cast(o_orderdate AS TIMESTAMP) + INTERVAL 3 MONTH AS plus_3m,
           last_day(cast(o_orderdate AS DATE)) AS month_end,
           cast(date_trunc('month', cast(o_orderdate AS TIMESTAMP))
                AS TIMESTAMP) AS month_start
    FROM orders
    """,
)
def date_month_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month arithmetic: add_months (with its end-of-month
    clamp — both engines roll Jan 31 + 1 month to Feb 29), last_day,
    month truncation. The billing/retention-period date algebra."""
    o = load_table(spark, sf_dir, "orders")
    ts = F.col("o_orderdate").cast("timestamp")
    return o.select(
        "o_orderkey",
        F.add_months(ts, 3).cast("timestamp").alias("plus_3m"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.date_trunc("month", ts).alias("month_start"),
    )


@op(
    "fn_digest_sha256",
    oracle="""
    SELECT doc_id, sha256(text) AS content_sha256,
           substr(sha256(text), 1, 16) AS short_id
    FROM documents
    """,
)
def fn_digest_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHA-256 content digest (the collision-resistant sibling of the
    md5 class key — what a content-addressed store actually uses) plus
    the truncated short-id form. Byte-identical cross-engine (G8's
    stable-hash family)."""
    d = load_table(spark, sf_dir, "documents")
    sha = F.lower(F.sha2("text", 256))
    return d.select(
        "doc_id",
        sha.alias("content_sha256"),
        F.substring(sha, 1, 16).alias("short_id"),
    )


@op(
    "array_clean_funcs",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_transform(string_split(text, ' '),
                            x -> CASE WHEN x = 'the' THEN NULL ELSE x END)
               AS toks
      FROM documents)
    SELECT doc_id,
           cast(len(list_filter(toks, x -> x IS NOT NULL)) AS BIGINT)
             AS n_compact,
           array_to_string(list_sort(list_distinct(
             list_filter(toks, x -> x IS NOT NULL))), ',') AS distinct_sorted,
           cast(len(list_filter(toks, x -> x IS NULL OR x <> 'value'))
                AS BIGINT) AS n_removed
    FROM t
    """,
)
def array_clean_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array cleanup battery: array_compact (drop NULLs),
    array_distinct (SORTED before stringify — engines build sets in
    different orders, G7), array_remove (which KEEPS NULL elements —
    the oracle filter must too) — the token-list hygiene ops a text
    pipeline chains before hashing."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.transform(
        F.split("text", " "),
        lambda x: F.when(x == "the", F.lit(None)).otherwise(x),
    )
    compact = F.array_compact(toks)
    return d.select(
        "doc_id",
        F.size(compact).cast("long").alias("n_compact"),
        F.array_join(F.array_sort(F.array_distinct(compact)), ",").alias(
            "distinct_sorted"
        ),
        F.size(F.array_remove(toks, "value")).cast("long").alias("n_removed"),
    )


@op(
    "agg_grouping_id",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           cast(grouping(o_orderstatus) AS BIGINT) AS g_status,
           cast(grouping(o_orderpriority) AS BIGINT) AS g_priority,
           cast(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """grouping() indicator columns on a ROLLUP — how a consumer
    distinguishes 'NULL because subtotal row' from 'NULL data' in
    multi-level aggregates (agg_rollup produces the levels; this op
    produces the level METADATA)."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("long").alias("g_status"),
        F.grouping("o_orderpriority").cast("long").alias("g_priority"),
        F.count("*").alias("n"),
    )


@op(
    "agg_regression",
    oracle="""
    SELECT event_type,
           round(regr_slope(value, user_id), 8) AS slope,
           round(regr_intercept(value, user_id), 6) AS intercept,
           round(regr_r2(value, user_id), 8) AS r2,
           cast(regr_count(value, user_id) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope/intercept/r2/count) —
    the single-pass trend-line fit behind every dashboard's 'is this
    metric drifting' overlay. Mergeable moment sums, so partial agg
    keeps the shuffle |groups|-sized; G8 rounding on the float
    outputs."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.regr_slope("value", "user_id"), 8).alias("slope"),
        F.round(F.regr_intercept("value", "user_id"), 6).alias("intercept"),
        F.round(F.regr_r2("value", "user_id"), 8).alias("r2"),
        F.regr_count("value", "user_id").alias("n"),
    )


@op(
    "str_split_part",
    oracle="""
    SELECT doc_id,
           split_part(text, ' ', 1) AS first_field,
           split_part(text, ' ', 3) AS third_field,
           split_part(source, 'src', 2) AS src_ordinal
    FROM documents
    """,
)
def str_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_part: nth field of a delimited string in one call (the
    log/CSV field-plucking staple; returns '' past the end in both
    engines, so no NULL-handling divergence)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.split_part("text", F.lit(" "), F.lit(1)).alias("first_field"),
        F.split_part("text", F.lit(" "), F.lit(3)).alias("third_field"),
        F.split_part("source", F.lit("src"), F.lit(2)).alias("src_ordinal"),
    )


@op(
    "map_transform_funcs",
    oracle="""
    SELECT doc_id,
           upper(lang) AS lang_upper,
           'k_lang' AS lang_key,
           length(lang) + length(source) AS zipped_lang
    FROM documents
    """,
)
def map_transform_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: transform_values / transform_keys /
    map_zip_with over a labels-style map, scalarized by extracting
    known keys. The oracle computes each extracted result directly —
    what's under test is that Spark's map HOFs produce exactly those
    values (DuckDB has no map lambdas to mirror)."""
    d = load_table(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("src"), F.col("source")
    )
    upped = F.transform_values(m, lambda k, v: F.upper(v))
    keyed = F.transform_keys(m, lambda k, v: F.concat(F.lit("k_"), k))
    lens = F.map_zip_with(
        m, m, lambda k, v1, v2: F.length(v1) + F.length(v2)
    )
    # zipped_lang = len(lang)+len(lang); adjust to lang+source via a
    # second map built from swapped values
    m2 = F.create_map(
        F.lit("lang"), F.col("source"), F.lit("src"), F.col("lang")
    )
    lens2 = F.map_zip_with(m, m2, lambda k, v1, v2: F.length(v1) + F.length(v2))
    return d.select(
        "doc_id",
        upped.getItem("lang").alias("lang_upper"),
        F.array_sort(F.map_keys(keyed)).getItem(0).alias("lang_key"),
        lens2.getItem("lang").alias("zipped_lang"),
    )


@op(
    "fn_from_csv",
    oracle="""
    SELECT doc_id,
           doc_id AS parsed_id,
           lang AS parsed_lang,
           cast(n_chars AS BIGINT) AS parsed_chars
    FROM documents
    """,
)
def fn_from_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_csv round-trip: encode row fields into a CSV string, parse
    back TYPED with an explicit schema (the embedded-CSV column case —
    webhook payloads, legacy exports). Oracle recomputes the fields
    directly, so any parse drift (quoting, type coercion) fails the
    hash."""
    d = load_table(spark, sf_dir, "documents")
    csv = F.concat_ws(
        ",", F.col("doc_id"), F.col("lang"), F.col("n_chars")
    )
    parsed = F.from_csv(
        csv, F.lit("id LONG, lang STRING, chars LONG")
    )
    return d.select(
        "doc_id",
        parsed["id"].alias("parsed_id"),
        parsed["lang"].alias("parsed_lang"),
        parsed["chars"].alias("parsed_chars"),
    )


@op(
    "xml_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS parsed_status,
           cast(o_custkey AS BIGINT) AS parsed_cust,
           round(o_totalprice, 4) AS parsed_price
    FROM orders WHERE o_orderkey % 10 = 0
    """,
)
def xml_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 native XML round-trip: encode row fields into an XML
    string, parse back TYPED with from_xml (the embedded-XML column
    case — SOAP/legacy feeds). Oracle recomputes the fields directly,
    so escaping or type-coercion drift in the XML path fails the
    hash. Single narrow projection, no shuffle."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 10 == 0)
    xml = F.concat(
        F.lit("<order><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><cust>"),
        F.col("o_custkey"),
        F.lit("</cust><price>"),
        F.col("o_totalprice"),
        F.lit("</price></order>"),
    )
    parsed = F.from_xml(xml, "status STRING, cust LONG, price DOUBLE")
    return o.select(
        "o_orderkey",
        parsed["status"].alias("parsed_status"),
        parsed["cust"].alias("parsed_cust"),
        F.round(parsed["price"], 4).alias("parsed_price"),
    )


@op(
    "agg_bitmap_distinct",
    # ClickHouse groupBitmap parity: the oracle is plain exact
    # COUNT(DISTINCT); the Spark side must reproduce it through the
    # two-level bitmap aggregation. n_buckets pins the bucketing
    # itself: Spark's bitmap_bucket_number(v) = floor((v-1)/32768)+1
    # for v > 0 (one 4 KB bitmap per 32768-value range). ids are
    # shifted +1 before bucketing because bitmap_bucket_number's
    # Java truncation and SQL floor division disagree at v = 0; the
    # +1 bijection keeps counts identical and buckets aligned with
    # the oracle's user_id // 32768.
    oracle="""
    SELECT event_type,
           cast(count(DISTINCT user_id) AS BIGINT) AS n_users,
           cast(count(DISTINCT (user_id // 32768)) AS BIGINT) AS n_buckets
    FROM events GROUP BY 1
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via Spark 4 bitmap aggregates — the
    ClickHouse ``groupBitmap`` pattern: bucket ids into fixed 32768-bit
    bitmaps (``bitmap_bucket_number`` / ``bitmap_bit_position``),
    OR-merge per bucket with ``bitmap_construct_agg``, then sum
    ``bitmap_count`` per group.

    Scale: this is THE exact-distinct plan for 100 TB. A naive
    COUNT(DISTINCT id) shuffles every raw id; here the map side
    partial-aggregates ids into ≤4 KB fixed-width bitmap partials, so
    shuffle volume is |groups × touched buckets × 4 KB| regardless of
    row count — HLL-sized network cost with an EXACT answer. The
    second aggregation (sum of per-bucket counts) is tiny. Both
    stages are built-in JVM aggregates inside whole-stage codegen."""
    ev = load_table(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type",
        F.bitmap_bucket_number(F.col("user_id") + 1).alias("bkt"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("user_id") + 1)).alias(
            "bm"
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).alias("n_users"),
        F.count("*").alias("n_buckets"),
    )


@op(
    "str_collation",
    # UTF8_LCASE grouping must equal grouping on lower(): the oracle
    # states the semantics with explicit lower(); min() keeps a
    # deterministic representative per group
    oracle="""
    SELECT lower(o_orderpriority) AS prio_ci,
           cast(count(*) AS BIGINT) AS n,
           min(o_orderpriority) AS example
    FROM orders GROUP BY 1
    """,
)
def str_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware grouping (new in Spark 4): group a string
    column under the UTF8_LCASE collation instead of wrapping every
    reference in lower() — the engine-level answer to
    case-insensitive dimensions (emails, country codes, SKUs).

    Scale: the collation is carried in the column TYPE, so the
    aggregate hashes collation keys directly — one partial-agg'd
    shuffle, no expression wrapper to forget on one side of a join.
    The output is normalized back to lower() so downstream schemas
    stay collation-free."""
    o = load_table(spark, sf_dir, "orders")
    ci = F.collate(F.col("o_orderpriority"), "UTF8_LCASE")
    return o.groupBy(ci.alias("prio_key")).agg(
        F.count("*").alias("n"),
        F.min("o_orderpriority").alias("example"),
    ).select(
        F.lower(F.col("prio_key")).cast("string").alias("prio_ci"),
        "n",
        "example",
    )


@op(
    "sql_pipe_syntax",
    oracle="""
    SELECT l_returnflag,
           cast(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice * l_discount), 4) AS revenue_effect
    FROM lineitem
    WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07
    GROUP BY 1
    """,
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (new in Spark 4): the same filtered aggregate
    written as a |> pipeline — each stage reads top-to-bottom the way
    the DataFrame API does, and Catalyst lowers it to the IDENTICAL
    plan as the classic formulation (the oracle), so adopting it is a
    readability choice, not a performance one.

    Scale: same plan as tpch_q6's shape — pushed filters, map-side
    partial agg, |flags|-row shuffle."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_pipe"
    )
    return spark.sql(
        """
        FROM lineitem_pipe
        |> WHERE l_quantity < 24 AND l_discount BETWEEN 0.05 AND 0.07
        |> AGGREGATE count(*) AS n,
                     round(sum(l_extendedprice * l_discount), 4)
                       AS revenue_effect
           GROUP BY l_returnflag
        |> SELECT l_returnflag, n, revenue_effect
        """
    )


@op(
    "agg_percentile_disc",
    # percentile_disc returns an ACTUAL data value (no interpolation),
    # so unlike the _cont battery there is no float arithmetic at all
    # to discipline — both engines pick the same stored double
    oracle="""
    SELECT event_type,
           quantile_disc(value, 0.5) AS p50_disc,
           quantile_disc(value, 0.95) AS p95_disc,
           quantile_cont(value, 0.5) AS p50_cont
    FROM events GROUP BY 1
    """,
)
def agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles (WITHIN GROUP ORDER BY): percentile_disc
    picks an actual observed value instead of interpolating — the
    right choice when the metric is categorical-ish (status codes,
    bucketed latencies) or when a report must show a value that
    really occurred. Emitted beside the continuous p50 so the
    difference is visible in the result itself.

    Scale: same single partial-agg'd shuffle as the exact-percentile
    battery; the per-group value buffer is the cost driver, and the
    documented 100 TB swap is approx_percentile (sketch) exactly as
    for the _cont family."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_pdisc")
    return spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value)
                 AS p50_disc,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY value)
                 AS p95_disc,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY value)
                 AS p50_cont
        FROM events_pdisc GROUP BY event_type
        """
    )


@op(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderpriority,
           cast(count(*) AS BIGINT) AS n_all,
           cast(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS n_finished,
           round(sum(o_totalprice) FILTER (WHERE o_totalprice > 100000), 4)
             AS big_total,
           cast(count(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O')
                AS BIGINT) AS open_customers
    FROM orders GROUP BY 1
    """,
)
def agg_filter_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI FILTER clause on aggregates — the standard's form of
    conditional aggregation (agg_conditional shows the CASE-WHEN
    equivalent; FILTER states intent directly and composes with
    DISTINCT, which CASE cannot). One grouped pass computes all four
    differently-filtered aggregates.

    Scale: identical partial-agg'd single-shuffle plan as the CASE
    form — FILTER is free at the plan level."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_filter")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_all,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
               round(sum(o_totalprice)
                     FILTER (WHERE o_totalprice > 100000), 4) AS big_total,
               count(DISTINCT o_custkey)
                 FILTER (WHERE o_orderstatus = 'O') AS open_customers
        FROM orders_filter GROUP BY 1
        """
    )


@op(
    "sql_lateral_alias",
    # raw IEEE products, NO rounding: scalar double arithmetic is
    # bit-deterministic cross-engine, while round()-on-a-double-tie is
    # not (Spark rounds via decimal string, DuckDB via float multiply
    # — a half-tie at sf0.1 flipped exactly this op before the rounds
    # were removed)
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net,
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) AS gross,
           (l_extendedprice * (1 - l_discount)) * (1 + l_tax) >= 1000
             AS is_material
    FROM lineitem WHERE l_orderkey % 50 = 0
    """,
)
def sql_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral column aliases: `net` defined in the SELECT list and
    immediately reused by `gross`, which `is_material` reuses again —
    the expression-pipeline style that otherwise forces nested
    subqueries or repeated formulas (and repeated formulas drift).

    Scale: pure projection; Catalyst inlines the alias chain into one
    codegen'd stage, so the readability is free."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 50 == 0
    )
    li.createOrReplaceTempView("lineitem_lca")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS net,
               net * (1 + l_tax) AS gross,
               gross >= 1000 AS is_material
        FROM lineitem_lca WHERE l_orderkey % 50 = 0
        """
    )


@op(
    "sql_identifier_clause",
    oracle="""
    SELECT n_name, cast(count(*) AS BIGINT) AS n_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDENTIFIER() clause: table and column names supplied as
    PARAMETERS without string-concatenating SQL — the
    injection-safe way to write generic per-table jobs (the
    compaction/backfill tools in sinks_ops are exactly this shape in
    production).

    Scale: resolved at analysis time — the plan is identical to the
    hardcoded-name query."""
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("sup_idf")
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nat_idf")
    return spark.sql(
        """
        SELECT n_name, count(*) AS n_suppliers
        FROM IDENTIFIER(:fact) JOIN IDENTIFIER(:dim)
          ON IDENTIFIER(:fact_key) = IDENTIFIER(:dim_key)
        GROUP BY 1
        """,
        args={
            "fact": "sup_idf",
            "dim": "nat_idf",
            "fact_key": "s_nationkey",
            "dim_key": "n_nationkey",
        },
    )
