"""Scalar-function operators (SURVEY.md §2B "Scalar functions").

String / date / math / array / map / json builtins — all JVM-side
``pyspark.sql.functions``, no Python UDFs anywhere. DuckDB oracle casts
are chosen so result types line up with Spark's (e.g. DuckDB year()
returns BIGINT, Spark returns INT → oracle casts to INT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_clustering_spark.functions.detagg import dround, sql_dround
from spark_clustering_spark.io import table
from spark_clustering_spark.registry import query


@query(
    "q_scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           substr(p_name, 1, 5) AS pfx,
           p_brand || ':' || p_type AS brand_type,
           length(p_name)::INT AS name_len,
           trim(p_name) AS trimmed,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word
    FROM part
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/substr/concat/length/trim/regexp_extract over part names."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.substring("p_name", 1, 5).alias("pfx"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.trim("p_name").alias("trimmed"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
    )


@query(
    "q_scalar_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)::INT AS yr,
           month(o_orderdate)::INT AS mo,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           date_diff('day', DATE '1995-01-01', o_orderdate::DATE)::INT AS days_since
    FROM orders
    """,
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/date_trunc/datediff over order dates."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
    )


@query(
    "q_scalar_math",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_dround('abs(l_quantity - 25)')} AS abs_dev,
           {sql_dround('(1 + l_discount) * (1 + l_discount)')} AS disc_sq,
           {sql_dround('sqrt(l_extendedprice)')} AS sqrt_price,
           {sql_dround('ln(l_extendedprice)')} AS ln_price,
           {sql_dround('exp(l_discount)')} AS exp_disc
    FROM lineitem
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/mult/sqrt/ln/exp (reference R3 uses pow/sqrt,
    kmeans.java:258-259). sqrt is IEEE-exact; ln/exp agree to well
    under the 4-dp rounding grain."""
    from spark_clustering_spark.io import spread

    # spread: five dround pivots per row (double->DECIMAL(38,12)->
    # round->double) are pure map work serialized by the one-task scan
    li = spread(table(spark, sf_dir, "lineitem"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(F.abs(F.col("l_quantity") - 25)).alias("abs_dev"),
        dround((1 + F.col("l_discount")) * (1 + F.col("l_discount"))).alias("disc_sq"),
        dround(F.sqrt("l_extendedprice")).alias("sqrt_price"),
        dround(F.log("l_extendedprice")).alias("ln_price"),
        dround(F.exp("l_discount")).alias("exp_disc"),
    )


@query(
    "q_scalar_array",
    oracle=f"""
    SELECT vec_id,
           len(embedding)::INT AS dim,
           {sql_dround('embedding[1]::DOUBLE')} AS first_v,
           {sql_dround('embedding[64]::DOUBLE')} AS last_v,
           {sql_dround("list_aggregate(embedding::DOUBLE[], 'min')")} AS arr_min,
           {sql_dround("list_aggregate(embedding::DOUBLE[], 'max')")} AS arr_max,
           {sql_dround('embedding[1]::DOUBLE + embedding[2]::DOUBLE + embedding[3]::DOUBLE')}
             AS head3_sum
    FROM embeddings
    """,
)
def q_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice/array_min/array_max over the embedding
    column (float -> double casts are exact)."""
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    d = lambda c: c.cast("double")  # noqa: E731
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        dround(d(F.element_at(emb, 1))).alias("first_v"),
        dround(d(F.element_at(emb, 64))).alias("last_v"),
        dround(d(F.array_min(emb))).alias("arr_min"),
        dround(d(F.array_max(emb))).alias("arr_max"),
        dround(
            d(F.element_at(emb, 1)) + d(F.element_at(emb, 2)) + d(F.element_at(emb, 3))
        ).alias("head3_sum"),
    )


@query(
    "q_scalar_map",
    oracle="""
    SELECT user_id,
           coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0)::BIGINT AS clicks,
           coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0)::BIGINT AS purchases
    FROM events
    GROUP BY user_id
    """,
)
def q_scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build map(event_type -> count) per user, then look keys up.
    The map itself never reaches the output (map key order is
    engine-specific); the looked-up scalars are oracle-checkable."""
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("by_type")
    )
    return m.select(
        "user_id",
        F.coalesce(F.try_element_at(F.col("by_type"), F.lit("click")), F.lit(0)).alias(
            "clicks"
        ),
        F.coalesce(
            F.try_element_at(F.col("by_type"), F.lit("purchase")), F.lit(0)
        ).alias("purchases"),
    )


@query(
    "q_scalar_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')::INT AS k_val
    FROM events
    """,
)
def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events props payload."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
    )


@query(
    "q_hash_md5",
    oracle="""
    SELECT doc_id, md5(text) AS h
    FROM documents
    """,
)
def q_hash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hash — the exact-dedup key (both engines emit lowercase
    hex md5)."""
    d = table(spark, sf_dir, "documents")
    return d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("h"))


@query(
    "q_scalar_variant",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT)
             AS sum_k,
           CAST(min(json_extract_string(props, '$.k')::BIGINT) AS BIGINT)
             AS min_k,
           CAST(max(json_extract_string(props, '$.k')::BIGINT) AS BIGINT)
             AS max_k
    FROM events
    WHERE json_valid(props)
    GROUP BY event_type
    """,
)
def q_scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion via Spark 4's VARIANT type:
    try_parse_json once into the binary variant encoding, then typed
    variant_get path extraction — the engine-native replacement for
    repeated get_json_object string re-parses (each get_json_object
    call re-tokenizes the JSON text; a variant parses once and serves
    every later path from the binary form). try_parse_json yields NULL
    for malformed rows, mirroring the oracle's json_valid guard.

    Scale: parse cost is paid once per row in the scan projection;
    aggregation is integer-exact. At 100 TB the variant column is what
    you'd persist (shredded parquet), making every downstream path
    extraction scan-speed."""
    e = table(spark, sf_dir, "events")
    v = e.select(
        "event_type", F.try_parse_json("props").alias("v")
    ).filter(F.col("v").isNotNull())
    k = F.variant_get("v", "$.k", "bigint")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )
