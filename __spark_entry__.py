"""Driver contract for the spark-graft builder (PySpark target).

Each entry in ``queries()`` exercises an operator family from SURVEY.md §2
through the ``muller_spark`` package; ``oracle_sql()`` carries the DuckDB
equivalent for the driver's sf0.01 correctness gate.

Float discipline (so cross-engine value hashes match): sums of arbitrary
doubles go through ``DECIMAL(18,p)`` casts (exact, order-independent in
both engines); averages are computed as exact-sum / count; cosine
similarities are rounded to 6 dp after double-precision accumulation.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from muller_spark.operators.aggregate import aggregate_vectorized
from muller_spark.operators.pagination import paginate
from muller_spark.plans import compile_conditions, compile_query_string
from muller_spark.plans.conditions import TOKEN_SPLIT_REGEX, contains_predicate


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark 4 refuses by
    default — read nanos as long and rebuild a (microsecond) timestamp."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return df


def _dec_sum(col: str, scale: int = 2, alias: str | None = None) -> Column:
    """Order-independent exact sum of a double column via decimal cast."""
    out = F.sum(F.col(col).cast(f"decimal(18,{scale})")).cast("double")
    return out.alias(alias) if alias else out


# --------------------------------------------------------------------------
# Query implementations (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (filter → groupBy → agg → orderBy)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            _dec_sum("l_extendedprice", 2, "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.avg("l_quantity").alias("avg_qty"),
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_filter_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-to-right AND/OR fold (no precedence): (a AND b) OR c."""
    li = _t(spark, sf_dir, "lineitem")
    cond = compile_conditions(
        [
            ("l_quantity", ">", 48),
            ("l_discount", "<=", 0.02),
            ("l_extendedprice", "<", 1500.0),
        ],
        ["AND", "OR"],
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


def q_filter_not_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN (inclusive both ends) + NOT negation."""
    li = _t(spark, sf_dir, "lineitem")
    cond = compile_conditions(
        [
            ("l_quantity", "BETWEEN", (10, 15)),
            ("l_returnflag", "==", "R", None, "NOT"),
        ],
        ["AND"],
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )


def q_like_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE = unanchored regex search on a text column."""
    docs = _t(spark, sf_dir, "documents")
    cond = compile_conditions([("text", "LIKE", "vector [a-z]+ join")], [])
    return docs.filter(cond).select("doc_id", "lang", "n_chars")


def q_contains_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINS full-text: OR of AND-of-token groups ("a b||c")."""
    docs = _t(spark, sf_dir, "documents")
    cond = compile_conditions([("text", "CONTAINS", "vector merge||stream window")], [])
    return docs.filter(cond).select("doc_id", "lang", "source")


def q_agg_count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return aggregate_vectorized(
        orders,
        group_by=["o_orderpriority"],
        aggregate_tensors=["*"],
        method="count",
        order_by=["o_orderpriority"],
    )


def q_agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return aggregate_vectorized(
        li,
        group_by=["l_returnflag"],
        aggregate_tensors=["l_quantity"],
        method="sum",
        order_by=["l_returnflag"],
    )


def q_agg_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return aggregate_vectorized(
        li,
        group_by=["l_linestatus"],
        aggregate_tensors=["l_quantity"],
        method="avg",
        order_by=["l_linestatus"],
    )


def q_agg_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return aggregate_vectorized(
        orders,
        group_by=["o_orderstatus"],
        aggregate_tensors=["o_totalprice"],
        method="min",
        order_by=["o_orderstatus"],
    )


def q_agg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return aggregate_vectorized(
        orders,
        group_by=["o_orderstatus"],
        aggregate_tensors=["o_totalprice"],
        method="max",
        order_by=["o_orderstatus"],
    )


def q_agg_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregate() with pre-filter UDF (reference aggregate.py:124-151)."""
    orders = _t(spark, sf_dir, "orders")
    return aggregate_vectorized(
        orders,
        group_by=["o_orderpriority"],
        aggregate_tensors=["*"],
        method="count",
        order_by=["o_orderpriority"],
        pre_filter=F.col("o_totalprice") > 100000.0,
    )


def q_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe query-string language compiled to a Catalyst expression."""
    li = _t(spark, sf_dir, "lineitem")
    cond = compile_query_string(
        "(l_quantity > 30 and l_discount <= 0.02) or l_extendedprice < 1200",
        columns=li.columns,
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber", "l_quantity")


def q_query_string_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained comparison + arithmetic in the query language."""
    li = _t(spark, sf_dir, "lineitem")
    cond = compile_query_string(
        "10 <= l_quantity * 2 <= 30 and not (l_returnflag == 'A')",
        columns=li.columns,
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber", "l_quantity")


def q_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic offset/limit pagination over a total order."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "_row_id",
        F.col("l_orderkey") * 100 + F.col("l_linenumber"),
    )
    return paginate(li, "_row_id", offset=100, limit=50).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


def q_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast join extension: revenue by market segment."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            _dec_sum("o_totalprice", 2, "revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join: order count per nation (customer ⋈ nation broadcast)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("n_name")
    )


def q_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject, no full sort at scale)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-hash groupBy keeping the first doc id."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .orderBy("keep_id")
    )


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting per document."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        "n_chars",
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, stopword ratio, mean token length."""
    docs = _t(spark, sf_dir, "documents")
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(tokens)
    stop = F.size(
        F.filter(tokens, lambda t: t.isin("a", "the", "of", "and", "to"))
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace(F.trim(F.col("text")), r"\s+", "")).cast("double")
            / n_tokens,
            6,
        ).alias("mean_token_len"),
    )


def q_lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return aggregate_vectorized(
        docs,
        group_by=["lang"],
        aggregate_tensors=["*", "n_chars"],
        method="count",
        order_by=["lang"],
    )


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 against the vec_id=0 embedding.

    Double-precision sequential accumulation (F.aggregate) matches the
    oracle's list_cosine_similarity over DOUBLE[]; rounded to 6 dp.
    """
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    e = F.col("embedding").cast("array<double>")
    dot = F.aggregate(
        F.zip_with(e, F.col("qv"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda v: F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(dot / (norm(e) * norm(F.col("qv"))), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


def q_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window aggregate (streaming-style, batch run)."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-ish field extraction from the events props column."""
    events = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("int")
    return (
        events.select(k.alias("k"), "event_type")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k")
    )


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q1_pricing_summary": q1_pricing_summary,
    "q_filter_fold": q_filter_fold,
    "q_filter_not_between": q_filter_not_between,
    "q_like_regex": q_like_regex,
    "q_contains_fuzzy": q_contains_fuzzy,
    "q_agg_count_star": q_agg_count_star,
    "q_agg_sum": q_agg_sum,
    "q_agg_avg": q_agg_avg,
    "q_agg_min": q_agg_min,
    "q_agg_max": q_agg_max,
    "q_agg_prefilter": q_agg_prefilter,
    "q_query_string": q_query_string,
    "q_query_string_chained": q_query_string_chained,
    "q_pagination": q_pagination,
    "q_join_revenue": q_join_revenue,
    "q_join_multiway": q_join_multiway,
    "q_topk_orders": q_topk_orders,
    "q_dedup_exact": q_dedup_exact,
    "q_token_stats": q_token_stats,
    "q_text_quality": q_text_quality,
    "q_lang_distribution": q_lang_distribution,
    "q_knn_cosine": q_knn_cosine,
    "q_window_events": q_window_events,
    "q_json_extract": q_json_extract,
}

_STOPWORD_SQL = "('a','the','of','and','to')"

_ORACLES: dict[str, str] = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
               avg(l_quantity) AS avg_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q_filter_fold": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE (l_quantity > 48 AND l_discount <= 0.02) OR l_extendedprice < 1500.0
    """,
    "q_filter_not_between": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 15 AND NOT (l_returnflag = 'R')
    """,
    "q_like_regex": """
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE regexp_matches(text, 'vector [a-z]+ join')
    """,
    "q_contains_fuzzy": """
        SELECT doc_id, lang, source FROM documents
        WHERE (list_contains(regexp_split_to_array(lower(text), '[^a-z0-9一-鿿]+'), 'vector')
               AND list_contains(regexp_split_to_array(lower(text), '[^a-z0-9一-鿿]+'), 'merge'))
           OR (list_contains(regexp_split_to_array(lower(text), '[^a-z0-9一-鿿]+'), 'stream')
               AND list_contains(regexp_split_to_array(lower(text), '[^a-z0-9一-鿿]+'), 'window'))
    """,
    "q_agg_count_star": """
        SELECT o_orderpriority, count(*) AS count_star
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q_agg_sum": """
        SELECT l_returnflag, sum(l_quantity) AS sum_l_quantity
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q_agg_avg": """
        SELECT l_linestatus, avg(l_quantity) AS avg_l_quantity
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
    "q_agg_min": """
        SELECT o_orderstatus, min(o_totalprice) AS min_o_totalprice
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "q_agg_max": """
        SELECT o_orderstatus, max(o_totalprice) AS max_o_totalprice
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "q_agg_prefilter": """
        SELECT o_orderpriority, count(*) AS count_star
        FROM orders WHERE o_totalprice > 100000.0
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "q_query_string": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE (l_quantity > 30 AND l_discount <= 0.02) OR l_extendedprice < 1200
    """,
    "q_query_string_chained": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        WHERE 10 <= l_quantity * 2 AND l_quantity * 2 <= 30
          AND NOT (l_returnflag = 'A')
    """,
    "q_pagination": """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem
        ORDER BY l_orderkey * 100 + l_linenumber
        OFFSET 100 LIMIT 50
    """,
    "q_join_revenue": """
        SELECT c_mktsegment,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "q_join_multiway": """
        SELECT n_name, count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name
    """,
    "q_topk_orders": """
        SELECT o_orderkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
    "q_dedup_exact": """
        SELECT md5(text) AS content_hash,
               min(doc_id) AS keep_id,
               count(*) AS dup_count
        FROM documents GROUP BY md5(text) ORDER BY keep_id
    """,
    "q_token_stats": """
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               n_chars
        FROM documents
    """,
    "q_text_quality": f"""
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
               round(CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                          x -> x IN {_STOPWORD_SQL})) AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), '\\s+')), 6) AS stopword_ratio,
               round(CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), '\\s+')), 6) AS mean_token_len
        FROM documents
    """,
    "q_lang_distribution": """
        SELECT lang, count(*) AS count_star, count(n_chars) AS count_n_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "q_knn_cosine": """
        WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               round(list_cosine_similarity(embedding::DOUBLE[], qv), 6) AS cos_sim
        FROM embeddings, q
        WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """,
    "q_window_events": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "q_json_extract": """
        SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS INT) AS k,
               count(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
    """,
}


# --------------------------------------------------------------------------
# Driver contract
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
