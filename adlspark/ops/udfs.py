"""§2 L — UDF / UDAF / UDTF surface.

Each mechanism is exercised once and oracled by a pure-SQL twin, so the
*mechanism* (Python worker round-trip, Arrow batching, group spill) is
what's under test while values stay checkable. Performance discipline:
row Python UDFs are the slow path (pickled per row) — everything else
here is Arrow-batched (pandas_udf / applyInPandas / mapInPandas), the
only acceptable Python data path at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from adlspark import tables
from adlspark.registry import query


@query(
    "udf_python",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_extendedprice IS NULL OR l_discount IS NULL THEN NULL
            WHEN l_extendedprice * (1 - l_discount) > 30000 THEN 'high'
            WHEN l_extendedprice * (1 - l_discount) > 10000 THEN 'mid'
            ELSE 'low' END AS band
FROM lineitem
""",
)
def udf_python(spark, sf_dir):
    """Row-at-a-time Python UDF (the slow path, kept off hot loops).
    NULL-in-NULL-out: a row UDF receives Python None for SQL NULL, and
    unguarded arithmetic on it kills the worker — an unknown price has
    an unknown band on both engines."""

    @F.udf(StringType())
    def band(price: float, discount: float) -> str:
        if price is None or discount is None:
            return None
        dp = price * (1 - discount)
        return "high" if dp > 30000 else ("mid" if dp > 10000 else "low")

    # spread: one scan task = ONE Python worker for the row UDF
    # otherwise (guide §2.5/§4) — same mechanism, 32 workers
    li = tables.spread(tables.load(spark, sf_dir, "lineitem"), key="l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        band("l_extendedprice", "l_discount").alias("band"),
    )


@query(
    "udf_pandas_scalar",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 6) AS revenue
FROM lineitem
""",
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized Arrow UDF — Series in, Series out, ~100× the row UDF."""

    @F.pandas_udf("double")
    def revenue(price: pd.Series, discount: pd.Series) -> pd.Series:
        return (price * (1 - discount)).round(6)

    li = tables.load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue("l_extendedprice", "l_discount").alias("revenue"),
    )


@query(
    "udf_pandas_grouped_agg",
    oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
         AS weighted_avg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def udf_pandas_grouped_agg(spark, sf_dir):
    """Arrow-batched UDAF: quantity-weighted average price per flag."""

    @F.pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return round(float((price * qty).sum() / qty.sum()), 6)

    li = tables.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wavg("l_extendedprice", "l_quantity").alias("weighted_avg_price")
    )


@query(
    "udf_grouped_map",
    oracle="""
SELECT c_custkey, c_nationkey,
       round((c_acctbal - avg(c_acctbal) OVER (PARTITION BY c_nationkey))
             / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 6)
         AS z_score
FROM customer
""",
)
def udf_grouped_map(spark, sf_dir):
    """applyInPandas per-group transform: z-score within nation."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        bal = pdf["c_acctbal"]
        z = (bal - bal.mean()) / bal.std(ddof=1)
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_nationkey": pdf["c_nationkey"],
                "z_score": z.round(6),
            }
        )

    c = tables.load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").applyInPandas(
        zscore, "c_custkey long, c_nationkey int, z_score double"
    )


@query(
    "udf_map_in_pandas",
    oracle="""
SELECT o_orderkey, o_totalprice,
       round(o_totalprice * 0.01, 6) AS fee
FROM orders
WHERE o_totalprice > 300000
""",
)
def udf_map_in_pandas(spark, sf_dir):
    """mapInPandas partition-wise map: filter + derive in one Arrow pass."""

    def fee_filter(batches):
        for pdf in batches:
            out = pdf[pdf["o_totalprice"] > 300000]
            yield pd.DataFrame(
                {
                    "o_orderkey": out["o_orderkey"],
                    "o_totalprice": out["o_totalprice"],
                    "fee": (out["o_totalprice"] * 0.01).round(6),
                }
            )

    o = tables.load(spark, sf_dir, "orders")
    return o.mapInPandas(
        fee_filter, "o_orderkey long, o_totalprice double, fee double"
    )


@query(
    "udtf_python",
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS word
FROM documents WHERE doc_id < 50
""",
)
def udtf_python(spark, sf_dir):
    """Python UDTF (Spark ≥3.5): one input doc row → N word rows. Falls
    back to explode(split()) if the arrow-UDTF path is unavailable in
    this build — same relational contract either way."""
    d = tables.load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    try:
        from pyspark.sql.functions import udtf

        @udtf(returnType="doc_id bigint, word string")
        class SplitWords:
            def eval(self, doc_id: int, text: str):
                for w in text.split(" "):
                    yield doc_id, w

        d.createOrReplaceTempView("udtf_docs")
        spark.udtf.register("split_words", SplitWords)
        return spark.sql(
            "SELECT s.doc_id, s.word "
            "FROM udtf_docs, LATERAL split_words(doc_id, text) s"
        )
    except Exception:
        return d.select(
            "doc_id", F.explode(F.split("text", " ")).alias("word")
        )
