"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

Engine law (SURVEY.md §1.4): Python logic crosses the JVM boundary only
through Arrow — pandas_udf / mapInPandas / applyInPandas. Row-at-a-time
``F.udf`` appears nowhere in this codebase; at 100 TB the 10-100×
Arrow-vs-pickle gap is the difference between hours and days.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from khose_spark.registry import query
from khose_spark.tables import t


@F.pandas_udf(T.StringType())
def price_tier(price: pd.Series) -> pd.Series:
    """Vectorized scalar UDF: price tier labels (Arrow batches in/out)."""
    return pd.cut(
        price,
        bins=[float("-inf"), 2000.0, 20000.0, float("inf")],
        labels=["low", "mid", "high"],
    ).astype(str)


@query(
    "q_udf_scalar_pandas",
    oracle="""
    SELECT tier, count(*) AS n, CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(max(l_extendedprice) AS DOUBLE) AS max_price
    FROM (
      SELECT CASE WHEN l_extendedprice <= 2000 THEN 'low'
                  WHEN l_extendedprice <= 20000 THEN 'mid'
                  ELSE 'high' END AS tier,
             l_extendedprice
      FROM lineitem
    )
    GROUP BY tier
    """,
)
def q_udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF on the hot path, aggregated for a stable check."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select(price_tier("l_extendedprice").alias("tier"), "l_extendedprice")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


@F.pandas_udf(T.DoubleType())
def midrange(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: (min+max)/2 — exact in double for
    2-decimal inputs, so no rounding ambiguity."""
    return float((v.min() + v.max()) / 2.0)


@query(
    "q_udaf_grouped_pandas",
    oracle="""
    SELECT event_type, (min(value) + max(value)) / 2 AS mid
    FROM events GROUP BY event_type
    """,
)
def q_udaf_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (UDAF shape)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(midrange("value").alias("mid"))
    )


_TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("token", T.StringType()),
        T.StructField("pos", T.IntegerType()),
    ]
)


def _first_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas generator: one output row per (doc, token) for the
    first 5 tokens — UDTF-shaped row expansion, Arrow batch in/out."""
    for pdf in batches:
        toks = pdf["text"].str.split(" ").str[:5]
        n = toks.str.len()
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].repeat(n).to_numpy(),
                "token": [t for lst in toks for t in lst],
                "pos": [i + 1 for lst in toks for i in range(len(lst))],
            }
        )


@query(
    "q_udtf_map_in_pandas",
    oracle="""
    SELECT doc_id,
           unnest(w[1:5]) AS token,
           unnest(range(1, least(len(w), 5) + 1)) AS pos
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
    """,
)
def q_udtf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-expanding mapInPandas transform (UDTF shape)."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_first_tokens, schema=_TOKENS_SCHEMA)


_CENTERED_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("centered", T.DoubleType()),
    ]
)


def _center_values(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas per-user demeaning, kept in EXACT decimal space:
    emits value*n - sum (the deviation from the mean scaled by the group
    size) rather than value - sum/n. The division form lands exactly on
    half-cent boundaries whenever n divides the 2-decimal group sum, and
    no two engines round those boundaries alike (observed at sf0.01);
    the scaled form needs no division, so every intermediate is an exact
    2-decimal and the float conversion is the same nearest-double on
    both engines."""
    from decimal import Decimal

    vals = [Decimal(f"{float(v):.2f}") for v in pdf["value"]]
    s, n = sum(vals), len(vals)
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "user_id": pdf["user_id"],
            "centered": [float(v * n - s) for v in vals],
        }
    )


@query(
    "q_udtf_apply_in_pandas",
    oracle="""
    SELECT event_id, user_id,
           CAST(CAST(value AS DECIMAL(18,2))
                  * count(*) OVER (PARTITION BY user_id)
                - sum(CAST(value AS DECIMAL(18,2)))
                  OVER (PARTITION BY user_id) AS DOUBLE) AS centered
    FROM events
    """,
)
def q_udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user scaled deviation from the
    mean (value*n - sum, exact decimal — see _center_values for why not
    value - mean). At 100 TB this shuffles once on user_id and streams
    each group through Arrow; groups must fit in executor memory (true
    for per-user slices)."""
    e = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return e.groupBy("user_id").applyInPandas(_center_values, schema=_CENTERED_SCHEMA)


@query(
    "q_udtf_python",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           CAST(i AS INT)                                 AS chunk_no,
           CAST(least(10, len(w) - 10 * i) AS INT)        AS n_tokens
    FROM words, unnest(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) AS u(i)
    """,
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 Python UDTF (@udtf table function) in a LATERAL join:
    chunk each document into 10-token "sentences", one output row per
    chunk. A UDTF is the row-expanding escape hatch when explode over a
    built-in expression can't express the generator logic (stateful
    tokenizers, ML segmenters); this deterministic chunker is
    hash-checked against a pure-SQL derivation. UDTF rows stream out of
    the Python worker per input row — no driver collection, partition-
    parallel like every other operator."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_no int, n_tokens int")
    class ChunkDoc:
        def eval(self, text: str):
            words = text.split(" ")
            for i in range(0, len(words), 10):
                yield i // 10, min(10, len(words) - i)

    spark.udtf.register("chunk_doc", ChunkDoc)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).createOrReplaceTempView(
        "udtf_docs"
    )
    return spark.sql(
        "SELECT doc_id, c.chunk_no, c.n_tokens "
        "FROM udtf_docs, LATERAL chunk_doc(text) AS c"
    )
