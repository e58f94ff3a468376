"""Hypertable-style multi-resolution time rollup (the continuous-
aggregate pattern): aggregate events once at the finest resolution
(hour), then derive every coarser level (day, month) FROM the hourly
aggregate — never rescanning the raw table.

That derivation is the 100 TB point: raw events are petabytes, the
hourly rollup is megabytes, so daily/monthly cost ~nothing and stay
exactly consistent with the hourly level because the re-aggregated
measures (counts, decimal sums) are associative and exact. In a live
deployment the hourly level is maintained incrementally by the
streaming runtime (tumbling-window agg, §2.9) and this module's
derivation runs on top — the batch/stream split of a TimescaleDB-style
continuous aggregate.

Money law: hourly sums stay UNROUNDED decimals internally; rounding to
double happens only at the output edge, per level — re-aggregating a
rounded double would drift from the oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.tables import t

_DEC = "decimal(28,2)"


@query(
    "q_ts_multires_rollup",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             count(*) AS n,
             sum(CAST(value AS DECIMAL(28,2))) AS s
      FROM events GROUP BY 1
    )
    SELECT 'hour' AS resolution,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket,
           n AS n_events,
           CAST(round(s, 2) AS DOUBLE) AS sum_value
    FROM hourly
    UNION ALL
    SELECT 'day', strftime(date_trunc('day', h), '%Y-%m-%d %H:%M:%S'),
           CAST(sum(n) AS BIGINT), CAST(round(sum(s), 2) AS DOUBLE)
    FROM hourly GROUP BY 2
    UNION ALL
    SELECT 'month', strftime(date_trunc('month', h), '%Y-%m-%d %H:%M:%S'),
           CAST(sum(n) AS BIGINT), CAST(round(sum(s), 2) AS DOUBLE)
    FROM hourly GROUP BY 2
    """,
)
def q_ts_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-resolution event rollup (hour/day/month) where day and
    month are re-aggregated from the hourly level. The oracle derives
    all levels from the same hourly CTE — hash-matching proves the
    derived levels are exactly consistent, which only holds because
    counts and decimal sums are associative (doubles wouldn't be)."""
    e = t(spark, sf_dir, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(_DEC)).alias("s"),
        )
        # The materialized continuous aggregate: without this, each
        # union branch re-scans raw events and re-runs the hourly
        # shuffle — exactly what the hypertable pattern exists to avoid.
        # Footprint is one row per distinct hour (tiny at any sf).
        .persist()
    )

    def level(df: DataFrame, name: str, bucket_col) -> DataFrame:
        return df.select(
            F.lit(name).alias("resolution"),
            F.date_format(bucket_col, "yyyy-MM-dd HH:mm:ss").alias("bucket"),
            F.col("n").cast("long").alias("n_events"),
            F.round("s", 2).cast("double").alias("sum_value"),
        )

    def reagg(res: str) -> DataFrame:
        coarse = (
            hourly.groupBy(F.date_trunc(res, "h").alias("b"))
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        )
        return level(coarse, res, F.col("b"))

    levels = [level(hourly, "hour", F.col("h")), reagg("day"), reagg("month")]
    return reduce(DataFrame.unionAll, levels)
