"""The distributed path of with_global_rank must produce exactly the
single-partition window's ranks (the adaptive threshold normally hides
it below 1M rows, so this test forces it on)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from khose_spark.operators.rank import with_global_rank
from khose_spark.tables import t


def test_distributed_rank_equals_window_rank(spark, sf_dir):
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    order = [F.asc("o_orderdate"), F.desc("o_totalprice"), F.asc("o_orderkey")]
    dist = with_global_rank(o, *order, local_threshold=0)
    w = Window.orderBy(*order)
    win = o.withColumn("rnk", F.row_number().over(w).cast("long"))
    a = sorted((r["o_orderkey"], r["rnk"]) for r in dist.collect())
    b = sorted((r["o_orderkey"], r["rnk"]) for r in win.collect())
    assert a == b


def test_distributed_rank_with_nulls(spark, sf_dir):
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("pr"),
        )
    )
    order = [F.asc_nulls_first("pr"), F.asc("o_orderkey")]
    dist = with_global_rank(o, *order, local_threshold=0)
    w = Window.orderBy(*order)
    win = o.withColumn("rnk", F.row_number().over(w).cast("long"))
    assert sorted((r["o_orderkey"], r["rnk"]) for r in dist.collect()) == sorted(
        (r["o_orderkey"], r["rnk"]) for r in win.collect()
    )
