"""khose_spark.scaling — the Nx fixture scale-up behind bench.py's
scaling proof. The properties that make the proof honest:

1. Conservation: factor N multiplies every fact-table row count by
   exactly N and leaves dimensions untouched.
2. Key disjointness: copy-shifted primary keys never collide.
3. Decorrelation: copies are NOT near-duplicates of each other —
   cross-copy shingle Jaccard stays far below every dedup threshold,
   so dedup outputs (and costs) scale linearly like a genuinely grown
   corpus, not quadratically like a cloned one.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from khose_spark.scaling import DIM_TABLES, FACT_KEYS, ensure_scale_dir


def test_scale_dir_properties(spark, sf_dir):
    dest = tempfile.mkdtemp(prefix="khose_scaletest_")
    try:
        out = ensure_scale_dir(spark, sf_dir, dest, factor=3)
        for tname in DIM_TABLES:
            a = spark.read.parquet(f"{sf_dir}/{tname}.parquet").count()
            b = spark.read.parquet(f"{out}/{tname}.parquet").count()
            assert a == b, f"dim {tname} changed cardinality"
        for tname, keys in FACT_KEYS.items():
            base = spark.read.parquet(f"{sf_dir}/{tname}.parquet")
            big = spark.read.parquet(f"{out}/{tname}.parquet")
            assert big.count() == 3 * base.count(), tname
            k = keys[0]
            assert (
                big.select(k).distinct().count()
                == 3 * base.select(k).distinct().count()
            ), f"{tname}.{k} copies collide"

        # decorrelation: max cross-copy 3-shingle Jaccard between a doc
        # and its copy-shifted twin stays far under the 0.7/0.8 dedup
        # thresholds (the tag token breaks 3 of every 4 windows)
        from khose_spark.operators.llm import shingles

        docs = spark.read.parquet(f"{out}/documents.parquet")
        sh = shingles(docs).withColumn(
            "orig", F.col("doc_id") % 1_000_000_000
        )
        pair_overlap = (
            sh.alias("a")
            .join(
                sh.alias("b"),
                (F.col("a.orig") == F.col("b.orig"))
                & (F.col("a.doc_id") < F.col("b.doc_id"))
                & (F.col("a.shingle") == F.col("b.shingle")),
            )
            .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
        jac = (
            pair_overlap.join(sizes.withColumnRenamed("doc_id", "da"), "da")
            .withColumnRenamed("n", "na")
            .join(sizes.withColumnRenamed("doc_id", "db"), "db")
            .withColumnRenamed("n", "nb")
            .select(
                (
                    F.col("n_common")
                    / (F.col("na") + F.col("nb") - F.col("n_common"))
                ).alias("j")
            )
        )
        max_j = jac.agg(F.max("j")).first()[0]
        assert max_j is not None and max_j < 0.5, (
            f"cross-copy Jaccard {max_j} — copies are near-duplicates, "
            "dedup costs would scale quadratically"
        )

        # embeddings stay unit-consistent: rotation preserves the norm
        emb = spark.read.parquet(f"{out}/embeddings.parquet")
        norm = F.sqrt(
            F.aggregate(
                "embedding", F.lit(0.0), lambda acc, x: acc + x * x
            )
        )
        big_norms = emb.withColumn(
            "orig", F.col("vec_id") % 1_000_000_000
        ).groupBy("orig").agg(
            F.round(F.max(norm) - F.min(norm), 6).alias("spread")
        )
        assert big_norms.agg(F.max("spread")).first()[0] <= 1e-4
    finally:
        shutil.rmtree(dest, ignore_errors=True)
