"""Per-stage timing breakdown of q_stream_curation_e2e_batchsem
(VERDICT r13 item 4, guide §1): staging write vs streaming drain
(WAL/manifest commits) vs compaction vs stage-0 audit vs funnel.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/profile_e2e.py [reps]
Prints one JSON line per rep plus a min-of-reps summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from khose_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark("profile-e2e")
    sc = spark.sparkContext

    from khose_spark.operators.curation_pipeline import (
        funnel_audit_rows,
        funnel_one_row,
    )
    from khose_spark.operators.stream_curation import _zone
    from khose_spark.sources.kinesis_sim import (
        document_kinesis_stream,
        parse_document_envelope,
        stage_document_chunks,
    )
    from khose_spark.streaming.runtime import compact_parquet

    all_rows = []
    for rep in range(reps):
        t = {}

        def mark(label, f):
            sc.setJobDescription(f"e2e:{label}")
            t0 = time.perf_counter()
            out = f()
            t[label] = round(time.perf_counter() - t0, 3)
            sc.setJobDescription(None)
            return out

        # fresh chunk staging per rep (delete so the write re-runs)
        chunks_parent = os.path.join("/tmp", "khose_stream", f"pid{os.getpid()}")
        shutil.rmtree(chunks_parent, ignore_errors=True)
        chunks = mark(
            "stage_chunks",
            lambda: stage_document_chunks(spark, sf_dir, n_chunks=4, tag="e2e"),
        )
        land = _zone(sf_dir, "landing")
        ckpt = _zone(sf_dir, "checkpoint")
        compacted = _zone(sf_dir, "compacted")
        for d in (land, ckpt, compacted):
            shutil.rmtree(d, ignore_errors=True)

        def drain():
            stream = parse_document_envelope(
                document_kinesis_stream(spark, chunks, files_per_trigger=2)
            )
            (
                stream.coalesce(1)
                .writeStream.format("parquet")
                .option("path", land)
                .option("checkpointLocation", ckpt)
                .partitionBy("lang")
                .trigger(availableNow=True)
                .start()
                .awaitTermination()
            )

        mark("stream_drain", drain)
        mark(
            "compaction",
            lambda: compact_parquet(
                spark, land, compacted, partition_cols=("lang",)
            ),
        )

        from pyspark.sql import functions as F

        def stage0():
            landed = spark.read.parquet(land)
            docs = spark.read.parquet(compacted)
            ing = landed.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
            comp = docs.agg(
                F.countDistinct("doc_id").cast("long").alias("n_docs"),
                F.sum(F.size(F.split("text", " ")))
                .cast("long")
                .alias("word_mass"),
                F.countDistinct(F.col("_metadata.file_path"))
                .cast("long")
                .alias("n_files"),
            )
            ing.crossJoin(comp).collect()

        mark("stage0_audit", stage0)

        def funnel():
            docs = spark.read.parquet(compacted)
            funnel_audit_rows(
                funnel_one_row(docs.select("doc_id", "source", "lang", "text"))
            ).orderBy("stage_no", "lang").count()

        mark("funnel", funnel)
        t["total"] = round(sum(t.values()), 3)
        all_rows.append(t)
        print(json.dumps({"rep": rep, **t}))

    summary = {
        k: min(r[k] for r in all_rows) for k in all_rows[0]
    }
    print(json.dumps({"min_of_reps": summary}))
    spark.stop()


if __name__ == "__main__":
    main()
