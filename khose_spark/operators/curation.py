"""Dataset-curation operators: deterministic hash-bucket splits and
sampling over the document corpus (training-data-pipeline surface,
SURVEY.md §2.8 family).

Both operators key on a 100-bucket assignment derived from
``md5(cast(doc_id as string))`` — a *content-stable* split: the same
document lands in the same bucket on every engine, every run, every
cluster size, with no RNG state to coordinate. That is the property a
100 TB train/test split actually needs (Spark's ``sample()``/
``TABLESAMPLE`` are seed-deterministic only for a fixed partitioning,
which a production table never keeps). md5 is bit-identical across
engines, so even the bucket assignment is hash-checked by the oracle.

The bucket expression is map-side only — zero shuffle is added on top
of whatever aggregation consumes it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.tables import t


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets): first 4 hex chars of
    md5(key) as an int, mod n_buckets."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")
        % n_buckets
    )


def _sql_hash_bucket(key: str, n_buckets: int = 100) -> str:
    """DuckDB twin of :func:`hash_bucket` (no conv(); per-char hex
    lookup like the SimHash oracle)."""
    terms = " + ".join(
        f"(instr('0123456789abcdef', substr(md5(CAST({key} AS VARCHAR)), {j}, 1)) - 1)"
        f" * {16 ** (4 - j)}"
        for j in range(1, 5)
    )
    return f"(({terms}) % {n_buckets})"


@query(
    "q_llm_split_assign",
    oracle=f"""
    SELECT CASE WHEN {_sql_hash_bucket('doc_id')} < 80 THEN 'train'
                WHEN {_sql_hash_bucket('doc_id')} < 90 THEN 'valid'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           count(DISTINCT lang) AS n_langs
    FROM documents GROUP BY split
    """,
)
def q_llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/valid/test split of the corpus by md5 bucket of
    doc_id; per-split doc count, total chars, distinct languages. All
    outputs are exact integers — no float parity surface at all."""
    docs = t(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    )
    return (
        docs.groupBy(split.alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@query(
    "q_llm_hash_sample",
    oracle=f"""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           count(DISTINCT source) AS n_sources
    FROM documents
    WHERE {_sql_hash_bucket('doc_id')} < 10
    GROUP BY lang
    """,
)
def q_llm_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample (md5 bucket < 10), profiled per
    language — the repeatable-sample primitive for eval sets and data
    audits. The bucket filter is a map-side predicate; only the tiny
    per-lang aggregate shuffles."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.filter(hash_bucket(F.col("doc_id")) < 10)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
    )


_DENYLIST_PAT = r"\b(customer|value|table)\b"


@query(
    "q_llm_denylist_scrub",
    oracle=rf"""
    SELECT lang,
           count(*) AS n_docs,
           CAST(sum(CAST(regexp_matches(text, '{_DENYLIST_PAT}') AS INT))
                AS BIGINT) AS n_docs_touched,
           CAST(sum(len(regexp_extract_all(text, '{_DENYLIST_PAT}')))
                AS BIGINT) AS n_hits,
           CAST(sum(length(regexp_replace(text, '{_DENYLIST_PAT}', '<TERM>',
                                          'g'))) AS BIGINT) AS sum_chars_after
    FROM documents GROUP BY lang
    """,
)
def q_llm_denylist_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist scrubbing (the PII-redaction shape on a synthetic corpus
    with no PII): mask every whole-word denylist hit with '<TERM>' and
    report, per language, how many documents were touched, total hits,
    and the post-scrub corpus size. Pure map-side regexes (Java and RE2
    agree on this pattern class) feeding one tiny per-lang aggregate —
    the audit trail a corpus-cleaning pass emits at 100 TB."""
    docs = t(spark, sf_dir, "documents")
    pat = _DENYLIST_PAT
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col("text").rlike(pat).cast("int")).alias("n_docs_touched"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit(pat), 0))).alias("n_hits"),
        F.sum(F.length(F.regexp_replace("text", pat, "<TERM>"))).alias(
            "sum_chars_after"
        ),
    )
