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


@query(
    "q_llm_contamination",
    oracle="""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(w) - 1, 1)),
                 i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
        FROM words
      ) WHERE len(string_split(shingle, ' ')) = 3
    ), train_sh AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id >= 50
    ), ev AS (
      SELECT doc_id, shingle FROM sh WHERE doc_id < 50
    )
    SELECT ev.doc_id,
           count(*) AS n_shingles,
           CAST(sum(CASE WHEN train_sh.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           CAST(sum(CASE WHEN train_sh.shingle IS NOT NULL THEN 1 ELSE 0 END)
                  * 10 >= count(*) * 8 AS INT) AS contaminated
    FROM ev LEFT JOIN train_sh ON ev.shingle = train_sh.shingle
    GROUP BY ev.doc_id
    """,
)
def q_llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination check: treat doc_id < 50 as the eval
    set and the rest as training data; for each eval doc, how many of
    its distinct 3-gram shingles appear ANYWHERE in training, and flag
    >= 80% overlap as contaminated. The 80% test is exact integer
    arithmetic (hit*10 >= total*8) — no ratio is ever rounded.

    Plan: eval shingles (tiny) left-semi-style join the distinct train
    shingle set on the shingle key — one string-keyed shuffle; at
    100 TB the train side would first collapse into a bloom/HLL filter
    per shingle partition, same join key."""
    from khose_spark.operators.llm import shingles

    docs = t(spark, sf_dir, "documents")
    sh = shingles(docs)
    train_sh = (
        sh.filter(F.col("doc_id") >= 50).select("shingle").distinct()
        .withColumn("in_train", F.lit(1))
    )
    ev = sh.filter(F.col("doc_id") < 50)
    joined = ev.join(train_sh, "shingle", "left")
    hit = F.sum(F.col("in_train").isNotNull().cast("long"))
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        hit.alias("n_hit"),
        (hit * 10 >= F.count("*") * 8).cast("int").alias("contaminated"),
    )


@query(
    "q_llm_repetition",
    oracle="""
    WITH per_doc AS (
      SELECT doc_id, lang,
             greatest(len(string_split(text, ' ')) - 2, 0) AS n_total,
             len(list_distinct(list_filter(
               list_transform(
                 range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
                 i -> concat_ws(' ', string_split(text, ' ')[i],
                                string_split(text, ' ')[i+1],
                                string_split(text, ' ')[i+2])),
               s -> len(string_split(s, ' ')) = 3))) AS n_distinct
      FROM documents
    )
    SELECT lang,
           CAST(n_distinct * 10 < n_total * 7 AS INT) AS high_repetition,
           count(*) AS n_docs,
           CAST(sum(n_total) AS BIGINT) AS sum_total,
           CAST(sum(n_distinct) AS BIGINT) AS sum_distinct
    FROM per_doc WHERE n_total > 0
    GROUP BY 1, 2
    """,
)
def q_llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition score (the Gopher-rules quality
    filter): docs where more than 30% of 3-gram shingle slots repeat an
    earlier shingle (distinct*10 < total*7 — exact integer test) are
    binned as high-repetition, counted per language. Entirely map-side
    scalar array work; the only shuffle is the tiny per-(lang, bin)
    aggregate."""
    docs = t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n = F.size(words)
    idx = F.when(n >= 3, F.sequence(F.lit(0), n - 3)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)))
    per_doc = docs.select(
        "lang",
        F.greatest(n - 2, F.lit(0)).alias("n_total"),
        F.size(F.array_distinct(sh)).alias("n_distinct"),
    ).filter(F.col("n_total") > 0)
    return per_doc.groupBy(
        "lang",
        (F.col("n_distinct") * 10 < F.col("n_total") * 7)
        .cast("int")
        .alias("high_repetition"),
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_total").cast("long").alias("sum_total"),
        F.sum("n_distinct").cast("long").alias("sum_distinct"),
    )
