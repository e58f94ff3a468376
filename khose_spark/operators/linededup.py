"""Sentence/span-level cross-document deduplication (the C4 / CCNet
curation step): remove every occurrence of a span that appears in more
than one document, and audit what survives.

This is the dedup-family variant the document-level keys don't cover:
exact dedup (`q_llm_exact_dedup`) drops whole duplicate documents and
the near-dup tier drops similar documents, but real web corpora are
dominated by PARTIAL duplication — boilerplate sentences, navigation
text, license blocks — that repeat across otherwise-distinct pages. C4
removes any three-sentence span seen more than once; CCNet deduplicates
by paragraph hash. The same design is what scales to 100 TB: the unit
of comparison is a bounded span keyed by its own hash, so the whole
operation is hash-partitioned aggregation + one co-partitioned
join-back — NO pair enumeration exists anywhere, which is why span
dedup runs on full crawls where even banded document MinHash needs
care. (The fixture documents have no newlines, so the span boundary is
deterministic: consecutive 10-token groups — "sentences" — exactly
reproducible in SQL.)

Contract (`q_llm_sentence_dedup`): a sentence is duplicated when its
exact text occurs in ≥2 DISTINCT documents; every occurrence of a
duplicated sentence is removed (the CCNet convention — deterministic,
order-free — rather than C4's keep-first, which would need a global
document order). Output: one row per language — documents, sentences,
duplicated-sentence occurrences, documents touched, and the half-up
permille of tokens retained after removal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from khose_spark.registry import query
from khose_spark.tables import t

_SENT_TOKENS = 10

_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
), sent AS (
  SELECT doc_id, lang, i.i AS sid,
         array_to_string(w[(i.i * {_SENT_TOKENS} + 1):
                           ((i.i + 1) * {_SENT_TOKENS})], ' ') AS s,
         len(w[(i.i * {_SENT_TOKENS} + 1):
               ((i.i + 1) * {_SENT_TOKENS})]) AS n_tok
  FROM docs,
       UNNEST(generate_series(0,
         CAST(ceil(len(w) / {_SENT_TOKENS}.0) AS INT) - 1)) AS i(i)
), hashed AS MATERIALIZED (
  SELECT doc_id, lang, md5(s) AS h, CAST(n_tok AS BIGINT) AS n_tok
  FROM sent
), dup AS (
  SELECT h FROM hashed GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), marked AS MATERIALIZED (
  SELECT x.doc_id, x.lang, x.n_tok,
         CASE WHEN d.h IS NOT NULL THEN 1 ELSE 0 END AS is_dup
  FROM hashed x LEFT JOIN dup d ON d.h = x.h
), per_doc AS (
  SELECT doc_id, lang,
         count(*) AS n_sent,
         CAST(sum(n_tok) AS BIGINT) AS n_tok,
         CAST(sum(is_dup) AS BIGINT) AS n_dup_sent,
         CAST(sum(is_dup * n_tok) AS BIGINT) AS n_dup_tok
  FROM marked GROUP BY doc_id, lang
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_sent) AS BIGINT) AS n_sentences,
       CAST(sum(n_dup_sent) AS BIGINT) AS n_dup_occurrences,
       CAST(sum(CASE WHEN n_dup_sent > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_affected,
       CAST((2 * 1000 * sum(n_tok - n_dup_tok) + sum(n_tok))
            // (2 * sum(n_tok)) AS BIGINT) AS retained_permille
FROM per_doc
GROUP BY lang ORDER BY lang
"""


@query("q_llm_sentence_dedup", oracle=_ORACLE)
def q_llm_sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/CCNet-style duplicated-span removal audit (module docstring
    for the contract). Per language: documents, sentences, duplicated
    occurrences, documents touched, half-up permille of tokens kept.

    Plan (the 100 TB shape): tokenizing + span slicing are map-side
    array ops on the scan (no explode of tokens — sentences come from
    `transform` over a `sequence`, ~n_tokens/10 rows after the one
    posexplode); the duplicate set is one hash-keyed aggregation; the
    mark step re-joins ON THE SAME hash key (co-partitioned with the
    aggregation's shuffle — AQE plans the small dup side broadcast at
    fixture scale); then one doc-keyed and one lang-keyed rollup.
    Linear in corpus size even when one boilerplate sentence occurs in
    millions of documents: fan-out is occurrence-count, never
    pairs² — the property that makes span dedup THE dedup that runs
    first on raw crawls."""
    toks = F.split(F.col("text"), " ")
    n_sent = F.ceil(F.size(toks) / F.lit(_SENT_TOKENS)).cast("int")
    sents = F.transform(
        F.sequence(F.lit(0), n_sent - 1),
        lambda i: F.array_join(
            F.slice(toks, i * _SENT_TOKENS + 1, _SENT_TOKENS), " "
        ),
    )
    sent = (
        t(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.posexplode(sents).alias("sid", "s"))
        .select(
            "doc_id",
            "lang",
            F.md5("s").alias("h"),
            F.size(F.split("s", " ")).cast("long").alias("n_tok"),
        )
    )
    dup = (
        sent.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h", F.lit(1).alias("is_dup"))
    )
    marked = sent.join(dup, "h", "left").select(
        "doc_id",
        "lang",
        "n_tok",
        F.coalesce(F.col("is_dup"), F.lit(0)).cast("long").alias("is_dup"),
    )
    per_doc = marked.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_sent"),
        F.sum("n_tok").alias("n_tok"),
        F.sum("is_dup").alias("n_dup_sent"),
        F.sum(F.col("is_dup") * F.col("n_tok")).alias("n_dup_tok"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_sent").alias("n_sentences"),
        F.sum("n_dup_sent").alias("n_dup_occurrences"),
        F.sum((F.col("n_dup_sent") > 0).cast("long")).alias(
            "n_docs_affected"
        ),
        F.sum(F.col("n_tok") - F.col("n_dup_tok")).alias("_kept"),
        F.sum("n_tok").alias("_total"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_sentences",
        "n_dup_occurrences",
        "n_docs_affected",
        # half-up permille on non-negative ints (the house idiom)
        F.expr(
            "CAST((2 * 1000 * _kept + _total) DIV (2 * _total) AS BIGINT)"
        ).alias("retained_permille"),
    ).orderBy("lang")
