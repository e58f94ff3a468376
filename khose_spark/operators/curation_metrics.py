"""Round-12 curation planning metrics (SURVEY.md §2 llm family):
tokenizer fertility and context-window packing efficiency — the two
numbers a pretraining-data team fixes BEFORE launching the big jobs
(which tokenizer, which context length), computed corpus-wide.

Both are single-scan integer audits in the house style: counts and
token masses exact int64, shares as half-up permille/milli, regex
surfaces restricted to POSIX character classes that Spark's and
DuckDB's regex engines treat identically (the q_llm_gopher_rules
precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from khose_spark.operators.curation import _sql_hash_bucket, hash_bucket
from khose_spark.registry import query
from khose_spark.tables import t

_PACK_W = (256, 512, 1024)  # candidate context windows (tokens)
_PACK_BUCKETS = 8  # q_llm_seq_pack's parallel-stream contract


@query(
    "q_llm_tokenizer_fertility",
    oracle="""
    WITH feats AS (
      SELECT lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS ws,
             CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
                  + len(regexp_extract_all(text, '[0-9]+'))
                  + length(regexp_replace(text, '[A-Za-z0-9 ]', '',
                                          'g')) AS BIGINT) AS sub,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ws) AS BIGINT) AS ws_tokens,
           CAST(sum(sub) AS BIGINT) AS subword_tokens,
           CAST((2 * 1000 * sum(sub) + sum(ws)) // (2 * sum(ws))
                AS BIGINT) AS fertility_permille,
           CAST((2 * 1000 * sum(chars) + sum(sub)) // (2 * sum(sub))
                AS BIGINT) AS chars_per_subword_milli
    FROM feats GROUP BY lang ORDER BY lang
    """,
)
def q_llm_tokenizer_fertility(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility per language — the compare-tokenizers number
    (subword tokens emitted per whitespace word; GPT-style BPE
    literature reports ~1.3 for English, much higher for non-Latin
    scripts): the subword proxy segments text the way a byte-level
    pre-tokenizer's first pass does — alphabetic runs + digit runs +
    every other non-space character as its own token ([A-Za-z]+ /
    [0-9]+ POSIX classes, identical in both regex engines). Fertility
    = subwords per whitespace word (half-up permille) and compression
    = non-space chars per subword (half-up milli) — the two columns
    that decide context-window token budgets per language.

    Plan: pure map-side counting inside the document scan's codegen
    stage + one |langs|-bounded rollup. One fact pass, text never
    shuffles. At 100 TB this is the cheapest possible corpus shape."""
    d = t(spark, sf_dir, "documents")
    feats = d.select(
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("ws"),
        (
            F.expr("size(regexp_extract_all(text, '[A-Za-z]+', 0))")
            + F.expr("size(regexp_extract_all(text, '[0-9]+', 0))")
            + F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", ""))
        )
        .cast("long")
        .alias("sub"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        .cast("long")
        .alias("chars"),
    )
    return (
        feats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.sum("sub").cast("long").alias("subword_tokens"),
            F.expr(
                "CAST((2 * 1000 * sum(sub) + sum(ws))"
                " DIV (2 * sum(ws)) AS BIGINT)"
            ).alias("fertility_permille"),
            F.expr(
                "CAST((2 * 1000 * sum(chars) + sum(sub))"
                " DIV (2 * sum(sub)) AS BIGINT)"
            ).alias("chars_per_subword_milli"),
        )
        .orderBy("lang")
    )


@query(
    "q_llm_pack_efficiency",
    oracle=f"""
    WITH toks AS (
      SELECT {_sql_hash_bucket('doc_id', _PACK_BUCKETS)} AS bucket,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), per_bucket AS (
      SELECT bucket, CAST(sum(n_tokens) AS BIGINT) AS tok_b
      FROM toks GROUP BY bucket
    ), ws AS (
      SELECT unnest([{', '.join(str(w) for w in _PACK_W)}]) AS w
    ), packed AS (
      SELECT w.w,
             CAST(sum((b.tok_b + w.w - 1) // w.w) AS BIGINT)
               AS n_windows,
             CAST(sum(b.tok_b) AS BIGINT) AS total_tokens,
             CAST(sum(((b.tok_b + w.w - 1) // w.w) * w.w - b.tok_b)
                  AS BIGINT) AS padding_tokens
      FROM per_bucket b CROSS JOIN ws w
      GROUP BY w.w
    )
    SELECT CAST(w AS BIGINT) AS window_tokens, n_windows,
           total_tokens, padding_tokens,
           CAST((2 * 1000 * padding_tokens + n_windows * w)
                // (2 * n_windows * w) AS BIGINT) AS waste_permille
    FROM packed ORDER BY window_tokens
    """,
)
def q_llm_pack_efficiency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Context-window packing efficiency — WHICH context length should
    the pretraining run use? For each candidate window (256/512/1024
    tokens), pack the corpus under the exact q_llm_seq_pack contract
    (8 parallel md5-ordered bucket streams, documents crossing window
    boundaries, padding only in each stream's final window) and report
    windows needed, padding tokens burned, and the half-up waste
    permille of the total window budget. Because packing is
    stream-concatenative, the per-bucket token TOTALS determine the
    answer exactly — windows_b = ceil(tok_b/W) — so all three window
    sizes price out from ONE 8-row relation, no per-W corpus passes.

    Plan: one map-side token count + 8-row bucket rollup, then a
    broadcast 3-row window dim crossed into it. One fact pass total —
    the 100 TB cost is identical to asking for a single W."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        hash_bucket(F.col("doc_id"), _PACK_BUCKETS).alias("bucket"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    per_bucket = toks.groupBy("bucket").agg(
        F.sum("n_tokens").cast("long").alias("tok_b")
    )
    ws = spark.range(0, len(_PACK_W)).select(
        F.element_at(
            F.array(*[F.lit(w).cast("long") for w in _PACK_W]),
            (F.col("id") + 1).cast("int"),
        ).alias("w")
    )
    packed = (
        per_bucket.crossJoin(F.broadcast(ws))
        .groupBy("w")
        .agg(
            F.sum(F.expr("(tok_b + w - 1) DIV w"))
            .cast("long")
            .alias("n_windows"),
            F.sum("tok_b").cast("long").alias("total_tokens"),
            F.sum(F.expr("((tok_b + w - 1) DIV w) * w - tok_b"))
            .cast("long")
            .alias("padding_tokens"),
        )
    )
    return packed.select(
        F.col("w").cast("long").alias("window_tokens"),
        "n_windows",
        "total_tokens",
        "padding_tokens",
        F.expr(
            "CAST((2 * 1000 * padding_tokens + n_windows * w)"
            " DIV (2 * n_windows * w) AS BIGINT)"
        ).alias("waste_permille"),
    ).orderBy("window_tokens")
