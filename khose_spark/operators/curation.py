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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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
    from khose_spark.operators.llm import doc_shingles

    sh = doc_shingles(spark, sf_dir)
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
    from khose_spark.operators.llm import shingle_array

    docs = t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n = F.size(words)
    sh = shingle_array(words, 3)  # shifted-array build, duplicates kept
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


# --- PII scrubbing ---------------------------------------------------------
# The fixture corpus is synthetic word-salad with no PII, so the query
# INJECTS deterministic PII spans (an email + a phone per doc, derived
# from doc_id) before scrubbing — the operator under test is the scrub
# machinery itself (pattern surface, global replace, removal audit),
# and injection makes every hit count verifiable in both engines.
_PII_EMAIL = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PII_PHONE = "\\b[0-9]{3}-[0-9]{4}-[0-9]{4}\\b"


@query(
    "q_llm_pii_scrub",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id, lang,
             concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                    '@example.com or 555-',
                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                    '-1234 now') AS text
      FROM documents
    ), scrubbed AS (
      SELECT doc_id, lang,
             len(regexp_extract_all(text, '{_PII_EMAIL}')) AS n_email,
             len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_phone,
             len(text) - len(
               regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                              '{_PII_PHONE}', '<PHONE>', 'g')
             ) AS chars_removed
      FROM seeded
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_email) AS BIGINT) AS n_emails,
           CAST(sum(n_phone) AS BIGINT) AS n_phones,
           CAST(sum(chars_removed) AS BIGINT) AS chars_removed
    FROM scrubbed GROUP BY lang
    """,
)
def q_llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (emails + phone numbers -> typed placeholder
    tokens) with a per-language removal audit — the mandatory scrub
    stage of any LLM training corpus. Entirely map-side JVM regex
    (regexp_count / regexp_replace); the only shuffle is the final
    per-lang audit aggregate. Patterns are dialect-portable (plain
    char-classes + \\b, identical semantics in Java regex and RE2)."""
    docs = t(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        "lang",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit("-1234 now"),
        ).alias("text"),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace("text", F.lit(_PII_EMAIL), F.lit("<EMAIL>")),
        F.lit(_PII_PHONE),
        F.lit("<PHONE>"),
    )
    per_doc = seeded.select(
        "lang",
        F.regexp_count("text", F.lit(_PII_EMAIL)).alias("n_email"),
        F.regexp_count("text", F.lit(_PII_PHONE)).alias("n_phone"),
        (F.length("text") - F.length(scrubbed)).alias("chars_removed"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_email").alias("n_emails"),
        F.sum("n_phone").alias("n_phones"),
        F.sum("chars_removed").alias("chars_removed"),
    )


@query(
    "q_llm_stratified_sample",
    oracle=f"""
    SELECT lang, doc_id, rn FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 20
    """,
)
def q_llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-N stratified sampling: precisely 20 documents per language,
    chosen by md5 order — the balanced-eval-set primitive. Unlike
    fraction-based sampling (approximate N, partitioning-dependent),
    the md5 ranking is content-stable AND exact-count. The window is
    partitioned by stratum, so it scales horizontally; WindowGroupLimit
    prunes each partition to 20 rows before the final sort."""
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
    )


_CTX_TOKENS = 512
_PACK_BUCKETS = 8


@query(
    "q_llm_seq_pack",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             {_sql_hash_bucket('doc_id', _PACK_BUCKETS)} AS bucket,
             md5(CAST(doc_id AS VARCHAR)) AS ord_key,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ), packed AS (
      SELECT bucket, n_tokens,
             sum(n_tokens) OVER (
               PARTITION BY bucket ORDER BY ord_key, doc_id
               ROWS UNBOUNDED PRECEDING) - n_tokens AS start_offset
      FROM toks
    )
    SELECT bucket,
           CAST(start_offset // {_CTX_TOKENS} AS BIGINT) AS window_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens
    FROM packed
    GROUP BY 1, 2
    """,
)
def q_llm_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: documents are concatenated in
    a deterministic md5 order into {_PACK_BUCKETS} independent token
    streams (hash buckets = parallel packer workers), and each document
    is assigned the context window (of {_CTX_TOKENS} tokens) in which
    it STARTS — exactly how a streaming packer chunks a corpus into
    fixed-length training sequences, with documents crossing window
    boundaries. One shuffle for the per-bucket cumulative-sum window +
    one for the per-window rollup; buckets scale with the cluster, and
    no stream ever materializes on one node."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), _PACK_BUCKETS).alias("bucket"),
        F.md5(F.col("doc_id").cast("string")).alias("ord_key"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("ord_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.select(
        "bucket",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    )
    return (
        packed.groupBy(
            "bucket",
            F.expr(f"start_offset div {_CTX_TOKENS}").alias("window_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )


@query(
    "q_llm_leakage_split",
    oracle=f"""
    WITH grouped AS (
      SELECT doc_id, n_chars, md5(text) AS grp,
             CASE WHEN {_sql_hash_bucket('text')} < 80 THEN 'train'
                  WHEN {_sql_hash_bucket('text')} < 90 THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, count(*) AS n_docs,
           count(DISTINCT grp) AS n_groups,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM grouped GROUP BY split
    """,
)
def q_llm_leakage_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/valid/test split: the split key is the md5 of
    the document CONTENT, so every member of an exact-duplicate group
    lands in the same split by construction — the guard against a test
    document's duplicate sitting in train (the classic contamination
    path that an id-keyed split, q_llm_split_assign, cannot prevent).
    Map-side hashing + one audit aggregate; countDistinct(grp) exposes
    the docs-vs-groups gap per split."""
    docs = t(spark, sf_dir, "documents")
    b = hash_bucket(F.col("text"))
    split = F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
    return (
        docs.select(
            split.alias("split"),
            F.md5("text").alias("grp"),
            "n_chars",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("grp").alias("n_groups"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


_RES_DENOM = 16**8  # md5-derived uniform granularity (8 hex chars)


@query(
    "q_llm_reservoir_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             round(ln(({" + ".join(
                 f"(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {j}, 1)) - 1)"
                 f" * {16 ** (8 - j)}"
                 for j in range(1, 9)
             )} + 1) / CAST({_RES_DENOM} AS DOUBLE)) / n_chars, 9) AS samp_key
      FROM documents
    )
    SELECT doc_id, lang, n_chars, samp_key, rnk FROM (
      SELECT *, row_number() OVER (ORDER BY samp_key DESC, doc_id) AS rnk
      FROM keyed
    ) WHERE rnk <= 20
    """,
)
def q_llm_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted reservoir sampling (Efraimidis–Spirakis A-ES): each doc
    draws a deterministic uniform u from its md5 (8 hex chars → (0,1])
    and scores key = ln(u)/weight with weight = n_chars; the top-20 by
    key IS a weighted-without-replacement sample — longer documents
    proportionally likelier, yet the whole draw is repeatable across
    engines and runs (the property a distributed mixture pipeline needs:
    no RNG state, no coordination, resharding-invariant).

    Determinism: u is exact integer arithmetic; ln(u)/w is rounded to
    9 decimals before ranking (libm vs JVM log differ in the last ULP)
    with doc_id tiebreak. Plan: map-side key derivation, global top-20
    via WindowGroupLimit — one partial-top-k pass, no full sort; at
    100 TB this is a single scan + 20-row reduce, and sampling k per
    STRATUM is the same plan with a partitionBy."""
    docs = t(spark, sf_dir, "documents")
    v = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    u = (v + 1) / F.lit(_RES_DENOM).cast("double")
    keyed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(F.ln(u) / F.col("n_chars"), 9).alias("samp_key"),
    )
    w = Window.orderBy(F.desc("samp_key"), F.asc("doc_id"))
    return (
        keyed.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select("doc_id", "lang", "n_chars", "samp_key", "rnk")
    )


_NEG_K = 3  # negatives per query document
_NEG_POOL_BUCKETS = 10  # candidate pool = md5 bucket < 10 (~10% of corpus)


@query(
    "q_llm_negative_sampling",
    oracle=f"""
    WITH queries AS (
      SELECT doc_id AS query_id, lang AS q_lang FROM documents
      WHERE doc_id % 10 = 0
    ), pool AS (
      SELECT doc_id AS neg_id, lang AS neg_lang FROM documents
      WHERE {_sql_hash_bucket('doc_id')} < {_NEG_POOL_BUCKETS}
    ), scored AS (
      SELECT q.query_id, p.neg_id, p.neg_lang,
             md5(concat(CAST(q.query_id AS VARCHAR), '#',
                        CAST(p.neg_id AS VARCHAR))) AS h
      FROM queries q JOIN pool p
        ON p.neg_lang <> q.q_lang
    ), ranked AS (
      SELECT query_id, neg_id, neg_lang,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY h, neg_id) AS rk
      FROM scored
    )
    SELECT query_id, CAST(rk AS INT) AS rk, neg_id, neg_lang
    FROM ranked WHERE rk <= {_NEG_K}
    """,
)
def q_llm_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: every
    10th document is a query, and each query draws 3 cross-language
    negatives from a fixed ~10% md5-bucket candidate pool, ranked by
    md5(query#candidate) — the repeatable negative-pair generator a
    retrieval/embedding trainer needs (same pairs every run, resharding
    invariant, no RNG; the q_llm_reservoir_sample/A-ES philosophy
    applied to pair construction).

    Scale posture: the candidate pool is the BOUNDED side (a content-
    stable md5 bucket of the corpus — in production a few thousand
    docs, broadcastable), so the query×pool join is linear in queries
    with a constant pool factor, never corpus×corpus; per-query top-3
    is a WindowGroupLimit. The hash ranking is the only compute — pure
    map-side string work."""
    d = t(spark, sf_dir, "documents")
    queries = d.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("lang").alias("q_lang")
    )
    pool = d.filter(
        hash_bucket(F.col("doc_id")) < _NEG_POOL_BUCKETS
    ).select(F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang"))
    scored = queries.join(
        F.broadcast(pool), F.col("neg_lang") != F.col("q_lang")
    ).select(
        "query_id",
        "neg_id",
        "neg_lang",
        F.md5(
            F.concat(
                F.col("query_id").cast("string"),
                F.lit("#"),
                F.col("neg_id").cast("string"),
            )
        ).alias("h"),
    )
    w = Window.partitionBy("query_id").orderBy("h", "neg_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _NEG_K)
        .select("query_id", "rk", "neg_id", "neg_lang")
    )


_NEG_FIXED_POOL = 1000  # fixed-pool twin: constant broadcastable size


@query(
    "q_llm_negative_sampling_fixedpool",
    oracle=f"""
    WITH queries AS (
      SELECT doc_id AS query_id, lang AS q_lang FROM documents
      WHERE doc_id % 10 = 0
    ), pool AS (
      SELECT doc_id AS neg_id, lang AS neg_lang FROM (
        SELECT doc_id, lang FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        LIMIT {_NEG_FIXED_POOL}
      )
    ), scored AS (
      SELECT q.query_id, p.neg_id, p.neg_lang,
             md5(concat(CAST(q.query_id AS VARCHAR), '#',
                        CAST(p.neg_id AS VARCHAR))) AS h
      FROM queries q JOIN pool p
        ON p.neg_lang <> q.q_lang
    ), ranked AS (
      SELECT query_id, neg_id, neg_lang,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY h, neg_id) AS rk
      FROM scored
    )
    SELECT query_id, CAST(rk AS INT) AS rk, neg_id, neg_lang
    FROM ranked WHERE rk <= {_NEG_K}
    """,
)
def q_llm_negative_sampling_fixedpool(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FIXED-POOL twin of q_llm_negative_sampling (round 9, VERDICT r08
    item 2): identical semantics — every 10th document is a query,
    negatives ranked by md5(query#candidate), top-3 cross-language —
    but the candidate pool is a CONSTANT 1000 documents (the 1000
    smallest md5(doc_id) ranks, deterministic and content-stable)
    instead of the ~10% md5 bucket. The bucket form's pool grows with
    the corpus, so its query × pool ranking is n²/10 md5 evaluations
    BY CONTRACT (declared, 10×-verified, 100×-skip-listed); this twin
    is the production shape its docstring promises: pool selection is
    one linear TakeOrdered pass, the pool broadcasts at any corpus
    size, and the ranking join is queries × 1000 — linear forever.

    Plan: one top-1000-by-md5 TakeOrdered over documents (never a full
    sort), broadcast pool join against the query stream, per-query
    top-3 via WindowGroupLimit. At 100 TB: one scan + a ~50 KB
    broadcast + a bounded window."""
    d = t(spark, sf_dir, "documents")
    queries = d.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("lang").alias("q_lang")
    )
    pool = (
        d.select(
            "doc_id",
            "lang",
            F.md5(F.col("doc_id").cast("string")).alias("ph"),
        )
        .orderBy("ph", "doc_id")
        .limit(_NEG_FIXED_POOL)
        .select(
            F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang")
        )
    )
    scored = queries.join(
        F.broadcast(pool), F.col("neg_lang") != F.col("q_lang")
    ).select(
        "query_id",
        "neg_id",
        "neg_lang",
        F.md5(
            F.concat(
                F.col("query_id").cast("string"),
                F.lit("#"),
                F.col("neg_id").cast("string"),
            )
        ).alias("h"),
    )
    w = Window.partitionBy("query_id").orderBy("h", "neg_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _NEG_K)
        .select("query_id", "rk", "neg_id", "neg_lang")
    )


_SPAN_LEN = 3  # masked-span length (T5-style)
_SPAN_START_BUCKETS = 10  # span starts at ~10% of positions


@query(
    "q_llm_span_corruption",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents
    ), toks AS (
      SELECT doc_id, lang,
             CAST(unnest(range(1, len(ws) + 1)) AS BIGINT) AS pos
      FROM words
    ), flagged AS (
      SELECT doc_id, lang, pos,
             CASE WHEN ({_sql_hash_bucket(
                 "concat(CAST(doc_id AS VARCHAR), '#', CAST(pos AS VARCHAR))"
             )}) < {_SPAN_START_BUCKETS} THEN 1 ELSE 0 END AS span_start
      FROM toks
    ), masked AS (
      SELECT doc_id, lang, pos, span_start,
             max(span_start) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN {_SPAN_LEN - 1} PRECEDING AND CURRENT ROW
             ) AS is_masked
      FROM flagged
    )
    SELECT lang,
           count(*) AS n_tokens,
           CAST(sum(is_masked) AS BIGINT) AS n_masked,
           CAST(sum(span_start) AS BIGINT) AS n_span_starts,
           CAST((2 * 1000 * sum(is_masked) + count(*))
                // (2 * count(*)) AS BIGINT) AS masked_permille
    FROM masked GROUP BY lang
    """,
)
def q_llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption audit: deterministic span starts at ~10%
    of token positions (md5 of doc#pos — reproducible across runs and
    shards), each masking a 3-token span; overlapping spans merge via
    the windowed max. Reports per-language token/mask counts and the
    half-up permille mask rate — the preprocessing-stage QA that checks
    the corruption rate actually hits the configured budget before a
    pretraining run burns compute on it.

    All-integer + md5; the only window is per-doc ordered by position
    (ROWS frame, bounded lookback = span length). Plan: split+posexplode
    → map-side hash flag → one doc-keyed window → 5-row agg. Linear at
    any scale, embarrassingly parallel across documents."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.posexplode(F.split("text", " ")).alias("pos0", "token"),
    ).select(
        "doc_id", "lang", (F.col("pos0") + 1).cast("long").alias("pos")
    )
    flagged = toks.withColumn(
        "span_start",
        F.when(
            hash_bucket(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#"),
                    F.col("pos").cast("string"),
                )
            )
            < _SPAN_START_BUCKETS,
            1,
        ).otherwise(0),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-( _SPAN_LEN - 1), Window.currentRow)
    )
    masked = flagged.withColumn("is_masked", F.max("span_start").over(w))
    return masked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("is_masked").cast("long").alias("n_masked"),
        F.sum("span_start").cast("long").alias("n_span_starts"),
        F.expr(
            "CAST((2 * 1000 * sum(is_masked) + count(*))"
            " DIV (2 * count(*)) AS BIGINT)"
        ).alias("masked_permille"),
    )


@query(
    "q_llm_dataset_card",
    oracle="""
    SELECT count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           count(DISTINCT source) AS n_sources,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS total_words,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT)
               AS n_exact_dups,
           CAST((2 * 1000 * sum(len(string_split(text, ' ')))
                 + count(*)) // (2 * count(*)) AS BIGINT)
               AS mean_words_milli,
           CAST((2 * 1000 * sum(CASE WHEN lang = 'en' THEN 1 ELSE 0
                                     END) + count(*))
                // (2 * count(*)) AS BIGINT) AS english_permille,
           CAST(max(n_chars) AS BIGINT) AS longest_doc_chars
    FROM documents
    """,
)
def q_llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card in one row — the summary block a corpus release
    actually publishes: document/language/source counts, total chars
    and words, exact-duplicate count (docs minus distinct text
    hashes), mean words x1000, English share permille, longest
    document. Every number is an exact integer from ONE aggregation
    pass (the distinct counts are the only Expand), so the card is
    cheap enough to regenerate on every snapshot and diff.

    Composition note: the deep versions of each line exist as their
    own keys (q_llm_length_histogram, q_llm_exact_dedup,
    q_llm_dataset_mixture, q_llm_filter_funnel) — this is the
    cover-page rollup."""
    d = t(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(n_words).cast("long").alias("total_words"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text"))).alias(
            "n_exact_dups"
        ),
        F.expr(
            "CAST((2 * 1000 * sum(size(split(text, ' '))) + count(1))"
            " DIV (2 * count(1)) AS BIGINT)"
        ).alias("mean_words_milli"),
        F.expr(
            "CAST((2 * 1000 * sum(CASE WHEN lang = 'en' THEN 1 ELSE 0"
            " END) + count(1)) DIV (2 * count(1)) AS BIGINT)"
        ).alias("english_permille"),
        F.max("n_chars").alias("longest_doc_chars"),
    )


_CHUNK_WIN = 50   # words per chunk
_CHUNK_STRIDE = 40  # new chunk every 40 words => 10-word overlap


@query(
    "q_llm_sliding_chunks",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_words
      FROM documents
    ), chunks AS (
      SELECT doc_id, lang,
             CASE WHEN n_words <= {_CHUNK_WIN} THEN 1
                  ELSE (n_words - {_CHUNK_WIN} + {_CHUNK_STRIDE} - 1)
                         // {_CHUNK_STRIDE} + 1 END AS n_chunks,
             n_words
      FROM toks
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chunks) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN n_chunks > 1
                    THEN (n_chunks - 1) * {_CHUNK_WIN - _CHUNK_STRIDE}
                    ELSE 0 END) AS BIGINT) AS overlap_words,
           CAST((2 * 1000 * sum(n_chunks) + count(*))
                // (2 * count(*)) AS BIGINT) AS chunks_per_doc_milli,
           CAST((2 * 1000 * sum(CASE WHEN n_chunks > 1
                    THEN (n_chunks - 1) * {_CHUNK_WIN - _CHUNK_STRIDE}
                    ELSE 0 END) + sum(n_words))
                // (2 * sum(n_words)) AS BIGINT)
               AS overlap_cost_permille
    FROM chunks GROUP BY lang ORDER BY lang
    """,
)
def q_llm_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking audit (50-word chunks, 40-word stride —
    the RAG-prep standard): per language, how many chunks the corpus
    fragments into, the duplicated-word overhead the 10-word overlap
    costs (absolute + permille of corpus words), and chunks-per-doc
    x1000. The chunk COUNT is closed-form from the word count
    (ceil((n-win)/stride)+1, as integer ceiling-division), so the
    audit is a pure map-side projection — the planner's answer to
    "what does this chunking config cost in tokens" BEFORE running
    the expensive chunk materialization (q_llm_cdc_chunking is the
    content-defined alternative; q_llm_seq_pack consumes the output).

    All-integer; one scan + a 5-row aggregate at any scale."""
    win, stride = _CHUNK_WIN, _CHUNK_STRIDE
    toks = t(spark, sf_dir, "documents").select(
        "lang", F.size(F.split("text", " ")).alias("n_words")
    )
    n_chunks = F.when(F.col("n_words") <= win, F.lit(1)).otherwise(
        F.expr(
            f"(n_words - {win} + {stride} - 1) DIV {stride} + 1"
        )
    )
    chunks = toks.select(
        "lang", "n_words", n_chunks.cast("long").alias("n_chunks")
    )
    overlap = F.when(
        F.col("n_chunks") > 1,
        (F.col("n_chunks") - 1) * (win - stride),
    ).otherwise(0)
    return (
        chunks.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chunks").alias("n_chunks"),
            F.sum(overlap).cast("long").alias("overlap_words"),
            F.expr(
                "CAST((2 * 1000 * sum(n_chunks) + count(1))"
                " DIV (2 * count(1)) AS BIGINT)"
            ).alias("chunks_per_doc_milli"),
            F.expr(
                f"CAST((2 * 1000 * sum(CASE WHEN n_chunks > 1"
                f" THEN (n_chunks - 1) * {win - stride} ELSE 0 END)"
                f" + sum(n_words)) DIV (2 * sum(n_words)) AS BIGINT)"
            ).alias("overlap_cost_permille"),
        )
        .orderBy("lang")
    )


@query(
    "q_llm_url_dedup",
    oracle="""
    WITH raws AS (
      SELECT d.doc_id, v.variant,
             CASE WHEN v.variant = 0 THEN
               concat('https://', d.source, '.example.com/', d.lang,
                      '/doc/', CAST(d.doc_id AS VARCHAR), '?id=',
                      CAST(d.doc_id % 100 AS VARCHAR))
             ELSE
               concat('HTTPS://WWW.', upper(d.source), '.EXAMPLE.COM:443/',
                      d.lang, '/doc/', CAST(d.doc_id AS VARCHAR),
                      '/?utm_source=feed&id=',
                      CAST(d.doc_id % 100 AS VARCHAR),
                      '&utm_campaign=x#frag')
             END AS url
      FROM documents d,
           (SELECT unnest([0, 1]) AS variant) v
    ), canon AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(lower(url), '#.*$', '', 'g'),
                           '^https://www\\.', '', 'g'),
                         '^https://', '', 'g'),
                       '^([^/?:]*):443([/?]|$)', '\\1\\2', 'g'),
                     '&utm_[a-z]+=[^&#]*', '', 'g'),
                   '\\?utm_[a-z]+=[^&#]*&', '?', 'g'),
                 '\\?utm_[a-z]+=[^&#]*$', '', 'g'),
               '/\\?', '?', 'g') AS curl
      FROM raws
    )
    SELECT regexp_extract(curl, '^([^/]+)', 1) AS host,
           CAST(count(*) AS BIGINT) AS n_raw,
           CAST(count(DISTINCT curl) AS BIGINT) AS n_canonical,
           CAST(count(*) - count(DISTINCT curl) AS BIGINT) AS n_dups,
           min(curl) AS sample_canonical
    FROM canon GROUP BY host
    """,
)
def q_llm_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the curation step a web-crawl
    pipeline runs BEFORE content dedup: the same page arrives under
    scheme/case variants, ``www.`` prefixes, explicit default ports,
    tracking parameters, fragments, and trailing slashes, and exact
    string dedup misses all of them.  Each document synthesizes two
    raw variants of its URL (a clean form and a maximally-messy form:
    upper-cased host, ``:443``, ``utm_*`` params wrapping the real
    param, fragment), and the canonicalizer — an ordered
    regexp_replace chain: drop fragment, strip scheme + ``www.``,
    strip default port, remove utm params (mid-list then head
    position, repairing the ``?``/``&`` separator), collapse ``/?`` —
    must fold both variants to ONE canonical key (the port strip is
    authority-anchored on BOTH sides — left to the authority, right to
    ``[/?]`` or end-of-string so ``host:4433`` never prefix-matches —
    and utm matching requires the full ``utm_<name>=`` shape in
    mid/head/sole positions — ADVICE r08 + r09, so the chain is a
    correct reusable contract, not just fixture-correct).  The per-host audit
    (raw count, canonical count, dup count) certifies exactly that:
    n_dups = n_raw/2 iff the canonicalizer is correct on every row.
    DuckDB replays the identical chain with the ``g`` flag (Spark's
    regexp_replace is always-global), so the hash check certifies the
    regex grammar cross-engine.

    Plan: pure map-side string work (codegen, no UDF) after a 2-way
    explode, then one low-cardinality per-host aggregate with a
    distinct on the canonical key.  At 100 TB the only shuffle is the
    per-host distinct-count — keyed on canonical URL, the same
    hash-partitioned shape as exact dedup."""
    d = t(spark, sf_dir, "documents")
    raws = d.select(
        "doc_id", "source", "lang",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("variant"),
    ).select(
        "doc_id",
        F.when(
            F.col("variant") == 0,
            F.concat(
                F.lit("https://"), F.col("source"),
                F.lit(".example.com/"), F.col("lang"), F.lit("/doc/"),
                F.col("doc_id").cast("string"), F.lit("?id="),
                (F.col("doc_id") % 100).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("HTTPS://WWW."), F.upper("source"),
                F.lit(".EXAMPLE.COM:443/"), F.col("lang"),
                F.lit("/doc/"), F.col("doc_id").cast("string"),
                F.lit("/?utm_source=feed&id="),
                (F.col("doc_id") % 100).cast("string"),
                F.lit("&utm_campaign=x#frag"),
            )
        )
        .alias("url"),
    )
    # Canonicalization chain hardened per ADVICE r08 item 4 + r09 item
    # 1: the port strip is ANCHORED to the authority on BOTH sides — a
    # literal ':443' elsewhere in the path/query must survive, and the
    # right boundary ([/?]|$) stops prefix-matching longer ports (the
    # r09 edge: 'host:4433/x' must NOT canonicalize to 'host3/x').
    # Spark backrefs are $1$2, DuckDB's \1\2 — same RE semantics.
    # utm removal matches FULL param names
    # (utm_[a-z]+=) in all three positions — mid-list, head-with-
    # successor, and sole-param — so a non-tracking param that merely
    # starts with 'utm' is never deleted.
    curl = F.lower(F.col("url"))
    for pat, repl in (
        ("#.*$", ""),
        ("^https://www\\.", ""),
        ("^https://", ""),
        ("^([^/?:]*):443([/?]|$)", "$1$2"),
        ("&utm_[a-z]+=[^&#]*", ""),
        ("\\?utm_[a-z]+=[^&#]*&", "?"),
        ("\\?utm_[a-z]+=[^&#]*$", ""),
        ("/\\?", "?"),
    ):
        curl = F.regexp_replace(curl, pat, repl)
    canon = raws.select("doc_id", curl.alias("curl"))
    return canon.groupBy(
        F.regexp_extract("curl", "^([^/]+)", 1).alias("host")
    ).agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.countDistinct("curl").alias("n_canonical"),
        (F.count(F.lit(1)) - F.countDistinct("curl")).alias("n_dups"),
        F.min("curl").alias("sample_canonical"),
    )


@query(
    "q_llm_length_trim",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ), bounds AS (
      SELECT lang,
             quantile_cont(n_tok, 0.05) AS lo,
             quantile_cont(n_tok, 0.95) AS hi
      FROM toks GROUP BY lang
    )
    SELECT t.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(max(b.lo), 2) AS lo_tokens,
           round(max(b.hi), 2) AS hi_tokens,
           CAST(sum(CASE WHEN CAST(t.n_tok AS DOUBLE) >= b.lo
                          AND CAST(t.n_tok AS DOUBLE) <= b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
           CAST(sum(CASE WHEN CAST(t.n_tok AS DOUBLE) >= b.lo
                          AND CAST(t.n_tok AS DOUBLE) <= b.hi
                         THEN t.n_tok ELSE 0 END) AS BIGINT)
             AS retained_tokens
    FROM toks t JOIN bounds b ON b.lang = t.lang
    GROUP BY t.lang
    ORDER BY t.lang
    """,
)
def q_llm_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile length trimming per language -- the curation step
    that drops truncated fragments (below p5 by token count) and
    runaway concatenations (above p95) BEFORE dedup/quality scoring,
    with per-language bounds because a p5 computed on the pooled
    corpus just deletes whichever language runs short. Reports the
    bounds and the retained doc/token mass per language.

    Determinism: token counts are exact int64; the p5/p95 bounds use
    linear-interpolation percentile over int64 counts -- the same
    cross-engine-certified estimator as q_agg_percentile -- and the
    trim predicate compares exact-int doubles against those bounds
    identically in both engines.

    Plan: two passes over the token-count projection (bounds agg,
    then trim counts with the |langs|-row bounds broadcast). Exact
    percentile needs the whole group per lang; at 100 TB the bounds
    pass switches to approx_percentile(eps) with the same join shape
    (the q_agg_percentile scale note)."""
    toks = t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
    )
    bounds = toks.groupBy("lang").agg(
        F.percentile("n_tok", F.lit(0.05)).alias("lo"),
        F.percentile("n_tok", F.lit(0.95)).alias("hi"),
    )
    keep = (F.col("n_tok").cast("double") >= F.col("lo")) & (
        F.col("n_tok").cast("double") <= F.col("hi")
    )
    return (
        toks.join(F.broadcast(bounds), "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.max("lo"), 2).alias("lo_tokens"),
            F.round(F.max("hi"), 2).alias("hi_tokens"),
            F.sum(F.when(keep, 1).otherwise(0))
            .cast("long")
            .alias("n_retained"),
            F.sum(F.when(keep, F.col("n_tok")).otherwise(F.lit(0)))
            .cast("long")
            .alias("retained_tokens"),
        )
        .orderBy("lang")
    )


_DSIR_K = 20  # resample budget: top-k non-target docs by importance


@query(
    "q_llm_dsir",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
      FROM documents
    ), tgt AS (
      SELECT term, count(*) AS n_t FROM tok WHERE lang = 'en'
      GROUP BY term
    ), src AS (
      SELECT term, count(*) AS n_s FROM tok GROUP BY term
    ), tots AS (
      SELECT (SELECT count(*) FROM tok WHERE lang = 'en') AS tot_t,
             (SELECT count(*) FROM tok) AS tot_s,
             (SELECT count(DISTINCT term) FROM tok) AS v
    ), model AS (
      SELECT s.term,
             ln(CAST(COALESCE(t.n_t, 0) + 1 AS DOUBLE)
                / (tots.tot_t + tots.v))
             - ln(CAST(s.n_s + 1 AS DOUBLE) / (tots.tot_s + tots.v))
               AS llr
      FROM src s LEFT JOIN tgt t ON t.term = s.term CROSS JOIN tots
    ), scored AS (
      SELECT k.doc_id, k.lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             round(avg(m.llr), 4) AS avg_llr
      FROM tok k JOIN model m ON m.term = k.term
      WHERE k.lang <> 'en'
      GROUP BY 1, 2
    )
    SELECT doc_id, lang, n_tokens, avg_llr, rk AS rank FROM (
      SELECT doc_id, lang, n_tokens, avg_llr,
             row_number() OVER (ORDER BY avg_llr DESC, doc_id ASC) AS rk
      FROM scored
    ) WHERE rk <= {_DSIR_K}
    """,
)
def q_llm_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance scoring for data selection (Xie et al.,
    Data Selection via Importance Resampling): score each NON-target
    document by how much more likely its unigrams are under the target
    distribution (lang='en' here — the 'quality reference' pool) than
    under the raw-corpus distribution, log w(d) = Σ_w c_d(w)·(ln
    p_tgt(w) − ln p_src(w)) with add-1 smoothing over the joint
    vocabulary; report the top-20 candidates by per-token importance
    (length-debiased avg llr) — the resample set a pretraining mixture
    would promote. This is the selection step between raw crawl and
    quality-filtered corpus that the Gopher/quality-score keys don't
    cover: those score documents in isolation, DSIR scores them
    AGAINST a target distribution.

    Determinism: avg-of-logs is continuous so round(4) is hash-stable
    (the q_llm_surprisal/sqlutil law); ranking compares the ROUNDED
    score with doc_id tiebreak.

    Plan: two vocabulary-sized count aggs (target + corpus) and three
    1-row totals build the model, which broadcasts into the token
    stream (the surprisal shape); scoring is map-side + one per-doc
    shuffle; the top-20 cut is TakeOrdered (no global sort), with the
    dense rank attached on the 20-row result. At 100 TB the only
    corpus-scale shuffles are the token count aggs and the per-doc
    fold."""
    tok = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
    )
    tgt = (
        tok.filter(F.col("lang") == "en")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    src = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n_s"))
    tots = tok.agg(
        F.sum((F.col("lang") == "en").cast("long")).alias("tot_t"),
        F.count(F.lit(1)).alias("tot_s"),
        F.countDistinct("term").alias("v"),
    )
    llr = F.log(
        (F.coalesce(F.col("n_t"), F.lit(0)) + 1).cast("double")
        / (F.col("tot_t") + F.col("v"))
    ) - F.log(
        (F.col("n_s") + 1).cast("double") / (F.col("tot_s") + F.col("v"))
    )
    model = (
        src.join(tgt, "term", "left")
        .crossJoin(F.broadcast(tots))
        .select("term", llr.alias("llr"))
    )
    scored = (
        tok.filter(F.col("lang") != "en")
        .join(F.broadcast(model), "term")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("llr"), 4).alias("avg_llr"),
        )
    )
    top = scored.orderBy(F.desc("avg_llr"), F.asc("doc_id")).limit(_DSIR_K)
    w = Window.orderBy(F.desc("avg_llr"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "lang",
        "n_tokens",
        "avg_llr",
        F.row_number().over(w).alias("rank"),
    )


@query(
    "q_llm_paragraph_dedup",
    oracle="""
    WITH docs AS (
      SELECT doc_id, source, lang, string_split(text, ' ') AS w
      FROM documents
    ), chunks AS (
      SELECT doc_id, source, lang,
             unnest(range(0, CAST((len(w) + 15) // 16 AS BIGINT)))
               AS ci,
             unnest(list_transform(
                 range(0, CAST((len(w) + 15) // 16 AS BIGINT)),
                 i -> array_to_string(w[i*16+1 : i*16+16], ' ')))
               AS chunk,
             len(w) AS nw
      FROM docs
    ), marked AS (
      SELECT source, lang,
             least(16, nw - ci * 16) AS n_words,
             row_number() OVER (PARTITION BY chunk
                                ORDER BY doc_id ASC, ci ASC) AS rn
      FROM chunks
    )
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup,
           CAST(sum(CASE WHEN rn > 1 THEN n_words ELSE 0 END) AS BIGINT)
             AS words_removed,
           CAST((2 * 1000 * sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)
                 + count(*)) // (2 * count(*)) AS BIGINT)
             AS dup_permille
    FROM marked GROUP BY source, lang
    """,
)
def q_llm_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity exact dedup — the C4/CCNet LINE-level pass
    the document-level keys can't express: documents split into
    non-overlapping 16-word paragraphs (the corpus has no newlines, so
    fixed word windows stand in for line boundaries), each paragraph
    deduplicated ACROSS the whole corpus keeping its first occurrence
    (min doc_id, then earliest position — a total order), and the
    removal audited per (source, lang): paragraphs seen, duplicates
    removed, words they carried, half-up permille dup rate. Catches
    boilerplate shared across documents that whole-document hashing
    (q_llm_dedup_clusters) and near-dup banding both keep, because the
    CONTAINING documents are distinct.

    Deterministic and all-integer: the paragraph key is the exact text,
    first-occurrence is a row_number over (doc_id, position), word
    masses are exact counts, and the rate uses the house half-up
    permille fold.

    Plan: map-side chunk explode (a per-row sequence — no cross-row
    work, ~n_words/16 rows per doc), ONE corpus-scale shuffle for the
    first-occurrence window (the inherent cost of exact global dedup),
    then a dimension-bounded (source, lang) rollup. At 100 TB the
    paragraph shuffle dominates, so it is keyed on md5(chunk) instead
    of the raw ~90-byte paragraph text (r13, guide §2.3 — the same
    128-bit content key the md5-groupBy dedup family shuffles on;
    the oracle keeps the raw-text partition and the driver hash-match
    certifies the equivalence); no window ever sees more rows than one
    paragraph's duplicate set."""
    words = F.split("text", " ")
    nch = F.expr("(size(split(text, ' ')) + 15) DIV 16")
    docs = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.size(words).alias("nw"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nch - 1),
                lambda i: F.array_join(
                    F.slice(words, i * 16 + 1, 16), " "
                ),
            )
        ).alias("ci", "chunk"),
    )
    # Shuffle the 128-bit content key, not the paragraph text: the
    # window needs only equality of chunks, and hashing map-side keeps
    # the corpus-scale exchange rows ~2x narrower (guide §2.3).
    hashed = docs.select(
        "source",
        "lang",
        "doc_id",
        "ci",
        F.md5("chunk").alias("hk"),
        F.least(F.lit(16), F.col("nw") - F.col("ci") * 16).alias(
            "n_words"
        ),
    )
    w_first = Window.partitionBy("hk").orderBy(
        F.asc("doc_id"), F.asc("ci")
    )
    marked = hashed.select(
        "source",
        "lang",
        "n_words",
        F.row_number().over(w_first).alias("rn"),
    )
    dup = (F.col("rn") > 1).cast("long")
    return marked.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(dup).cast("long").alias("n_dup"),
        F.sum(dup * F.col("n_words")).cast("long").alias("words_removed"),
        F.expr(
            "CAST((2 * 1000 * sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)"
            " + count(*)) DIV (2 * count(*)) AS BIGINT)"
        ).alias("dup_permille"),
    )


@query(
    "q_llm_domain_cap",
    oracle="""
    WITH ranked AS (
      SELECT source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn <= 40 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rn > 40 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           CAST(sum(CASE WHEN rn <= 40 THEN n_chars ELSE 0 END)
                AS BIGINT) AS kept_chars,
           CAST((2 * 1000 * sum(CASE WHEN rn <= 40 THEN 1 ELSE 0 END)
                 + count(*)) // (2 * count(*)) AS BIGINT)
               AS kept_permille
    FROM ranked GROUP BY source ORDER BY source
    """,
)
def q_llm_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain frequency capping - the anti-head-domain step every
    pretraining mix applies after dedup (C4 capped patents.google.com;
    RefinedWeb caps per-domain share): each source keeps at most 40
    documents and the rest drop, so no single crawl feed dominates the
    mixture. Selection is the content-stable md5 order (the
    reservoir-sample law at curation.py:336): which docs survive
    depends only on their ids, never on partitioning, resharding, or
    arrival order - re-running the cap on a re-sharded 100 TB corpus
    keeps EXACTLY the same documents.

    Determinism/exactness: ranks come from the total order
    (md5(doc_id), doc_id) - collision-proof because the id breaks
    ties; all outputs are exact int64 counts/sums and the kept share
    is exact half-up permille.

    Plan: one source-keyed shuffle feeding a window rank and the
    aggregate (same partitioning, one exchange). Per-source partitions
    are the natural unit; a pathological mega-domain would salt the
    rank via the q_sort_multikey_dist range-offset idiom - the cap
    itself (keep-first-40) needs only each partition's local prefix."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ranked = d.select(
        "source",
        "n_chars",
        F.row_number().over(w).alias("rn"),
    )
    kept = F.when(F.col("rn") <= 40, 1).otherwise(0)
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(kept).cast("long").alias("n_kept"),
            F.sum(1 - kept).cast("long").alias("n_dropped"),
            F.sum(F.when(F.col("rn") <= 40, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias("kept_chars"),
            F.expr(
                "CAST((2 * 1000 * sum(CASE WHEN rn <= 40 THEN 1 ELSE 0 END)"
                " + count(*)) DIV (2 * count(*)) AS BIGINT)"
            ).alias("kept_permille"),
        )
        .orderBy("source")
    )
