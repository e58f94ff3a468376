"""Text indexing / retrieval / tokenizer-induction operators
(SURVEY.md §2.8 extension — the text-side primitives a training-data
pipeline runs between curation and training: retrieval-based filtering
(BM25), statistical LM scoring (bigram NLL), and tokenizer vocabulary
induction (BPE merges)).

Scale posture: every stage is groupBy/window over keys whose cardinality
is bounded by the vocabulary (pair counts, term stats) or the corpus
(per-doc windows) — no all-pairs joins anywhere; the per-doc token
streams shuffle once per consumer on doc_id and the model relations
(term stats, pair counts) are broadcast back.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from khose_spark.operators.llm import shingle_array
from khose_spark.registry import query
from khose_spark.tables import t

# BM25 parameters (Robertson/Spärck Jones defaults) and the fixed query.
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("join", "filter", "window")


@query(
    "q_llm_bm25",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ), dl AS (
      SELECT doc_id, lang, len(w) AS dl FROM docs
    ), stats AS (
      SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl
    ), toks AS (
      SELECT doc_id, unnest(w) AS term FROM docs
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM toks
      WHERE term IN ('join', 'filter', 'window')
      GROUP BY 1, 2
    ), df AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             sum(ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({_BM25_K1} + 1.0)
                 / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                    + {_BM25_B} * dl.dl / s.avgdl))) AS score,
             count(*) AS n_terms_matched
      FROM tf
      JOIN dl ON dl.doc_id = tf.doc_id
      JOIN df ON df.term = tf.term
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    )
    SELECT sc.doc_id, dl.lang,
           CAST(sc.n_terms_matched AS BIGINT) AS n_terms_matched,
           round(sc.score, 4) AS score
    FROM scored sc JOIN dl ON dl.doc_id = sc.doc_id
    ORDER BY round(sc.score, 4) DESC, sc.doc_id
    LIMIT 10
    """,
)
def q_llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval: top-10 documents for the fixed query
    {'join','filter','window'} (k1=1.2, b=0.75) — the retrieval-scoring
    primitive behind quality-classifier seeding and eval-set mining.

    Plan: term frequencies for the 3 query terms only (the IN filter
    prunes the token stream map-side), document lengths map-side, corpus
    stats (N, avgdl) as a 1-row broadcast, document frequencies as a
    3-row broadcast. One shuffle on doc_id for tf, tiny broadcasts for
    everything else, TakeOrdered for the top-10 — no global sort. At
    100 TB the same plan holds: df/stats stay tiny for any fixed query.

    Determinism: score is a continuous double (ln/ratios — never lands
    on half-decimals); ranking on round(score,4) with doc_id tiebreak.
    """
    d = t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    dl = d.select("doc_id", "lang", F.size(words).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    toks = d.select("doc_id", F.explode(words).alias("term"))
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    part = idf * F.col("tf") * (_BM25_K1 + 1.0) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(part).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
        )
    )
    return (
        scored.select(
            "doc_id", "lang", "n_terms_matched",
            F.round("score", 4).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


@query(
    "q_llm_bigram_lm",
    oracle="""
    WITH docs AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
    ), bi AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(1, greatest(len(w), 1)),
                    i -> {'w1': w[i], 'w2': w[i+1]})) AS p
      FROM docs WHERE len(w) >= 2
    ), stream AS (
      SELECT doc_id, lang, p.w1 AS w1, p.w2 AS w2 FROM bi
    ), c12 AS (
      SELECT w1, w2, count(*) AS c12 FROM stream GROUP BY 1, 2
    ), c1 AS (
      SELECT w1, count(*) AS c1 FROM stream GROUP BY 1
    ), vocab AS (
      SELECT count(DISTINCT w2) AS v FROM stream
    ), doc_nll AS (
      SELECT s.doc_id, s.lang,
             avg(-ln((c12.c12 + 1.0) / (c1.c1 + vocab.v))) AS nll
      FROM stream s
      JOIN c12 ON c12.w1 = s.w1 AND c12.w2 = s.w2
      JOIN c1 ON c1.w1 = s.w1
      CROSS JOIN vocab
      GROUP BY 1, 2
    )
    SELECT lang, count(*) AS n_docs,
           round(avg(nll), 6) AS avg_nll,
           round(min(nll), 6) AS min_nll,
           round(max(nll), 6) AS max_nll
    FROM doc_nll GROUP BY lang
    """,
)
def q_llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring (KenLM-perplexity-filter proxy,
    one level up from q_llm_surprisal's unigram model): train add-one-
    smoothed bigram probabilities P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) on
    the corpus's own bigram stream, score every document by its average
    negative log-probability, report per-language NLL stats.

    Plan: the bigram stream is built map-side (shifted-array zip, no
    window); the model (c12, c1, V) comes from two aggs + one 1-row agg
    and is broadcast back into the stream; one doc_id shuffle for the
    per-doc average and a 5-row final agg. At 100 TB the model relations
    are vocabulary-bounded (≪ corpus) — exactly the map-reduce LM-
    training shape.

    Determinism: probabilities are identical rationals in both engines;
    per-doc/per-lang averages differ only by float summation order
    (≤1e-14), absorbed by round(6)."""
    d = t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    bigram = shingle_array(words, 2)
    stream = d.select(
        "doc_id", "lang", F.explode(bigram).alias("bg")
    ).select(
        "doc_id",
        "lang",
        F.split("bg", " ")[0].alias("w1"),
        F.split("bg", " ")[1].alias("w2"),
    )
    c12 = stream.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = stream.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = stream.agg(F.countDistinct("w2").alias("v"))
    p = (F.col("c12") + 1.0) / (F.col("c1") + F.col("v"))
    doc_nll = (
        stream.join(F.broadcast(c12), ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "lang")
        .agg(F.avg(-F.log(p)).alias("nll"))
    )
    return doc_nll.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.min("nll"), 6).alias("min_nll"),
        F.round(F.max("nll"), 6).alias("max_nll"),
    )


_BPE_ROUNDS = 3


def _bpe_oracle(rounds: int = _BPE_ROUNDS) -> str:
    """Unrolled BPE-merge CTE chain (house pattern: the oracle re-runs
    the identical per-round logic, like q_llm_kmeans / q_graph_pagerank)."""
    ctes = [
        """tok0 AS (
      SELECT doc_id, CAST(pt.pos AS BIGINT) AS pos, pt.tok AS tok
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w) + 1),
                      i -> {'pos': i, 'tok': w[i]})) AS pt
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      )
    )"""
    ]
    for r in range(1, rounds + 1):
        ctes.append(f"""pr{r} AS (
      SELECT doc_id, pos, tok,
             lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      FROM tok{r - 1}
    )""")
        ctes.append(f"""top{r} AS (
      SELECT tok AS l, nxt AS rt, count(*) AS c
      FROM pr{r} WHERE nxt IS NOT NULL
      GROUP BY 1, 2 ORDER BY c DESC, l ASC, rt ASC LIMIT 1
    )""")
        ctes.append(f"""cand{r} AS (
      SELECT p.doc_id, p.pos,
             row_number() OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS rn
      FROM pr{r} p JOIN top{r} t ON p.tok = t.l AND p.nxt = t.rt
    )""")
        ctes.append(f"""sel{r} AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY doc_id, pos - rn
                                  ORDER BY pos) AS k
        FROM cand{r}
      ) WHERE k % 2 = 1
    )""")
        ctes.append(f"""tok{r} AS (
      SELECT p.doc_id,
             row_number() OVER (PARTITION BY p.doc_id ORDER BY p.pos) AS pos,
             CASE WHEN s.pos IS NOT NULL
                  THEN concat(p.tok, '+', p.nxt) ELSE p.tok END AS tok
      FROM pr{r} p
      LEFT JOIN sel{r} s  ON s.doc_id = p.doc_id AND s.pos = p.pos
      LEFT JOIN sel{r} s2 ON s2.doc_id = p.doc_id AND s2.pos = p.pos - 1
      WHERE s2.pos IS NULL
    )""")
    unions = "\n    UNION ALL ".join(
        f"SELECT {r} AS merge_round, l AS left_tok, rt AS right_tok, "
        f"CAST(c AS BIGINT) AS pair_count FROM top{r}"
        for r in range(1, rounds + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + unions


@query("q_llm_bpe_merges", oracle=_bpe_oracle())
def q_llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-vocabulary induction: 3 merge rounds over the
    corpus's word stream. Each round counts adjacent token pairs, picks
    the most frequent pair (ties: count desc, then lexicographic), and
    APPLIES the merge with standard BPE greedy-leftmost semantics before
    recounting — overlapping occurrences of the winning pair (runs like
    "a a a" for pair (a,a)) merge at odd run offsets only, expressed as
    a gaps-and-islands window (run key = pos − row_number over matches),
    not an imperative scan. Output: one row per round (round, left,
    right, pair count at selection time) — integer/string only, fully
    hash-checked against the identical unrolled CTE chain in DuckDB.

    Scale: every stage is a per-doc window (doc_id-partitioned — linear,
    co-partitioned across rounds) or a pair-count aggregation bounded by
    vocabulary², with the winning pair broadcast back as a 1-row hash
    join. The token stream persists per round to cut the 3-round
    lineage; at 100 TB this is the standard checkpoint-per-iteration
    posture (as in graph.py's Pregel loop)."""
    d = t(spark, sf_dir, "documents")
    stream = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok")

    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    tops = []
    cached = []
    for r in range(1, _BPE_ROUNDS + 1):
        pr = stream.withColumn("nxt", F.lead("tok").over(w_doc)).persist()
        cached.append(pr)
        top = (
            pr.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("tok").alias("l"), F.col("nxt").alias("rt"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), "l", "rt")
            .limit(1)
        )
        tops.append(
            top.select(
                F.lit(r).alias("merge_round"),
                F.col("l").alias("left_tok"),
                F.col("rt").alias("right_tok"),
                F.col("c").cast("long").alias("pair_count"),
            )
        )
        cand = (
            pr.join(
                F.broadcast(top),
                (F.col("tok") == F.col("l")) & (F.col("nxt") == F.col("rt")),
            )
            .select("doc_id", "pos")
            .withColumn("rn", F.row_number().over(w_doc))
        )
        sel = (
            cand.withColumn(
                "k",
                F.row_number().over(
                    Window.partitionBy(
                        "doc_id", (F.col("pos") - F.col("rn"))
                    ).orderBy("pos")
                ),
            )
            .filter(F.col("k") % 2 == 1)
            .select("doc_id", "pos")
        )
        m = sel.select(
            F.col("doc_id").alias("m_doc"), F.col("pos").alias("m_pos")
        )
        dropped = sel.select(
            F.col("doc_id").alias("d_doc"), (F.col("pos") + 1).alias("d_pos")
        )
        stream = (
            pr.join(
                m,
                (F.col("doc_id") == F.col("m_doc"))
                & (F.col("pos") == F.col("m_pos")),
                "left",
            )
            .join(
                dropped,
                (F.col("doc_id") == F.col("d_doc"))
                & (F.col("pos") == F.col("d_pos")),
                "left_anti",
            )
            .select(
                "doc_id",
                "pos",
                F.when(
                    F.col("m_pos").isNotNull(),
                    F.concat("tok", F.lit("+"), "nxt"),
                )
                .otherwise(F.col("tok"))
                .alias("tok"),
            )
            .withColumn("pos", F.row_number().over(w_doc).cast("long"))
        )
    out = reduce(lambda a, b: a.unionAll(b), tops)
    return out
