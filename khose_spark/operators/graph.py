"""Near-duplicate cluster resolution: connected components over the
exact-Jaccard near-dup pair graph (SURVEY.md §2.8 family).

Pairwise near-dup detection is only half of corpus dedup — transitive
chains (A~B, B~C but A!~C) must collapse into ONE keep-decision, which
is a connected-components problem. The production pipelines behind the
big open corpora (CCNet / SlimPajama-style) all end their MinHash stage
with exactly this step.

Spark side: Pregel-style min-label propagation — each node repeatedly
takes the min label over itself and its neighbors until a fixpoint.
Deterministic (converges to the component-min doc_id regardless of
execution order), needs O(diameter) rounds; near-dup components are
clique-like, so the diameter is small. Each round is one shuffle keyed
on node id; lineage is cut per round so the plan doesn't snowball. At
100 TB scale the same loop runs with the large-star/small-star
contraction refinement (fewer rounds on high-diameter graphs); the
fixpoint-loop structure is identical.

DuckDB oracle: recursive transitive closure (UNION-distinct fixpoint)
with the min-label aggregation OUTSIDE the recursive term (standard SQL
forbids aggregates inside), over the same Jaccard >= 0.8 edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from khose_spark.operators.llm import q_llm_neardup_jaccard
from khose_spark.registry import query
from khose_spark.tables import t

_JACCARD_EDGES_CTES = """
    words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(w) - 1, 1)),
                 i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
        FROM words
      ) WHERE len(string_split(shingle, ' ')) = 3
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8
    )
"""


def connected_components(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """(node, rep) for every node in ``edges`` (cols id_a, id_b), where
    rep is the minimum node id of its connected component.

    Min-label propagation to fixpoint. The per-round convergence probe
    (one scalar count per round) is driver-side by design — iterative
    graph algorithms are the documented exception to the no-driver-loop
    rule; the data itself never leaves the executors."""
    sym = edges.select(
        F.col("id_a").alias("node"), F.col("id_b").alias("peer")
    ).unionAll(edges.select(F.col("id_b").alias("node"), F.col("id_a").alias("peer")))
    # localCheckpoint (not persist): each round's result is materialized
    # and its LOGICAL PLAN replaced by a scan of the materialized blocks,
    # so round N's plan doesn't embed rounds 1..N-1 — without this the
    # lineage (and the plan string) grows by two joins per round.
    sym = sym.localCheckpoint()
    # Seed: min over self + direct neighbors (round 1 done in the seed).
    labels = (
        sym.groupBy("node")
        .agg(F.min("peer").alias("rep"))
        .select("node", F.least("rep", F.col("node")).alias("rep"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        peer_reps = (
            sym.join(labels.withColumnRenamed("node", "peer"), "peer")
            .groupBy("node")
            .agg(F.min("rep").alias("peer_rep"))
        )
        new_labels = (
            labels.join(peer_reps, "node", "left")
            .select(
                "node",
                F.least(
                    "rep", F.coalesce("peer_rep", F.col("rep"))
                ).alias("rep"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(
                labels.withColumnRenamed("rep", "old_rep"), "node"
            )
            .filter(F.col("rep") != F.col("old_rep"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")


@query(
    "q_llm_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_EDGES_CTES},
    sym AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    node_reach AS (
      SELECT a, b FROM reach
      UNION SELECT DISTINCT a, a FROM sym
    ),
    labels AS (
      SELECT a AS doc_id, min(b) AS rep FROM node_reach GROUP BY a
    )
    SELECT rep AS cluster_rep, count(*) AS n_docs,
           CAST(count(*) - 1 AS BIGINT) AS n_dropped
    FROM labels GROUP BY rep
    """,
)
def q_llm_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse exact-Jaccard near-dup pairs (>= 0.8) into dedup
    clusters via connected components; per cluster emit the canonical
    keeper (min doc_id), the cluster size, and how many documents a
    keep-one policy drops. Singleton documents (no near-dup edge) are
    not cluster members and are absent by construction."""
    pairs = q_llm_neardup_jaccard(spark, sf_dir).select("id_a", "id_b")
    labels = connected_components(pairs)
    return labels.groupBy(F.col("rep").alias("cluster_rep")).agg(
        F.count("*").alias("n_docs"),
        (F.count("*") - 1).cast("long").alias("n_dropped"),
    )


@query(
    "q_llm_dedup_apply",
    oracle=f"""
    WITH RECURSIVE {_JACCARD_EDGES_CTES},
    sym AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(a, b) AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
    ),
    node_reach AS (
      SELECT a, b FROM reach
      UNION SELECT DISTINCT a, a FROM sym
    ),
    labels AS (
      SELECT a AS doc_id, min(b) AS rep FROM node_reach GROUP BY a
    ),
    drops AS (
      SELECT doc_id FROM labels WHERE doc_id != rep
    )
    SELECT lang,
           count(*) FILTER (WHERE drops.doc_id IS NULL) AS n_kept,
           count(*) FILTER (WHERE drops.doc_id IS NOT NULL) AS n_dropped,
           CAST(sum(n_chars) FILTER (WHERE drops.doc_id IS NULL)
                AS BIGINT) AS chars_kept
    FROM documents LEFT JOIN drops USING (doc_id)
    GROUP BY lang
    """,
)
def q_llm_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup pipeline APPLIED: run clustering, drop every cluster
    member except the min-doc_id keeper, and report the per-language
    retention audit (kept/dropped doc counts, kept chars) — the actual
    output contract of a corpus dedup stage. The drop list is one row
    per discarded doc (tiny vs the corpus) and anti-joins back into
    documents as a broadcast."""
    pairs = q_llm_neardup_jaccard(spark, sf_dir).select("id_a", "id_b")
    labels = connected_components(pairs)
    drops = labels.filter(F.col("node") != F.col("rep")).select(
        F.col("node").alias("doc_id")
    )
    docs = t(spark, sf_dir, "documents").join(
        F.broadcast(drops.withColumn("dropped", F.lit(1))), "doc_id", "left"
    )
    kept = F.col("dropped").isNull()
    return docs.groupBy("lang").agg(
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum(F.col("dropped").isNotNull().cast("long")).alias("n_dropped"),
        F.sum(F.when(kept, F.col("n_chars"))).alias("chars_kept"),
    )
