"""Fixed-k twins of the ANN / clustering family (round 9, VERDICT r08
item 1 — the top-next item).

The registered q_llm_ann_ivf / q_llm_ann_pq* / q_llm_kmeans /
q_ml_silhouette / q_llm_semdedup keys use the SAMPLED-codebook fixture
contract: k = n/50 centroids taken from the data (``vec_id % 50 == 0``),
which makes the assign stage n·k = n²/50 distance evaluations in BOTH
engines — superlinear by construction, the single reason the whole
family sat in ``SCALE100_SKIP``. Production ANN fixes k; these twins
pin that production contract so the family has a scale-LINEAR,
100×-runnable registered form, while the sampled originals remain the
fixture-scale truth twins (the q_llm_minhash_det /
q_llm_lsh_threshold_sweep precedent).

Fixed seed contract (engine-portable, scale-stable): the 64 vectors
with the smallest ``md5(CAST(vec_id AS VARCHAR))`` digests, dense ids
0..63 assigned by vec_id rank within the selected set. md5 is
bit-identical in Spark and DuckDB; selection is one linear
TakeOrdered, never a full sort; k stays 64 at EVERY corpus size, so
assignment is 64 distance evals per vector forever.

Keys:
- ``q_llm_ann_ivf_fixedk``      — IVF probe-1 search over 64 cells
- ``q_llm_ann_pq_fixedk``       — PQ/ADC search, 64-code codebook
- ``q_llm_ann_pq_indexed_fixedk`` — build-once/search-many split
- ``q_llm_ann_pq_rerank_fixedk`` — IVFPQ+R exact refinement (R=50)
- ``q_llm_kmeans_fixedk``       — 3 Lloyd iterations from the 64 seeds
- ``q_ml_silhouette_fixedk``    — simplified silhouette of that run
- ``q_llm_semdedup_fixedk``     — cluster-route + in-cluster SRP-band
  candidates + exact cosine verify (the only member whose within-
  cluster prune would be n²/64 with fixed k alone; the 8-bit SRP band
  prefilter inside each cluster restores collision-bounded cost)
"""

from __future__ import annotations

import hashlib
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from khose_spark.operators.similarity import (
    _KM_ITERS,
    _PQ_BUCKETS,
    _PQ_ORACLE,
    _PQ_RERANK_ORACLE,
    _PQ_RERANK_R,
    _SEMDEDUP_THRESH,
    _km_oracle,
    _l2sq,
    _lloyd,
    _pq_lut,
    _pq_search,
    _pq_subvectors,
    _silhouette_oracle,
    _srp_planes,
)
from khose_spark.registry import query
from khose_spark.tables import t
from khose_spark.vecexec import (
    map_arrow_vectors,
    round_half_up,
    seq_dot,
    seq_l2sq,
    seq_sq,
)

_FIXED_K = 64

# ---------------------------------------------------------------------------
# Shared fixed-seed machinery
# ---------------------------------------------------------------------------

# SQL twin of fixed_seeds(): requires a `base` CTE with (vec_id, v).
_FK_CENT_SQL = f"""
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v AS cv
      FROM (SELECT vec_id, v FROM base
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {_FIXED_K}) fs
    """


def fixed_seeds(base: DataFrame, k: int = _FIXED_K) -> DataFrame:
    """The fixed codebook: k md5-ranked seed vectors as (cid, cv) with
    dense cids 0..k−1 by vec_id order. Selection is a TakeOrdered (no
    global sort); the k-row window that assigns dense ids runs on a
    k-row relation, so the single-partition window is constant-size by
    construction."""
    sel = (
        base.select(
            "vec_id", "v", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(k)
    )
    w = Window.orderBy("vec_id")
    return sel.select(
        (F.row_number().over(w) - 1).cast("long").alias("cid"),
        F.col("v").alias("cv"),
    )


def _dbl_base(e: DataFrame) -> DataFrame:
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select("vec_id", dbl.alias("v"))


def _collect_cents(cent: DataFrame) -> list[tuple[int, list[float]]]:
    """Materialize the fixed-k codebook to the driver, cid-ascending.
    Bounded by the fixed-k CONTRACT (k = 64 rows, ~32 KB at any corpus
    size) — the sanctioned bounded-collect class (the 10-row GEMM query
    block in similarity.py is the precedent). Never call this for the
    sampled (k = n/50) twins."""
    rows = cent.collect()
    rows.sort(key=lambda r: r["cid"])
    return [(int(r["cid"]), [float(x) for x in r["cv"]]) for r in rows]


def _assign_min_l2_vec(e: DataFrame, cents) -> DataFrame:
    """(vec_id, v, cid) nearest-centroid assignment as ONE Arrow batch
    kernel instead of the interpreted broadcast argmin fold (r13
    optimization, guide §4.2). Takes the RAW embeddings relation — the
    float→double widening happens inside the kernel (exact cast, so it
    is bit-identical to the _dbl_base transform HOF, which this skips).
    Bit-identical by the vecexec exactness discipline: dim-sequential
    L2² fold, half-up round(6), first-min tiebreak over the
    cid-ascending codebook — the same contract as _lloyd's aggregate()
    fold and the oracles' row_number ORDER BY (d2, cid)."""
    import numpy as np

    from khose_spark.vecexec import matrix_to_list_array

    cids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.array([cv for _, cv in cents], dtype=np.float64)

    def fn(mats, batch):
        V = mats["embedding"]
        d2 = round_half_up(seq_l2sq(V, C), 6)
        return {
            "vec_id": batch.column("vec_id"),
            "v": matrix_to_list_array(V),
            "cid": cids[d2.argmin(axis=1)],
        }

    return map_arrow_vectors(
        e.select("vec_id", "embedding"),
        "vec_id bigint, v array<double>, cid bigint",
        fn,
        {"embedding": 64},
    )


def _assign_max_cos_vec(e: DataFrame, cents) -> DataFrame:
    """(vec_id, v, cid) nearest-cell assignment by COSINE via the Arrow
    kernel — the vectorized form of the crossJoin + round(_cos, 6)
    row_number(DESC sim, ASC cid) chain, fed by the RAW embeddings
    (in-kernel exact widening). Exactness: seq dot fold /
    (√seqΣv² · √seqΣc²) per pair, half-up round(6), first-max = the
    smallest-cid tiebreak over the cid-ascending codebook."""
    import numpy as np

    from khose_spark.vecexec import matrix_to_list_array

    cids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.array([cv for _, cv in cents], dtype=np.float64)
    nc = np.sqrt(seq_sq(C))

    def fn(mats, batch):
        V = mats["embedding"]
        sim = round_half_up(
            seq_dot(V, C) / (np.sqrt(seq_sq(V))[:, None] * nc[None, :]), 6
        )
        return {
            "vec_id": batch.column("vec_id"),
            "v": matrix_to_list_array(V),
            "cid": cids[sim.argmax(axis=1)],
        }

    return map_arrow_vectors(
        e.select("vec_id", "embedding"),
        "vec_id bigint, v array<double>, cid bigint",
        fn,
        {"embedding": 64},
    )


def _cos(a: str, b: str):
    """Sequential-fold cosine — identical expression tree to the IVF /
    semdedup originals, so rounded values are bit-identical."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    )
    return dot / (F.sqrt(sq(a)) * F.sqrt(sq(b)))


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


@query(
    "q_llm_ann_ivf_fixedk",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent AS (
{_FK_CENT_SQL}
    ), assign AS (
      SELECT vec_id, cid FROM (
        SELECT b.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY round(list_cosine_similarity(b.v, c.cv), 6) DESC, c.cid ASC
               ) AS rn
        FROM base b CROSS JOIN cent c
      ) WHERE rn = 1
    ), probe AS (
      SELECT b.vec_id AS qid, b.v AS qv, a.cid
      FROM base b JOIN assign a ON a.vec_id = b.vec_id
      WHERE b.vec_id < 10
    ), cell_sims AS (
      SELECT p.qid, b.vec_id,
             round(list_cosine_similarity(p.qv, b.v), 4) AS sim
      FROM probe p
      JOIN assign a ON a.cid = p.cid
      JOIN base b ON b.vec_id = a.vec_id
      WHERE b.vec_id <> p.qid
    )
    SELECT qid, vec_id AS neighbor_id, sim, rn AS rank FROM (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
      FROM cell_sims
    ) WHERE rn <= 3
    """,
)
def q_llm_ann_ivf_fixedk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors over the FIXED 64-seed
    codebook — the scale-linear twin of q_llm_ann_ivf (whose sampled
    k = n/50 contract makes assignment n²/50; that form stays as the
    fixture-scale truth twin). Assignment cost here is 64 cosine evals
    per vector at ANY corpus size; each query probes only its own cell
    and exact-reranks inside it. Same determinism contract as the
    original: argmax on round(sim, 6) with centroid-id tiebreak,
    round(4) + id tiebreak on the final ranking.

    Plan: one TakeOrdered seed selection, corpus × broadcast-64 assign
    (map-side), per-vector argmax window, probe join, cell-scoped
    rerank. At 100 TB the corpus never shuffles for assignment; the
    only shuffles carry (vec_id, cid) pairs."""
    base = _dbl_base(t(spark, sf_dir, "embeddings"))
    cent = fixed_seeds(base)
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("asim"), F.asc("cid")
    )
    assign = (
        base.crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "cid", F.round(_cos("v", "cv"), 6).alias("asim")
        )
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )
    probe = (
        base.filter(F.col("vec_id") < 10)
        .join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "cid"
        )
    )
    members = assign.join(base, "vec_id").select("cid", "vec_id", "v")
    cell_sims = (
        F.broadcast(probe)
        .join(members, "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", F.round(_cos("qv", "v"), 4).alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cell_sims.select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            "sim",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


# ---------------------------------------------------------------------------
# PQ family: fixed 64-code codebook
# ---------------------------------------------------------------------------

# The fixedk PQ oracles are the SAMPLED oracles with ONLY the codebook
# CTE swapped (assign/LUT/ADC stages definitionally identical), built
# by exact string surgery with an existence assertion so drift in the
# shared chain can never silently fork the twins.
_PQ_CB_SAMPLED = """    ), cb AS (       -- deterministic codebook: seed vectors' slices
      SELECT vec_id // 50 AS code, sub_id, sv AS cv
      FROM sub WHERE vec_id % 50 = 0
    ), assign AS ("""
_PQ_CB_FIXED = f"""    ), cbseed AS (   -- fixed-k codebook: 64 md5-ranked seed vectors
      SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS code
      FROM (SELECT vec_id FROM base
            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
            LIMIT {_FIXED_K}) fs
    ), cb AS (
      SELECT f.code, s.sub_id, s.sv AS cv
      FROM cbseed f JOIN sub s ON s.vec_id = f.vec_id
    ), assign AS ("""

assert _PQ_CB_SAMPLED in _PQ_ORACLE, "PQ oracle chain drifted"
assert _PQ_CB_SAMPLED in _PQ_RERANK_ORACLE, "PQ rerank oracle drifted"
_PQ_ORACLE_FIXEDK = _PQ_ORACLE.replace(_PQ_CB_SAMPLED, _PQ_CB_FIXED)
_PQ_RERANK_ORACLE_FIXEDK = _PQ_RERANK_ORACLE.replace(
    _PQ_CB_SAMPLED, _PQ_CB_FIXED
)


def _pq_fixed_codebook(sub: DataFrame) -> DataFrame:
    """Fixed 64-entry PQ codebook: the 8 subvector slices of each
    md5-ranked seed vector, code = dense seed rank (0..63)."""
    seeds = (
        sub.filter(F.col("sub_id") == 0)
        .select(
            "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h", "vec_id")
        .limit(_FIXED_K)
    )
    w = Window.orderBy("vec_id")
    coded = seeds.select(
        "vec_id", (F.row_number().over(w) - 1).cast("long").alias("code")
    )
    return sub.join(F.broadcast(coded), "vec_id").select(
        "code", "sub_id", F.col("sv").alias("cv")
    )


def _pq_fixed_assign(sub: DataFrame, cb: DataFrame) -> DataFrame:
    """PQ encoding against the fixed codebook — same argmin contract as
    similarity._pq_assign (round(L2²,6), code tiebreak); re-stated here
    so the twins share the oracle chain, not the sampled plan object."""
    from khose_spark.operators.similarity import _pq_assign

    return _pq_assign(sub, cb)


def _collect_pq_cb(cb: DataFrame):
    """(8, 64, 8) fixed PQ codebook tensor on the driver — 512 rows,
    bounded by the fixed-k contract (the _collect_cents class)."""
    import numpy as np

    from khose_spark.operators.similarity import _PQ_DIM, _PQ_M

    CB = np.zeros((_PQ_M, _FIXED_K, _PQ_DIM))
    rows = cb.collect()
    # ADVICE r13 item 2: the tensor is zero-initialized, so a corpus
    # yielding fewer than 8×64 codebook rows would leave phantom
    # all-zero codes that the kernel argmin could rank (the expression
    # path only ranks codes that exist). Fail loudly instead.
    assert len(rows) == _PQ_M * _FIXED_K, (
        f"fixed PQ codebook collected {len(rows)} rows, expected "
        f"{_PQ_M * _FIXED_K} — corpus too small for the fixed-k contract"
    )
    for r in rows:
        CB[int(r["sub_id"]), int(r["code"])] = [float(x) for x in r["cv"]]
    return CB


def _pq_fixed_codes_vec(
    e: DataFrame, CB, cell_cents=None
) -> DataFrame:
    """PQ-encode the corpus against the FIXED 64-entry codebook in one
    Arrow pass (r13): per vector, 8 subspace argmins over the 64 codes
    — the vectorized form of _pq_assign's exploded (corpus×codes) grid
    + row_number window, whose window shuffle dominated the index
    builds. Exactness: the unrolled t1+…+t8 term order of _pq_l2sq per
    (slice, code), half-up round(6), first-min = code-ascending
    tiebreak. With ``cell_cents`` the kernel ALSO emits each vector's
    IVF cell id (the _assign_max_cos_vec contract), fusing the ivfpq
    build's cell assignment + code join into the same pass."""
    import numpy as np

    from khose_spark.operators.similarity import _PQ_DIM, _PQ_M

    if cell_cents is not None:
        cell_cids = np.array([c for c, _ in cell_cents], dtype=np.int64)
        C = np.array([cv for _, cv in cell_cents], dtype=np.float64)
        nc = np.sqrt(seq_sq(C))

    def fn(mats, batch):
        import numpy as np

        V = mats["embedding"]
        n = V.shape[0]
        codes = np.empty((n, _PQ_M), dtype=np.int64)
        for s in range(_PQ_M):
            sl = V[:, s * _PQ_DIM : (s + 1) * _PQ_DIM]
            S = CB[s]
            acc = None
            for i in range(_PQ_DIM):
                d = sl[:, i, None] - S[None, :, i]
                tsq = d * d
                acc = tsq if acc is None else acc + tsq
            codes[:, s] = round_half_up(acc, 6).argmin(axis=1)
        vec_id = batch.column("vec_id").to_numpy(zero_copy_only=False)
        out = {
            "vec_id": np.repeat(vec_id, _PQ_M),
            "sub_id": np.tile(np.arange(_PQ_M, dtype=np.int32), n),
            "code": codes.reshape(-1),
        }
        if cell_cents is not None:
            sim = round_half_up(
                seq_dot(V, C)
                / (np.sqrt(seq_sq(V))[:, None] * nc[None, :]),
                6,
            )
            out["cid"] = np.repeat(cell_cids[sim.argmax(axis=1)], _PQ_M)
        return out

    schema = "vec_id bigint, sub_id int, code bigint"
    if cell_cents is not None:
        schema += ", cid bigint"
    return map_arrow_vectors(
        e.select("vec_id", "embedding"), schema, fn, {"embedding": 64}
    )


@query("q_llm_ann_pq_fixedk", oracle=_PQ_ORACLE_FIXEDK)
def q_llm_ann_pq_fixedk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with the FIXED 64-code codebook — the
    scale-linear twin of q_llm_ann_pq: encoding costs 8×64 small-L2
    evals per vector at any corpus size (the sampled form's codebook
    grows as n/50, making encode n²/50 — it remains the fixture truth
    twin). Queries precompute a 512-row (subspace, code) LUT and the
    asymmetric distance is 8 LUT additions per code — the FAISS
    layout, now with the production constant-k property.

    Determinism: identical contracts to the sampled twin (round(L2²,6)
    + code tiebreak on assignment; round(ADC,4) + id tiebreak on
    ranking)."""
    e = t(spark, sf_dir, "embeddings")
    sub = _pq_subvectors(e)
    cb = _pq_fixed_codebook(sub)
    # r13: corpus encode via the Arrow kernel (one pass, no exploded
    # grid window); the 10-query LUT stays on the expression path.
    return _pq_search(
        _pq_fixed_codes_vec(e, _collect_pq_cb(cb)), _pq_lut(sub, cb)
    )


_PQF_INDEX_CACHE: dict[tuple[str, str], tuple[str, str]] = {}


def build_pq_index_fixedk(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """INDEX-BUILD job for the fixed-k PQ lifecycle — same two-table
    layout as similarity.build_pq_index (codes bucketed by vec_id so
    the search job's ADC aggregation needs no exchange; codebook is a
    broadcast dim), but encoding against the constant 64-code codebook,
    which is what makes the BUILD job linear at any corpus size."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _PQF_INDEX_CACHE.get(key)
    if hit is not None:
        return hit
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    codes_tbl, cb_tbl = f"pqf_codes_{tag}", f"pqf_codebook_{tag}"
    loc = tempfile.mkdtemp(prefix=f"khose_pqf_{tag}_")
    e = t(spark, sf_dir, "embeddings")
    sub = _pq_subvectors(e)
    cb = _pq_fixed_codebook(sub)
    spark.sql(f"DROP TABLE IF EXISTS {codes_tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {cb_tbl}")
    (
        _pq_fixed_codes_vec(e, _collect_pq_cb(cb))
        .write.format("parquet")
        .bucketBy(_PQ_BUCKETS, "vec_id")
        .option("path", f"{loc}/codes")
        .saveAsTable(codes_tbl)
    )
    (
        cb.write.format("parquet")
        .option("path", f"{loc}/codebook")
        .saveAsTable(cb_tbl)
    )
    _PQF_INDEX_CACHE[key] = (codes_tbl, cb_tbl)
    return codes_tbl, cb_tbl


@query("q_llm_ann_pq_indexed_fixedk", oracle=_PQ_ORACLE_FIXEDK)
def q_llm_ann_pq_indexed_fixedk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEARCH job of the fixed-k PQ lifecycle (same answer as
    q_llm_ann_pq_fixedk — the shared oracle certifies the split
    changes nothing): read the bucketed codes + 64-entry codebook
    written by :func:`build_pq_index_fixedk`, slice only the query
    vectors, broadcast-LUT ADC top-3. The codes scan carries its
    bucket distribution through the broadcast LUT join into the
    (qid, vec_id) aggregation — zero shuffle before the final ranking
    window, exactly like the sampled twin
    (tests/test_bucketing.py posture)."""
    codes_tbl, cb_tbl = build_pq_index_fixedk(spark, sf_dir)
    codes = spark.table(codes_tbl)
    cb = spark.table(cb_tbl)
    qsub = _pq_subvectors(
        t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    )
    return _pq_search(codes, _pq_lut(qsub, cb))


@query("q_llm_ann_pq_rerank_fixedk", oracle=_PQ_RERANK_ORACLE_FIXEDK)
def q_llm_ann_pq_rerank_fixedk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVFPQ+R over the fixed-k index: ADC ranks the corpus from the
    8-byte codes, keeps a top-R (=50) candidate pool per query, and
    re-ranks the pool by EXACT full-precision L2² (round-4, id
    tiebreak) — the refinement stage that makes the coarse 64-code
    quantizer production-usable: codebook distortion bounds only
    CANDIDATE recall, never the final ordering. Same R and contracts
    as q_llm_ann_pq_rerank; with the constant codebook both the encode
    and the search stay linear, so this is the registered ANN form
    that runs on the 100× digest board.

    Plan: zero-shuffle ADC over bucketed codes, then the R×|queries|
    candidate pool broadcasts against the embeddings scan — the corpus
    is read, never shuffled."""
    codes_tbl, cb_tbl = build_pq_index_fixedk(spark, sf_dir)
    codes = spark.table(codes_tbl)
    cb = spark.table(cb_tbl)
    e = t(spark, sf_dir, "embeddings")
    qsub = _pq_subvectors(e.filter(F.col("vec_id") < 10))
    cand = _pq_search(codes, _pq_lut(qsub, cb), k=_PQ_RERANK_R).select(
        "qid", F.col("neighbor_id").alias("cand_id")
    )
    base = _dbl_base(e)
    qv = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_vec"), F.col("v").alias("qv")
    )
    pool = cand.join(F.broadcast(qv), F.col("qid") == F.col("q_vec"))
    exact_dist = F.round(
        F.aggregate(
            F.zip_with("qv", "v", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        4,
    )
    w = Window.partitionBy("qid").orderBy(
        F.asc("exact_dist"), F.asc("neighbor_id")
    )
    return (
        base.join(F.broadcast(pool), F.col("vec_id") == F.col("cand_id"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            exact_dist.alias("exact_dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# k-means + silhouette from the fixed seeds
# ---------------------------------------------------------------------------


# (applicationId, sf_dir) -> (cents_assign, cents_final): the two k=64
# centroid LISTS that reproduce the Lloyd outcome — cents_assign is the
# codebook the FINAL assignment pass used (after _KM_ITERS-1
# re-averages), cents_final the re-average of that assignment. ~64 KB
# of driver-side floats per entry, so unlike the corpus-sized
# checkpoint memos there is no §5 footprint to lifecycle; cleared by
# plancheck.reset_plan_state like every cross-query memo.
_FIXED_LLOYD_CACHE: dict[tuple[str, str], tuple[list, list]] = {}


def _fixed_lloyd(spark: SparkSession, sf_dir: str):
    """3 Lloyd iterations from the fixed 64 seeds, with the assignment
    stage vectorized (r13): each iteration is one Arrow argmin kernel
    over the corpus + the unchanged k-keyed Spark re-average (round(6)
    per dimension — identical partial-aggregation layout, so the
    averages are bit-identical to the HOF-fold build). The k-row
    codebook round-trips through the driver per iteration (fixed-k
    bounded-collect class) instead of a localCheckpoint — same job
    count, no interpreted fold. Shares the determinism contract of
    similarity._lloyd verbatim; the sampled twins stay on _lloyd.

    r14 (VERDICT item 3): two structural fixes, zero arithmetic change —
    - the FINAL iteration's assignment is persisted before its
      re-average is collected, so the consumer's follow-up pass (kmeans
      member stats, the silhouette kernel) reads the cached assignment
      instead of re-running the iteration-3 kernel over the corpus
      (4 corpus passes -> 3 for the first consumer);
    - the converged centroid lists (k=64, ~64 KB) are memoized per
      (applicationId, sf_dir), so the SECOND consumer in a session
      (q_ml_silhouette_fixedk after q_llm_kmeans_fixedk) rebuilds its
      assignment with ONE deterministic kernel pass instead of
      re-running all three Lloyd iterations (4 passes -> 1).
    Assignment is a pure function of the codebook (round(6) argmin,
    first-min cid tiebreak), so the rebuilt relation is bit-identical
    to the one the building consumer saw — oracle hashes certify."""
    from khose_spark.operators.similarity import _KM_DIM

    e = t(spark, sf_dir, "embeddings")
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _FIXED_LLOYD_CACHE.get(key)
    if hit is not None:
        cents_assign, cents_final = hit
        assign = _assign_min_l2_vec(e, cents_assign)
        cent = spark.createDataFrame(
            [(c, cv) for c, cv in cents_final],
            "cid bigint, cv array<double>",
        )
        return assign, cent

    cents = _collect_cents(fixed_seeds(_dbl_base(e)))
    assign = None
    for it in range(_KM_ITERS):
        assign = _assign_min_l2_vec(e, cents)
        if it == _KM_ITERS - 1:
            # The consumer's next job over `assign` hits the cache the
            # re-average collect below just materialized.
            assign = assign.persist()
            cents_assign = cents
        cent_df = assign.groupBy("cid").agg(
            F.array(
                *[
                    F.round(F.avg(F.element_at("v", i)), 6)
                    for i in range(1, _KM_DIM + 1)
                ]
            ).alias("cv")
        )
        cents = _collect_cents(cent_df)
    _FIXED_LLOYD_CACHE[key] = (cents_assign, cents)
    cent = assign.sparkSession.createDataFrame(
        [(c, cv) for c, cv in cents], "cid bigint, cv array<double>"
    )
    return assign, cent


@query("q_llm_kmeans_fixedk", oracle=_km_oracle(_FK_CENT_SQL))
def q_llm_kmeans_fixedk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means from the FIXED 64 md5-ranked seeds, 3
    Lloyd iterations — the scale-linear twin of q_llm_kmeans: per
    iteration, assignment is a map-side argmin fold over a ONE-ROW
    broadcast of 64 centroids (64 distance evals per vector at any
    corpus size) + one k-keyed re-average; the sampled n/50 form —
    whose growing codebook is the declared n²/50 fixture contract —
    stays as the fixture-scale truth twin. Identical determinism
    contract (argmin on round(L2²,6) with cid tiebreak, per-round
    round(6) centroid re-sync) via the SHARED _lloyd helper, so the
    only difference between the twins is the seed CTE."""
    from khose_spark.vecexec import pair_metric

    assign, cent = _fixed_lloyd(spark, sf_dir)
    assign = assign.persist()
    cent = cent.persist()
    # r13: the member→centroid distance runs through the Arrow l2
    # kernel (√ of the dim-sequential fold, unrounded — the round(4)
    # stays on the avg, exactly as before).
    dist = pair_metric(
        assign.join(F.broadcast(cent), "cid").select("cid", "v", "cv"),
        ["cid"],
        "v",
        "cv",
        "l2",
        None,
        "d",
    )
    stats = dist.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("d"), 4).alias("avg_dist"),
    )
    out = stats.join(F.broadcast(cent), "cid").select(
        F.col("cid").alias("cluster_id"),
        "n_members",
        "avg_dist",
        *[
            F.round(F.element_at("cv", i), 6).alias(f"c{i}")
            for i in range(1, 5)
        ],
    ).localCheckpoint()
    assign.unpersist()
    cent.unpersist()
    return out


@query("q_ml_silhouette_fixedk", oracle=_silhouette_oracle(_FK_CENT_SQL))
def q_ml_silhouette_fixedk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified-silhouette audit of the q_llm_kmeans_fixedk
    clustering — same shared _lloyd chain from the fixed 64 seeds, same
    a/b broadcast-fold as q_ml_silhouette (per-point distances and s
    round to 6 before the mean, one round(4) at the boundary). With
    constant k the whole audit is one map-side pass + one 64-row
    rollup at any corpus size."""
    import numpy as np

    assign, cent = _fixed_lloyd(spark, sf_dir)
    cents = _collect_cents(cent)
    # ADVICE r13 item 3: with a single occupied cluster the masked-inf
    # min below would yield b = +inf where the old array_min-over-empty
    # expression produced null. The fixed-k contract (64 md5-ranked
    # seeds over distinct vectors) never collapses to one cluster;
    # assert it so a degenerate fixture fails loudly, not divergently.
    assert len(cents) > 1, (
        "silhouette_fixedk: Lloyd collapsed to a single cluster — "
        "b-distance semantics diverge from the expression path"
    )
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.array([cv for _, cv in cents], dtype=np.float64)

    # One Arrow pass computes the per-point a/b/s instead of the
    # interpreted transform/filter/array_min chain (r13, guide §4.2).
    # Exactness: per-centroid d = round(sqrt(seq L2² fold), 6) — sqrt
    # is correctly-rounded IEEE in both engines — a = d[own], b =
    # min(d[other]), s = round((b−a)/greatest(a,b), 6), all replicated
    # by the vecexec kernels.
    def fn(mats, batch):
        d = round_half_up(np.sqrt(seq_l2sq(mats["v"], C)), 6)
        own = batch.column("cid").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(cids, own)
        rows = np.arange(d.shape[0])
        a = d[rows, pos]
        masked = d.copy()
        masked[rows, pos] = np.inf
        b = masked.min(axis=1)
        s = round_half_up((b - a) / np.maximum(a, b), 6)
        return {"cid": batch.column("cid"), "s": s}

    sil = map_arrow_vectors(
        assign.select("cid", "v"),
        "cid bigint, s double",
        fn,
        {"v": 64},
    )
    # r14: materialize the 64-row rollup eagerly (localCheckpoint below
    # the final sort), then unpersist the Lloyd assignment cache that
    # _fixed_lloyd pinned on a cold build — a no-op when this key runs
    # on the memo-hit single-pass path. Same release discipline as
    # q_llm_kmeans_fixedk; rows/ordering unchanged (the orderBy stays
    # on top of the checkpoint).
    out = (
        sil.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("s"), 4).alias("silhouette_avg"),
            F.sum((F.col("s") < 0).cast("long")).alias("n_negative"),
        )
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            "silhouette_avg",
            "n_negative",
        )
        .localCheckpoint()
    )
    assign.unpersist()
    return out.orderBy("cluster_id")


# ---------------------------------------------------------------------------
# SemDeDup with fixed routing + in-cluster SRP banding
# ---------------------------------------------------------------------------

_SD_BAND_BITS = 8  # 2 bands × 8 bits from the 16 SRP planes


def _srp_planes_sql() -> str:
    """planes CTE body (16 md5-derived hyperplanes) — the q_llm_lsh_srp
    oracle's construction verbatim."""
    return """
      SELECT p, list_transform(range(1, 65),
               d -> (instr('0123456789abcdef',
                           substr(md5(concat(CAST(p AS VARCHAR), '_',
                                             CAST(d AS VARCHAR))), 1, 1))
                     - 1 - 7.5) / 7.5) AS hp
      FROM range(0, 16) t(p)
    """


@query(
    "q_llm_semdedup_fixedk",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent AS (
{_FK_CENT_SQL}
    ), assign AS (
      SELECT vec_id, v, cid FROM (
        SELECT b.vec_id, b.v, c.cid,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY round(list_sum(list_transform(range(1, 65),
                           i -> (b.v[i] - c.cv[i]) ^ 2)), 6) ASC, c.cid ASC
               ) AS rn
        FROM base b CROSS JOIN cent c
      ) WHERE rn = 1
    ), planes AS ({_srp_planes_sql()}
    ), bits AS (
      SELECT vec_id, p,
             CASE WHEN round(list_dot_product(v, hp), 6) > 0
                  THEN 1 ELSE 0 END AS bit
      FROM base CROSS JOIN planes
    ), bands AS (
      SELECT vec_id, CAST(p // {_SD_BAND_BITS} AS INT) AS band,
             CAST(sum(bit * CAST(pow(2, p % {_SD_BAND_BITS}) AS INT))
                  AS INT) AS code
      FROM bits GROUP BY 1, 2
    ), keyed AS (
      SELECT a.vec_id, a.cid, b.band, b.code
      FROM assign a JOIN bands b ON b.vec_id = a.vec_id
    ), cand AS (
      SELECT DISTINCT a.cid, a.vec_id AS id_a, b.vec_id AS id_b
      FROM keyed a JOIN keyed b
        ON a.cid = b.cid AND a.band = b.band AND a.code = b.code
       AND a.vec_id < b.vec_id
    ), pairs AS (
      SELECT c.cid, c.id_a, c.id_b
      FROM cand c
      JOIN base va ON va.vec_id = c.id_a
      JOIN base vb ON vb.vec_id = c.id_b
      WHERE round(list_cosine_similarity(va.v, vb.v), 4)
            >= {_SEMDEDUP_THRESH}
    ), members AS (
      SELECT cid, count(*) AS n_members FROM assign GROUP BY cid
    ), pstats AS (
      SELECT cid, count(*) AS n_dup_pairs,
             count(DISTINCT id_b) AS n_dropped
      FROM pairs GROUP BY cid
    )
    SELECT m.cid AS cluster_id, n_members,
           COALESCE(n_dup_pairs, 0) AS n_dup_pairs,
           COALESCE(n_dropped, 0) AS n_dropped,
           n_members - COALESCE(n_dropped, 0) AS n_kept
    FROM members m LEFT JOIN pstats p ON m.cid = p.cid
    """,
)
def q_llm_semdedup_fixedk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with FIXED 64-cell routing and an in-cluster SRP-LSH
    prefilter — the 100×-runnable twin of q_llm_semdedup. The sampled
    form keeps clusters ~50 vectors wide (so its within-cluster prune
    is linear) at the price of an n²/50 assign; fixing k alone would
    flip the cost to the prune (n²/64 within-cluster pairs). This twin
    therefore restores collision-bounded pruning the way every other
    production dedup tier here does — banding: each vector gets the
    16-bit SRP sign code (md5-derived hyperplanes, the q_llm_lsh_srp
    machinery verbatim), candidates are pairs agreeing on (cluster,
    band, 8-bit code) for either of the 2 bands, and the exact cosine
    ≥ 0.3 verify runs on candidates only. Expected bucket occupancy is
    |cluster|/256 per band, so candidate mass is Σ|bucket|² — the
    quantity q_llm_band_occupancy-style audits watch — instead of
    Σ|cluster|². Recall: SRP collision prob per 8-bit band is
    (1−θ/π)⁸; two bands + the 0.3 threshold make the miss band narrow,
    and the fixture-scale truth twin (q_llm_semdedup) is the measured
    reference.

    Plan: one-row broadcast argmin assign (64 evals/vector), map-side
    sign codes (16 broadcast hyperplanes), one (cid, band, code)
    equi-join for candidates, candidate-scoped verify, 64-row audit.
    Every stage is linear-modulo-collision at any corpus size."""
    import numpy as np

    e = t(spark, sf_dir, "embeddings")
    base = _dbl_base(e)
    cents = _collect_cents(fixed_seeds(base))
    cids_arr = np.array([c for c, _ in cents], dtype=np.int64)
    C = np.array([cv for _, cv in cents], dtype=np.float64)
    HP = np.array(_srp_planes(), dtype=np.float64)  # 16 × 64

    # ONE fused Arrow pass (r13, guide §4.2) replaces the broadcast
    # argmin fold AND the 16-plane bits crossJoin + band groupBy: per
    # batch, the kernel computes the nearest-cid assignment (dim-
    # sequential L2² fold, round(6), first-min cid tiebreak) and both
    # 8-bit SRP band codes (bit_p = round(seq dot(v, hp_p), 6) > 0,
    # code = Σ bit·2^(p mod 8) — exact integers). This also deletes
    # the (vec_id, band) shuffle the groupBy paid; band codes now
    # travel as two int columns per vector.
    def fn(mats, batch):
        V = mats["embedding"]
        d2 = round_half_up(seq_l2sq(V, C), 6)
        cid = cids_arr[d2.argmin(axis=1)]
        bits = (round_half_up(seq_dot(V, HP), 6) > 0).astype(np.int64)
        w = 2 ** (np.arange(HP.shape[0], dtype=np.int64) % _SD_BAND_BITS)
        code0 = (bits[:, :_SD_BAND_BITS] * w[:_SD_BAND_BITS]).sum(axis=1)
        code1 = (bits[:, _SD_BAND_BITS:] * w[_SD_BAND_BITS:]).sum(axis=1)
        return {
            "vec_id": batch.column("vec_id"),
            "cid": cid,
            "code0": code0.astype(np.int32),
            "code1": code1.astype(np.int32),
        }

    assign = map_arrow_vectors(
        e.select("vec_id", "embedding"),
        "vec_id bigint, cid bigint, code0 int, code1 int",
        fn,
        {"embedding": 64},
    ).persist()
    keyed = assign.select(
        "vec_id",
        "cid",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"), F.col("code0").alias("code")
                ),
                F.struct(
                    F.lit(1).alias("band"), F.col("code1").alias("code")
                ),
            )
        ).alias("bc"),
    ).select("vec_id", "cid", "bc.band", "bc.code")
    ka, kb = keyed.alias("ka"), keyed.alias("kb")
    cand = (
        ka.join(
            kb,
            (F.col("ka.cid") == F.col("kb.cid"))
            & (F.col("ka.band") == F.col("kb.band"))
            & (F.col("ka.code") == F.col("kb.code"))
            & (F.col("ka.vec_id") < F.col("kb.vec_id")),
        )
        .select(
            F.col("ka.cid").alias("cid"),
            F.col("ka.vec_id").alias("id_a"),
            F.col("kb.vec_id").alias("id_b"),
        )
        .distinct()
    )
    va = e.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    vb = e.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )

    # Candidate-scoped exact verify, vectorized (raw float vectors —
    # the kernel widens exactly): round(cos, 4) ≥ θ on
    # the joined pair vectors via the same sequential-fold kernels
    # (dot, Σa², Σb² then dot/(√·√) — the _cos expression order).
    def verify(mats, batch):
        A, B = mats["va"], mats["vb"]
        dot = np.zeros(A.shape[0])
        for i in range(A.shape[1]):
            dot = dot + A[:, i] * B[:, i]
        r = round_half_up(dot / (np.sqrt(seq_sq(A)) * np.sqrt(seq_sq(B))), 4)
        keep = r >= _SEMDEDUP_THRESH
        import pyarrow as pa

        mask = pa.array(keep)
        return {
            "cid": batch.column("cid").filter(mask),
            "id_a": batch.column("id_a").filter(mask),
            "id_b": batch.column("id_b").filter(mask),
        }

    pairs = map_arrow_vectors(
        cand.join(va, "id_a").join(vb, "id_b").select(
            "cid", "id_a", "id_b", "va", "vb"
        ),
        "cid bigint, id_a bigint, id_b bigint",
        verify,
        {"va": 64, "vb": 64},
    )
    members = assign.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    pstats = pairs.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_dup_pairs"),
        F.countDistinct("id_b").alias("n_dropped"),
    )
    out = (
        members.join(F.broadcast(pstats), "cid", "left")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            F.coalesce("n_dup_pairs", F.lit(0)).alias("n_dup_pairs"),
            F.coalesce("n_dropped", F.lit(0)).alias("n_dropped"),
            (F.col("n_members") - F.coalesce("n_dropped", F.lit(0)))
            .alias("n_kept"),
        )
        .localCheckpoint()
    )
    assign.unpersist()
    return out


# ---------------------------------------------------------------------------
# Round 10: probe-P / corpus-scaled-R search — closing the recall-at-scale
# gap the fixed-64 probe-1 contract left open (VERDICT r09 item 1)
# ---------------------------------------------------------------------------

_IVF_PROBES = 8  # cells inspected per query (of the 64 fixed cells)


@query(
    "q_llm_ann_ivf_probed",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent AS (
{_FK_CENT_SQL}
    ), assign AS (
      SELECT vec_id, cid FROM (
        SELECT b.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY round(list_cosine_similarity(b.v, c.cv), 6) DESC, c.cid ASC
               ) AS rn
        FROM base b CROSS JOIN cent c
      ) WHERE rn = 1
    ), probe AS (
      SELECT vec_id AS qid, v AS qv, cid FROM (
        SELECT b.vec_id, b.v, c.cid,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY round(list_cosine_similarity(b.v, c.cv), 6) DESC, c.cid ASC
               ) AS rn
        FROM base b CROSS JOIN cent c
        WHERE b.vec_id < 10
      ) WHERE rn <= {_IVF_PROBES}
    ), cell_sims AS (
      SELECT p.qid, b.vec_id,
             round(list_cosine_similarity(p.qv, b.v), 4) AS sim
      FROM probe p
      JOIN assign a ON a.cid = p.cid
      JOIN base b ON b.vec_id = a.vec_id
      WHERE b.vec_id <> p.qid
    )
    SELECT qid, vec_id AS neighbor_id, sim, rn AS rank FROM (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
      FROM cell_sims
    ) WHERE rn <= 3
    """,
)
def q_llm_ann_ivf_probed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF over the fixed 64-seed codebook (VERDICT r09
    item 1): each query inspects its 8 NEAREST cells instead of only
    its own — the standard IVF recall lever (FAISS ``nprobe``). Corpus
    cost is unchanged from q_llm_ann_ivf_fixedk (64 cosine evals per
    vector, each vector stored in exactly ONE cell); query cost is 8
    cell scans ≈ n/8 exact evals per query — still linear per decade
    at any corpus size. Measured on the decorrelated 10× fixture the
    probe ladder is 100‰ (probe-1) → 366‰ (probe-8) → 600‰ (probe-16):
    multi-probe buys back real recall but saturates on
    distance-concentrated data, which is why the GATED scale recall
    key is the corpus-scaled rerank pool (q_llm_ann_pq_rerank_scaled)
    and this key pins the routing mechanism. On the clustered twin
    (resolvable geometry) probe-8 is lossless vs exhaustive search.

    Determinism: both the cell ranking and the final ranking argsort
    rounded values with id tiebreaks — same contract as every ANN key
    here. Candidates need no DISTINCT: assignment is rn = 1, so a
    corpus vector reaches a query through at most one probed cell.

    Plan: one TakeOrdered seed selection, corpus × broadcast-64 assign
    (map-side), per-query 64-row probe ranking, broadcast of the 80
    (qid, cell) probe rows against the member list, cell-scoped exact
    rerank. The corpus never shuffles; only (vec_id, cid) pairs do."""
    from khose_spark.vecexec import pair_metric

    e = t(spark, sf_dir, "embeddings")
    base = _dbl_base(e)
    cent = fixed_seeds(base)
    cents = _collect_cents(cent)
    # Corpus-side cell assignment: the Arrow argmax kernel replaces the
    # crossJoin cosine fold + full-corpus row_number window (r13 — the
    # window shuffled corpus×64 scored rows; the kernel emits one row
    # per vector, keeping v, so the old assign⋈base member join is
    # gone too).
    members = _assign_max_cos_vec(e, cents).select(
        "cid", "vec_id", "v"
    )
    # Query-side probe ranking stays on the expression path: 10 query
    # rows × 64 cells after scan pushdown — constant work.
    w_rank = Window.partitionBy("vec_id").orderBy(
        F.desc("asim"), F.asc("cid")
    )
    probe = (
        base.filter(F.col("vec_id") < 10)
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "v", "cid", F.round(_cos("v", "cv"), 6).alias("asim")
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _IVF_PROBES)
        .select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv"), "cid"
        )
    )
    cell_sims = pair_metric(
        F.broadcast(probe)
        .join(members, "cid")
        .filter(F.col("vec_id") != F.col("qid")),
        ["qid", "vec_id"],
        "qv",
        "v",
        "cos",
        4,
        "sim",
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        cell_sims.select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            "sim",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )


# Corpus-scaled rerank pool: R = ceil(2n/25) (8% of the corpus). The
# integer ceil form (2n + 24) // 25 is exact in both engines. Measured
# pool containment (= post-exact-rerank recall) on the decorrelated
# fixtures: 800‰ at 1× (R=160, n=2000), 933‰ at 10× (R=1600, n=20000)
# vs 333‰ for the constant R=50 pool — above the sampled contract's
# 733‰ and the ≥900‰ target; 1000‰ on the clustered twin.
_R_SCALED_SQL = "(SELECT (2 * count(*) + 24) // 25 FROM base)"

assert f"WHERE rn <= {_PQ_RERANK_R}" in _PQ_RERANK_ORACLE_FIXEDK, (
    "rerank oracle chain drifted"
)
_PQ_RERANK_ORACLE_SCALED = _PQ_RERANK_ORACLE_FIXEDK.replace(
    f"WHERE rn <= {_PQ_RERANK_R}", f"WHERE rn <= {_R_SCALED_SQL}"
)


@query("q_llm_ann_pq_rerank_scaled", oracle=_PQ_RERANK_ORACLE_SCALED)
def q_llm_ann_pq_rerank_scaled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """IVFPQ+R with a CORPUS-SCALED refinement pool — the key that
    closes VERDICT r09's one `weak` grade (fixed-k ANN recall at
    scale). The constant 64-code quantizer keeps encode/search linear,
    but a constant R=50 pool lets ADC impostor mass grow with the
    corpus: on decorrelated data the true top-3's pool containment
    fell 566‰ (1×) → 333‰ (10×). Scaling the pool with the corpus,
    R = ceil(2n/25), pins the refinement budget to a constant 8%
    corpus fraction, so recall has a scale-stable floor: measured
    800‰ at 1×, 933‰ at 10× (≥ the sampled n/50-codebook contract's
    733‰ and the ≥900‰ target), 1000‰ on the clustered twin — gated
    per round in bench.py (recall_gate). Total cost stays linear in n
    for a fixed query batch: ADC is 8 LUT adds per vector, the pool is
    |queries|·n/12.5 exact 64-d evals.

    Determinism: identical contracts to q_llm_ann_pq_rerank_fixedk
    (round(ADC,4) + id tiebreak for the pool cut, round(L2²,4) + id
    tiebreak for the final ranking); R derives from a count, not a
    sample.

    Plan: zero-shuffle ADC over the bucketed fixed-k codes; the pool
    cut is the same per-query ranking window every ANN key uses; the
    (qid, cand_id) pool — ids only, never vectors — broadcasts against
    the embeddings scan, and the 10 query vectors broadcast separately,
    so the corpus is read once and never shuffled and the broadcast
    stays O(|pool|) ids even at 100×."""
    codes_tbl, cb_tbl = build_pq_index_fixedk(spark, sf_dir)
    codes = spark.table(codes_tbl)
    cb = spark.table(cb_tbl)
    e = t(spark, sf_dir, "embeddings")
    qsub = _pq_subvectors(e.filter(F.col("vec_id") < 10))
    lut = _pq_lut(qsub, cb)
    base = _dbl_base(e)
    r_pool = base.agg(
        F.floor((2 * F.count(F.lit(1)) + 24) / 25)
        .cast("long")
        .alias("r_pool")
    )
    adc = (
        codes.join(F.broadcast(lut), ["sub_id", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.round(F.sum("pdist"), 4).alias("approx_dist"))
    )
    w_pool = Window.partitionBy("qid").orderBy(
        F.asc("approx_dist"), F.asc("vec_id")
    )
    cand = (
        adc.withColumn("rn", F.row_number().over(w_pool))
        .crossJoin(F.broadcast(r_pool))
        .filter(F.col("rn") <= F.col("r_pool"))
        .select("qid", F.col("vec_id").alias("cand_id"))
    )
    qv = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_vec"), F.col("v").alias("qv")
    )
    # r13: the corpus-scaled pool (R = 2n/25 rows per query) reranks
    # through the Arrow l2sq kernel instead of the interpreted zip_with
    # fold — same (x−y)² term order, half-up round(4).
    from khose_spark.vecexec import pair_metric

    scored = pair_metric(
        base.join(F.broadcast(cand), F.col("vec_id") == F.col("cand_id"))
        .join(F.broadcast(qv), F.col("qid") == F.col("q_vec"))
        .select("qid", F.col("vec_id").alias("neighbor_id"), "qv", "v"),
        ["qid", "neighbor_id"],
        "qv",
        "v",
        "l2sq",
        4,
        "exact_dist",
    )
    w = Window.partitionBy("qid").orderBy(
        F.asc("exact_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# Round 11: the COMPOSED production search — multi-probe cell routing
# feeding the corpus-scaled exact rerank WITHIN the probed cells
# (VERDICT r10 item 1: until now routing (q_llm_ann_ivf_probed) and
# recall-strong refinement (q_llm_ann_pq_rerank_scaled) were separate
# keys, so no single registered operator was both cell-routed — the
# 100-TB read pattern, touch ~8/64 of the corpus — and recall-strong.)
# ---------------------------------------------------------------------------

# Oracle: the scaled-rerank chain with (a) the IVF cell CTEs spliced in
# after `base` and (b) the ADC stage restricted to probed-cell members.
# Exact string surgery with existence assertions (the fixedk precedent)
# so drift in the shared chain can never silently fork this twin.
_CELL_CTES = f"""    ), cellcent AS (
{_FK_CENT_SQL}
    ), cellassign AS (   -- corpus vector -> its ONE nearest cell
      SELECT vec_id, cid FROM (
        SELECT b.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY round(list_cosine_similarity(b.v, c.cv), 6) DESC,
                          c.cid ASC
               ) AS rn
        FROM base b CROSS JOIN cellcent c
      ) WHERE rn = 1
    ), cellprobe AS (    -- query -> its {_IVF_PROBES} nearest cells
      SELECT vec_id AS qid, cid FROM (
        SELECT b.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY round(list_cosine_similarity(b.v, c.cv), 6) DESC,
                          c.cid ASC
               ) AS rn
        FROM base b CROSS JOIN cellcent c
        WHERE b.vec_id < 10
      ) WHERE rn <= {_IVF_PROBES}
    ), sub AS ("""

_BASE_CTE = """    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), sub AS ("""

_ADC_FULL = """), adc AS (      -- asymmetric distance: sum of 8 LUT lookups
      SELECT l.qid, a.vec_id,
             round(sum(l.pdist), 4) AS approx_dist
      FROM assign a
      JOIN lut l ON l.sub_id = a.sub_id AND l.code = a.code
      WHERE a.vec_id <> l.qid
      GROUP BY l.qid, a.vec_id
    )"""

_ADC_PROBED = """), adc AS (    -- ADC restricted to probed-cell members
      SELECT l.qid, a.vec_id,
             round(sum(l.pdist), 4) AS approx_dist
      FROM assign a
      JOIN cellassign ca ON ca.vec_id = a.vec_id
      JOIN cellprobe cp ON cp.cid = ca.cid
      JOIN lut l ON l.qid = cp.qid
                AND l.sub_id = a.sub_id AND l.code = a.code
      WHERE a.vec_id <> l.qid
      GROUP BY l.qid, a.vec_id
    )"""

assert _BASE_CTE in _PQ_RERANK_ORACLE_SCALED, "scaled oracle base drifted"
assert _ADC_FULL in _PQ_RERANK_ORACLE_SCALED, "scaled oracle ADC drifted"
_PQ_PROBED_SCALED_ORACLE = _PQ_RERANK_ORACLE_SCALED.replace(
    _BASE_CTE,
    _BASE_CTE.replace("), sub AS (", _CELL_CTES),
).replace(_ADC_FULL, _ADC_PROBED)


_IVFPQ_INDEX_CACHE: dict[tuple[str, str], tuple[str, str]] = {}


def build_ivfpq_index_fixedk(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """INDEX-BUILD job for the composed IVF+PQ lifecycle: the fixed-k
    PQ codes of :func:`build_pq_index_fixedk`, now carrying each
    vector's IVF cell id and laid out for CELL-ROUTED search —

    - ``codes``: (cid, vec_id, sub_id, code) PARTITIONED BY cid (64
      directories) and BUCKETED by vec_id within each partition. The
      cid partitioning is what makes multi-probe search a partial
      SCAN, not a filter: a probe set joined broadcast against this
      table prunes to ~nprobe/64 of the files (Spark dynamic
      partition pruning), which is the FAISS inverted-list read
      pattern expressed as parquet layout. The vec_id bucketing keeps
      the downstream (qid, vec_id) ADC aggregation exchange-free,
      same as every PQ index here.
    - ``codebook``: the 64x8 fixed-seed subvector slices (broadcast
      dim).

    Cell assignment (cosine argmax over the 64 fixed seeds, round-6,
    cid tiebreak) happens ONCE, at build time — the O(corpus) routing
    cost is paid by the writer, and every search afterwards reads only
    probed partitions' 8-byte codes."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _IVFPQ_INDEX_CACHE.get(key)
    if hit is not None:
        return hit
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    codes_tbl, cb_tbl = f"ivfpqf_codes_{tag}", f"ivfpqf_cb_{tag}"
    loc = tempfile.mkdtemp(prefix=f"khose_ivfpqf_{tag}_")
    e = t(spark, sf_dir, "embeddings")
    base = _dbl_base(e)
    # r13: ONE fused Arrow pass PQ-encodes the corpus AND routes each
    # vector to its IVF cell (cosine argmax over the 64 fixed seeds) —
    # replacing the crossJoin fold + corpus row_number window + the
    # codes⋈cellassign join with a single kernel scan.
    cell_cents = _collect_cents(fixed_seeds(base))
    sub = _pq_subvectors(e)
    cb = _pq_fixed_codebook(sub)
    codes = _pq_fixed_codes_vec(e, _collect_pq_cb(cb), cell_cents)
    spark.sql(f"DROP TABLE IF EXISTS {codes_tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {cb_tbl}")
    (
        codes.write.format("parquet")
        .partitionBy("cid")
        .bucketBy(_PQ_BUCKETS, "vec_id")
        .option("path", f"{loc}/codes")
        .saveAsTable(codes_tbl)
    )
    (
        cb.write.format("parquet")
        .option("path", f"{loc}/codebook")
        .saveAsTable(cb_tbl)
    )
    _IVFPQ_INDEX_CACHE[key] = (codes_tbl, cb_tbl)
    return codes_tbl, cb_tbl


@query("q_llm_ann_pq_probed_scaled", oracle=_PQ_PROBED_SCALED_ORACLE)
def q_llm_ann_pq_probed_scaled(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The composed production ANN search (VERDICT r10 item 1): multi-
    probe IVF routing (each query inspects its 8 nearest of the 64
    fixed cells) feeding the corpus-scaled exact rerank pool
    (R = ceil(2n/25)) WITHIN the probed cells — the first registered
    key that is simultaneously CELL-ROUTED (the 100-TB read pattern:
    touch ~8/64 of the corpus codes) and RECALL-STRONG (the scaled
    refinement budget that made q_llm_ann_pq_rerank_scaled hold 933
    permille at 10x).

    Pipeline (FAISS IVFPQ+R with nprobe=8, end to end):
      1. BUILD (once, :func:`build_ivfpq_index_fixedk`): corpus
         encoded to 8-byte PQ codes + routed to its one nearest cell;
         codes land partitioned by cid, bucketed by vec_id.
      2. ROUTE: the query batch ranks the 64 broadcast seeds, keeps 8
         cells each (round-6 cosine, cid tiebreak — the
         q_llm_ann_ivf_probed contract verbatim).
      3. ADC: broadcast the 80-row probe set against the codes scan —
         Spark's dynamic partition pruning drops the 56 unprobed cell
         directories — then 8 LUT adds per surviving code, aggregated
         (qid, vec_id) with zero exchange (vec_id bucketing).
      4. POOL: per query keep the R = ceil(2n/25) ADC-nearest
         candidates (round-4, id tiebreak) — the corpus-fraction
         budget, counted over the FULL corpus so the contract is
         unchanged from the scaled twin.
      5. REFINE: fetch only the pool's raw vectors (broadcast of id
         pairs against the embeddings scan — the corpus is read, never
         shuffled) and rank by exact L2^2 (round-4, id tiebreak).

    Recall semantics, measured per round by bench.py: on CLUSTERED
    geometry (the resolvable-neighbor case real embeddings present)
    probe-8 routing is near-lossless and this key holds the >=900
    permille gate at 10x (recall_gate_routed). On the decorrelated
    fixture, routing itself is information-limited (367 permille at
    10x for exact search within probed cells — documented ladder), so
    the composed recall is bounded by routing there; that number is
    recorded, not gated: a sublinear reader cannot beat the geometry
    it routes over, which is exactly why the UNROUTED scaled rerank
    stays registered (and gated) as the decorrelated-data fallback.

    Scale: every stage is linear — 64 cosine evals/vector at build, 8
    LUT adds per probed code at search, |queries|*2n/25 exact evals at
    refine; the only corpus-sized shuffles are the build-time writes."""
    codes_tbl, cb_tbl = build_ivfpq_index_fixedk(spark, sf_dir)
    codes = spark.table(codes_tbl)
    cb = spark.table(cb_tbl)
    e = t(spark, sf_dir, "embeddings")
    base = _dbl_base(e)
    cent = fixed_seeds(base)
    w_rank = Window.partitionBy("vec_id").orderBy(
        F.desc("asim"), F.asc("cid")
    )
    cellprobe = (
        base.filter(F.col("vec_id") < 10)
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "cid", F.round(_cos("v", "cv"), 6).alias("asim")
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _IVF_PROBES)
        .select(F.col("vec_id").alias("qid"), "cid")
    )
    qsub = _pq_subvectors(e.filter(F.col("vec_id") < 10))
    lut = _pq_lut(qsub, cb)
    r_pool = base.agg(
        F.floor((2 * F.count(F.lit(1)) + 24) / 25)
        .cast("long")
        .alias("r_pool")
    )
    # Probed ADC: the broadcast probe join on cid is the partition-
    # pruning filter; the LUT join then matches (qid, sub_id, code).
    adc = (
        codes.join(F.broadcast(cellprobe), "cid")
        .join(F.broadcast(lut), ["qid", "sub_id", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.round(F.sum("pdist"), 4).alias("approx_dist"))
    )
    w_pool = Window.partitionBy("qid").orderBy(
        F.asc("approx_dist"), F.asc("vec_id")
    )
    cand = (
        adc.withColumn("rn", F.row_number().over(w_pool))
        .crossJoin(F.broadcast(r_pool))
        .filter(F.col("rn") <= F.col("r_pool"))
        .select("qid", F.col("vec_id").alias("cand_id"))
    )
    qv = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_vec"), F.col("v").alias("qv")
    )
    # r13: the corpus-scaled pool (R = 2n/25 rows per query) reranks
    # through the Arrow l2sq kernel instead of the interpreted zip_with
    # fold — same (x−y)² term order, half-up round(4).
    from khose_spark.vecexec import pair_metric

    scored = pair_metric(
        base.join(F.broadcast(cand), F.col("vec_id") == F.col("cand_id"))
        .join(F.broadcast(qv), F.col("qid") == F.col("q_vec"))
        .select("qid", F.col("vec_id").alias("neighbor_id"), "qv", "v"),
        ["qid", "neighbor_id"],
        "qv",
        "v",
        "l2sq",
        4,
        "exact_dist",
    )
    w = Window.partitionBy("qid").orderBy(
        F.asc("exact_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .orderBy("qid", "rank")
    )


# ---------------------------------------------------------------------------
# SQ8: per-dimension 8-bit scalar quantization
# ---------------------------------------------------------------------------


@query(
    "q_llm_ann_sq8",
    oracle="""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), dim AS (
      SELECT i AS pos, min(v[i]) AS mn, max(v[i]) AS mx
      FROM base, unnest(range(1, 65)) AS t(i)
      GROUP BY i
    ), s AS (
      SELECT list(mn ORDER BY pos) AS mins,
             list(mx - mn ORDER BY pos) AS deltas
      FROM dim
    ), deq AS (
      SELECT b.vec_id,
             list_transform(range(1, 65), i ->
               s.mins[i] +
               ((CASE WHEN s.deltas[i] = 0 THEN 0.0
                      ELSE round(((b.v[i] - s.mins[i]) / s.deltas[i])
                                 * 255) END)
                * s.deltas[i]) / 255) AS dv
      FROM base b CROSS JOIN s
    ), q AS (
      SELECT vec_id AS qid, v AS qv FROM base WHERE vec_id < 10
    ), approx AS (
      SELECT q.qid, d.vec_id,
             round(list_cosine_similarity(q.qv, d.dv), 6) AS sim6,
             round(list_cosine_similarity(q.qv, d.dv), 4) AS sim
      FROM q JOIN deq d ON d.vec_id <> q.qid
    ), exact3 AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, b.vec_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY round(list_cosine_similarity(q.qv, b.v), 6)
                          DESC, b.vec_id ASC) AS rn
        FROM q JOIN base b ON b.vec_id <> q.qid
      ) WHERE rn <= 3
    )
    SELECT a.qid, a.vec_id AS neighbor_id, a.sim, a.rn AS rank,
           CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END AS in_exact_top3
    FROM (
      SELECT qid, vec_id, sim,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sim6 DESC, vec_id ASC) AS rn
      FROM approx
    ) a
    LEFT JOIN exact3 e ON e.qid = a.qid AND e.vec_id = a.vec_id
    WHERE a.rn <= 3
    """,
)
def q_llm_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 approximate nearest neighbors — per-dimension 8-bit SCALAR
    quantization, the third quantizer in the family (PQ = subspace
    codebooks, IVF = cell routing; SQ8 is the 4×-compression int8 form
    every production vector store ships first because it keeps exact
    per-dimension geometry): each dimension maps to code =
    round((x−min_d)/Δ_d·255), queries stay full-precision and score
    against DEQUANTIZED corpus vectors (asymmetric, the ADC
    discipline), and each query's top-3 carries an in_exact_top3 flag
    measured against the true full-precision neighbors — the
    per-query recall audit built into the key.

    Determinism: per-dimension min/max are exact double order
    statistics; the quantize→dequantize chain is the SAME parenthesized
    IEEE expression in both engines (nonneg operand, so Spark HALF_UP
    round ≡ DuckDB half-away); ranking on round(sim,6) with vec_id
    tiebreak, reported round(4).

    Plan: one 64-group posexplode aggregate for dimension stats
    (map-side combined), collapsed to a 1-row broadcast of two
    64-float arrays; quantize/dequantize runs ELEMENTWISE map-side
    (zip_with — codes never shuffle, no per-vector explode); approx and
    exact passes are corpus × broadcast-10-query crosses with per-qid
    ranking windows. At 100 TB the corpus is read twice and shuffled
    never; materializing int8 codes (n × 64 bytes) instead of floats
    is the storage win the key certifies."""
    base = _dbl_base(t(spark, sf_dir, "embeddings"))
    stats64 = (
        base.select(F.posexplode("v").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )
    s = stats64.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))),
            lambda r: r.mn,
        ).alias("mins"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct("pos", (F.col("mx") - F.col("mn")).alias("dl"))
                )
            ),
            lambda r: r.dl,
        ).alias("deltas"),
    )
    code = lambda x, mn, dl: F.when(  # noqa: E731
        dl == 0, F.lit(0.0)
    ).otherwise(F.round(((x - mn) / dl) * 255))
    deq = (
        base.crossJoin(F.broadcast(s))
        .select(
            "vec_id",
            F.zip_with(
                F.zip_with(
                    "v",
                    "mins",
                    lambda x, mn: F.struct(
                        x.alias("x"), mn.alias("mn")
                    ),
                ),
                "deltas",
                lambda p, dl: p.mn
                + ((code(p.x, p.mn, dl) * dl) / 255),
            ).alias("dv"),
        )
    )
    q = base.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    approx = (
        deq.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(_cos("qv", "dv"), 6).alias("sim6"),
            F.round(_cos("qv", "dv"), 4).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim6"), F.asc("vec_id"))
    top3 = (
        approx.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qid", F.col("vec_id").alias("neighbor_id"), "sim", "rank")
    )
    exact3 = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            F.col("qid").alias("eqid"),
            F.col("vec_id").alias("evid"),
            F.round(_cos("qv", "v"), 6).alias("esim"),
        )
        .withColumn(
            "ern",
            F.row_number().over(
                Window.partitionBy("eqid").orderBy(
                    F.desc("esim"), F.asc("evid")
                )
            ),
        )
        .filter(F.col("ern") <= 3)
        .select("eqid", "evid")
    )
    return top3.join(
        F.broadcast(exact3),
        (F.col("qid") == F.col("eqid"))
        & (F.col("neighbor_id") == F.col("evid")),
        "left_outer",
    ).select(
        "qid",
        "neighbor_id",
        "sim",
        "rank",
        F.when(F.col("evid").isNull(), 0).otherwise(1).alias(
            "in_exact_top3"
        ),
    )


# ---------------------------------------------------------------------------
# Round 13: routing read-fraction audit — the sublinear-read CLAIM of the
# probed index as an oracle-checked relation
# ---------------------------------------------------------------------------


@query(
    "q_llm_ann_probe_audit",
    oracle=f"""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), cent AS (
{_FK_CENT_SQL}
    ), assign AS (
      SELECT vec_id, cid FROM (
        SELECT b.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY round(list_cosine_similarity(b.v, c.cv), 6) DESC, c.cid ASC
               ) AS rn
        FROM base b CROSS JOIN cent c
      ) WHERE rn = 1
    ), probe AS (
      SELECT vec_id AS qid, cid FROM (
        SELECT b.vec_id, c.cid,
               row_number() OVER (
                 PARTITION BY b.vec_id
                 ORDER BY round(list_cosine_similarity(b.v, c.cv), 6) DESC, c.cid ASC
               ) AS rn
        FROM base b CROSS JOIN cent c
        WHERE b.vec_id < 10
      ) WHERE rn <= {_IVF_PROBES}
    ), occ AS (
      SELECT cid, CAST(count(*) AS BIGINT) AS n_codes
      FROM assign GROUP BY cid
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS corpus_n FROM base
    )
    SELECT p.qid,
           CAST(count(*) AS BIGINT) AS n_cells_probed,
           CAST(sum(o.n_codes) AS BIGINT) AS codes_scanned,
           t.corpus_n,
           CAST((2 * 1000 * sum(o.n_codes) + t.corpus_n)
                // (2 * t.corpus_n) AS BIGINT) AS read_permille
    FROM probe p JOIN occ o ON o.cid = p.cid CROSS JOIN tot t
    GROUP BY p.qid, t.corpus_n
    ORDER BY p.qid
    """,
)
def q_llm_ann_probe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Routing read-fraction audit for the composed probed search
    (q_llm_ann_pq_probed_scaled): per query, how many of the index's
    PQ codes does probe-8 routing actually scan, as an
    exact half-up permille of the corpus — the "touch ~8/64 of the
    corpus" sublinear-read claim turned into an oracle-checked
    relation the driver grades every round, instead of a docstring
    assertion. Cell occupancy is counted off the REAL persisted index
    artifact (build_ivfpq_index_fixedk's cid-partitioned codes table),
    so a routing or build regression that silently inflates the read
    set fails the hash, not just a bench number.

    Exactness: occupancy/total are exact int64 row counts; routing is
    the verbatim q_llm_ann_ivf_probed contract (round-6 cosine, cid
    tiebreak); the permille is the all-positive half-up integer idiom.

    Plan: the one-time index build amortizes across the ANN family
    (memoized per dir); the audit itself is one 64-row occupancy agg
    off the codes scan + the 80-row broadcast probe relation joined
    and folded per query — nothing corpus-sized shuffles."""
    codes_tbl, _cb_tbl = build_ivfpq_index_fixedk(spark, sf_dir)
    codes = spark.table(codes_tbl)
    # The codes table holds 8 subvector rows per vector (PQ M=8);
    # occupancy counts VECTORS, so fold the sub_id=0 stripe only.
    occ = (
        codes.filter(F.col("sub_id") == 0)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_codes"))
    )
    e = t(spark, sf_dir, "embeddings")
    base = _dbl_base(e)
    cent = fixed_seeds(base)
    w_rank = Window.partitionBy("vec_id").orderBy(
        F.desc("asim"), F.asc("cid")
    )
    cellprobe = (
        base.filter(F.col("vec_id") < 10)
        .crossJoin(F.broadcast(cent))
        .select(
            "vec_id", "cid", F.round(_cos("v", "cv"), 6).alias("asim")
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= _IVF_PROBES)
        .select(F.col("vec_id").alias("qid"), "cid")
    )
    tot = base.agg(F.count(F.lit(1)).cast("long").alias("corpus_n"))
    return (
        cellprobe.join(F.broadcast(occ), "cid")
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells_probed"),
            F.sum("n_codes").cast("long").alias("codes_scanned"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "qid",
            "n_cells_probed",
            "codes_scanned",
            "corpus_n",
            F.expr(
                "CAST((2 * 1000 * codes_scanned + corpus_n)"
                " DIV (2 * corpus_n) AS BIGINT)"
            ).alias("read_permille"),
        )
        .orderBy("qid")
    )
