"""Deterministic N× scale-up of a fixture directory — the empirical
backing for the "would this survive 100 TB" posture.

The plan gates (tests/test_plans.py, plans.lock.json) prove the SHAPE of
every query is scale-safe; this module proves the MEASUREMENT: bench.py
re-times the heavy tail of the suite on a 10× materialization of sf0.1
and reports sec@10×/sec@1× per key, so superlinear growth is a recorded
number instead of a docstring argument.

Scale-up semantics (same keyspace, more volume — the shape a growing
production deployment actually has):

- Fact tables (orders, lineitem, events, documents, embeddings) are
  unioned ``factor`` times with copy-shifted primary keys (offset 10^9
  per copy, far above any fixture key).
- Dimension tables (region, nation, customer, supplier, part) are
  copied unchanged: 10× more facts per dimension key, constant
  dimension cardinality — so per-key fan-in genuinely grows.
- ``documents.text`` gets a copy-specific tag token spliced in every
  3rd word for copies > 0. With 3-word shingles this drops cross-copy
  Jaccard to ~0.14 (three-quarters of each window straddles a tag),
  well under every dedup threshold — near-dup candidate sets scale
  ~linearly instead of quadratically in the copy count, which is the
  honest workload (real corpus growth adds new documents, not 9
  verbatim clones of every document).
- ``embeddings.embedding`` is cyclically rotated by the copy index:
  unit norm preserved, copies decorrelated (random-ish vectors are
  near-orthogonal to their rotations), so ANN/semdedup candidate
  volumes grow ~linearly for the same reason.
- Timestamps / dates are untouched: the same time range at 10× density
  (more traffic, not a longer history).

Everything is derived deterministically from the copy index — no RNG —
so a regenerated directory is byte-stable modulo parquet encoding.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIM_TABLES = ("region", "nation", "customer", "supplier", "part")
FACT_KEYS = {
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}
_COPY_OFFSET = 1_000_000_000


def _tag_text(col, tag: str):
    """Splice ``tag`` in after every 3rd word (1-indexed positions
    3,6,…), decorrelating the copy's shingle space from the original."""
    words = F.split(col, " ")
    tagged = F.transform(
        words,
        lambda w, i: F.when(
            (i + 1) % 3 == 0, F.concat(w, F.lit(" " + tag))
        ).otherwise(w),
    )
    return F.array_join(tagged, " ")


def _rotate(vec, by: int):
    """Norm-preserving decorrelating transform for copy index ``by``:
    cyclic rotation by ``by mod dim`` positions, NEGATED on every odd
    full cycle (``(by // dim) % 2 == 1``).

    The modulo keeps the slice well-defined past the embedding
    dimension (ADVICE r06 item 1); the sign flip keeps the
    decorrelation invariant alive there too — without it, copy == dim
    (64) would rotate a full cycle and emit an EXACT duplicate of the
    base vector. With the flip, copies dim..2·dim−1 are negated
    rotations (cosine ≈ −cosine of the rotation — still far from any
    near-dup threshold), so the generator is decorrelated for factors
    up to 2×dim = 128; ``ensure_scale_dir`` asserts that bound.
    """
    n = F.size(vec)
    b = F.pmod(F.lit(by), n)
    rotated = F.concat(
        F.slice(vec, b + F.lit(1), F.greatest(n - b, F.lit(0))),
        F.slice(vec, F.lit(1), b),
    )
    odd_cycle = F.pmod(F.floor(F.lit(by) / n), F.lit(2)) == 1
    return F.when(
        odd_cycle, F.transform(rotated, lambda x: -x)
    ).otherwise(rotated)


def _scaled_copy(df: DataFrame, table: str, copy: int) -> DataFrame:
    if copy == 0:
        return df
    shift = copy * _COPY_OFFSET
    out = df
    for k in FACT_KEYS[table]:
        out = out.withColumn(k, F.col(k) + F.lit(shift))
    if table == "documents":
        tag = f"zq{copy}tag"
        out = out.withColumn("text", _tag_text(F.col("text"), tag))
        out = out.withColumn("n_chars", F.length("text"))
    elif table == "embeddings":
        out = out.withColumn(
            "embedding", _rotate(F.col("embedding"), copy).cast(
                df.schema["embedding"].dataType.simpleString()
            )
        )
    return out


def ensure_scale_dir(
    spark: SparkSession,
    base_dir: str,
    dest: str,
    factor: int = 10,
) -> str:
    """Materialize (once) a ``factor``× copy of ``base_dir`` under
    ``dest`` and return ``dest``. A marker file makes re-runs free."""
    # 128 = 2 × the fixture embedding dim: past it the rotate+flip
    # transform cycles and copies would be exact duplicates (see
    # _rotate). Raise the transform's period before raising this.
    assert factor <= 128, f"decorrelation breaks past factor 128: {factor}"
    marker = os.path.join(dest, f"_SCALED_x{factor}_OK")
    if os.path.exists(marker):
        return dest
    os.makedirs(dest, exist_ok=True)
    for table in DIM_TABLES:
        df = spark.read.parquet(os.path.join(base_dir, f"{table}.parquet"))
        df.write.mode("overwrite").parquet(
            os.path.join(dest, f"{table}.parquet")
        )
    for table in FACT_KEYS:
        base = spark.read.parquet(os.path.join(base_dir, f"{table}.parquet"))
        copies = [_scaled_copy(base, table, c) for c in range(factor)]
        out = copies[0]
        for c in copies[1:]:
            out = out.unionAll(c)
        # One output file per copy keeps the scan parallelism of the
        # result proportional to its size (the base fixture is a single
        # row group, i.e. one split).
        out.repartition(factor).write.mode("overwrite").parquet(
            os.path.join(dest, f"{table}.parquet")
        )
    with open(marker, "w") as f:
        f.write("ok\n")
    return dest
