"""Arrow-batched vectorized kernels for the embedding-family inner loops.

Optimization round r13 (guide §4.2): the fixed-k ANN/clustering keys
spent their time evaluating Catalyst higher-order-function folds
(``aggregate``/``zip_with``/``transform``) — interpreted per element,
never codegen'd — over (vector × centroid) grids. This module moves the
SAME arithmetic into ``mapInArrow`` + numpy: Spark keeps distribution,
shuffles and I/O; each task hands whole Arrow batches to vectorized
fp64 kernels.

Exactness discipline (the hash-parity contract is bit-level):

- Sequential-fold replication. Catalyst evaluates
  ``aggregate(zip_with(v, c, f), 0.0, acc + x)`` as a strict
  left-to-right fp64 fold over dims. The kernels replicate it with an
  explicit loop over dims whose body is a vectorized elementwise op —
  per (row, centroid) the IEEE op sequence is identical, so results
  are bit-identical. No ``np.sum``/``np.dot`` (pairwise summation /
  FMA would change the float).
- ``F.round(double, s)`` replication. Spark rounds doubles via the
  shortest-decimal (Double.toString) BigDecimal with HALF_UP.
  ``round_half_up`` uses a vectorized fast path and falls back to
  ``decimal.Decimal(repr(x))`` for values within 1e-6 of the .5
  boundary — measured 0 mismatches over 2M+ adversarial values
  (OPTIMIZATION_r13.md §kernels).
- Tie-breaks. ``np.argmin``/``np.argmax`` return the FIRST minimum /
  maximum, which equals the fold's strict-``<`` (first-wins) semantics
  over a cid-ascending centroid array and the oracles'
  ``row_number() OVER (ORDER BY metric, cid)`` contract.

Centroid transport: the fixed-k contract pins k (=64) at every corpus
size, so the codebook is collected to the driver (k rows, ~32 KB) and
shipped in the task closure — the bounded-collect class already
sanctioned for the 10-row GEMM query block (similarity.py). Kernels
are NEVER used for the sampled (k = n/50) fixture-truth twins, whose
codebook grows with the corpus.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Callable, Iterator

import numpy as np

__all__ = [
    "round_half_up",
    "seq_l2sq",
    "seq_dot",
    "seq_sq",
    "map_arrow_vectors",
    "matrix_to_list_array",
    "pair_metric",
]

_BOUNDARY = 1e-6  # |frac - 0.5| below this goes through exact Decimal


def round_half_up(x: np.ndarray, scale: int) -> np.ndarray:
    """Bit-exact replication of Spark's round(double, scale) HALF_UP.

    Magnitude bound (ADVICE r13 item 1): the fast path detects
    near-boundary values with an absolute band of ``_BOUNDARY`` on the
    scaled value ``y = x * 10^scale``, which is only sound while the
    double representation error of ``y`` (≈2 ulp) stays below that
    band — i.e. ``|y| < _BOUNDARY / (2 * 2^-52) ≈ 2.25e9`` (about
    ``|x| < 2.2e3`` at scale 6). Every current caller rounds cosines in
    [-1, 1], bounded L2/L2² distances, or SRP dot products, all far
    inside the bound; the assert makes a future out-of-range caller
    fail loudly instead of silently diverging from Spark."""
    m = 10.0 ** scale
    y = x * m
    assert np.abs(y).max(initial=0.0) < 2.0e9, (
        "round_half_up: |x|*10^scale exceeds the exactness bound of the"
        " fast boundary detector — widen _BOUNDARY per-ulp or route"
        " this caller through Decimal"
    )
    f = np.floor(y)
    frac = y - f
    out = np.where(frac >= 0.5, f + 1.0, f) / m
    sus = np.abs(frac - 0.5) < _BOUNDARY
    if sus.any():
        q = Decimal(1).scaleb(-scale)
        flat_out = out.reshape(-1)
        flat_x = x.reshape(-1)
        for i in np.nonzero(sus.reshape(-1))[0]:
            flat_out[i] = float(
                Decimal(repr(float(flat_x[i]))).quantize(
                    q, rounding=ROUND_HALF_UP
                )
            )
    return out


def seq_l2sq(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) squared-L2 grid, dim-sequential fold: for each (row,
    centroid) the op sequence is acc = acc + (v_i - c_i)*(v_i - c_i)
    over i in dim order — bit-identical to the Catalyst
    aggregate(zip_with(...)) fold."""
    n, d = V.shape
    acc = np.zeros((n, C.shape[0]))
    for i in range(d):
        diff = V[:, i, None] - C[None, :, i]
        acc = acc + diff * diff
    return acc


def seq_dot(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, k) dot-product grid via the same dim-sequential fold."""
    n, d = V.shape
    acc = np.zeros((n, C.shape[0]))
    for i in range(d):
        acc = acc + V[:, i, None] * C[None, :, i]
    return acc


def seq_sq(V: np.ndarray) -> np.ndarray:
    """(n,) sum-of-squares via the dim-sequential fold (acc + x*x)."""
    n, d = V.shape
    acc = np.zeros(n)
    for i in range(d):
        acc = acc + V[:, i] * V[:, i]
    return acc


def _list_to_matrix(col, dim: int) -> np.ndarray:
    """Arrow list<double|float> column -> (n, dim) fp64 matrix without
    a Python-object detour (uniform-length lists: flatten + reshape).
    float32 input is widened with the exact float->double cast, so
    feeding the RAW embedding column is bit-identical to the
    transform(cast) HOF the expression path used — and skips that
    interpreted cast entirely."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    mat = np.ascontiguousarray(flat).reshape(-1, dim)
    if mat.dtype != np.float64:
        mat = mat.astype(np.float64)
    return mat


def matrix_to_list_array(M: np.ndarray):
    """(n, d) fp64 matrix -> Arrow list<double> column (one values
    buffer + an offsets ramp — no per-row Python objects)."""
    import pyarrow as pa

    n, d = M.shape
    values = pa.array(np.ascontiguousarray(M).reshape(-1))
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, values)


def map_arrow_vectors(
    df,
    out_schema: str,
    batch_fn: Callable[[dict, "object"], dict],
    vec_cols: dict[str, int],
):
    """mapInArrow plumbing: for each record batch, decode the named
    list<double> columns into (n, dim) matrices, call ``batch_fn`` with
    {col: matrix} plus the raw batch, and build the output batch from
    the returned {name: numpy array or pyarrow array} in out_schema
    column order (pass-through columns may be returned as the raw
    arrow column)."""
    import pyarrow as pa

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            if batch.num_rows == 0:
                continue
            mats = {
                name: _list_to_matrix(batch.column(name), dim)
                for name, dim in vec_cols.items()
            }
            cols = batch_fn(mats, batch)
            arrays = []
            names = []
            for name, arr in cols.items():
                names.append(name)
                if isinstance(arr, (pa.Array, pa.ChunkedArray)):
                    arrays.append(arr)
                else:
                    arrays.append(pa.array(arr))
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.mapInArrow(run, out_schema)


def pair_metric(
    df,
    keep: list[str],
    a_col: str,
    b_col: str,
    metric: str,
    scale: int,
    out_name: str,
    dim: int = 64,
):
    """Append ``round(metric(a, b), scale)`` to each row via one Arrow
    pass — the vectorized form of the per-pair
    ``round(aggregate(zip_with(...)), s)`` verify/rerank expressions.
    ``metric``: 'l2sq' (the zip_with (x−y)² fold) or 'cos' (the _cos
    expression: seq dot / (√seqΣa² · √seqΣb²)). Bit-exact by the module
    exactness discipline."""

    # ADVICE r13 item 5: the select below duplicates a column if a
    # caller lists the vector columns (or the output name) in ``keep``,
    # making the Arrow batch lookup by name ill-defined. Fail loudly.
    assert not ({a_col, b_col, out_name} & set(keep)), (
        f"pair_metric: keep={keep} must be disjoint from "
        f"a_col/b_col/out_name ({a_col}, {b_col}, {out_name})"
    )

    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    schema = ", ".join(
        [f"{c} {fields[c]}" for c in keep] + [f"{out_name} double"]
    )

    def fn(mats, batch):
        A, B = mats[a_col], mats[b_col]
        if metric in ("l2sq", "l2"):
            m = np.zeros(A.shape[0])
            for i in range(A.shape[1]):
                d = A[:, i] - B[:, i]
                m = m + d * d
            if metric == "l2":
                m = np.sqrt(m)
        elif metric == "cos":
            dot = np.zeros(A.shape[0])
            for i in range(A.shape[1]):
                dot = dot + A[:, i] * B[:, i]
            m = dot / (np.sqrt(seq_sq(A)) * np.sqrt(seq_sq(B)))
        else:  # pragma: no cover - caller bug
            raise ValueError(metric)
        out = {c: batch.column(c) for c in keep}
        out[out_name] = round_half_up(m, scale) if scale is not None else m
        return out

    return map_arrow_vectors(
        df.select(*keep, a_col, b_col),
        schema,
        fn,
        {a_col: dim, b_col: dim},
    )
