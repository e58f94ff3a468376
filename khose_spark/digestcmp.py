"""Aggregate-contract result comparison for decade-scale oracle sweeps
(round 8, VERDICT r07 item 2).

At 100× data the bound on the oracle board was never the engine — it
was the compare harness: ``toPandas()`` on an O(n)-row result relation
(60M lineitem projections) and a Python-side row-by-row canonical form.
This module replaces that transfer with a DIGEST contract computed
entirely inside DuckDB:

- Spark writes its result relation to parquet (distributed write — no
  driver collect at any size).
- DuckDB registers both relations (the parquet and the oracle SQL) and
  evaluates ONE canonicalization — the SQL mirror of
  ``tests/_parity.canon_value`` (type-prefixed cells, 12-significant-
  digit floats, NaN→NULL, −0.0→0.0) — over each, folding every row to
  ``hash(row)`` and comparing ``(count(*), Σ hash)`` plus the sorted
  column-name/type-category schema.

Because the same SQL runs over both relations in the same engine, the
digest can only diverge when the DATA diverges: engine-formatting
differences are normalized exactly the way the fixture-scale pandas
compare normalizes them (the per-type prefixes keep an int column from
silently matching a float column). Σ-of-hash is order-insensitive by
construction, matching the sorted-rows semantics of ``canon_frame``.
The mode is recorded per key in the sweep artifact ("mode": "digest")
so the judge can see which rows carry the aggregate contract instead
of the full row-multiset one.
"""

from __future__ import annotations

import glob as _glob

# US (unit separator) — cannot appear in canonical cells, whose payload
# is hex, digits, ISO dates, or fixture text.
_SEP = "chr(31)"

_FLOAT_CANON = (
    "printf('%.12g', CASE WHEN isnan(CAST({c} AS DOUBLE)) THEN NULL "
    "WHEN CAST({c} AS DOUBLE) = 0 THEN CAST(0 AS DOUBLE) "
    "ELSE CAST({c} AS DOUBLE) END)"
)


def type_category(duck_type: str) -> str:
    """Collapse a DuckDB column type to the category the fixture-scale
    pandas compare distinguishes (canon_value's prefixes): int32 vs
    int64 is NOT a mismatch there, int vs double IS."""
    u = duck_type.strip().upper()
    if u.endswith("[]"):
        return "list<" + type_category(u[:-2]) + ">"
    if u.startswith("DECIMAL") or u in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if "INT" in u:  # TINYINT … HUGEINT, unsigned variants
        return "int"
    if "TIMESTAMP" in u:
        return "ts"
    if u == "DATE":
        return "date"
    if u == "BOOLEAN":
        return "bool"
    if u in ("BLOB", "BYTEA", "BINARY", "VARBINARY"):
        return "bin"
    return "str"


def canon_expr(col: str, cat: str) -> str:
    """SQL producing the canonical cell string for one column — the
    DuckDB mirror of tests/_parity.canon_value (same prefixes, same
    12-significant-digit float form, NaN→<NULL>, −0.0→0.0)."""
    q = f'"{col}"'
    if cat == "int":
        body = f"'i:' || CAST(CAST({q} AS HUGEINT) AS VARCHAR)"
    elif cat == "float":
        body = "'f:' || " + _FLOAT_CANON.format(c=q)
    elif cat == "bool":
        body = f"'b:' || CASE WHEN {q} THEN 'True' ELSE 'False' END"
    elif cat == "ts":
        body = (
            f"'t:' || strftime(CAST({q} AS TIMESTAMP), "
            "'%Y-%m-%dT%H:%M:%S.%f')"
        )
    elif cat == "date":
        body = f"'d:' || strftime({q}, '%Y-%m-%d')"
    elif cat == "bin":
        body = f"'x:' || lower(hex({q}))"
    elif cat.startswith("list<"):
        inner = cat[5:-1]
        if inner == "float":
            el = "'f:' || " + _FLOAT_CANON.format(c="x")
        elif inner == "int":
            el = "'i:' || CAST(CAST(x AS HUGEINT) AS VARCHAR)"
        else:
            el = "'s:' || CAST(x AS VARCHAR)"
        body = (
            f"'[' || array_to_string(list_transform({q}, "
            f"x -> COALESCE({el}, '<NULL>')), ',') || ']'"
        )
    else:
        body = f"'s:' || {q}"
    return f"COALESCE({body}, '<NULL>')"


def digest_sql(relation: str, cols: list[tuple[str, str]]) -> str:
    """(count, Σ hash(canonical row)) over ``relation``; ``cols`` is the
    (name, category) list SORTED BY NAME — mirroring canon_frame's
    sorted-column contract."""
    cells = ", ".join(canon_expr(c, cat) for c, cat in cols)
    return (
        "SELECT CAST(count(*) AS VARCHAR) AS n, "
        "CAST(COALESCE(sum(CAST(hash(concat_ws("
        f"{_SEP}, {cells})) AS HUGEINT)), 0) AS VARCHAR) AS h "
        f"FROM {relation}"
    )


def digest_compare(con, oracle_sql: str, spark_parquet_dir: str):
    """Compare the oracle relation against a Spark-written parquet
    result by schema + (count, Σ hash) digest. Returns
    (problems, n_rows): empty problems == parity; n_rows is the oracle
    row count (== spark's when green)."""
    problems: list[str] = []
    con.sql(f"CREATE OR REPLACE VIEW _oracle_res AS {oracle_sql}")
    o_desc = con.sql("DESCRIBE _oracle_res").fetchall()
    o_cols = sorted((r[0], type_category(r[1])) for r in o_desc)

    parts = _glob.glob(f"{spark_parquet_dir}/*.parquet")
    if not parts:
        # Spark writes no part files for a 0-task empty result; the
        # contract degrades to count-only for this (rare) case.
        n_oracle = con.sql(
            "SELECT count(*) FROM _oracle_res"
        ).fetchone()[0]
        if n_oracle != 0:
            problems.append(
                f"row count: spark=0 (no part files) oracle={n_oracle}"
            )
        return problems, int(n_oracle)

    con.sql(
        "CREATE OR REPLACE VIEW _spark_res AS SELECT * FROM "
        f"'{spark_parquet_dir}/*.parquet'"
    )
    s_desc = con.sql("DESCRIBE _spark_res").fetchall()
    s_cols = sorted((r[0], type_category(r[1])) for r in s_desc)
    if [c for c, _ in s_cols] != [c for c, _ in o_cols]:
        problems.append(
            f"columns: spark={[c for c, _ in s_cols]} "
            f"oracle={[c for c, _ in o_cols]}"
        )
        return problems, -1
    cat_mismatch = [
        (sc, st, ot)
        for (sc, st), (_, ot) in zip(s_cols, o_cols)
        if st != ot
    ]
    if cat_mismatch:
        problems.append(f"column type categories: {cat_mismatch}")
        return problems, -1

    o_n, o_h = con.sql(digest_sql("_oracle_res", o_cols)).fetchone()
    s_n, s_h = con.sql(digest_sql("_spark_res", o_cols)).fetchone()
    if s_n != o_n:
        problems.append(f"row count: spark={s_n} oracle={o_n}")
    if s_h != o_h:
        problems.append(f"digest: spark={s_h} oracle={o_h}")
    return problems, int(o_n)
