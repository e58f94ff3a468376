"""DuckDB-oracle evaluation hint: materialize multiply-referenced CTEs.

House law (SURVEY.md round-6 notes): DuckDB 1.0 re-inlines a CTE at
every reference site, so an oracle whose fact-scale CTE is referenced
N times evaluates it N times — and CHAINED multi-referenced CTEs
compound multiplicatively (the unrolled-iteration oracles: k-core
spilled 70 GB, triangles ran 393 s before ``AS MATERIALIZED`` landed;
q_graph_hits wedged the first 10× sweep the same way in round 7).

``materialize_multiref_ctes`` rewrites an oracle so every CTE that is
(a) referenced at least twice and (b) transitively fact-scale gets the
``AS MATERIALIZED`` hint. This is an EVALUATION-STRATEGY hint only —
DuckDB documents it as semantics-neutral — so a rewritten oracle is the
same oracle; the 10× sweep applies it wholesale instead of hand-editing
~80 committed oracle strings whose verbatim form is what the driver
(correctly, and fast enough) runs at sf0.01.
"""

from __future__ import annotations

import re

# The driver fixtures' fact-scale tables: a CTE touching one of these
# (directly or through a non-materialized expensive CTE) re-evaluates
# data-sized work on every reference.
_FACTS = re.compile(r"\b(lineitem|orders|events|documents|embeddings)\b")
_CTE_DEF = re.compile(r"\b(\w+)\s+AS\s+(MATERIALIZED\s+)?\(", re.IGNORECASE)


def _masked(sql: str) -> str:
    """``sql`` with single-quoted string literals (incl. '' escapes) and
    ``--`` line comments blanked to same-length spaces (ADVICE r07): an
    unbalanced paren or a fact-table name inside a literal/comment must
    not skew paren balancing, fact detection, or reference counting.
    Length-preserving, so every offset found on the mask is valid on the
    original text."""
    out, i, n = list(sql), 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":  # escaped ''
                        j += 2
                        continue
                    break
                j += 1
            for k in range(i + 1, min(j, n)):
                out[k] = " "
            i = j + 1
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            j = n if j == -1 else j
            for k in range(i, j):
                out[k] = " "
            i = j
        else:
            i += 1
    return "".join(out)


def _cte_definitions(sql: str) -> list[tuple[str, bool, int, int, str]]:
    """(name, materialized, def_start, body_start, body) per CTE, in
    definition order. Body spans are found by paren balancing over the
    literal/comment-masked text (same offsets as ``sql``); bodies are
    returned masked too, so fact detection and dependency counting
    never match inside a quoted string."""
    masked = _masked(sql)
    out = []
    for m in _CTE_DEF.finditer(masked):
        depth, i = 1, m.end()
        while i < len(masked) and depth:
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
            i += 1
        out.append(
            (
                m.group(1),
                bool(m.group(2)),
                m.start(),
                m.end(),
                masked[m.end() : i - 1],
            )
        )
    return out


def flag_multiref_ctes(sql: str) -> list[str]:
    """Names of CTEs that are transitively fact-scale, NOT materialized,
    and referenced two or more times outside their own definition."""
    defs = _cte_definitions(sql)
    expensive: dict[str, bool] = {}
    body_of = {name: body for name, _, _, _, body in defs}
    mat_of = {name: mat for name, mat, _, _, _ in defs}
    for name, _, _, _, body in defs:  # definition order = dependency order
        exp = bool(_FACTS.search(body))
        for dep, dep_exp in expensive.items():
            if (
                dep_exp
                and not mat_of[dep]
                and re.search(rf"\b{dep}\b", body)
            ):
                exp = True
        expensive[name] = exp
    flagged = []
    masked = _masked(sql)
    for name, mat, _, _, body in defs:
        if mat or not expensive[name]:
            continue
        total = len(re.findall(rf"\b{name}\b", masked))
        self_refs = len(re.findall(rf"\b{name}\b", body))
        if total - 1 - self_refs >= 2:
            flagged.append(name)
    return flagged


def materialize_multiref_ctes(sql: str) -> str:
    """Insert ``MATERIALIZED`` into the definition of every flagged CTE.
    Idempotent; returns ``sql`` unchanged when nothing is flagged. The
    rewrite sites come from the masked text (never inside a string
    literal or comment); the splice edits the original."""
    flagged = set(flag_multiref_ctes(sql))
    if not flagged:
        return sql

    pieces, last = [], 0
    for m in _CTE_DEF.finditer(_masked(sql)):
        if m.group(1) in flagged and not m.group(2):
            pieces.append(sql[last : m.start()])
            pieces.append(f"{m.group(1)} AS MATERIALIZED (")
            last = m.end()
    pieces.append(sql[last:])
    return "".join(pieces)
