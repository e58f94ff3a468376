"""3000x certification for the disk-bounded trio (VERDICT r11 item 3).

q_ml_linreg_2f / q_ml_shapley_2f / q_agg_cm_join_estimate were reasoned
skips at 3000x: their full-width lineitem(+orders) fixture (36 GB) plus
the DuckDB join spill (>45 GB) exceeded the 80 GB disk. The verdict's
sanctioned fix: materialize a PRUNED-WIDTH 3000x fixture carrying only
the columns the trio touches —

  lineitem: l_orderkey, l_quantity, l_partkey   (3 of 16 columns)
  orders:   o_orderkey, o_totalprice            (2 of 9 columns)

— and run the REGISTERED keys and committed oracles verbatim over it.
No twin queries and no semantic rewrites: column pruning is the only
difference, and both engines' plans prune to exactly these columns
anyway (asserted for the Spark side in tests/test_plans.py ReadSchema
gates), so this is the same computation the full-width fixture would
run, at ~15% of its storage/spill footprint.

Replication contract (identical to scripts/margin_audit.py
ensure_table_scale): copy i shifts l_orderkey and o_orderkey by i*10^9
IN LOCKSTEP, so the lineitem<->orders join key space replicates
consistently; l_quantity / l_partkey / o_totalprice are untouched (same
value domain at 3000x density — the carrier-magnitude regime the decade
probe chases). l_partkey keeps the base key space, so the cm-sketch
part join multiplies naturally.

Usage: python scripts/trio3000.py [--materialize-only]
Then the sweep runs with SPARK_GRAFT_DRIVER_MEM=48g /
SPARK_GRAFT_SHUFFLE=128 (the established 3000x session shape) and
merges digest rows into LOCAL_CORRECTNESS_3000x.json, auto-retiring
the three stale skip entries.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.1"
FACTOR = 3000
TRIO = ["q_ml_linreg_2f", "q_ml_shapley_2f", "q_agg_cm_join_estimate"]

PRUNED = {
    "lineitem": ("l_orderkey", "l_quantity", "l_partkey"),
    "orders": ("o_orderkey", "o_totalprice"),
}
SHIFT_KEY = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
SYMLINKED = (
    "region nation customer supplier part events documents embeddings"
).split()


def materialize() -> str:
    import duckdb

    scratch = os.environ.get(
        "KHOSE_MARGIN_SCRATCH",
        os.path.dirname(
            os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/khose_scale")
        )
        or "/tmp",
    )
    dest = os.path.join(scratch, f"khose_trio{FACTOR}_dir")
    marker = os.path.join(dest, f"_TRIO_x{FACTOR}_OK")
    if os.path.exists(marker):
        return dest
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.sql(
        "SET memory_limit='"
        + os.environ.get("KHOSE_DUCKDB_MEM", "64GB")
        + "'"
    )
    con.sql("SET temp_directory='/tmp/khose_duckdb_spill'")
    # Disk pre-flight (margin_audit discipline): projected = factor x
    # the PRUNED base footprint + a 25 GB working margin for the
    # DuckDB oracle join spill during the sweep.
    pruned_bytes = 0
    for tbl, cols in PRUNED.items():
        probe = os.path.join(dest, f"_probe_{tbl}.parquet")
        con.sql(
            f"COPY (SELECT {', '.join(cols)} FROM "
            f"'{BASE}/{tbl}.parquet') TO '{probe}' (FORMAT parquet)"
        )
        pruned_bytes += os.path.getsize(probe)
        os.remove(probe)
    projected = pruned_bytes * FACTOR
    st = os.statvfs(dest)
    free = st.f_bavail * st.f_frsize
    margin = 25 * 1024**3
    if projected + margin > free:
        raise SystemExit(
            f"refusing: projected {projected / 1e9:.1f} GB + "
            f"{margin / 1e9:.0f} GB margin > {free / 1e9:.1f} GB free "
            f"on {dest}"
        )
    print(
        f"# pre-flight ok: projected {projected / 1e9:.1f} GB, "
        f"free {free / 1e9:.1f} GB",
        file=sys.stderr,
        flush=True,
    )
    for tbl, cols in PRUNED.items():
        out = os.path.join(dest, f"{tbl}.parquet")
        shift = SHIFT_KEY[tbl]
        proj = ", ".join(
            f"{c} + c.i * 1000000000 AS {c}" if c == shift else c
            for c in cols
        )
        print(f"# materializing {tbl} x{FACTOR}...", file=sys.stderr,
              flush=True)
        con.sql(
            f"COPY (SELECT {proj} FROM '{BASE}/{tbl}.parquet' t "
            f"CROSS JOIN range({FACTOR}) c(i)) TO '{out}' "
            "(FORMAT parquet, PER_THREAD_OUTPUT true)"
        )
    for tbl in SYMLINKED:
        link = os.path.join(dest, f"{tbl}.parquet")
        if not os.path.exists(link):
            os.symlink(f"{BASE}/{tbl}.parquet", link)
    open(marker, "w").write("ok")
    return dest


def main() -> int:
    dest = materialize()
    if "--materialize-only" in sys.argv:
        print(dest)
        return 0
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    env.setdefault("SPARK_GRAFT_SHUFFLE", "128")
    return subprocess.call(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "verify_sweep.py"),
            "--scale10",
            f"--factor={FACTOR}",
            f"--dir={dest}",
            "--digest",
            *TRIO,
        ],
        env=env,
    )


if __name__ == "__main__":
    sys.exit(main())
