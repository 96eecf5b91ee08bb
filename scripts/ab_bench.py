#!/usr/bin/env python
"""Same-window A/B bench: previous-round commit vs HEAD, interleaved.

VERDICT r4 #5: this host's speed drifts across hours beyond the ±20%
run-to-run noise, so cross-round BENCH deltas are unfalsifiable when
the two rounds ran in different windows. This harness checks out the
comparison ref into a git worktree and alternates full ``bench.py``
invocations A/B/A/B in ONE window, then reports per-query best-of per
side plus ratios — any per-query regression it shows is attributable
to code, not turbo drift.

Usage:
    python scripts/ab_bench.py --base <ref> [--pairs 2] \
        [--sf /root/testdata/sf0.1] [--cpus 32] [--out AB_BENCH.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tree: str, sf: str, cpus: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS=cpus,
               PYTHONPATH=tree)
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        cwd=tree, env=env, capture_output=True, text=True, timeout=3600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(
        f"no JSON line from bench in {tree}:\n{out.stdout[-2000:]}"
        f"\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True,
                    help="git ref of the comparison side (prev round)")
    ap.add_argument("--pairs", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get(
        "SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    base_sha = subprocess.check_output(
        ["git", "rev-parse", "--short", args.base], cwd=REPO, text=True
    ).strip()
    head_sha = subprocess.check_output(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO, text=True
    ).strip()
    base_tree = f"/tmp/westa_ab_{base_sha}"
    if not os.path.isdir(base_tree):
        subprocess.run(
            ["git", "worktree", "add", "--detach", base_tree, base_sha],
            cwd=REPO, check=True,
        )

    sides = {"base": [], "head": []}
    t_start = time.time()
    for pair in range(args.pairs):
        # alternate which side goes first within the pair, so slow
        # drift inside the window cancels instead of biasing one side
        order = (("base", base_tree), ("head", REPO))
        if pair % 2:
            order = order[::-1]
        for side, tree in order:
            print(f"[ab] pair {pair + 1}/{args.pairs} side={side} "
                  f"({time.time() - t_start:.0f}s in)", file=sys.stderr)
            sides[side].append(run_bench(tree, args.sf, args.cpus))

    def best(side: str, key: str, q: str | None = None) -> float:
        vals = [
            (r["queries"][q] if q else r[key]) for r in sides[side]
        ]
        return min(vals)

    common = set.intersection(*(
        set(r["queries"]) for rs in sides.values() for r in rs
    ))
    per_query = {}
    for q in sorted(common):
        b = best("base", "", q)
        h = best("head", "", q)
        per_query[q] = {
            "base": b, "head": h,
            "ratio": round(h / b, 3) if b else None,
        }
    result = {
        "metric": "ab_bench_same_window",
        "base_ref": base_sha,
        "head_ref": head_sha,
        "sf": args.sf,
        "cpus": int(args.cpus),
        "pairs": args.pairs,
        "base_total_best": best("base", "value"),
        "head_total_best": best("head", "value"),
        "base_docs_per_sec": max(
            r["docs_per_sec"] for r in sides["base"]),
        "head_docs_per_sec": max(
            r["docs_per_sec"] for r in sides["head"]),
        "queries": per_query,
        "regressed_gt_10pct": sorted(
            q for q, v in per_query.items()
            if v["ratio"] and v["ratio"] > 1.10
        ),
        "improved_gt_10pct": sorted(
            q for q, v in per_query.items()
            if v["ratio"] and v["ratio"] < 0.90
        ),
        "window_sec": round(time.time() - t_start, 1),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
