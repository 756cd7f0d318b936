#!/usr/bin/env python
"""Interleaved A/B benchmark adjudicator for a steal-prone box.

BENCH_r*.json deltas on this machine routinely include 2-4x CPU-steal
swings, so a raw round-over-round comparison cannot distinguish a real
regression from box noise (the round-10 verdict had to hand-write this
exact experiment to adjudicate an apparent +15%). This tool makes that
adjudication a one-liner:

    PYTHONPATH=. python tools/ab_compare.py <refA> <refB> \
        [--queries q1,q2,...] [--runs 6] [--sf-dir DIR] [--cpus 32]

- refA / refB are git refs (use the literal WORKTREE for the current
  working tree, uncommitted changes included). Refs are materialized
  with `git worktree add` into a temp dir and removed afterwards.
- Each timed sample is a FRESH JVM (subprocess) running the tree's own
  registry: one warm-up execution per query, then one timed execution,
  using the same count+xxhash64-checksum action as bench.py (shared
  metrics.run_full), so neither tree can win by plan pruning.
- Samples alternate A,B,A,B,... so slow-box episodes (CPU steal, page
  cache evictions) land on both trees symmetrically instead of biasing
  whichever tree ran second.
- Output: per-query wall medians for both refs and the B/A ratio, plus
  an honest min/max spread so a noisy verdict is visibly noisy.

The driver's BENCH_r{N}.json stays untouched — this tool is for
adjudicating apparent deltas between rounds, not for producing them.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Child process body: runs inside ONE JVM for one (tree, sample) pair.
# Each query: one warm-up run_full, then one timed run_full. Row counts
# ride along so a tree that silently changes results is caught here.
_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from nzgmdb_spark.metrics import run_full
from nzgmdb_spark.queries import load_registry
from nzgmdb_spark.session import get_spark

names = json.loads(sys.argv[1])
sf_dir = sys.argv[2]
cpus = sys.argv[3]
spark = get_spark(
    app_name="ab-compare",
    master=f"local[{cpus}]",
    shuffle_partitions=int(cpus),
    extra_conf={"spark.ui.showConsoleProgress": "false"},
)
spark.sparkContext.setLogLevel("ERROR")
reg = load_registry()
out = {}
for n in names:
    fn = reg[n].fn
    rows = run_full(fn(spark, sf_dir))  # warm-up (JIT, python workers)
    t0 = time.monotonic()
    rows2 = run_full(fn(spark, sf_dir))
    out[n] = {"wall": round(time.monotonic() - t0, 4), "rows": rows2}
    assert rows == rows2, (n, rows, rows2)
print("AB_RESULT " + json.dumps(out))
spark.stop()
"""


def _headline_names() -> list[str]:
    sys.path.insert(0, REPO)
    from nzgmdb_spark.queries import load_registry

    return [n for n, s in load_registry().items() if s.headline]


def _materialize(ref: str, tmp: str) -> str:
    if ref == "WORKTREE":
        return REPO
    path = os.path.join(tmp, ref.replace("/", "_"))
    subprocess.run(
        ["git", "worktree", "add", "--detach", path, ref],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    return path


def _cleanup(ref: str, tmp: str) -> None:
    if ref == "WORKTREE":
        return
    path = os.path.join(tmp, ref.replace("/", "_"))
    subprocess.run(
        ["git", "worktree", "remove", "--force", path],
        cwd=REPO,
        check=False,
        capture_output=True,
    )


def _sample(tree: str, names: list[str], sf_dir: str, cpus: str) -> dict:
    env = dict(os.environ, PYTHONPATH=tree)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, json.dumps(names), sf_dir, cpus],
        cwd=tree,
        env=env,
        capture_output=True,
        text=True,
        check=False,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT ") :])
    raise RuntimeError(
        f"child in {tree} produced no result:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-4000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("ref_a")
    ap.add_argument("ref_b")
    ap.add_argument("--queries", default=None, help="comma list; default headline")
    ap.add_argument("--runs", type=int, default=6, help="samples per ref")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    names = (
        args.queries.split(",") if args.queries else _headline_names()
    )
    with tempfile.TemporaryDirectory(prefix="ab_compare_") as tmp:
        try:
            tree_a = _materialize(args.ref_a, tmp)
            tree_b = _materialize(args.ref_b, tmp)
            walls: dict[str, dict[str, list[float]]] = {
                n: {"a": [], "b": []} for n in names
            }
            rows_seen: dict[str, dict[str, int]] = {n: {} for n in names}
            for i in range(args.runs):
                for side, tree in (("a", tree_a), ("b", tree_b)):
                    try:
                        load = "%.1f/%.1f/%.1f" % os.getloadavg()
                    except OSError:
                        load = "?"
                    res = _sample(tree, names, args.sf_dir, args.cpus)
                    for n in names:
                        walls[n][side].append(res[n]["wall"])
                        rows_seen[n].setdefault(side, res[n]["rows"])
                    print(
                        f"  sample {i + 1}/{args.runs} {side.upper()} "
                        f"load={load} "
                        + " ".join(f"{n}={res[n]['wall']:.2f}s" for n in names),
                        file=sys.stderr,
                    )
        finally:
            _cleanup(args.ref_a, tmp)
            _cleanup(args.ref_b, tmp)

    report = {
        "ref_a": args.ref_a,
        "ref_b": args.ref_b,
        "runs": args.runs,
        "sf_dir": args.sf_dir,
        "queries": {},
    }
    for n in names:
        ma = statistics.median(walls[n]["a"])
        mb = statistics.median(walls[n]["b"])
        report["queries"][n] = {
            "median_a_s": round(ma, 3),
            "median_b_s": round(mb, 3),
            "ratio_b_over_a": round(mb / ma, 3) if ma else None,
            "spread_a": [min(walls[n]["a"]), max(walls[n]["a"])],
            "spread_b": [min(walls[n]["b"]), max(walls[n]["b"])],
            "rows_match": rows_seen[n].get("a") == rows_seen[n].get("b"),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
