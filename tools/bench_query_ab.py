"""Interleaved A/B of the 8-query headline bench leg between two git
revisions — the attribution protocol the round-6 regression lacked
(BENCH_r06 qsum 4.20s vs r5 3.08s with no probe and no A/B, flagged by
the round-6 verdict).

Each sample is a FRESH spark subprocess (local[32], same confs as
bench.py) running the same warm+3-runs-median protocol as
bench.py::bench_queries against one revision's tree, bracketed by the
8-proc memory-bandwidth probe. Sides alternate A,B then B,A per rep so
slow host drift cancels; a sample whose pre-probe is below --min-gbps
is flagged (and the comparison should lean on the flag-free samples).

Usage:
  python tools/bench_query_ab.py --a 678105d --b WORKTREE --reps 3
    (--b WORKTREE = the current working tree, uncommitted changes
     included; any other value is resolved with `git worktree add`)

Prints one JSON line and writes BENCH/query_ab_last_run.md (never
touches the hand-curated BENCH/BASELINE.md)."""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE, membw_probe  # noqa: E402

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {tree!r})
from gamechanger_data_spark.session import get_spark
from gamechanger_data_spark.plans.catalog import CATALOG
spark = get_spark("abq", master="local[32]", shuffle_partitions=32,
                  extra_conf={{"spark.driver.memory": "16g"}})
out = {{}}
for name in {headline!r}:
    fn = CATALOG[name].fn
    fn(spark, {sf!r}).collect()  # warm
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        fn(spark, {sf!r}).collect()
        runs.append(time.perf_counter() - t0)
    out[name] = round(sorted(runs)[1], 4)
print("ABRESULT " + json.dumps(out))
"""


def run_sample(tree: str, sf_dir: str) -> dict:
    code = _CHILD.format(tree=tree, headline=list(HEADLINE), sf=sf_dir)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=tree, timeout=900,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"sample produced no result (rc={p.returncode}):\n{p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", default="678105d", help="baseline rev (r5 tip)")
    ap.add_argument("--b", default="WORKTREE",
                    help="candidate rev, or WORKTREE for the live tree")
    ap.add_argument("--reps", type=int, default=3,
                    help="samples PER SIDE (2 spark boots per rep)")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--min-gbps", type=float, default=6.0,
                    help="pre-probe below this flags the sample contended")
    args = ap.parse_args()

    trees, cleanup = {}, []
    for side, rev in (("a", args.a), ("b", args.b)):
        if rev == "WORKTREE":
            trees[side] = REPO
        else:
            d = f"/tmp/gcspark_qab_{side}_{rev}"
            if not os.path.exists(d):
                subprocess.run(
                    ["git", "worktree", "add", "--detach", d, rev],
                    cwd=REPO, check=True, capture_output=True,
                )
                cleanup.append(d)
            trees[side] = d

    samples: list[dict] = []
    try:
        for rep in range(args.reps):
            order = ("a", "b") if rep % 2 == 0 else ("b", "a")
            for side in order:
                bw = membw_probe()
                t0 = time.perf_counter()
                q = run_sample(trees[side], args.sf_dir)
                samples.append({
                    "side": side, "rev": getattr(args, side),
                    "membw_pre_gbps": bw,
                    "flagged": bw < args.min_gbps,
                    "qsum": round(sum(q.values()), 3),
                    "wall": round(time.perf_counter() - t0, 1),
                    "queries": q,
                })
                print(f"[{side}] probe {bw} GB/s qsum {samples[-1]['qsum']}s"
                      f"{' FLAGGED' if samples[-1]['flagged'] else ''}",
                      file=sys.stderr)
    finally:
        for d in cleanup:
            subprocess.run(["git", "worktree", "remove", "--force", d],
                           cwd=REPO, capture_output=True)

    def side_stats(side: str, clean_only: bool) -> dict:
        xs = [s for s in samples if s["side"] == side
              and (not clean_only or not s["flagged"])]
        if not xs:
            return {}
        per_q = {
            n: round(statistics.median(s["queries"][n] for s in xs), 4)
            for n in HEADLINE
        }
        return {"n": len(xs),
                "qsum_median": round(statistics.median(s["qsum"] for s in xs), 3),
                "qsums": [s["qsum"] for s in xs],
                "per_query_median": per_q}

    result = {
        "a_rev": args.a, "b_rev": args.b, "sf_dir": args.sf_dir,
        "samples": samples,
        "a": side_stats("a", clean_only=True),
        "b": side_stats("b", clean_only=True),
        "a_all": side_stats("a", clean_only=False),
        "b_all": side_stats("b", clean_only=False),
    }
    if result["a"] and result["b"]:
        result["b_over_a_qsum"] = round(
            result["b"]["qsum_median"] / result["a"]["qsum_median"], 3
        )
    print(json.dumps(result))

    md = os.path.join(REPO, "BENCH", "query_ab_last_run.md")
    with open(md, "w") as f:
        f.write("# Headline-query A/B (last run)\n\n")
        f.write(f"a = `{args.a}`, b = `{args.b}`, sf = `{args.sf_dir}`, "
                f"interleaved A,B / B,A per rep, probe-bracketed "
                f"(flag < {args.min_gbps} GB/s).\n\n")
        f.write("| side | probe GB/s | qsum s | flagged |\n|--|--|--|--|\n")
        for s in samples:
            f.write(f"| {s['side']} | {s['membw_pre_gbps']} | {s['qsum']} "
                    f"| {'YES' if s['flagged'] else ''} |\n")
        if "b_over_a_qsum" in result:
            f.write(f"\nClean-sample medians: a {result['a']['qsum_median']}s "
                    f"(n={result['a']['n']}), b {result['b']['qsum_median']}s "
                    f"(n={result['b']['n']}), b/a = "
                    f"**{result['b_over_a_qsum']}**.\n")
        f.write("\nPer-query clean medians:\n\n| query | a | b |\n|--|--|--|\n")
        for n in HEADLINE:
            av = result["a"].get("per_query_median", {}).get(n, "-")
            bv = result["b"].get("per_query_median", {}).get(n, "-")
            f.write(f"| {n} | {av} | {bv} |\n")


if __name__ == "__main__":
    main()
