#!/usr/bin/env python3
"""Pin per-key bench baselines (VERDICT r7 task 1 / r8 task 1).

Runs `graft.Bench` N times (default 3), each in its OWN JVM (one sbt
invocation per run), collects the complete per-key record each run writes
to bench_full.json, and emits:

  - bench_baseline.json   — per key: median / min / max of the per-run
                            min-of-3, plus the raw per-run numbers
  - stdout                — a markdown table ready to paste into
                            BASELINE.md, keys sorted by median desc

A separate-JVM median is the noise protocol the r5–r8 verdicts asked for:
within one JVM, min-of-3 absorbs stragglers; ACROSS JVMs, the median of
three independent runs separates machine-state swings (r7: 47.5↔63.1 s on
identical code) from real regressions.

Usage:
  python3 tools/bench_baseline.py [n_runs] [key1,key2,...]

The optional key filter forwards to SPARK_GRAFT_KEYS for isolated
adjudication runs (e.g. dedup_cluster_cc,dedup_decontaminate).
"""
import json, os, statistics, subprocess, sys


def run_once(i: int, keys: str | None) -> dict:
    out = f"/tmp/graft_bench_full_run{i}.json"
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        SPARK_GRAFT_BENCH_FULL=out,
        # Pinning runs must be pure min-of-3: Bench's early-accept reads
        # the EXISTING bench_baseline.json, and letting the pin's own
        # input be truncated by the previous pin would bias medians up
        # across re-pins.
        SPARK_GRAFT_EARLY_ACCEPT="0",
    )
    if keys:
        env["SPARK_GRAFT_KEYS"] = keys
    print(f"[bench_baseline] run {i + 1}: separate JVM, "
          f"{'keys=' + keys if keys else 'full inventory'}", flush=True)
    subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env=env, check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # sbt may not fork `run`, but each sbt invocation above IS a fresh JVM.
    return json.load(open(out))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    keys_filter = sys.argv[2] if len(sys.argv) > 2 else None
    runs = [run_once(i, keys_filter) for i in range(n)]
    keys = sorted(runs[0]["keys"])
    rec = {}
    for k in keys:
        mins = [r["keys"][k]["min"] for r in runs]
        rec[k] = {
            "median": round(statistics.median(mins), 2),
            "min": round(min(mins), 2),
            "max": round(max(mins), 2),
            "runs": mins,
        }
    totals = [round(sum(r["keys"][k]["min"] for k in keys), 2) for r in runs]
    out = {
        "n_runs": n,
        "sf": runs[0]["sf"],
        "cpus": runs[0]["cpus"],
        "per_run_totals": totals,
        "total_of_medians": round(sum(v["median"] for v in rec.values()), 2),
        "keys": rec,
    }
    path = "bench_baseline.json" if not keys_filter else "bench_baseline_isolated.json"
    json.dump(out, open(path, "w"), indent=1)
    print(f"[bench_baseline] wrote {path}")
    print(f"[bench_baseline] per-run totals: {totals}; "
          f"sum of per-key medians: {out['total_of_medians']}")
    print()
    print("| key | median s | min | max |")
    print("|---|---|---|---|")
    for k in sorted(keys, key=lambda k: -rec[k]["median"]):
        v = rec[k]
        print(f"| `{k}` | {v['median']:.2f} | {v['min']:.2f} | {v['max']:.2f} |")


if __name__ == "__main__":
    main()
