#!/usr/bin/env python3
"""Diff a bench_full.json against the pinned per-key baselines.

The r9 baseline protocol (tools/bench_baseline.py, BASELINE.md) pinned a
median + [min,max] band per key from three separate-JVM runs. This tool
answers the question that burned rounds 5-9: "is this key's number a
regression or machine state?" — mechanically, against the committed band.

A key is flagged only when BOTH hold (absolute + relative, so sub-0.3 s
keys whose 2x swings are scheduler noise stay quiet):

  value > max(band_max * REL_TOL, band_max + ABS_TOL)

Usage:
  python3 tools/bench_compare.py [bench_full.json] [bench_baseline.json]

Exit code 1 if any key is flagged — usable as a gate. Re-pin the baseline
(rerun tools/bench_baseline.py) after intentional perf-relevant changes.
"""
import json
import sys

REL_TOL = 1.5   # x band max — generous: the pinned band is itself 3 JVMs
ABS_TOL = 0.30  # seconds — swallows scheduler noise on fast keys


def main() -> None:
    full_path = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "bench_baseline.json"
    full = json.load(open(full_path))
    base = json.load(open(base_path))

    cur = {k: v["min"] for k, v in full["keys"].items()}
    missing = sorted(set(base["keys"]) - set(cur))
    new = sorted(set(cur) - set(base["keys"]))

    flagged = []
    for k, v in sorted(cur.items()):
        b = base["keys"].get(k)
        if b is None:
            continue
        limit = max(b["max"] * REL_TOL, b["max"] + ABS_TOL)
        if v > limit:
            flagged.append((k, v, b))

    total_cur = round(sum(cur.values()), 2)
    print(f"[bench_compare] {full_path}: total {total_cur} s over "
          f"{len(cur)} keys; baseline sum-of-medians "
          f"{base['total_of_medians']} s over {len(base['keys'])} keys")
    if new:
        print(f"[bench_compare] keys not in baseline (re-pin after adding): {new}")
    if missing:
        # Isolated runs cover a key subset on purpose; keep the note short.
        shown = missing if len(missing) <= 8 else missing[:8] + ["..."]
        print(f"[bench_compare] {len(missing)} baseline key(s) absent from "
              f"this run (partial/isolated run?): {shown}")
    if not flagged:
        print("[bench_compare] all keys inside band — no regression signal")
        return
    print(f"\n[bench_compare] {len(flagged)} key(s) OUTSIDE band "
          f"(> max(band_max*{REL_TOL}, band_max+{ABS_TOL}s)):")
    print("| key | this run | pinned median | band | limit |")
    print("|---|---|---|---|---|")
    for k, v, b in sorted(flagged, key=lambda t: -(t[1] - t[2]["max"])):
        limit = max(b["max"] * REL_TOL, b["max"] + ABS_TOL)
        print(f"| `{k}` | {v:.2f} | {b['median']:.2f} "
              f"| [{b['min']:.2f}-{b['max']:.2f}] | {limit:.2f} |")
    print("\nNext step: isolated 3-JVM re-run of the flagged keys "
          "(tools/bench_baseline.py 3 key1,key2) before treating any "
          "of this as a code regression.")
    sys.exit(1)


if __name__ == "__main__":
    main()
