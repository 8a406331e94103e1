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

Key-filtered runs are the protocol's ISOLATED ARBITER (r14 verdict task
2): they write bench_baseline_isolated.json and — because a small subset
run pays a cold-JVM floor the full-inventory pins never see (measured
r12/r14: controls read ~1.5-1.8x their full-run pins on byte-identical
code) — the two CONTROL keys are always appended to the filter and the
artifact carries the floor CORRECTION, not just raw numbers:

  control_ratios   = isolated control median / pinned control median
  floor_adjusted   = (isolated key median / pinned key median)
                       / central(control_ratios)

floor_adjusted ~ 1.0 means the key is exactly as far over its pin as the
never-changing controls are over theirs — machine state / cold floor. A
real regression survives the division. tools/bench_compare.py consumes
the artifact (threshold documented there: ISOLATED_OK) and this script
prints the same verdict per key; it also resolves a pending-requiet
artifact (bench_pending_requiet.json, written by bench_compare for
flagged runs) when the verdict clears every key the artifact names.

Usage:
  python3 tools/bench_baseline.py [n_runs] [key1,key2,...]

The optional key filter forwards to SPARK_GRAFT_KEYS for isolated
adjudication runs (e.g. dedup_cluster_cc,dedup_decontaminate).
"""
import json, os, statistics, subprocess, sys, time

CONTROL_KEYS = ("agg_daily_counts", "fn_math")  # keep in sync: Bench.scala,
                                                # tools/bench_compare.py
ISOLATED_OK = 1.3  # keep in sync with tools/bench_compare.py
PENDING_PATH = "bench_pending_requiet.json"


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
    requested = None
    if keys_filter:
        requested = sorted({k for k in keys_filter.split(",") if k.strip()})
        # The floor correction needs the controls measured INSIDE the same
        # isolated runs — append them to every key-filtered invocation.
        keys_filter = ",".join(sorted(set(requested) | set(CONTROL_KEYS)))
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
    # Per-run load-calibration stamps (Bench >= r17): the pin protocol's
    # "quiet box verified" clause becomes mechanical — a pin whose runs
    # stamp >~1.3x the quiet reference was taken on a loaded box and
    # should be discarded, exactly like the r16 contended-middle-run
    # re-pin, without needing the per-run-totals forensics.
    cals = [r.get("load_cal") for r in runs]
    out = {
        "n_runs": n,
        "sf": runs[0]["sf"],
        "cpus": runs[0]["cpus"],
        "generated_at": int(time.time()),
        "per_run_totals": totals,
        "per_run_load_cal": cals,
        "total_of_medians": round(sum(v["median"] for v in rec.values()), 2),
        "keys": rec,
    }
    verdicts = {}
    if keys_filter:
        # Floor calibration against the committed full-inventory pins.
        try:
            pins = json.load(open("bench_baseline.json"))["keys"]
        except (OSError, ValueError):
            pins = {}
        ctl_ratios = {
            c: round(rec[c]["median"] / pins[c]["median"], 3)
            for c in CONTROL_KEYS
            if c in rec and c in pins and pins[c]["median"] > 0
        }
        rs = sorted(ctl_ratios.values())
        central = None if not rs else (
            rs[len(rs) // 2] if len(rs) % 2
            else (rs[len(rs) // 2 - 1] + rs[len(rs) // 2]) / 2)
        out["control_ratios"] = ctl_ratios
        out["central_control_ratio"] = round(central, 3) if central else None
        fa = {}
        for k in keys:
            if k in CONTROL_KEYS or k not in pins or not central:
                continue
            ratio = rec[k]["median"] / pins[k]["median"]
            fa[k] = round(ratio / central, 3)
        out["floor_adjusted"] = fa
        verdicts = {k: ("machine state / cold floor" if v <= ISOLATED_OK
                        else "REGRESSION CONFIRMED (reproduces isolated)")
                    for k, v in fa.items()}
    path = "bench_baseline.json" if not keys_filter else "bench_baseline_isolated.json"
    json.dump(out, open(path, "w"), indent=1)
    print(f"[bench_baseline] wrote {path}")
    print(f"[bench_baseline] per-run totals: {totals}; "
          f"sum of per-key medians: {out['total_of_medians']}")
    for i, c in enumerate(cals):
        if c:
            q = c.get("quiet_ref_ms") or 55
            print(f"[bench_baseline] run {i + 1} load_cal: "
                  f"{c['start_ms']:.0f}/{c['end_ms']:.0f} ms "
                  f"({c['start_ms'] / q:.2f}x/{c['end_ms'] / q:.2f}x quiet ref)"
                  + ("  <- LOADED BOX, discard this pin attempt"
                     if max(c['start_ms'], c['end_ms']) / q > 1.3 else ""))
    if keys_filter:
        print(f"[bench_baseline] control ratios vs full-inventory pins: "
              f"{out['control_ratios']} (central "
              f"{out['central_control_ratio']}) — the isolated cold floor")
        for k in sorted(verdicts):
            print(f"[bench_baseline]   {k}: median {rec[k]['median']:.2f} "
                  f"(pin {json.load(open('bench_baseline.json'))['keys'][k]['median']:.2f}), "
                  f"floor-adjusted {out['floor_adjusted'][k]:.2f} -> {verdicts[k]}")
        # Consume the pending-requiet artifact when every key it names is
        # cleared by this arbiter run (r14 ADVICE: the artifact exists so
        # a contended flag can't silently pass — this IS the later gate).
        if os.path.exists(PENDING_PATH):
            try:
                pend_keys = set(json.load(open(PENDING_PATH)).get("keys", {}))
            except (OSError, ValueError):
                pend_keys = set()
            covered = pend_keys and pend_keys <= set(verdicts)
            clean = covered and all(
                out["floor_adjusted"][k] <= ISOLATED_OK for k in pend_keys)
            if clean:
                os.remove(PENDING_PATH)
                print(f"[bench_baseline] {PENDING_PATH} resolved and removed "
                      "— all its keys adjudicate machine state.")
            elif covered:
                print(f"[bench_baseline] {PENDING_PATH} NOT resolved — at "
                      "least one key reproduces isolated (see verdicts).")
            elif pend_keys:
                print(f"[bench_baseline] {PENDING_PATH} names keys outside "
                      f"this run ({sorted(pend_keys - set(verdicts))}) — "
                      "rerun with them included to resolve it.")
    print()
    print("| key | median s | min | max |")
    print("|---|---|---|---|")
    for k in sorted(keys, key=lambda k: -rec[k]["median"]):
        v = rec[k]
        print(f"| `{k}` | {v['median']:.2f} | {v['min']:.2f} | {v['max']:.2f} |")
    if any("REGRESSION" in v for v in verdicts.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
