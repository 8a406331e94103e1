#!/usr/bin/env python3
"""Diff a bench_full.json against the pinned per-key baselines.

The r9 baseline protocol (tools/bench_baseline.py, BASELINE.md) pinned a
median + [min,max] band per key from three separate-JVM runs. This tool
answers the question that burned rounds 5-9: "is this key's number a
regression or machine state?" — mechanically, against the committed band.

A key is flagged only when BOTH hold (absolute + relative, so sub-0.3 s
keys whose 2x swings are scheduler noise stay quiet):

  value > max(band_max * REL_TOL, band_max + ABS_TOL)

Each flagged key is then CLASSIFIED against the CONTROL keys (r13 verdict
task 1 — pinned, never-changing keys measured in the same run):

  control ratio = control value / control pinned median
    (Bench takes each rerun2-window control as a WARM min-of-3 — the
    same statistic as the flagged key's judged number, so a single
    cold/noisy control draw can't bias the ratio high and mask a
    regression)
  central control ratio >= CONTROL_INFLATED ->  CONTENDED (machine state:
      the whole box is inflated, not this key's code — the r13
      text_bigram_lm false flag, where agg_daily_counts ran 2.0x and
      text_tfidf 1.9x their pins on byte-identical code)
  otherwise                                 ->  OVER-BAND (regression
      candidate: the box is quiet, only this key moved — e.g. the
      synthetic SPARK_GRAFT_BENCH_SLEEP_KEY rehearsal)

Control evidence preference: "rerun2_controls" from bench_full.json
(taken by Bench INSIDE the delayed re-measure window, temporally next to
the surviving flag) when present, else the sweep's own control numbers.
A control key can never vouch for itself. Controls must stay untouched
round-over-round; deliberately changing one means re-pinning and
updating CONTROL_KEYS here AND in Bench.scala.

Usage:
  python3 tools/bench_compare.py [bench_full.json] [bench_baseline.json]

Exit code 1 only if any flagged key classifies OVER-BAND — CONTENDED
flags are machine-state, self-adjudicated, and exit 0 (still printed).
Re-pin the baseline (rerun tools/bench_baseline.py) after intentional
perf-relevant changes.
"""
import json
import sys

REL_TOL = 1.5   # x band max — generous: the pinned band is itself 3 JVMs
ABS_TOL = 0.30  # seconds — swallows scheduler noise on fast keys
ROUND_EPS = 0.005  # bench_full stores 2-decimal seconds; the limit is
                   # unrounded — compare past the half-quantum so a
                   # round-to-the-limit value can't misread as a flag

CONTROL_KEYS = ("agg_daily_counts", "fn_math")
CONTROL_INFLATED = 1.4  # central (median; mean-of-2) control ratio => CONTENDED


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
        if v > limit + ROUND_EPS:
            flagged.append((k, v, b))

    def ratios_from(vals):
        out = {}
        for c in CONTROL_KEYS:
            b = base["keys"].get(c)
            v = vals.get(c)
            if b and v is not None and v > 0 and b["median"] > 0:
                out[c] = v / b["median"]
        return out

    # Prefer control timings taken inside the delayed re-measure window
    # (temporally local to any surviving flag); fall back to the sweep's.
    rr2 = ratios_from(full.get("rerun2_controls") or {})
    sweep = ratios_from(cur)
    ctl_src = "rerun2 window" if rr2 else "sweep"
    ctl = rr2 if rr2 else sweep

    def classify(k):
        usable = {c: r for c, r in ctl.items() if c != k}
        if not usable:
            return "OVER-BAND", None  # no control evidence: stay strict
        rs = sorted(usable.values())
        med = rs[len(rs) // 2] if len(rs) % 2 else (
            (rs[len(rs) // 2 - 1] + rs[len(rs) // 2]) / 2)
        return ("CONTENDED" if med >= CONTROL_INFLATED else "OVER-BAND"), med

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
    if ctl:
        pretty = ", ".join(f"{c} {r:.2f}x" for c, r in sorted(ctl.items()))
        print(f"[bench_compare] control-key ratios ({ctl_src}): {pretty}")
    else:
        print("[bench_compare] WARNING: no control-key evidence in this run "
              f"(need {CONTROL_KEYS} in the run and the baseline) — all "
              "flags stay OVER-BAND")
    print(f"\n[bench_compare] {len(flagged)} key(s) OUTSIDE band "
          f"(> max(band_max*{REL_TOL}, band_max+{ABS_TOL}s)):")
    print("| key | this run | pinned median | band | limit | verdict |")
    print("|---|---|---|---|---|---|")
    over_band = 0
    for k, v, b in sorted(flagged, key=lambda t: -(t[1] - t[2]["max"])):
        limit = max(b["max"] * REL_TOL, b["max"] + ABS_TOL)
        verdict, med = classify(k)
        if verdict == "OVER-BAND":
            over_band += 1
        note = f" (controls {med:.2f}x)" if med is not None else ""
        print(f"| `{k}` | {v:.2f} | {b['median']:.2f} "
              f"| [{b['min']:.2f}-{b['max']:.2f}] | {limit:.2f} "
              f"| {verdict}{note} |")
    if over_band:
        print("\nNext step: isolated 3-JVM re-run of the OVER-BAND keys "
              "(tools/bench_baseline.py 3 key1,key2) before treating any "
              "of this as a code regression.")
        sys.exit(1)
    print("\nAll flags CONTENDED (controls inflated alongside them): "
          "machine state, not a regression — re-run under quiet "
          "conditions if the number matters.")


if __name__ == "__main__":
    main()
