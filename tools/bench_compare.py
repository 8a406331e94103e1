#!/usr/bin/env python3
"""Diff a bench_full.json against the pinned per-key baselines.

The r9 baseline protocol (tools/bench_baseline.py, BASELINE.md) pinned a
median + [min,max] band per key from three separate-JVM runs. This tool
answers the question that burned rounds 5-9: "is this key's number a
regression or machine state?" — mechanically, against the committed band.

A key is flagged only when BOTH hold (absolute + relative, so sub-0.3 s
keys whose 2x swings are scheduler noise stay quiet):

  value > max(band_max * REL_TOL, band_max + ABS_TOL)

Each flagged key is then CLASSIFIED (r14 verdict task 1 amended the r13
two-way rule after its fixed 1.4 threshold misclassified the r14 driver
run's mild-contention tail — controls 1.26-1.29x, flagged keys later
PROVEN machine state by the isolated arbiter):

  1. A fresh covering bench_baseline_isolated.json (written by
     tools/bench_baseline.py AFTER this run, carrying floor_adjusted —
     the isolated key ratio divided by the same runs' central control
     ratio) is the FINAL ARBITER:
       floor_adjusted <= ISOLATED_OK  ->  CONTENDED (isolated-adjudicated)
       otherwise                      ->  OVER-BAND (isolated-confirmed:
                                          the slowdown reproduces on a
                                          quiet box — a real regression)
  2. No arbiter, central control ratio >= CONTROL_INFLATED: CONTENDED
     (box-wide burst: the controls themselves are far over pin — the r13
     text_bigram_lm false flag, where agg_daily_counts ran 2.0x). Even
     here a pending-requiet artifact is written (r14 ADVICE: a contended
     flag must never be a silent pass) — the next
     `tools/bench_baseline.py 3 <keys>` consumes it.
  3. No arbiter, central control ratio in (CONTROL_QUIET,
     CONTROL_INFLATED): PENDING — a mild tail that THIS RUN cannot
     adjudicate either way (the r14 class: keys ~1.7-2.0x pin, controls
     ~1.27x — ratio-of-ratios cannot separate that from a real
     regression without masking one, since any flagged key is >= 1.5x
     band max by flag construction). Writes the pending-requiet
     artifact and exits 3: not green, not regression-confirmed.
  4. No arbiter, controls quiet (<= CONTROL_QUIET): OVER-BAND
     (regression candidate: the box is quiet, only this key moved —
     e.g. the synthetic SPARK_GRAFT_BENCH_SLEEP_KEY rehearsal, whose
     controls read 1.00-1.11x).

Control evidence preference: "rerun2_controls" from bench_full.json
(taken by Bench INSIDE the delayed re-measure window, temporally next to
the surviving flag) when present, else the sweep's own control numbers.
A control key can never vouch for itself. Controls must stay untouched
round-over-round; deliberately changing one means re-pinning and
updating CONTROL_KEYS here AND in Bench.scala.

Synthetic artifacts: a bench_full.json stamped "synthetic_sleep" (Bench
writes it whenever SPARK_GRAFT_BENCH_SLEEP_KEY was live) can NEVER exit
0 — classification still prints (the rehearsal reads it) but a leaked
knob cannot produce a green artifact (exit 4 if nothing else failed).

Usage:
  python3 tools/bench_compare.py [bench_full.json] [bench_baseline.json]
                                 [--auto-requiet]

  --auto-requiet: for surviving flags with no fresh arbiter, shell out to
  `tools/bench_baseline.py 3 <flagged keys>` (three isolated JVMs, ~min),
  then fold the arbiter's floor-adjusted verdict into the exit code — the
  r14 verdict's "auto-trigger the isolated re-run" option.

Exit codes: 0 all green / adjudicated machine-state; 1 any OVER-BAND;
3 PENDING (needs the isolated arbiter); 4 synthetic artifact, otherwise
green. Re-pin the baseline (rerun tools/bench_baseline.py) after
intentional perf-relevant changes.
"""
import json
import os
import subprocess
import sys
import time

REL_TOL = 1.5   # x band max — generous: the pinned band is itself 3 JVMs
ABS_TOL = 0.30  # seconds — swallows scheduler noise on fast keys
ROUND_EPS = 0.005  # bench_full stores 2-decimal seconds; the limit is
                   # unrounded — compare past the half-quantum so a
                   # round-to-the-limit value can't misread as a flag

CONTROL_KEYS = ("agg_daily_counts", "fn_math")
CONTROL_INFLATED = 1.4  # central control ratio >= this => box-wide burst
CONTROL_QUIET = 1.15    # central control ratio <= this => box is quiet
# Isolated-arbiter verdict threshold on floor_adjusted = (isolated key
# median / pin) / (central isolated control ratio). Clean keys read ~1.0
# by construction (both numerator and denominator carry the isolated-run
# cold floor, BASELINE.md r12/r14: ~1.5-1.8x); the r14 adjudication read
# 0.93-0.95. A regression big enough to flag at all is >= 1.5x band max
# (>= ~1.6x median), which reads >= ~1.33 even under the measured
# per-shape floor spread — 1.3 separates the two populations.
ISOLATED_OK = 1.3

PENDING_PATH = "bench_pending_requiet.json"
ISOLATED_PATH = "bench_baseline_isolated.json"


def generated_at(doc: dict, path: str) -> float:
    """Epoch seconds the artifact was produced: embedded stamp when the
    writer recorded one (Bench >= r15, bench_baseline.py >= r15), file
    mtime otherwise (pre-r15 artifacts, replay fixtures)."""
    g = doc.get("generated_at")
    return float(g) if g is not None else os.path.getmtime(path)


def load_arbiter(run_ts: float, need_keys: set) -> dict | None:
    """The isolated 3-JVM artifact, iff it POSTDATES the judged run,
    carries the r15 floor_adjusted verdicts, and covers every surviving
    flag — else None (a stale or partial arbiter can't vouch)."""
    try:
        iso = json.load(open(ISOLATED_PATH))
    except (OSError, ValueError):
        return None
    if generated_at(iso, ISOLATED_PATH) <= run_ts:
        return None
    fa = iso.get("floor_adjusted") or {}
    if not need_keys <= set(fa):
        return None
    return iso


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--auto-requiet"]
    auto_requiet = "--auto-requiet" in sys.argv[1:]
    full_path = args[0] if len(args) > 0 else "bench_full.json"
    base_path = args[1] if len(args) > 1 else "bench_baseline.json"
    full = json.load(open(full_path))
    base = json.load(open(base_path))
    run_ts = generated_at(full, full_path)
    synthetic = full.get("synthetic_sleep")

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

    def central(usable: dict) -> float | None:
        if not usable:
            return None
        rs = sorted(usable.values())
        return rs[len(rs) // 2] if len(rs) % 2 else (
            (rs[len(rs) // 2 - 1] + rs[len(rs) // 2]) / 2)

    flag_keys = {k for k, _, _ in flagged}
    arbiter = load_arbiter(run_ts, flag_keys) if flagged else None

    def classify(k):
        """-> (verdict, note). Verdicts: CONTENDED / OVER-BAND / PENDING."""
        if arbiter is not None:
            fa = arbiter["floor_adjusted"][k]
            note = f"isolated floor-adj {fa:.2f}"
            return (("CONTENDED" if fa <= ISOLATED_OK else "OVER-BAND"),
                    note + (" — adjudicated" if fa <= ISOLATED_OK
                            else " — reproduces isolated: REGRESSION"))
        usable = {c: r for c, r in ctl.items() if c != k}
        med = central(usable)
        if med is None:
            return "OVER-BAND", "no control evidence: stay strict"
        note = f"controls {med:.2f}x"
        if med >= CONTROL_INFLATED:
            return "CONTENDED", note + " — box-wide burst"
        if med > CONTROL_QUIET:
            return "PENDING", note + " — mild tail, needs isolated arbiter"
        return "OVER-BAND", note + " — quiet box, only this key moved"

    def finish(code: int) -> None:
        if synthetic:
            print(f"\n[bench_compare] SYNTHETIC ARTIFACT: this run carried "
                  f"synthetic_sleep={synthetic} (rehearsal knob) — never a "
                  "real bench number; refusing a green exit.")
            code = code or 4
        sys.exit(code)

    total_cur = round(sum(cur.values()), 2)
    print(f"[bench_compare] {full_path}: total {total_cur} s over "
          f"{len(cur)} keys; baseline sum-of-medians "
          f"{base['total_of_medians']} s over {len(base['keys'])} keys")
    # Load calibration stamp (r16 verdict task 4): Bench times a fixed
    # amount of work spun on N PARALLEL threads (N = executor width —
    # a single-threaded spin is blind to autogroup contention, see
    # Bench.scala) at sweep start and end, plus one mid-run sample per
    # re-measure pass when flags fired (r17 task 4 — closes the
    # burst-fully-inside-the-sweep blind spot); vs the pinned quiet
    # reference this reads ambient box load mechanically. Evidence only —
    # the flag CLASSIFICATION stays control-key/arbiter-based.
    cal = full.get("load_cal")
    if cal:
        q = cal.get("quiet_ref_ms") or 55  # match Bench's stamped default
        mid = cal.get("mid_ms") or []
        midtxt = ("" if not mid else
                  " / mid " + ", ".join(f"{m / q:.2f}x" for m in mid)
                  + " (re-measure windows)")
        print(f"[bench_compare] load calibration: fixed-work N-wide spin "
              f"{cal['start_ms']:.0f} ms at start / {cal['end_ms']:.0f} ms at "
              f"end vs quiet ref {q} ms -> load factor "
              f"{cal['start_ms'] / q:.2f}x / {cal['end_ms'] / q:.2f}x{midtxt}")
    if new:
        print(f"[bench_compare] keys not in baseline (re-pin after adding): {new}")
    if missing:
        # Isolated runs cover a key subset on purpose; keep the note short.
        shown = missing if len(missing) <= 8 else missing[:8] + ["..."]
        print(f"[bench_compare] {len(missing)} baseline key(s) absent from "
              f"this run (partial/isolated run?): {shown}")
    if not flagged:
        if os.path.exists(PENDING_PATH):
            print(f"[bench_compare] note: stale {PENDING_PATH} on disk from "
                  "an earlier flagged run — resolve it with "
                  "tools/bench_baseline.py or delete it consciously.")
        print("[bench_compare] all keys inside band — no regression signal")
        finish(0)
    if ctl:
        pretty = ", ".join(f"{c} {r:.2f}x" for c, r in sorted(ctl.items()))
        print(f"[bench_compare] control-key ratios ({ctl_src}): {pretty}")
    else:
        print("[bench_compare] WARNING: no control-key evidence in this run "
              f"(need {CONTROL_KEYS} in the run and the baseline) — all "
              "flags stay OVER-BAND")
    if arbiter is not None:
        print(f"[bench_compare] isolated arbiter: {ISOLATED_PATH} postdates "
              f"this run and covers all flags — its floor-adjusted verdict "
              f"(threshold {ISOLATED_OK}) overrides control heuristics")

    def emit_table():
        print(f"\n[bench_compare] {len(flagged)} key(s) OUTSIDE band "
              f"(> max(band_max*{REL_TOL}, band_max+{ABS_TOL}s)):")
        print("| key | this run | pinned median | band | limit | verdict |")
        print("|---|---|---|---|---|---|")
        verdicts = {}
        for k, v, b in sorted(flagged, key=lambda t: -(t[1] - t[2]["max"])):
            limit = max(b["max"] * REL_TOL, b["max"] + ABS_TOL)
            verdict, note = classify(k)
            verdicts[k] = verdict
            print(f"| `{k}` | {v:.2f} | {b['median']:.2f} "
                  f"| [{b['min']:.2f}-{b['max']:.2f}] | {limit:.2f} "
                  f"| {verdict} ({note}) |")
        return verdicts

    verdicts = emit_table()

    def write_pending(keys):
        doc = {
            "written_at": int(time.time()),
            "source_run": full_path,
            "source_generated_at": run_ts,
            "control_ratios": {c: round(r, 3) for c, r in ctl.items()},
            "keys": {k: {"value": cur[k],
                         "pin_median": base["keys"][k]["median"],
                         "ratio": round(cur[k] / base["keys"][k]["median"], 3)}
                     for k in sorted(keys)},
            "resolve_with":
                "python3 tools/bench_baseline.py 3 " + ",".join(sorted(keys)),
        }
        json.dump(doc, open(PENDING_PATH, "w"), indent=1)
        print(f"\n[bench_compare] wrote {PENDING_PATH} — a flagged run is "
              "never a silent pass; run the resolve_with command (three "
              "isolated JVMs) to adjudicate.")

    unresolved = {k for k, v in verdicts.items() if v in ("PENDING", "OVER-BAND")}
    if auto_requiet and unresolved and arbiter is None:
        keys_arg = ",".join(sorted(unresolved))
        print(f"\n[bench_compare] --auto-requiet: running the isolated "
              f"3-JVM arbiter for {keys_arg} ...")
        rc = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "bench_baseline.py"), "3", keys_arg],
        ).returncode
        if rc == 0:
            arbiter = load_arbiter(run_ts, unresolved)
            if arbiter is not None:
                print("[bench_compare] arbiter verdict folded in — "
                      "re-classifying:")
                verdicts = emit_table()
        else:
            print(f"[bench_compare] arbiter run failed (exit {rc}) — "
                  "keeping pre-arbiter verdicts")

    over_band = sum(1 for v in verdicts.values() if v == "OVER-BAND")
    pending = sum(1 for v in verdicts.values() if v == "PENDING")
    contended = sum(1 for v in verdicts.values() if v == "CONTENDED")

    if over_band:
        write_pending({k for k, v in verdicts.items() if v == "OVER-BAND"})
        print("\nOVER-BAND flag(s): regression candidate(s). If no fresh "
              "isolated evidence exists yet, run the pending artifact's "
              "resolve_with command before treating this as final.")
        finish(1)
    if pending:
        write_pending({k for k, v in verdicts.items()
                       if v in ("PENDING", "CONTENDED")})
        print("\nPENDING flag(s): this run's controls are mildly inflated — "
              "neither green nor a confirmed regression. Exit 3 until the "
              "isolated arbiter rules (or rerun with --auto-requiet).")
        finish(3)
    # All CONTENDED. Adjudicated (arbiter) => consume any pending artifact;
    # heuristic-only (box-wide burst) => leave a pending artifact so the
    # isolated arbiter still gets its look (r14 ADVICE).
    if arbiter is not None:
        if os.path.exists(PENDING_PATH):
            try:
                pend = json.load(open(PENDING_PATH))
                if set(pend.get("keys", {})) <= set(verdicts):
                    os.remove(PENDING_PATH)
                    print(f"\n[bench_compare] {PENDING_PATH} consumed — its "
                          "keys are isolated-adjudicated machine state.")
            except (OSError, ValueError):
                pass
        print(f"\nAll {contended} flag(s) CONTENDED per the isolated "
              "arbiter: machine state, not a regression.")
        finish(0)
    write_pending(set(verdicts))
    print(f"\nAll {contended} flag(s) CONTENDED (controls inflated alongside "
          "them): machine state by the box-wide-burst heuristic — the "
          "pending artifact stands until an isolated re-run confirms.")
    finish(0)


if __name__ == "__main__":
    main()
