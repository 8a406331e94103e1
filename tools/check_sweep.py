#!/usr/bin/env python3
"""Per-key driver of tools/check.py for at-scale Verify dumps.

One serial check.py run over a big-corpus dump is CHECKER-bound, not
engine-bound (measured r16 at x16 facts: the Python sorted-multiset
compare runs minutes per multi-million-row key, and one slow key hides
which keys are heavy). This sweep runs check.py once PER KEY — a temp
outdir holding a symlink to the key's result dir plus oracle_sql.json —
with a per-key timeout, then tallies PASS / FAIL / TIMEOUT. Keys that
time out are the heavy-compare ones: re-run just those untimed
(`--only k1,k2 --timeout 0`) instead of restarting the whole gate.

Usage:
  python3 tools/check_sweep.py <sfDir> <verifyOutDir> [--timeout SECS]
                               [--only k1,k2,...]

Exit 0 iff every swept key PASSes (timeouts are failures — resolve them
with an untimed re-run before claiming the gate).
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    args = [a for a in sys.argv[1:]]
    if len(args) < 2:
        sys.exit(__doc__)
    sfdir, outdir = args[0], args[1]
    timeout = 900
    only = None
    for i, a in enumerate(args):
        if a == "--timeout":
            timeout = int(args[i + 1])
        if a == "--only":
            only = set(args[i + 1].split(","))
    oracle_path = os.path.join(outdir, "oracle_sql.json")
    keys = sorted(k for k in os.listdir(outdir)
                  if os.path.isdir(os.path.join(outdir, k)))
    # Declared-but-missing keys are FAILURES, not silent skips (r16
    # ADVICE): a key whose Spark side crashed produces no result dir, so
    # sweeping only the dirs present would exit 0 where a full check.py
    # run prints 'FAIL <key>: declared oracle but no Spark output'.
    declared = sorted(json.load(open(oracle_path)))
    missing = [k for k in declared if k not in keys]
    if only is not None:
        keys = [k for k in keys if k in only]
        missing = [k for k in missing if k in only]
    n_pass, failed, timed_out = 0, list(missing), []
    for k in missing:
        print(f"FAIL {k}: declared oracle but no Spark output", flush=True)
    for k in keys:
        w = tempfile.mkdtemp(prefix=f"check_sweep_{k}_")
        try:
            os.symlink(os.path.join(outdir, k), os.path.join(w, k))
            os.symlink(oracle_path, os.path.join(w, "oracle_sql.json"))
            try:
                r = subprocess.run(
                    [sys.executable, os.path.join(HERE, "check.py"), sfdir, w],
                    capture_output=True, text=True,
                    timeout=(timeout if timeout > 0 else None))
            except subprocess.TimeoutExpired:
                timed_out.append(k)
                print(f"TIMEOUT {k} (> {timeout}s — heavy compare; re-run "
                      f"with --only {k} --timeout 0)", flush=True)
                continue
            # check.py also prints a FAIL line for every DECLARED oracle
            # with no result dir in the temp outdir — only this key's
            # verdict line is meaningful. Match WITH the ': ' separator
            # (check.py always emits it): key names with prefix
            # collisions exist (sql_tpch_q1/q11, fn_map/fn_map_hof, ...),
            # so a bare-prefix match could latch onto another key's
            # missing-dir FAIL line if this key's own line were ever
            # non-PASS/FAIL (r16 ADVICE).
            line = next((ln for ln in r.stdout.splitlines()
                         if ln.startswith(f"PASS {k}:") or ln.startswith(f"FAIL {k}:")),
                        f"FAIL {k}: no verdict line")
            print(line, flush=True)
            if line.startswith("PASS "):
                n_pass += 1
            else:
                failed.append(k)
        finally:
            shutil.rmtree(w, ignore_errors=True)
    total = len(keys) + len(missing)
    print(f"\n== sweep: {n_pass} pass, {len(failed)} fail, "
          f"{len(timed_out)} timeout of {total} ==")
    if failed:
        print("failed:", " ".join(failed))
    if timed_out:
        print("timed out:", " ".join(timed_out))
    sys.exit(0 if n_pass == total else 1)


if __name__ == "__main__":
    main()
