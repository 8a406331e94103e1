#!/usr/bin/env python3
"""Input row-order permutation probe (round-18 extension).

Builds a corpus identical to <srcDir> except that every table's ROW
ORDER is deterministically shuffled (seeded), keeping the one-file-per-
table `<table>.parquet` layout the oracle SQL depends on (e.g.
scan_file_metadata pins those literal file names). Then the standard
gate — `graft.Verify <dest> <out>` + `tools/check.py <dest> <out>` —
proves every key's RESULT VALUES are invariant to input row order.

Why this axis matters at 100 TB: on a real cluster the scan order of a
table is arbitrary (split assignment, speculative retries, compaction
history). The existing robustness matrix already varies Spark-side
split/partition counts; this probe additionally re-orders what BOTH
engines read, so any key whose semantics silently depend on "first
row wins" / arrival order / file order fails loudly here instead of
on a cluster. (The compare itself is a sorted multiset, so emitted
order is free to differ — only values are pinned.)

Usage: python3 tools/permute_probe.py <srcDir> <destDir> [seed]
       seed default 18 (the round). Re-running with the same seed is
       byte-stable; different seeds give independent permutations.
"""
import sys, os
import numpy as np
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    src, dest = sys.argv[1], sys.argv[2]
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 18
    os.makedirs(dest, exist_ok=True)
    rng = np.random.default_rng(seed)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        perm = rng.permutation(tbl.num_rows)
        shuffled = tbl.take(perm)
        # Single row group, like the driver's fixtures — keeps the probe
        # about ROW ORDER only, not parallelism (the matrix covers that).
        pq.write_table(shuffled, os.path.join(dest, f"{t}.parquet"),
                       row_group_size=max(1, tbl.num_rows))
        # First-row fingerprint proves the order actually changed.
        head = perm[0] if tbl.num_rows else -1
        print(f"[permute] {t}: {tbl.num_rows} rows, seed {seed}, "
              f"row0 <- src row {head}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
