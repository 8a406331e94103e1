#!/usr/bin/env python3
"""Degenerate-corpus cross-engine check (round 10).

The sf fixtures contain only well-formed documents, so the branches the
text/dedup family takes on DEGENERATE inputs — empty text, whitespace-only
text, docs below the 3-token shingle threshold, trailing-space token
splits, exact duplicates across languages — are never exercised by the
driver's hash gate. A divergence there would be latent until a real
corpus (which always contains such rows at 100 TB) hits it.

This script builds a 15-row adversarial documents.parquet, runs
graft.Verify on the document-only key family against it, and applies the
same DuckDB compare as the driver (tools/check.py). Expected: every
selected key PASS (the remaining inventory reports "declared oracle but
no Spark output" — an artifact of SPARK_GRAFT_KEYS filtering, not a
failure of those keys).

Usage: python3 tools/degen_check.py
"""
import os, subprocess, sys

import pyarrow as pa
import pyarrow.parquet as pq

KEYS = ",".join([
    "text_tokenize_tf", "text_token_count", "text_tfidf", "text_bigram_lm",
    "text_lang_id", "text_lang_stats", "text_quality_score",
    "text_fingerprint", "text_pii_scrub", "text_zipf_coverage",
    "text_heavy_hitters", "dedup_exact", "dedup_exact_normalized",
    "dedup_keep_best", "dedup_ngram_jaccard", "dedup_ngram_capped",
    "dedup_near_minhash", "dedup_simhash", "dedup_cluster_cc",
    "dedup_decontaminate", "sample_stratified", "sample_hash_bernoulli",
])

ROWS = [
    (1, "", "en", "web"),                  # empty text
    (2, " ", "en", "web"),                 # single space
    (3, "   ", "de", "web"),               # whitespace-only
    (4, "hello", "en", "web"),             # one token (below shingle k=3)
    (5, "a b", "de", "web"),               # two tokens
    (6, "a b c", "fr", "web"),             # exactly three tokens
    (7, "a b ", "en", "web"),              # trailing space (split(-1) keeps empty)
    (8, " a", "de", "web"),                # leading space
    (9, "x x x x", "fr", "web"),           # repeated token
    (10, "!!!", "en", "web"),              # punctuation only
    (11, "123 456", "de", "web"),          # digits
    (12, "the quick brown fox jumps over the lazy dog again and again", "en", "web"),
    (13, "the quick brown fox jumps over the lazy dog again and again", "en", "web"),  # exact dup
    (14, "a b c", "en", "web"),            # dup text, different lang
    (15, "word word word word tail", "fr", "web"),
]


def main() -> None:
    sfdir, outdir = "/tmp/degen_sf", "/tmp/vout_degen"
    os.makedirs(sfdir, exist_ok=True)
    t = pa.table({
        "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
        "text": pa.array([r[1] for r in ROWS], pa.string()),
        "lang": pa.array([r[2] for r in ROWS], pa.string()),
        "source": pa.array([r[3] for r in ROWS], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in ROWS], pa.int64()),
    })
    pq.write_table(t, f"{sfdir}/documents.parquet")
    subprocess.run(["rm", "-rf", outdir], check=True)
    env = dict(os.environ, SPARK_GRAFT_CPUS="32", SPARK_GRAFT_KEYS=KEYS)
    subprocess.run(["sbt", "-batch", f"runMain graft.Verify {sfdir} {outdir}"],
                   env=env, check=True, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL)
    out = subprocess.run([sys.executable, "tools/check.py", sfdir, outdir],
                         capture_output=True, text=True).stdout
    selected = set(KEYS.split(","))
    n_pass = sum(1 for l in out.splitlines()
                 if l.startswith("PASS ") and l.split()[1].rstrip(":") in selected)
    fails = [l for l in out.splitlines()
             if l.startswith("FAIL ") and l.split()[1].rstrip(":") in selected]
    print("\n".join(l for l in out.splitlines()
                    if l.split(" ", 1)[-1].split(":")[0] in selected or
                    l.startswith("==")))
    print(f"[degen_check] {n_pass}/{len(selected)} selected keys pass")
    sys.exit(1 if fails or n_pass != len(selected) else 0)


if __name__ == "__main__":
    main()
