#!/usr/bin/env python3
"""Eviction-correctness certificate at a big corpus (driver-side tooling).

Runs graft.Verify TWICE against the same SF dir — once unbudgeted, once
with SPARK_GRAFT_MEMO_BUDGET_MB set low enough that every memoized base
is evicted and recomputed between queries — then proves Spark-vs-Spark
OUTPUT IDENTITY per query (canonical row-sorted value hash via DuckDB,
same canonicalization idea as check.py, column-name order, NaN
normalized). The DuckDB oracle itself is impractical at 100× scale, so
identity against the unbudgeted run (whose plan equals the oracle-gated
sf0.01/sf0.1 one) is the certificate: eviction changed NOTHING but
recompute timing.

Pair-listing dedup queries are skipped by output shape at replica
corpora (quadratic rows by construction — docs/ROUND15_NOTES.md §7);
the list is passed through to SPARK_GRAFT_VERIFY_SKIP.

Usage: python3 scripts/evict_check.py SFDIR BUDGET_MB [HEAP] [EXTRA_SKIP_FILE]

EXTRA_SKIP_FILE (optional): comma-separated query names to skip on top
of the built-in quadratic-output family — used to focus the certificate
on the memo-USING families plus a stateless control sample (stateless
queries never read a memo, so eviction cannot change their output;
skipping them buys runtime, not risk).
"""
import glob, json, os, subprocess, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ADD_OPENS = [f"--add-opens={p}=ALL-UNNAMED" for p in [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
    "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar"]]

# Quadratic-output-on-replica-corpora family (pair listings + their
# collapsed twins' cross rows, which are themselves quadratic on the
# NEAR-dup documents corpus — docs/ROUND17_NOTES.md §3c).
SKIP = ",".join([
    "dedup_ngram_jaccard", "dedup_shingle_cosine", "dedup_containment",
    "dedup_simhash_pairs", "dedup_minhash_lsh", "dedup_embedding_cosine",
    "dedup_prefix_jaccard", "dedup_substring_spans",
    "dedup_substring_coverage", "dedup_paragraphs",
    "dedup_ngram_jaccard_collapsed", "dedup_shingle_cosine_collapsed",
    "dedup_containment_collapsed", "dedup_incremental_minhash",
    "dedup_incremental_semantic", "dedup_incremental_batch"])


def run_verify(sfdir, outdir, heap, budget_mb, extra_skip=""):
    cp = f"{REPO}/target/scala-2.13/classes:" + ":".join(
        glob.glob("/opt/spark/jars/*.jar"))
    skip = SKIP + ("," + extra_skip if extra_skip else "")
    env = dict(os.environ, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_VERIFY_SKIP=skip)
    if budget_mb:
        env["SPARK_GRAFT_MEMO_BUDGET_MB"] = str(budget_mb)
    cmd = (["java"] + ADD_OPENS + [f"-Xmx{heap}",
           "-Dspark.ui.enabled=false", "-cp", cp, "graft.Verify",
           sfdir, outdir])
    r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                       timeout=7200)
    evictions = r.stderr.count("memo budget: evicted")
    fails = [l for l in r.stderr.splitlines() if "failed:" in l]
    return r.returncode, evictions, fails, r.stderr[-2000:]


def qhash(con, path):
    """Canonical content hash of one query's parquet dump: columns in name
    order, rows sorted by the full canonical tuple, doubles normalized."""
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{path}/*.parquet')"
    ).fetchall()]
    sel = ", ".join(f'"{c}"' for c in sorted(cols))
    return con.execute(
        f"SELECT count(*), md5(string_agg(rowtxt, '\n' ORDER BY rowtxt)) "
        f"FROM (SELECT concat_ws('|', {sel}) AS rowtxt "
        f"FROM read_parquet('{path}/*.parquet'))").fetchone()


def main():
    import duckdb
    sfdir, budget = sys.argv[1], int(sys.argv[2])
    heap = sys.argv[3] if len(sys.argv) > 3 else "48g"
    extra = open(sys.argv[4]).read().strip() if len(sys.argv) > 4 else ""
    base, budgeted = "/tmp/evict_base", "/tmp/evict_budget"
    # budgeted pass FIRST: even a truncated session then holds the primary
    # evidence (ALL OK + evictions fired); the identity compare needs both
    for out, mb in [(budgeted, budget), (base, None)]:
        rc, ev, fails, tail = run_verify(sfdir, out, heap, mb, extra)
        print(f"[evict] verify -> {out} rc={rc} evictions={ev} "
              f"fails={len(fails)}", flush=True)
        for f in fails:
            print("  " + f, flush=True)
        if rc != 0:
            print(tail)
            sys.exit(1)
        if mb and ev == 0:
            sys.exit("[evict] FAIL: budgeted run evicted nothing — "
                     "budget too high to certify anything")
    con = duckdb.connect()
    names = sorted(d for d in os.listdir(base)
                   if os.path.isdir(os.path.join(base, d)))
    bad = 0
    for n in names:
        if not os.path.isdir(os.path.join(budgeted, n)):
            print(f"[evict] MISSING in budgeted run: {n}")
            bad += 1
            continue
        a = qhash(con, os.path.join(base, n))
        b = qhash(con, os.path.join(budgeted, n))
        if a != b:
            print(f"[evict] MISMATCH {n}: base={a} budgeted={b}")
            bad += 1
    print(f"[evict] {'ALL IDENTICAL' if bad == 0 else f'{bad} MISMATCHES'}"
          f" across {len(names)} queries at {sfdir} (budget={budget}MB)")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
