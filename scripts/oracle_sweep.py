#!/usr/bin/env python3
"""Oracle-determinism sweep: run every declared DuckDB oracle repeatedly
under varying thread counts and flag any whose result set changes.

Why this exists: the correctness gate (check.py) compares Spark vs DuckDB
by hash, so an oracle that is itself nondeterministic is a probabilistic
gate failure — it can pass several runs and then flap. The one real
instance (round 9): a window whose ORDER BY could FULLY TIE
(identical interval rows from different partners) made DuckDB's parallel
window give both tied rows an empty preceding frame ≈1 run in 3. This
sweep runs each oracle at threads=1 and several threads=32 repetitions
and diffs the canonicalized results, catching that whole class
mechanically.

Usage:
    python3 scripts/oracle_sweep.py [sfdir] [oracle_sql.json]

Defaults: sfdir=/root/testdata/sf0.1 and the oracle dump of the last
check.py run (/tmp/graft_verify/oracle_sql.json — run check.py first, or
point at any Verify outDir's oracle_sql.json). Exit 0 iff no oracle is
flaky. Expect minutes at sf0.1: every oracle runs 6x.
"""
import glob
import hashlib
import json
import os
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
# same default outDir contract as check.py (GRAFT_VERIFY_OUT), so running
# check.py then the sweep with no args always agrees on the dump location
OUT = os.environ.get('GRAFT_VERIFY_OUT', '/tmp/graft_verify')
SQLS = sys.argv[2] if len(sys.argv) > 2 else f'{OUT}/oracle_sql.json'
# threads=1 forces the serial window/aggregate paths; repeated threads=32
# runs shake out parallel-only tie resolution
THREAD_PLAN = (1, 32, 32, 32, 32, 4)


def mkcon(threads):
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    # view every parquet in the sfdir (check.py's setup): a table added to
    # the dataset later is picked up without editing a hardcoded list
    for p in glob.glob(f"{SF}/*.parquet"):
        name = os.path.basename(p)[:-len('.parquet')]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    return con


def canon(rows):
    return hashlib.md5(
        repr(sorted(repr(r) for r in rows)).encode()).hexdigest()


def main():
    sqls = json.load(open(SQLS))
    flaky, errors = [], []
    for name, sql in sorted(sqls.items()):
        hashes = set()
        try:
            for threads in THREAD_PLAN:
                con = mkcon(threads)
                hashes.add(canon(con.execute(sql).fetchall()))
                con.close()
        except Exception as e:
            errors.append(name)
            print(f"ERR {name}: {str(e)[:140]}")
            continue
        if len(hashes) > 1:
            flaky.append(name)
            print(f"NONDETERMINISTIC: {name} ({len(hashes)} distinct results)")
    print(f"swept {len(sqls)} oracles @ {SF}: "
          f"flaky={flaky or 'none'} errors={errors or 'none'}")
    sys.exit(1 if (flaky or errors) else 0)


if __name__ == '__main__':
    main()
