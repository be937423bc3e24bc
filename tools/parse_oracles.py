#!/usr/bin/env python3
"""Parse-check every oracle SQL statement in DuckDB (driver-side tooling).

Usage: python3 tools/parse_oracles.py <verify_out_dir> <sf_dir>

Creates views over the sf tables, then runs `EXPLAIN <sql>` for every
entry in <verify_out_dir>/oracle_sql.json. EXPLAIN parses + binds the
statement (catching syntax errors, unknown columns, bad casts) without
executing it, so this is seconds even for the heavy dedup oracles.
Exit 1 if any statement fails to parse/bind.

This exists because round 7 shipped an oracle with an unbalanced paren
(d17) in a round-end commit that was never parsed by DuckDB; the
correctness gate then recorded a parse error instead of a verdict.
"""
import sys, json, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    bad = []
    for name in sorted(oracle):
        try:
            con.execute(f"EXPLAIN {oracle[name]}")
        except Exception as e:
            bad.append(name)
            msg = str(e).splitlines()[0] if str(e) else repr(e)
            print(f"PARSE-FAIL {name}: {msg}")
    print(f"== oracle parse: {len(oracle) - len(bad)} ok, {len(bad)} fail ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
