#!/usr/bin/env python3
"""Generate a local sf1 dataset (10x sf0.1) for the scale soak.

Driver-side tooling (duckdb). Usage:
    python3 tools/gen_sf1.py [outdir]        # default /tmp/graft_sf1

Scaling rules (deterministic, copy index c in 0..9):
- events:    ids/users shifted per copy (event_id + c*1e6, user_id +
             c*100000); timestamps unchanged, so the time-window shape
             (windows per day, rollup cardinality) scales in DENSITY,
             which is how real ingest grows.
- lineitem/orders: keys shifted per copy (consistent l_orderkey /
             o_orderkey shift), so joins keep their fan-out.
- documents: doc_id shifted; TEXT Caesar-shifted by c (letters and
             digits rotate). An injective per-copy character map keeps
             every within-copy length/shingle/near-dup structure
             identical to the original corpus while making cross-copy
             shingle overlap ~zero — the corpus grows 10x without
             manufacturing artificial cross-copy near-duplicates that
             would inflate LSH candidate counts quadratically.
- embeddings: vec_id shifted; vector dimensions cyclically rotated by
             c*7 positions. Rotation preserves norms and within-copy
             cosines exactly; cross-copy similarities become arbitrary.
- dims (region nation customer supplier part): copied as-is.
"""
import os
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = 10


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")

    for t in ["region", "nation", "customer", "supplier", "part"]:
        shutil.copyfile(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
        print(f"copied {t}")

    con.execute(f"""
        COPY (
          SELECT event_id + c.c * 1000000 AS event_id, ts,
                 user_id + c.c * 100000 AS user_id, event_type, value, props
          FROM read_parquet('{SRC}/events.parquet'),
               (SELECT unnest(range({COPIES})) AS c) c
        ) TO '{OUT}/events.parquet' (FORMAT parquet)""")
    print("events x10")

    con.execute(f"""
        COPY (
          SELECT o_orderkey + c.c * 1000000 AS o_orderkey, o_custkey,
                 o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
          FROM read_parquet('{SRC}/orders.parquet'),
               (SELECT unnest(range({COPIES})) AS c) c
        ) TO '{OUT}/orders.parquet' (FORMAT parquet)""")
    print("orders x10")

    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/lineitem.parquet')"
    ).fetchall()]
    rest = ", ".join(c for c in cols if c != "l_orderkey")
    con.execute(f"""
        COPY (
          SELECT l_orderkey + c.c * 1000000 AS l_orderkey, {rest}
          FROM read_parquet('{SRC}/lineitem.parquet'),
               (SELECT unnest(range({COPIES})) AS c) c
        ) TO '{OUT}/lineitem.parquet' (FORMAT parquet)""")
    print("lineitem x10")

    # per-copy Caesar shift: lower/upper letters and digits each rotate
    # by c (copy 0 = identity, i.e. the original corpus verbatim)
    lower = "abcdefghijklmnopqrstuvwxyz"
    upper = lower.upper()
    digits = "0123456789"
    shifted_exprs = []
    for c in range(COPIES):
        frm = lower + upper + digits
        to = (lower[c:] + lower[:c]) + (upper[c:] + upper[:c]) + \
            (digits[c:] + digits[:c])
        shifted_exprs.append(
            f"WHEN {c} THEN translate(text, '{frm}', '{to}')")
    case = "CASE c.c " + " ".join(shifted_exprs) + " END"
    con.execute(f"""
        COPY (
          SELECT doc_id + c.c * 100000 AS doc_id, {case} AS text,
                 lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet'),
               (SELECT unnest(range({COPIES})) AS c) c
        ) TO '{OUT}/documents.parquet' (FORMAT parquet)""")
    print("documents x10 (per-copy caesar)")

    dim = con.execute(f"""
        SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet')
        LIMIT 1""").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT vec_id + c.c * 100000 AS vec_id,
                 CAST([embedding[1 + (i + c.c * 7) % {dim}]
                       for i in range({dim})] AS FLOAT[]) AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet'),
               (SELECT unnest(range({COPIES})) AS c) c
        ) TO '{OUT}/embeddings.parquet' (FORMAT parquet)""")
    print("embeddings x10 (per-copy dim rotation)")

    for t in ["events", "lineitem", "orders", "documents", "embeddings"]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
