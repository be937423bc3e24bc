#!/usr/bin/env python3
"""Generate the SECOND-decade soak dataset: sf10 = 100x sf0.1, for the
heavy-tail entries only (documents + embeddings — the tables every
>=5s-at-sf1 entry reads; the fact tables would add ~20 GB for entries
this soak does not run).

Driver-side tooling (duckdb). Usage:
    python3 tools/gen_sf10.py [outdir] [copies]   # default /tmp/graft_sf10 100
A copies override generates intermediate decades with the SAME injective
per-copy maps (e.g. 30 -> an sf3 point for two-interval slope checks).

Scaling rules (copy index c in 0..99) — same philosophy as gen_sf1.py
(grow the corpus without manufacturing cross-copy near-duplicates), but
the per-copy maps must stay injective ACROSS 100 copies, where gen_sf1's
Caesar shift would wrap (shift 26 = shift 0) and its dimension rotation
would repeat (rotation is mod the 64-dim width):

- documents: per-copy AFFINE letter map x -> a*x + b (mod 26) with
  a coprime to 26; (a, b) = (coprimes[c % 12], 7c % 26) repeats only
  every lcm(12, 26) = 156 copies. Digits map x -> a'*x + c (mod 10),
  a' coprime to 10. Copy 0 is the identity (original corpus verbatim).
  Injective per copy => every within-copy length/shingle/edit-distance
  structure is preserved exactly; distinct maps across copies =>
  cross-copy shingle overlap ~zero.
- embeddings: dimensions rotated by 7c mod 64, and NEGATED for c >= 64
  (rotation alone repeats at c = 64, which would plant exact duplicate
  vectors). Both transforms preserve norms and within-copy cosines
  exactly; cross-copy cosines stay arbitrary.
- ids: +c * 100000 (max organic id 1999 -> max 9,901,999, still below
  the 1e7 planted-twin offset the autoBits entries use).
"""
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 100

LOWER = "abcdefghijklmnopqrstuvwxyz"
DIGITS = "0123456789"
A26 = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]  # coprime to 26
A10 = [1, 3, 7, 9]                                  # coprime to 10


def charmap(c):
    a, b = A26[c % 12], (7 * c) % 26
    lo = "".join(LOWER[(a * i + b) % 26] for i in range(26))
    ad, bd = A10[c % 4], c % 10
    dg = "".join(DIGITS[(ad * i + bd) % 10] for i in range(10))
    return LOWER + LOWER.upper() + DIGITS, lo + lo.upper() + dg


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET preserve_insertion_order=false")

    cases = []
    for c in range(COPIES):
        frm, to = charmap(c)
        cases.append(f"WHEN {c} THEN translate(text, '{frm}', '{to}')")
    case = "CASE c.c " + " ".join(cases) + " END"
    con.execute(f"""
        COPY (
          SELECT doc_id + c.c * 100000 AS doc_id, {case} AS text,
                 lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet'),
               (SELECT unnest(range({COPIES})) AS c) c
        ) TO '{OUT}/documents.parquet' (FORMAT parquet)""")
    print("documents x100 (per-copy affine)")

    dim = con.execute(f"""
        SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet')
        LIMIT 1""").fetchone()[0]
    con.execute(f"""
        COPY (
          SELECT vec_id + c.c * 100000 AS vec_id,
                 CAST([(CASE WHEN c.c >= 64 THEN -1 ELSE 1 END) *
                        embedding[1 + (i + c.c * 7) % {dim}]
                       for i in range({dim})] AS FLOAT[]) AS embedding,
                 label
          FROM read_parquet('{SRC}/embeddings.parquet'),
               (SELECT unnest(range({COPIES})) AS c) c
        ) TO '{OUT}/embeddings.parquet' (FORMAT parquet)""")
    print("embeddings x100 (per-copy rotation, negated past c=63)")

    for t in ["documents", "embeddings"]:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
