#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle pairs (mimics the driver's
t2 check). Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Loads each <name>/ parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, sorts
columns by name, and compares values."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def compare(a, b, name):
    if sorted(a.columns) != sorted(b.columns):
        return f"COLS spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    a, b = norm(a), norm(b)
    if len(a) != len(b):
        return f"ROWS spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if a[c].dtype != b[c].dtype:
            return f"DTYPE {c}: spark={a[c].dtype} oracle={b[c].dtype}"
        if np.issubdtype(a[c].dtype, np.floating):
            ok = np.allclose(av, bv, rtol=0, atol=0, equal_nan=True)
            if not ok:
                bad = np.where(~np.isclose(av, bv, rtol=0, atol=0, equal_nan=True))[0][:3]
                return f"VAL {c} rows {bad.tolist()}: spark={av[bad]} oracle={bv[bad]}"
        else:
            neq = av != bv
            if getattr(neq, "any", lambda: neq)():
                bad = np.where(neq)[0][:3]
                return f"VAL {c} rows {bad.tolist()}: spark={av[bad]} oracle={bv[bad]}"
    return None

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted([os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)])
    # optional per-oracle timeout (seconds) for big-SF sweeps where the
    # all-pairs DuckDB baselines are infeasible (they already exceed 45 s
    # at sf0.1); a timed-out oracle counts as skipped, not failed
    timeout = float(os.environ.get("CHECK_ORACLE_TIMEOUT", "0"))
    npass = nfail = nskip = 0
    import threading
    for name in names:
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL {name}: no spark output"); nfail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(spark_df)} rows)"); nskip += 1; continue
        # the timeout callback checks a per-query done flag under a lock:
        # a timer firing between execute() returning and cancel() must not
        # interrupt the idle connection (which would abort the NEXT
        # oracle's execute and record a spurious FAIL for a healthy query)
        timer = None
        lk = threading.Lock()
        state = {"done": False, "timed_out": False}
        def on_timeout():
            with lk:
                if not state["done"]:
                    state["timed_out"] = True
                    con.interrupt()
        if timeout > 0:
            timer = threading.Timer(timeout, on_timeout)
            timer.start()
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            with lk:
                state["done"] = True
            if timer: timer.cancel()
            if state["timed_out"]:
                print(f"SKIP {name}: oracle timeout >{timeout}s"); nskip += 1; continue
            print(f"FAIL {name}: oracle error {e}"); nfail += 1; continue
        with lk:
            state["done"] = True
        if timer: timer.cancel()
        if state["timed_out"]:
            # interrupt landed after the result was already produced —
            # absorb any pending interrupt so the next execute is clean
            try: con.execute("SELECT 1")
            except Exception: pass
        err = compare(spark_df, odf, name)
        if err:
            print(f"FAIL {name}: {err}"); nfail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)"); npass += 1
    print(f"== {npass} pass, {nfail} fail, {nskip} rows-only ==")
    sys.exit(1 if nfail else 0)

if __name__ == "__main__":
    main()
