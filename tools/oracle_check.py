"""Strict oracle verification — runs each queries() entry and its oracle_sql
side by side at a given sf dir and compares columns, DTYPES, and exact values
(floats bitwise via array_equal). Stricter than a value hash: dtype drift
(int32 vs int64, DuckDB HUGEINT->float64) fails loudly here before it can
fail silently in the driver's hash compare.

Usage: PYTHONPATH=. python tools/oracle_check.py [sf_dir] [query ...]
Default: every oracled query at /root/testdata/sf0.01.
"""
import sys, os, json
import duckdb
import pandas as pd
import numpy as np
import ray

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import __ray_entry__ as E

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
NAMES = sys.argv[2:]

ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True)

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = os.path.join(SF, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

Q = E.queries()
O = E.oracle_sql()
if not NAMES:
    NAMES = sorted(O)

def canon(df):
    if not isinstance(df, pd.DataFrame):
        try:
            df = df.to_pandas()
        except AttributeError:
            df = df.to_pandas() if hasattr(df, "to_pandas") else pd.DataFrame(df)
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

ok_all = True
for name in NAMES:
    mine = canon(Q[name](SF))
    orc = canon(con.execute(O[name]).df())
    probs = []
    if list(mine.columns) != list(orc.columns):
        probs.append(f"cols {list(mine.columns)} vs {list(orc.columns)}")
    else:
        for c in mine.columns:
            if str(mine[c].dtype) != str(orc[c].dtype):
                probs.append(f"dtype[{c}] {mine[c].dtype} vs {orc[c].dtype}")
        if len(mine) != len(orc):
            probs.append(f"rows {len(mine)} vs {len(orc)}")
        else:
            for c in mine.columns:
                a, b = mine[c].to_numpy(), orc[c].to_numpy()
                if a.dtype.kind == "f":
                    eq = np.array_equal(a, b, equal_nan=True)
                else:
                    eq = (a == b).all()
                if not eq:
                    i = int(np.nonzero(~(a == b))[0][0]) if len(a) else -1
                    probs.append(f"val[{c}] first diff at row {i}: {a[i]!r} vs {b[i]!r}")
    print(f"{name}: {'OK' if not probs else 'MISMATCH ' + '; '.join(probs[:5])}")
    ok_all = ok_all and not probs
ray.shutdown()
sys.exit(0 if ok_all else 1)
