"""Local stand-in for the driver's correctness gate: run every queries()
entry at the given sf_dir, run its oracle_sql() in DuckDB over the same
parquet tables, and compare row count, column names, and values
(column-name-sorted, row-sorted)."""
import sys, os, time
sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

import pyarrow as pa
import ray.data

def to_pandas(res):
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(sf_dir):
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="error")
    ray.data.DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.WARNING)
    import __ray_entry__ as E
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    qs, oracles = E.queries(), E.oracle_sql()
    only = sys.argv[2:] or None
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            fails += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok(rows-only) {name}: {len(got)} rows {dt:.1f}s cols={list(got.columns)}")
            continue
        exp = canon(con.execute(oracles[name]).fetchdf())
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
            fails += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            fails += 1
            continue
        # dtype-strict value compare (mirrors the driver's value hash,
        # which is dtype-sensitive: int64 799 != float64 799.0)
        try:
            eq = True
            for c in got.columns:
                a, b = got[c], exp[c]
                if a.dtype.kind != b.dtype.kind:
                    print(f"  dtype mismatch {c}: {a.dtype} vs {b.dtype}")
                    eq = False; break
                if a.dtype.kind in "fc":
                    if not ((a.astype(float) - b.astype(float)).abs() < 1e-9).all():
                        eq = False; break
                else:
                    if not (a.astype(str).values == b.astype(str).values).all():
                        eq = False; break
        except Exception as e:
            eq = False
        if eq:
            print(f"OK   {name}: {len(got)} rows {dt:.1f}s")
        else:
            print(f"FAIL {name}: value mismatch (col {c})")
            print("got:", got.head(5).to_dict("records"))
            print("exp:", exp.head(5).to_dict("records"))
            fails += 1
    print("FAILS:", fails)
    ray.shutdown()
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
