#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from oracle_sql.json in DuckDB against the sfDir parquet tables, compare
with the Spark parquet output (columns sorted by name, rows sorted,
values hashed)."""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df: pd.DataFrame) -> str:
    m = hashlib.sha256()
    for col in df.columns:
        for v in df[col]:
            if isinstance(v, float):
                m.update(repr(round(v, 9)).encode())
            else:
                m.update(repr(v).encode())
        m.update(b"|")
    return m.hexdigest()[:16]

def main(sf_dir: str, out_dir: str):
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["documents", "embeddings", "lineitem", "orders", "events",
              "customer", "supplier", "part", "nation", "region"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    ok = fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"[MISS ] {name}: no spark output"); fail += 1; continue
        try:
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"[OERR ] {name}: duckdb error: {e}"); fail += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
        schema_g = [(c, str(got[c].dtype)) for c in got.columns]
        schema_w = [(c, str(want[c].dtype)) for c in want.columns]
        if list(got.columns) != list(want.columns):
            print(f"[SCHEM] {name}: cols {list(got.columns)} vs {list(want.columns)}"); fail += 1; continue
        if len(got) != len(want):
            print(f"[ROWS ] {name}: {len(got)} vs {len(want)}"); fail += 1; continue
        if h(got) != h(want):
            print(f"[HASH ] {name}: value mismatch; schema got={schema_g} want={schema_w}")
            merged = got.compare(want) if got.shape == want.shape else None
            if merged is not None and not merged.empty:
                print(merged.head(5))
            fail += 1; continue
        print(f"[OK   ] {name}: {len(got)} rows")
        ok += 1
    print(f"== {ok} ok, {fail} fail ==")
    sys.exit(1 if fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
