#!/usr/bin/env python3
"""Type-width audit of the oracle SQL vs the Spark output (dev tool).

The driver's hasher is type-sensitive: a DuckDB HUGEINT (uncast SUM of
BIGINT) against a Spark BIGINT column hash-mismatches even when every
value is equal. This mirror flags any oracle output column whose DuckDB
type widens past the Spark parquet type for the same column name.
Usage: tools/typecheck.py <sfDir> <verifyOutDir> [names...]
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WIDER = {("HUGEINT", "BIGINT"), ("HUGEINT", "INTEGER"),
         ("BIGINT", "INTEGER"), ("DECIMAL", "DOUBLE"),
         ("HUGEINT", "DOUBLE")}

def base(t):
    t = str(t).upper()
    return "DECIMAL" if t.startswith("DECIMAL") else t

def main(sf_dir, out_dir, names):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    bad = 0
    for name in sorted(oracles):
        if names and name not in names:
            continue
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            continue
        try:
            ora = con.sql(f"SELECT * FROM ({oracles[name]}) LIMIT 0")
            otypes = dict(zip(ora.columns, [base(t) for t in ora.dtypes]))
            got = con.sql(f"SELECT * FROM '{pq}/*.parquet' LIMIT 0")
            gtypes = dict(zip(got.columns, [base(t) for t in got.dtypes]))
        except Exception as e:
            print(f"ERR   {name}: {e}")
            bad += 1
            continue
        for c, ot in otypes.items():
            gt = gtypes.get(c)
            if gt is None:
                print(f"COLS  {name}: oracle col '{c}' missing on spark side")
                bad += 1
            elif ot != gt and (ot, gt) in WIDER:
                print(f"TYPE  {name}.{c}: oracle {ot} vs spark {gt}")
                bad += 1
    print(f"{'FAIL' if bad else 'OK'}: {bad} type-width findings")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
