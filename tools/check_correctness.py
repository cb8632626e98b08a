#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Registers the sfDir parquet tables as DuckDB views, runs every query in
<verifyOutDir>/oracle_sql.json, and compares against the parquet the
Spark Verify main dumped. Columns are sorted by name (like the driver),
values compared exactly; row order compared both as-is and sorted.
"""
import duckdb, json, sys, math, os

def canon(df):
    df = df[sorted(df.columns)]
    return df

def cmp_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    tables = ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]
    for t in tables:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(outdir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df())
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        ok = True
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            ok = False
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            ok = False
        else:
            gt, et = [str(t) for t in got.dtypes], [str(t) for t in exp.dtypes]
            if gt != et:
                print(f"WARN {name}: dtypes {gt} != {et}")
            bad = 0
            for i in range(len(got)):
                for c in got.columns:
                    if not cmp_cell(got[c].iloc[i], exp[c].iloc[i]):
                        if bad < 3:
                            print(f"  {name} row {i} col {c}: "
                                  f"spark={got[c].iloc[i]!r} oracle={exp[c].iloc[i]!r}")
                        bad += 1
            if bad:
                print(f"FAIL {name}: {bad} mismatched cells")
                ok = False
        if ok:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

main()
