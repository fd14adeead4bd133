#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query
dumped by graft.Verify, run the declared DuckDB oracle SQL over the
same sf-dir parquet tables and compare (schema-insensitive: columns
sorted by name, rows sorted, values hashed at repr-level with float
tolerance via round-trip to 6dp strings).

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)

def table_digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm_cell(r[i]) for i in order))
    out.sort()
    return sorted(c for c in cols), out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        try:
            o = con.execute(sql)
            o_cols = [d[0] for d in o.description]
            o_rows = o.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        s = con.execute(f"SELECT * FROM read_parquet({files!r})")
        s_cols = [d[0] for d in s.description]
        s_rows = s.fetchall()
        oc, od = table_digest(o_cols, o_rows)
        sc, sd = table_digest(s_cols, s_rows)
        if oc != sc:
            print(f"FAIL     {name}: columns {sc} != oracle {oc}")
            n_fail += 1
        elif od != sd:
            diffs = [i for i, (a, b) in enumerate(zip(od, sd)) if a != b]
            print(f"FAIL     {name}: rows {len(sd)} vs {len(od)}; "
                  f"first diffs {diffs[:3]}")
            for i in diffs[:2]:
                print(f"  oracle: {od[i]}\n  spark : {sd[i]}")
            if len(od) != len(sd):
                print(f"  oracle head: {od[:2]}\n  spark head : {sd[:2]}")
            n_fail += 1
        else:
            print(f"ok       {name} ({len(sd)} rows)")
            n_pass += 1
    # rows-only checks for queries without an oracle
    for d in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(d)
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        print(f"rows-only {name}: {n} rows")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
