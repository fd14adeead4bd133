#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query
dumped by graft.Verify, run the declared DuckDB oracle SQL over the
same sf-dir parquet tables and compare (schema-insensitive: columns
sorted by name, rows sorted, values hashed at repr-level with float
tolerance via round-trip to 6dp strings).

Driver-parity guards (round-8): the driver hashes through pandas,
which (a) renders DuckDB HUGEINT aggregates as float ("118869.0" !=
"118869" vs Spark's BIGINT) and (b) crashes lexsort on LIST/STRUCT
columns. Both slipped through this checker in round 7 because
duckdb's fetchall() returns plain Python ints for HUGEINT. So now:
any HUGEINT / UHUGEINT / LIST / STRUCT / MAP typed column — on the
oracle side OR the Spark-output side — is a hard FAIL here, before
any value comparison, and each query's DuckDB result types are
printed so a typed mismatch is visible locally. Integer-typed values
never pass through the float normalizer.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# type names (substring match on duckdb's rendered type) that the
# driver's pandas hasher mangles or crashes on
UNSAFE = ("HUGEINT", "[]", "STRUCT", "MAP(", "LIST", "UNION")


def unsafe_cols(cols, types):
    return [f"{c}:{t}" for c, t in zip(cols, types)
            if any(u in str(t).upper() for u in UNSAFE)]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, int):
        # integers stay integers — never the float path; a Spark
        # BIGINT vs oracle HUGEINT repr split must FAIL, not blur
        return str(v)
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, decimal.Decimal):
        # the driver's pandas frame holds DECIMAL as float64
        return f"{float(v):.6f}"
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
            rel = con.sql(sql)
            o_cols = list(rel.columns)
            o_types = [str(t) for t in rel.types]
            o_rows = rel.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        srel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        s_cols = list(srel.columns)
        s_types = [str(t) for t in srel.types]
        s_rows = srel.fetchall()
        tline = ", ".join(f"{c}:{t}" for c, t in zip(o_cols, o_types))
        bad_o = unsafe_cols(o_cols, o_types)
        bad_s = unsafe_cols(s_cols, s_types)
        if bad_o or bad_s:
            side = (f"oracle {bad_o}" if bad_o else "") + \
                   (f" spark {bad_s}" if bad_s else "")
            print(f"FAIL     {name}: driver-unsafe result type(s): {side}")
            print(f"         types: {tline}")
            n_fail += 1
            continue
        oc, od = table_digest(o_cols, o_rows)
        sc, sd = table_digest(s_cols, s_rows)
        if oc != sc:
            print(f"FAIL     {name}: columns {sc} != oracle {oc}")
            print(f"         types: {tline}")
            n_fail += 1
        elif od != sd:
            diffs = [i for i, (a, b) in enumerate(zip(od, sd)) if a != b]
            print(f"FAIL     {name}: rows {len(sd)} vs {len(od)}; "
                  f"first diffs {diffs[:3]}")
            print(f"         types: {tline}")
            for i in diffs[:2]:
                print(f"  oracle: {od[i]}\n  spark : {sd[i]}")
            if len(od) != len(sd):
                print(f"  oracle head: {od[:2]}\n  spark head : {sd[:2]}")
            n_fail += 1
        else:
            print(f"ok       {name} ({len(sd)} rows) [{tline}]")
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
