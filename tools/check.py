#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (parquet per query + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf dir, and compares: column names
(sorted), row counts, and exact cell values (rows sorted as a final guard).

Usage: tools/check.py <sfDir> <verifyOutDir> [queryName...]
"""
import json, math, sys, os
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # fold -0.0
        return repr(v)
    return str(v)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            files = [f for f in os.listdir(qdir) if f.endswith(".parquet")]
            spark_tbl = pq.read_table([f"{qdir}/{f}" for f in files])
            duck = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck.column_names)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if spark_tbl.num_rows != duck.num_rows:
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={duck.num_rows}")
            n_fail += 1
            continue
        s_rows = sorted(tuple(norm(spark_tbl.column(c)[i].as_py()) for c in s_cols)
                        for i in range(spark_tbl.num_rows))
        d_rows = sorted(tuple(norm(duck.column(c)[i].as_py()) for c in d_cols)
                        for i in range(duck.num_rows))
        if s_rows != d_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            print(f"FAIL {name}: values differ at sorted row {bad}:")
            print(f"  cols : {s_cols}")
            print(f"  spark: {s_rows[bad]}")
            print(f"  duck : {d_rows[bad]}")
            n_fail += 1
            continue
        print(f"PASS {name} ({spark_tbl.num_rows} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
