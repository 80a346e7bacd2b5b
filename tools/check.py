#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify output dir (parquet per query + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf dir, and compares: column names
(sorted), row counts, and exact cell values (rows sorted as a final guard).

Type-strict like the driver: the driver hashes TYPED arrow values, so a
BIGINT column on one side and a HUGEINT/decimal128 on the other hash-differ
even when every cell prints identically. We therefore (a) reject any
decimal column outright (the driver's hash cannot digest decimal128 — r7
verdict), and (b) fail when a column's arrow type class differs between
the Spark result and the oracle result.

Usage: tools/check.py <sfDir> <verifyOutDir> [queryName...]
       tools/check.py --selftest   # proves BIGINT-vs-HUGEINT FAILS the gate
"""
import json, math, sys, os
import duckdb
import pyarrow as pa
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


def type_class(t):
    """Canonical class of an arrow type — two results agree only if every
    column's class matches (int64 vs decimal128 is the class of failure the
    driver hash catches and plain str()-compare does not)."""
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) or pa.types.is_fixed_size_list(t):
        return "list<" + type_class(t.value_type) + ">"
    return str(t)


def type_error(spark_tbl, duck):
    """Return a failure message if the two arrow tables' types are not
    driver-hash-compatible, else None."""
    s_types = {f.name: f.type for f in spark_tbl.schema}
    d_types = {f.name: f.type for f in duck.schema}
    for c in sorted(s_types):
        sc, dc = type_class(s_types[c]), type_class(d_types[c])
        if "decimal" in (sc, dc):
            side = "spark" if sc == "decimal" else "duck"
            return (f"column '{c}' is {side}-side decimal "
                    f"(spark={s_types[c]} duck={d_types[c]}) — driver hash "
                    f"cannot digest decimal128; keep checked output in int64")
        if sc != dc:
            return (f"column '{c}' type class differs: "
                    f"spark={s_types[c]}({sc}) duck={d_types[c]}({dc})")
    return None


def selftest():
    """A BIGINT spark result vs a HUGEINT-promoted oracle sum must FAIL."""
    con = duckdb.connect()
    spark_side = pa.table({"s": pa.array([4999999950000000], type=pa.int64())})
    # DuckDB silently promotes sum(BIGINT) -> HUGEINT -> arrow decimal128(38,0)
    duck = con.execute(
        "SELECT sum(r) AS s FROM (SELECT CAST(range AS BIGINT) * 1000000 AS r "
        "FROM range(100000000)) t WHERE r < 100000000000000").fetch_arrow_table()
    assert type_class(duck.column("s").type) == "decimal", duck.schema
    err = type_error(spark_side, duck)
    assert err is not None and "decimal" in err, "gate is blind to HUGEINT promotion!"
    # and an int64-vs-int64 pair with equal values must still pass
    duck_ok = con.execute("SELECT CAST(4999999950000000 AS BIGINT) AS s").fetch_arrow_table()
    assert type_error(spark_side, duck_ok) is None
    print("SELFTEST PASS: BIGINT-vs-HUGEINT fails the gate; BIGINT-vs-BIGINT passes")


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
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
        terr = type_error(spark_tbl, duck)
        if terr is not None:
            print(f"FAIL {name}: {terr}")
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
