#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir tables,
and compares: schema (column names), row count, and values (columns sorted by
name, rows in emitted order since every query ends in a total ORDER BY).
"""
import sys, json, glob, math, os
import duckdb

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)

def norm_type(t):
    """Normalize to the driver's observed type sensitivity (round 1):
    INTEGER vs BIGINT hash-matched (q_textstats, q_winnow, q_fetch,
    q_knn_join, q_map_props all green), but HUGEINT (un-cast DuckDB
    integer SUM, int128) vs BIGINT hash-FAILED (the 4 red queries). So
    integer widths up to 64 bit are one class; HUGEINT is its own."""
    return "INT<=64" if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                              "UTINYINT", "USMALLINT", "UINTEGER") else t

def col_types(con, query):
    """name -> normalized DuckDB type for a query's result columns. The
    driver's compare hashes TYPED values (round 1: HUGEINT vs BIGINT failed
    with identical Python repr), so local green must compare types too."""
    return {r[0]: norm_type(r[1])
            for r in con.sql(f"DESCRIBE {query}").fetchall()}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM '{files[0]}'")
        spark_cols = sorted(spark_rel.columns)
        spark_rows = con.sql(
            "SELECT " + ", ".join(f'"{c}"' for c in spark_cols) +
            f" FROM '{files[0]}'").fetchall()
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(spark_rows)} rows)")
            continue
        try:
            duck_rel = con.sql(oracle[name])
            duck_cols_orig = duck_rel.columns
            sel = ", ".join(f'"{c}"' for c in sorted(duck_cols_orig))
            duck_rows = con.sql(
                f"SELECT {sel} FROM ({oracle[name]}) oq").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        duck_cols = sorted(duck_rel.columns)
        if spark_cols != duck_cols:
            print(f"FAIL {name}: cols {spark_cols} vs {duck_cols}")
            n_fail += 1
            continue
        spark_types = col_types(con, f"SELECT * FROM '{files[0]}'")
        duck_types = col_types(con, oracle[name])
        type_bad = [(c, spark_types[c], duck_types[c]) for c in duck_cols
                    if spark_types[c] != duck_types[c]]
        if type_bad:
            print(f"FAIL {name}: column types differ (spark vs oracle): "
                  + ", ".join(f"{c}: {a} vs {b}" for c, a, b in type_bad))
            n_fail += 1
            continue
        if len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows {len(spark_rows)} vs {len(duck_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (a, b) in enumerate(zip(spark_rows, duck_rows)):
            na = [norm_cell(x) for x in a]
            nb = [norm_cell(x) for x in b]
            if na != nb:
                bad = (i, na, nb)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: spark={bad[1]} duck={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
