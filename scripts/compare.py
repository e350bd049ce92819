#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 scripts/compare.py <verify_out_dir> <sf_dir> [query ...]

Reads <verify_out_dir>/<name>/*.parquet (Spark dump) and runs the SQL from
<verify_out_dir>/oracle_sql.json in DuckDB against the sf parquet tables,
then compares rows / schema (column names) / canonical value hash the same
way the driver does: columns sorted by name, rows sorted, values rounded
via repr.
"""
import sys, json, glob, os
import duckdb

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return out

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"{name}: MISSING spark dump"); fails += 1; continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").fetchall()
            scols = [d[0] for d in con.description]
            odf = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"{name}: ERR {e}"); fails += 1; continue
        rows_ok = len(sdf) == len(odf)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and canon(sdf, scols) == canon(odf, ocols)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"{name}: {status} rows={len(sdf)}/{len(odf)} "
                  f"schema={schema_ok} hash={hash_ok}")
            if schema_ok and rows_ok:
                a, b = canon(sdf, scols), canon(odf, ocols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"  spark={x}\n  duck ={y}")
            elif not schema_ok:
                print(f"  spark cols={sorted(scols)}\n  duck cols={sorted(ocols)}")
        else:
            print(f"{name}: OK ({len(sdf)} rows)")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
