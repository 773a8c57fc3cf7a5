#!/usr/bin/env python3
"""Local pre-flight mimic of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
For each query dir under verify_out: load Spark's parquet result, run the
oracle SQL from oracle_sql.json in DuckDB (tables = views over the sf dir),
sort columns by name + rows by all columns, compare values exactly.
"""
import sys, json, glob, os
import duckdb

def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        pq = os.path.join(outdir, name)
        files = glob.glob(os.path.join(pq, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            spark_res = con.execute(f"SELECT * FROM '{files[0]}'")
            s_cols = [d[0] for d in spark_res.description]
            s_rows = spark_res.fetchall()
            o_res = con.execute(sql)
            o_cols = [d[0] for d in o_res.description]
            o_rows = o_res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL {name}: cols spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_bad += 1; continue
        sn, cols = normalize(s_rows, s_cols)
        on, _ = normalize(o_rows, o_cols)
        if sn == on:
            print(f"ok   {name} ({len(sn)} rows)"); n_ok += 1
        else:
            print(f"FAIL {name}: rows spark={len(sn)} oracle={len(on)}")
            for a, b in list(zip(sn, on))[:200]:
                if a != b:
                    print(f"  spark : {a}\n  oracle: {b}  (cols {cols})")
                    break
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
