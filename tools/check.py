#!/usr/bin/env python3
"""Local correctness pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query result parquet in <verifyOutDir>, runs the matching SQL from
oracle_sql.json in DuckDB over the sfDir tables, sorts columns by name and
rows by all columns, and compares values cell-by-cell.
Dev-only tooling (runs on the driver-side python stack); the shipped
library is pure Scala/Spark.
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / fp print noise
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        got = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        gcols, grows = got.columns, got.fetchall()
        if name not in oracle:
            print(f"  ~ {name}: rows-only check, rows={len(grows)}")
            continue
        exp = con.sql(oracle[name])
        ecols, erows = exp.columns, exp.fetchall()
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"  ✗ {name}: SCHEMA got={gc} want={ec}")
            n_bad += 1
            continue
        if gr != er:
            print(f"  ✗ {name}: VALUES rows got={len(gr)} want={len(er)}")
            for i,(a,b) in enumerate(zip(gr,er)):
                if a != b:
                    print(f"      first diff row {i}: got={a} want={b}")
                    break
            if len(gr) != len(er):
                onlyg = set(gr)-set(er); onlye = set(er)-set(gr)
                if onlyg: print(f"      extra: {list(onlyg)[:2]}")
                if onlye: print(f"      missing: {list(onlye)[:2]}")
            n_bad += 1
            continue
        n_ok += 1
        print(f"  ✓ {name} ({len(gr)} rows)")
    print(f"OK={n_ok} BAD={n_bad}")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
