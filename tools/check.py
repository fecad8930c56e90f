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
    declared = None
    if os.path.exists(f"{outdir}/queries.json"):
        declared = json.load(open(f"{outdir}/queries.json"))
    dirs = sorted(d for d in os.listdir(outdir)
                  if os.path.isdir(os.path.join(outdir, d)))
    n_ok = n_bad = 0
    if declared is not None:
        for name in declared:
            if name not in dirs:
                print(f"  x {name}: MISSING output dir (query failed?)")
                n_bad += 1
        for name in dirs:
            if name not in declared:
                print(f"  x {name}: STALE dir (not in SparkEntry.queries)")
                n_bad += 1
        dirs = [d for d in dirs if d in declared]
    for name in dirs:
        qdir = os.path.join(outdir, name)
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
            gcols, grows = got.columns, got.fetchall()
        except Exception as e:
            print(f"  x {name}: UNREADABLE output ({e})")
            n_bad += 1
            continue
        if name not in oracle:
            # rows-only gate: a non-oracle query must at least return rows
            if len(grows) > 0:
                print(f"  ~ {name}: rows-only check OK, rows={len(grows)}")
                n_ok += 1
            else:
                print(f"  x {name}: rows-only check EMPTY")
                n_bad += 1
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
