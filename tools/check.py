#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify output (outDir/<name>/ parquet + oracle_sql.json)
against DuckDB executing the oracle SQL over the same sf dir, and
compares: column names (sorted), row count, and cell values (rows
sorted). Floats compared exactly by default (the engine uses exact
decimal aggregation precisely so this holds); --tol for debugging.

Usage: tools/check.py SF_DIR OUT_DIR [--tol 0]
"""
import sys, json, math, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if isinstance(v, float):
        return v
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    tol = float(sys.argv[sys.argv.index("--tol")+1]) if "--tol" in sys.argv else 0.0
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
            scols = [c.lower() for c in spark_rel.columns]
            sdf = spark_rel.fetchall()
            duck_rel = con.sql(oracle[name])
            dcols = [c.lower() for c in duck_rel.columns]
            ddf = duck_rel.fetchall()
        except Exception as e:
            results[name] = f"ERROR: {str(e)[:200]}"
            continue
        if sorted(scols) != sorted(dcols):
            results[name] = f"SCHEMA_MISMATCH spark={scols} duck={dcols}"
            continue
        # The driver's hasher is TYPE-sensitive: DuckDB widens SUM(BIGINT)
        # to HUGEINT (int128) which Spark can't produce, so value-equal
        # results still hash-mismatch. Compare the DuckDB-reported types
        # of both sides so that class of red is caught locally.
        stypes = {c: str(t) for c, t in zip(scols, spark_rel.types)}
        dtypes = {c: str(t) for c, t in zip(dcols, duck_rel.types)}
        tbad = [(c, stypes[c], dtypes[c]) for c in sorted(dtypes)
                if stypes[c] != dtypes[c]]
        if tbad:
            results[name] = "TYPE_MISMATCH " + "; ".join(
                f"{c}: spark={st} duck={dt}" for c, st, dt in tbad)
            continue
        # reorder spark cols to duck col order
        perm = [scols.index(c) for c in dcols]
        # Sort key: with --tol set, round floats first so near-equal
        # values can't sort into different positions on the two sides
        # and produce spurious VALUE_MISMATCHes from misaligned rows.
        # Rounding precision follows tol (a tolerance coarser than 1e-6
        # would otherwise still misalign rows straddling a 6th-decimal
        # boundary).
        ndig = max(0, math.ceil(-math.log10(tol))) if tol > 0 else 6
        def skey(row):
            if tol > 0:
                row = tuple(round(v, ndig) if isinstance(v, float) else v
                            for v in row)
            return repr(row)
        srows = sorted([tuple(r[i] for i in perm) for r in sdf], key=skey)
        drows = sorted(list(ddf), key=skey)
        if len(srows) != len(drows):
            results[name] = f"ROWCOUNT spark={len(srows)} duck={len(drows)}"
            continue
        bad = None
        for i, (a, b) in enumerate(zip(srows, drows)):
            for x, y in zip(a, b):
                ok = (x == y)
                if not ok and isinstance(x, float) and isinstance(y, float):
                    if math.isnan(x) and math.isnan(y):
                        ok = True
                    elif tol > 0 and abs(x - y) <= tol * max(1, abs(y)):
                        ok = True
                if not ok:
                    bad = (i, a, b)
                    break
            if bad:
                break
        results[name] = "PASS" if not bad else f"VALUE_MISMATCH row{bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}"
    npass = sum(1 for v in results.values() if v == "PASS")
    for k, v in results.items():
        print(f"{'PASS' if v=='PASS' else 'FAIL'} {k}" + ("" if v == "PASS" else f" -> {v}"))
    print(f"== {npass}/{len(results)} pass")
    sys.exit(0 if npass == len(results) else 1)

if __name__ == "__main__":
    main()
