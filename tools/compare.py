#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the testdata parquet tables, compare with the Spark result
parquet written by graft.Verify (columns sorted by name, rows sorted, values
compared with a small float tolerance)."""
import json, sys, glob, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING_RESULT"
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        d = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(s.columns) != list(d.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} duck={list(d.columns)}"
            continue
        if len(s) != len(d):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} duck={len(d)}"
            continue
        # the driver's hash compare is dtype-sensitive (int64 vs float64 vs
        # int32 all hash differently) — enforce the same strictness here
        dt_bad = [f"{c}: spark={s[c].dtype} duck={d[c].dtype}"
                  for c in s.columns if s[c].dtype != d[c].dtype]
        if dt_bad:
            results[name] = "DTYPE_MISMATCH " + "; ".join(dt_bad)
            continue
        # any array/list column kills the driver's pandas sort — detect from
        # ALL values (a column whose early rows are scalars/None but later
        # rows are lists would escape a head()-sample check)
        obj_arrays = [c for c in s.columns
                      if s[c].dtype == object and len(s) > 0
                      and any(hasattr(v, '__len__') and not isinstance(v, (str, bytes))
                              for v in s[c].dropna())]
        if obj_arrays:
            results[name] = f"UNSORTABLE_ARRAY_COLS {obj_arrays} (driver harness would error)"
            continue
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
        mismatch = None
        for c in s.columns:
            sv, dv = s[c], d[c]
            if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
                # exact: the driver hash-matches; rounding on both sides must
                # make values bitwise identical
                bad = ~((sv.isna() & dv.isna()) | (sv == dv))
                if bad.any():
                    i = bad.idxmax()
                    mismatch = f"col {c} row {i}: spark={sv[i]} duck={dv[i]}"
                    break
            else:
                svs, dvs = sv.astype(str), dv.astype(str)
                bad = svs != dvs
                if bad.any():
                    i = bad.idxmax()
                    mismatch = f"col {c} row {i}: spark={sv[i]!r} duck={dv[i]!r}"
                    break
        results[name] = mismatch or "OK"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in results.items():
        print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else "  " + str(v)))
    print(f"\n{n_ok}/{len(results)} queries match")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
