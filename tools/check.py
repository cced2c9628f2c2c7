#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB-oracle check.

Usage: tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<query>/ parquet (written by graft.Verify), runs the
matching SQL from <outDir>/oracle_sql.json in DuckDB against views over
<sfDir>/*.parquet, sorts columns by name, and compares schema + values
exactly. Queries without an oracle get a rows>0 check.
"""
import sys, os, glob, json
import duckdb
import pyarrow.parquet as pq
import pyarrow as pa

def canon(v):
    """Canonical string rendering of a value, mimicking the driver's hash
    input. Crucially str(Decimal('1.0')) != str(Decimal('1.00')) — a scale
    mismatch between Spark and DuckDB must FAIL here, not slip through a
    value-equality compare (that was the round-1 11-query blind spot)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # shortest round-trip repr — 1-ulp diffs surface
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{canon(k)}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)

def table_rows(t: pa.Table):
    cols = sorted(t.column_names)
    t = t.select(cols)
    return cols, [tuple(canon(col[i].as_py()) for col in t.columns)
                  for i in range(t.num_rows)]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # Let the oracle spill instead of dying: the heavy dedup oracles
    # (q57/q60 minhash pipelines) exceed RAM at sf0.1 without a temp
    # directory (in-memory DuckDB disables spilling by default).
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("PRAGMA temp_directory='/tmp/duckdb_spill'")
    con.execute("PRAGMA memory_limit='48GB'")
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    result_dirs = [d for d in sorted(os.listdir(outdir))
                   if os.path.isdir(os.path.join(outdir, d))]
    n_pass = n_fail = 0
    for name in result_dirs:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        spark_t = pa.concat_tables([pq.read_table(f) for f in sorted(files)])
        if name not in oracle:
            ok = spark_t.num_rows > 0
            print(f"{'pass' if ok else 'FAIL'} {name}: rows-only ({spark_t.num_rows} rows)")
            n_pass += ok; n_fail += (not ok); continue
        try:
            duck_t = con.execute(oracle[name]).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        s_cols, s_rows = table_rows(spark_t)
        d_cols, d_rows = table_rows(duck_t)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} != {d_cols}"); n_fail += 1; continue
        s_types = [str(spark_t.schema.field(c).type) for c in s_cols]
        d_types = [str(duck_t.schema.field(c).type) for c in d_cols]
        if s_types != d_types:
            # timestamp unit (us/ns) is rendering-identical after as_py;
            # everything else (incl. decimal precision/scale) must match.
            lax = all(a == b or (a.startswith("timestamp") and b.startswith("timestamp"))
                      for a, b in zip(s_types, d_types))
            if not lax:
                print(f"FAIL {name}: types spark={s_types} duck={d_types}")
                n_fail += 1; continue
            print(f"WARN {name}: timestamp-unit types spark={s_types} duck={d_types}")
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount {len(s_rows)} != {len(d_rows)}"); n_fail += 1; continue
        bad = None
        for i, (a, b) in enumerate(zip(s_rows, d_rows)):
            if a != b:
                bad = (i, a, b); break
        if bad:
            print(f"FAIL {name}: row {bad[0]} spark={bad[1]} duck={bad[2]}"); n_fail += 1
        else:
            print(f"pass {name}: {len(s_rows)} rows exact-match")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
