#!/usr/bin/env python3
"""Dev-only local replica of the driver's DuckDB-oracle compare (t2).

NOT part of the shipped library (the Scala engine never imports this) —
it exists so oracle SQL can be validated locally before the driver runs.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: read the Spark result parquet,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables
registered as views over <sfDir>/*.parquet), sort columns by name, and
compare row count, schema (column names), and cell values.
"""
import json, math, sys, glob, os
import duckdb

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver rounds via the query contract; normalize -0.0 and format
        # with full round-trip precision (%.17g) so this local replica is
        # never more lenient than the driver's hash compare
        if v == 0.0:
            v = 0.0
        return f"{v:.17g}"
    return str(v)

def table_of(rel):
    cols = rel.columns
    types = [str(t).upper() for t in rel.types]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = rel.fetchall()
    return ([cols[i] for i in order], [types[i] for i in order],
            [[norm_cell(r[i]) for i in order] for r in rows])

# Output-type lint (r13 verdict item 2): DuckDB widens SUM(BIGINT) to
# HUGEINT, and a HUGEINT (or DECIMAL) final column renders differently
# across pyarrow/pandas versions, flipping the driver's hash while rows
# and schema names still match — the exact q160 failure signature that
# cost three rounds. No oracle (and no Spark dump) may emit a final
# column outside this closed set; aggregates must CAST on the way out.
_ALLOWED_BASE = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                 "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
                 "TIMESTAMP_NS"}

def bad_types(cols, types):
    out = []
    for c, t in zip(cols, types):
        base = t[:-2] if t.endswith("[]") else t
        if base not in _ALLOWED_BASE:
            out.append(f"{c}:{t}")
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # Pin the adjudicating engine in every artifact: the r12 q160
    # mismatch was engine-version-dependent (local DuckDB 1.0.0 matched
    # Spark, the driver's build didn't), and without the version in the
    # output such a flip costs a round of guessing.
    print(f"-- oracle-engine: duckdb {duckdb.__version__}")
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        qdir = f"{out_dir}/{name}"
        # sorted: stable part-file order (Verify writes coalesce(1), but
        # never depend on filesystem enumeration order)
        files = sorted(glob.glob(f"{qdir}/*.parquet"))
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            scols, stypes, srows = table_of(con.sql(
                f"SELECT * FROM read_parquet({files!r})"))
            ocols, otypes, orows = table_of(con.sql(oracle[name]))
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        lint = bad_types(ocols, otypes) + bad_types(scols, stypes)
        if lint:
            results[name] = f"TYPE-LINT: hash-unstable output types {lint}"
        elif scols != ocols:
            results[name] = f"SCHEMA: spark={scols} oracle={ocols}"
        elif len(srows) != len(orows):
            results[name] = f"ROWS: spark={len(srows)} oracle={len(orows)}"
        elif srows != orows:
            bad = next(i for i, (a, b) in enumerate(zip(srows, orows)) if a != b)
            results[name] = (f"VALUES at row {bad}: spark={srows[bad]} "
                             f"oracle={orows[bad]}")
        else:
            results[name] = f"OK ({len(srows)} rows)"
    width = max(len(k) for k in results)
    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in results.items():
        print(f"{k:<{width}}  {v[:300]}")
    print(f"-- {n_ok}/{len(results)} OK (oracle duckdb {duckdb.__version__})")
    # machine-readable engine pin next to the per-query dumps
    with open(f"{out_dir}/oracle_engine.json", "w") as f:
        json.dump({"oracle_engine": "duckdb",
                   "oracle_version": duckdb.__version__}, f)
    # queries dumped but lacking oracle (rows-only check)
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        nm = os.path.basename(qdir)
        if nm not in oracle:
            n = con.sql(f"SELECT count(*) FROM read_parquet({glob.glob(qdir + '/*.parquet')!r})").fetchone()[0]
            print(f"{nm:<{width}}  NO-ORACLE rows={n}")

if __name__ == "__main__":
    main()
