#!/usr/bin/env python3
"""Dev-only harness replicating the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <outDir> [query ...]

Reads <outDir>/<name>/ parquet written by graft.Verify, runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the raw tables, and
compares (columns sorted by name, rows sorted, exact value match).
Not part of the shipped library (driver-side python only).
"""
import sys, json, glob, math, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # exact representation — the gate is bit-exactness
        return ("f", v.hex())
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(norm(x) for x in v)
    return (type(v).__name__, str(v))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_dir = f"{out_dir}/{name}"
        if not glob.glob(f"{res_dir}/*.parquet"):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            oracle_rel = con.sql(sql)
            scols, ocols = sorted(spark_rel.columns), sorted(oracle_rel.columns)
            if scols != ocols:
                print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
                n_fail += 1
                continue
            s_proj = spark_rel.select(", ".join(f'"{c}"' for c in scols))
            o_proj = oracle_rel.select(", ".join(f'"{c}"' for c in ocols))
            # Type-strict: the driver's gate hashes typed values, so HUGEINT
            # (DuckDB's widened integer SUM) vs BIGINT must FAIL here too,
            # not silently compare equal after the Python int fetch.
            stypes, otypes = [str(t) for t in s_proj.types], [str(t) for t in o_proj.types]
            if stypes != otypes:
                print(f"FAIL {name}: column types differ")
                for c, st, ot in zip(scols, stypes, otypes):
                    if st != ot:
                        print(f"  {c}: spark={st} oracle={ot}")
                n_fail += 1
                continue
            s_rows = sorted((tuple(norm(v) for v in r) for r in s_proj.fetchall()))
            o_rows = sorted((tuple(norm(v) for v in r) for r in o_proj.fetchall()))
            if len(s_rows) != len(o_rows):
                print(f"FAIL {name}: rowcount spark={len(s_rows)} oracle={len(o_rows)}")
                n_fail += 1
                continue
            bad = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
            if bad:
                i = bad[0]
                print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first @{i}:")
                print(f"  cols:   {scols}")
                print(f"  spark:  {s_rows[i]}")
                print(f"  oracle: {o_rows[i]}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(s_rows)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
