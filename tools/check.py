#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: tools/check.py <verify_out_dir> <sf_dir> [--json <out.json>]

--json additionally writes the per-query results in the round-artifact
format ({name: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}) so a scale run can be recorded as CORRECTNESS_sf*.json
directly instead of transcribing terminal output.

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the sf_dir
parquet tables, and compares: row count, schema (column names), and a hash of
all values with columns sorted by name (mirroring the described driver gate:
"sorts columns by name before hashing values"). Rows are sorted before
hashing so physical order can't cause false negatives.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np
import hashlib

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(sorted(v)) if isinstance(v, dict) else
                          (str(list(v)) if isinstance(v, (list, np.ndarray)) else str(v)))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def h(df: pd.DataFrame) -> str:
    m = hashlib.sha256()
    for c in df.columns:
        m.update(c.encode())
        vals = df[c]
        if pd.api.types.is_float_dtype(vals):
            m.update(np.ascontiguousarray(vals.to_numpy()).tobytes())
        else:
            m.update("\x1f".join("" if v is None else str(v) for v in vals).encode())
    return m.hexdigest()[:16]


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    json_out = None
    if "--json" in sys.argv:
        json_out = sys.argv[sys.argv.index("--json") + 1]
    results = {}
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    # big-SF runs: the quadratic oracles (q41/q55/q84/q90) spill to disk at
    # the default memory limit and can fill the volume — let the env raise it
    if os.environ.get("CHECK_DUCKDB_MEM"):
        con.execute(f"SET memory_limit='{os.environ['CHECK_DUCKDB_MEM']}'")
    if os.environ.get("CHECK_DUCKDB_TMP"):
        con.execute(f"SET temp_directory='{os.environ['CHECK_DUCKDB_TMP']}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written dataset dir (e.g. GenData output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        results[name] = {"rows_match": rows_match, "schema_match": schema_match,
                         "hash_match": hash_match, "spark_rows": spark_rows,
                         "oracle_rows": oracle_rows, "err": err}
    for name in names:
        # every part file (sorted): a multi-part dump must not silently
        # drop rows; canon() re-sorts rows, so order never matters
        files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark parquet output"); n_fail += 1
            record(name, False, False, False, 0, None, "no spark parquet output")
            continue
        got = pq.read_table(files).to_pandas()
        if name not in oracle:
            print(f"ROWS {name}: rows={len(got)} (no oracle, rows-only check)")
            n_pass += 1
            record(name, len(got) > 0, True, False, len(got), None, None)
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1
            record(name, False, False, False, len(got), None, f"oracle SQL error: {e}")
            continue
        gc, ec = canon(got), canon(exp)
        if list(gc.columns) != list(ec.columns):
            print(f"FAIL {name}: schema spark={list(gc.columns)} oracle={list(ec.columns)}")
            n_fail += 1
            record(name, len(gc) == len(ec), False, False, len(gc), len(ec), None)
            continue
        if len(gc) != len(ec):
            print(f"FAIL {name}: rows spark={len(gc)} oracle={len(ec)}")
            n_fail += 1
            record(name, False, True, False, len(gc), len(ec), None)
            continue
        hg, he = h(gc), h(ec)
        if hg != he:
            print(f"FAIL {name}: hash mismatch")
            # show first differing rows for debugging
            for i in range(min(len(gc), 2000)):
                if not gc.iloc[i].equals(ec.iloc[i]):
                    print("  spark :", gc.iloc[i].to_dict())
                    print("  oracle:", ec.iloc[i].to_dict())
                    break
            n_fail += 1
            record(name, True, True, False, len(gc), len(ec), None)
        else:
            print(f"PASS {name} rows={len(gc)} hash={hg}")
            n_pass += 1
            record(name, True, True, True, len(gc), len(ec), None)
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
