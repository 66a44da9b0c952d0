#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB over the sfDir parquet tables and
compares (sorted columns, sorted rows, float-tolerant) against the Spark
parquet dumps produced by `graft.Verify`. Dev tool only — not part of the
shipped library.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        col = df[c]
        if col.dtype == object and len(col) and isinstance(
                col.dropna().iloc[0] if len(col.dropna()) else None,
                (bytes, bytearray)):
            df[c] = col.apply(lambda b: b.hex() if isinstance(b, (bytes, bytearray)) else b)
        elif col.dtype == object:
            # dates and misc objects -> try datetime, else string.
            # Normalize to us resolution: assert_frame_equal treats
            # datetime64[ns] (pandas' object-parse default) vs
            # datetime64[us] (duckdb fetchdf) as 100% different even
            # when every value matches. Nulls in object columns get one
            # canonical token: pandas surfaces a Spark-parquet null as
            # None (str -> "None") but a duckdb fetchdf null as float
            # NaN (str -> "nan"), and a representation-level compare
            # must not read that engine difference as a value diff.
            try:
                df[c] = pd.to_datetime(col).astype("datetime64[us]")
            except Exception:
                df[c] = col.apply(
                    lambda v: "<null>" if pd.isna(v) else str(v))
        elif str(col.dtype).startswith("datetime64"):
            df[c] = (pd.to_datetime(col).dt.tz_localize(None)
                     if getattr(col.dt, "tz", None) else
                     pd.to_datetime(col)).astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    declared = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*"))
    fails, rows_only = [], []
    for name in declared:
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            status = "rows-only" if len(got) > 0 else "EMPTY(rows-only)"
            (rows_only if len(got) > 0 else fails).append(name)
            print(f"{status:9} {name} rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as ex:
            # an oracle that DuckDB itself cannot execute at this scale
            # (e.g. out of temp disk on an all-pairs twin) fails THIS
            # query, not the whole run
            fails.append(name)
            print(f"FAIL(oracle-exec) {name}: {str(ex)[:300]}")
            continue
        g, e = norm(got), norm(exp)
        if g.shape != e.shape:
            fails.append(name)
            print(f"FAIL(shape) {name} spark={g.shape} duck={e.shape}")
            continue
        try:
            pd.testing.assert_frame_equal(
                g, e, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
            # strict pass — emulates the driver's representation-level hash:
            # same dtype kind (int vs float), exact values, signed zeros.
            strict = ""
            for c in g.columns:
                gk, ek = g[c].dtype.kind, e[c].dtype.kind
                if gk != ek and {gk, ek} <= {"i", "u", "f", "O"}:
                    strict = f"dtype {c}: spark={g[c].dtype} duck={e[c].dtype}"
                    break
                if gk == "f":
                    gz = np.signbit(g[c].fillna(0.0)) != np.signbit(e[c].fillna(0.0))
                    if gz.any():
                        strict = f"signed-zero/signbit {c} ({int(gz.sum())} rows)"
                        break
            if strict:
                fails.append(name)
                print(f"FAIL(repr) {name}: {strict}")
            else:
                print(f"OK        {name} rows={len(g)}")
        except Exception as ex:
            fails.append(name)
            print(f"FAIL      {name}: {str(ex)[:300]}")
    print(f"\n{len(declared) - len(fails)}/{len(declared)} pass"
          f" ({len(rows_only)} rows-only). FAILS: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
