#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify
(done separately via sbt), then compare each <name>.parquet against the
DuckDB oracle SQL over the same test tables.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>

Compare semantics (strictest plausible): sort columns by name, sort
rows by all columns, exact value equality (floats compared exactly
after both sides round in-query).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare: ints → int64, floats → float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = n_skip = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.execute(sql).fetchdf()
            g, w = norm(got), norm(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                n_fail += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                n_fail += 1
                continue
            if not g.equals(w):
                neq = (g != w) & ~(g.isna() & w.isna())
                bad = neq.any(axis=0)
                print(f"FAIL {name}: value mismatch in {list(bad[bad].index)}")
                for c in bad[bad].index:
                    i = neq[c].idxmax()
                    print(f"   first diff row {i} col {c}: spark={g[c][i]!r} duckdb={w[c][i]!r}")
                n_fail += 1
                continue
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except FileNotFoundError:
            # Verify was run with SPARK_GRAFT_VERIFY_ONLY — queries it
            # didn't dump are skips here, not failures
            n_skip += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {n_skip} skipped (not dumped), "
          f"{len(oracles)} with oracle")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
