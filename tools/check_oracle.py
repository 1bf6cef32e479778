#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump produced by `graft.Verify`,
runs the matching SQL from <verifyOutDir>/oracle_sql.json against DuckDB
views over <sfDir>/*.parquet, sorts columns by name and rows by all columns,
and compares cell-by-cell. Dev tool only — the engine itself is pure Scala.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # NaT (missing timestamp) and None: pandas NaT != NaT, so normalize all
    # scalar missing values to one token (the driver's hash treats null as
    # null); guard with a try since pd.isna on list-likes returns arrays
    try:
        import pandas as pd
        if v is None or (not hasattr(v, "__len__") and pd.isna(v)):
            return "NaN"
    except (TypeError, ValueError):
        pass
    return v


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark result dir")
            failures += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        want = con.execute(oracle[name]).fetchdf()
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns differ spark={gc} oracle={wc}")
            failures += 1
            continue
        # the driver's compare is type-sensitive (it hashes typed values):
        # 92 (int64) vs 92.0 (float64) must FAIL here too, before any
        # cell-level == that would mask it. Width differences (int32 vs
        # int64) DO hash equal driver-side (q08 passed r02 with rank()
        # int32 vs DuckDB int64), so compare dtype KIND, not exact dtype.
        dt_diff = [(c, str(got[c].dtype), str(want[c].dtype))
                   for c in gc if got[c].dtype.kind != want[c].dtype.kind]
        if dt_diff:
            print(f"FAIL {name}: dtypes differ (spark,oracle): {dt_diff}")
            failures += 1
            continue
        # array/list cells are unhashable for pandas sorting — stringify
        for df in (got, want):
            for c in gc:
                if df[c].dtype == object and df[c].map(
                        lambda v: not isinstance(v, (str, bytes, type(None)))
                        and hasattr(v, "__len__")).any():
                    df[c] = df[c].map(str)
        g = got[gc].sort_values(by=gc, kind="mergesort").reset_index(drop=True)
        w = want[wc].sort_values(by=wc, kind="mergesort").reset_index(drop=True)
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            failures += 1
            continue
        diff_cells = []
        for c in gc:
            for i, (a, b) in enumerate(zip(g[c], w[c])):
                if norm(a) != norm(b):
                    diff_cells.append((c, i, a, b))
                    if len(diff_cells) >= 5:
                        break
            if len(diff_cells) >= 5:
                break
        if diff_cells:
            print(f"FAIL {name}: {len(diff_cells)}+ diff cells, first: {diff_cells[:3]}")
            failures += 1
        else:
            print(f"PASS {name}: {len(g)} rows x {len(gc)} cols")
    for name in sorted(p.name for p in Path(out_dir).iterdir()
                       if p.is_dir() and p.name not in oracle):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchone()[0]
        print(f"INFO {name}: no oracle (rows-only check), {n} rows")
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
