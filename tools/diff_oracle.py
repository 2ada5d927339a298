#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata parquet and diff against the Spark results dumped
by graft.Verify. Usage: diff_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        parts = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not parts:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({parts!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        got, want = norm(got), norm(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # Type-strict: the driver's hash is representation-sensitive (a
        # DECIMAL(18,2) vs DECIMAL(38,2) divergence hash-fails even when
        # values match cell-for-cell — round 1 proved it on 3 queries), so a
        # dtype mismatch is a FAIL here too. Compare both the pandas dtype
        # and, for object columns (decimals land there), the arrow type.
        def arrow_types(df_):
            import pyarrow as pa
            return {f.name: str(f.type)
                    for f in pa.Table.from_pandas(df_, preserve_index=False).schema}
        ga, wa = arrow_types(got), arrow_types(want)
        dt = [(c, str(got[c].dtype), str(want[c].dtype), ga[c], wa[c])
              for c in got.columns
              if str(got[c].dtype) != str(want[c].dtype) or ga[c] != wa[c]]
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt}")
            n_fail += 1
            continue
        diffs = []
        for c in got.columns:
            a, b = got[c], want[c]
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                bad = (~eq).idxmax()
                diffs.append(f"{c}[{bad}]: spark={a[bad]!r} duck={b[bad]!r} "
                             f"({int((~eq).sum())} cells)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
