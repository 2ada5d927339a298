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


def canon_duck_type(t):
    """DuckDB DESCRIBE type name -> canonical type string."""
    t = t.upper()
    aliases = {"BIGINT": "LONG", "INT8": "LONG", "HUGEINT": "DECIMAL(38,0)",
               "INTEGER": "INT", "INT4": "INT", "INT": "INT",
               "SMALLINT": "SHORT", "TINYINT": "BYTE",
               "DOUBLE": "DOUBLE", "FLOAT": "FLOAT", "REAL": "FLOAT",
               "VARCHAR": "STRING", "BOOLEAN": "BOOL",
               "TIMESTAMP": "TIMESTAMP", "TIMESTAMP WITH TIME ZONE": "TIMESTAMP",
               "DATE": "DATE", "BLOB": "BINARY"}
    if t.startswith("DECIMAL"):
        return t.replace(" ", "")
    if t.endswith("[]"):
        return f"ARRAY<{canon_duck_type(t[:-2])}>"
    return aliases.get(t, t)


def canon_arrow_type(t):
    """pyarrow DataType -> canonical type string."""
    import pyarrow as pa
    if pa.types.is_decimal(t):
        return f"DECIMAL({t.precision},{t.scale})"
    if pa.types.is_int64(t):
        return "LONG"
    if pa.types.is_int32(t):
        return "INT"
    if pa.types.is_int16(t):
        return "SHORT"
    if pa.types.is_int8(t):
        return "BYTE"
    if pa.types.is_float64(t):
        return "DOUBLE"
    if pa.types.is_float32(t):
        return "FLOAT"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "STRING"
    if pa.types.is_boolean(t):
        return "BOOL"
    if pa.types.is_timestamp(t):
        return "TIMESTAMP"
    if pa.types.is_date(t):
        return "DATE"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BINARY"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"ARRAY<{canon_arrow_type(t.value_type)}>"
    return str(t).upper()


def type_mismatches(parts, con, sql):
    """Source-type comparison: Spark dump parquet schema vs DESCRIBE oracle."""
    import pyarrow.parquet as pq
    spark_types = {f.name: canon_arrow_type(f.type)
                   for f in pq.ParquetFile(parts[0]).schema_arrow}
    duck_types = {r[0]: canon_duck_type(r[1])
                  for r in con.execute(f"DESCRIBE {sql}").fetchall()}
    return [(c, spark_types.get(c), duck_types.get(c))
            for c in sorted(set(spark_types) | set(duck_types))
            if spark_types.get(c) != duck_types.get(c)]


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
        # type mismatch is a FAIL here too. Compare at the SOURCE-type
        # level — the Spark parquet dump's arrow schema vs DuckDB's
        # DESCRIBE of the oracle SQL — because fetchdf() converts DECIMAL
        # to float64 on BOTH sides and would mask exactly the divergence
        # this gate exists to catch.
        dt = type_mismatches(parts, con, sql)
        if dt:
            print(f"FAIL {name}: type mismatch {dt}")
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
