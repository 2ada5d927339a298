# Warm DuckDB baseline of the headline oracle queries (judge protocol:
# 32 threads, 3 warmups, best-of-N) over the same parquet testdata.
import json, sys, time
import duckdb

HEADLINES = ["ref_a1_dedup_latest", "ref_w1_global_aggs", "ref_j1_dim_join",
             "ref_q1_agg", "data_sim_cosine_topk", "ref_exports_pipeline_e2e",
             "ref_e2e_monthly_report"]
TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
sqls = json.load(open("target/vdump/oracle_sql.json"))
con = duckdb.connect()
con.execute("SET threads TO 32")
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
for _ in range(3):
    for q in HEADLINES:
        con.execute(sqls[q]).fetchall()
times = {q: [] for q in HEADLINES}
for r in range(reps):
    for q in HEADLINES:
        t0 = time.time()
        con.execute(sqls[q]).fetchall()
        times[q].append(time.time() - t0)
best = {q: min(ts) for q, ts in times.items()}
print(json.dumps({"total": round(sum(best.values()), 3),
                  "queries": {q: round(v, 3) for q, v in best.items()}}))
