# DuckDB side of the sf1 per-query parity probe (VERDICT r6 #1): runs the
# ScaleBench query set's oracle SQL over a ScaleGen parquet directory with
# the same protocol as duck_bench.py (32 threads, warmups, best-of-N), so
# BENCH_SCALE.md can publish Spark/DuckDB ratios at sf0.1p AND sf1 instead
# of asserting that Spark's fixed per-job floor "stops mattering at scale".
#
# Usage: python3 tools/duck_scale.py <sfDir> [reps] [warmups]
#   (needs target/vdump/oracle_sql.json from a prior `runMain graft.Verify`)
import glob
import json
import os
import sys
import time

import duckdb

# Mirror graft.ScaleBench: the headline seven + the LSH/dedup/curation family.
HEADLINES = ["ref_a1_dedup_latest", "ref_w1_global_aggs", "ref_j1_dim_join",
             "ref_q1_agg", "data_sim_cosine_topk", "ref_exports_pipeline_e2e",
             "ref_e2e_monthly_report"]
EXTRAS = ["data_dedup_exact", "data_chunk_dedup", "data_dedup_minhash_bands",
          "data_dedup_minhash_pairs", "data_dedup_minhash_groupsig",
          "data_dedup_ngram_jaccard", "data_dedup_components",
          "data_dedup_embedding", "data_dedup_semantic",
          "data_dedup_incremental", "data_sim_sq8_topk", "data_sim_pq_topk",
          "data_sim_ivfpq", "data_quality_gopher", "data_quality_classifier",
          "data_ngram_coverage", "data_winnow_fingerprint", "data_chunk_cdc",
          "data_curation_gate", "data_dedup_spans", "data_sketch_cms",
          "data_decontaminate_bloom", "data_search_postings",
          "data_search_phrase",
          "data_mm_phash", "data_mm_audio_frames", "data_sim_ivfpq_refine",
          "data_classifier_pr", "data_epoch_shuffle", "data_split_assign",
          "data_cube_stats", "data_mm_resize", "data_mm_neardup",
          "data_pack_sequences", "data_mixture_temperature",
          "data_sim_ivfadc", "data_sim_l2_topk", "data_bpe_encode",
          "data_shard_manifest", "data_tfidf_selfmrr", "data_mm_components",
          # round-8 additions: tokenizer training, PGM container, reel scene cuts
          "data_bpe_train", "data_bpe_train_encode", "data_mm_pgm_decode",
          "data_mm_scene_cuts",
          # round-9 additions (mirrors graft.ScaleBench.ExtraQueries)
          "data_mm_png_decode", "data_mm_reel_overlap", "data_quality_propagate",
          "data_split_by_component", "data_lm_score", "data_boilerplate_strip",
          "data_source_reputation", "data_curation_fate", "data_lm_backoff",
          "data_dsir_resample", "data_novelty_score", "data_source_pagerank",
          "data_sketch_hll", "data_warc_roundtrip", "data_curriculum_plan",
          "data_decontaminate_fuzzy", "data_scd2_history", "data_unigram_segment",
          "data_unigram_encode", "data_unigram_em", "data_graph_triangles",
          "data_corpus_diff",
          # round-10 additions
          "data_dedup_index_serve", "data_mm_png_rgb_decode", "data_bpe_pretok",
          "data_unigram_em3", "data_sim_opq", "data_dedup_index_append",
          "data_mm_jpeg_decode", "data_mm_jpeg_rgb_decode",
          "data_dedup_band_index_serve", "data_dedup_band_index_append",
          "data_bpe_bytes", "data_sim_ivf_append", "data_sim_ivf_drift",
          "data_mixture_sample", "data_bpe_bytes_encode", "data_bpe_oov_encode",
          "data_search_index_serve", "data_search_index_append",
          "data_sim_ivf_retrain", "data_dedup_semantic_index_serve",
          "data_dedup_semantic_index_append", "data_pack_tokenized",
          "data_dedup_band_tombstone",
          # round-12 late additions: time-travel serve (retention),
          # maintained tokenized-shard appends
          "data_dedup_index_asof", "data_pack_tokenized_append",
          "data_shard_tfrecord", "data_search_index_asof",
          "data_sim_ivf_asof", "data_dedup_band_index_asof",
          "data_dedup_components_append",
          # round-13 additions (mirrors graft.ScaleBench.ExtraQueries):
          # cluster-index lifecycle completion + TFRecord files at rest
          "data_dedup_components_asof", "data_dedup_components_compact",
          "data_dedup_components_stats", "data_shard_tfrecord_files",
          # round-14 addition: the maintained wire-format artifact
          "data_shard_tfrecord_append",
          # round-15 additions: the four-hop maintained-pipeline lineage
          # and its whole-chain time-travel serve
          "data_pipeline_e2e", "data_pipeline_asof"]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

sf = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
warmups = int(sys.argv[3]) if len(sys.argv) > 3 else 1
if len(sys.argv) > 4:  # optional comma-separated query subset
    names = [q.strip() for q in sys.argv[4].split(",") if q.strip()]
    HEADLINES, EXTRAS = names, []
sqls = json.load(open("target/vdump/oracle_sql.json"))

con = duckdb.connect()
con.execute("SET threads TO 32")
for t in TABLES:
    path = f"{sf}/{t}.parquet"
    # ScaleGen writes Spark-style directories of part files; the driver
    # testdata is a single file per table. Glob both. Partial ScaleGen
    # dirs (single-family probes, e.g. an events-only sf30) just skip
    # the missing views — queries touching them will error visibly.
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    if not glob.glob(src.replace("*.parquet", "**")) and not os.path.exists(path):
        print(f"[duck_scale] missing table {path} - skipping view", file=sys.stderr)
        continue
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

out = {}
for q in HEADLINES + EXTRAS:
    if q not in sqls:
        out[q] = {"skip": "no oracle sql"}
        continue
    try:
        for _ in range(warmups):
            con.execute(sqls[q]).fetchall()
        best = None
        for _ in range(reps):
            t0 = time.time()
            rows = con.execute(sqls[q]).fetchall()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        out[q] = {"sec": round(best, 3), "rows": len(rows)}
    except Exception as e:  # noqa: BLE001 - record and continue
        out[q] = {"error": str(e)[:200]}
print(json.dumps({"sf": sf, "queries": out,
                  "total": round(sum(v["sec"] for v in out.values()
                                     if "sec" in v), 3)}))
