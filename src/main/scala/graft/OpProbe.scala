package graft

import org.apache.spark.sql.SparkSession

/** Per-query wall-clock probe over the non-headline data-pipeline
  * queries at a given sf (warm, one timed rep after one warm-up) — the
  * sanity check that no operator hides a scale pathology the headline
  * bench would never see. Not part of the driver contract.
  */
object OpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = Seq("data_dedup_minhash_bands", "data_dedup_minhash_pairs", "data_dedup_ngram_jaccard", "data_decontaminate", "data_dedup_minhash_groupsig", "data_dedup_components", "data_chunk_dedup", "data_text_unigram",
      "data_tfidf_topk", "data_source_overlap", "data_event_rolling",
      "data_bpe_pairs", "data_quality_threshold", "data_fuzzy_join",
      "data_cdc_apply", "data_time_bucket", "data_retention_cohort",
      "data_funnel", "data_shard_plan", "data_zorder_layout",
      "data_group_percentiles", "data_quantile_norm",
      "data_jsonl_ingest", "data_orc_roundtrip",
      "data_quality_gopher", "data_ngram_coverage", "data_winnow_fingerprint",
      "data_dedup_semantic", "data_sim_sq8_topk", "data_sim_pq_topk", "data_sim_ivfpq", "data_dedup_incremental",
      "data_quality_classifier", "data_chunk_cdc", "data_curation_gate",
      "data_mm_phash", "data_mm_resize", "data_mm_neardup",
      "data_mm_audio_frames", "data_sim_ivfpq_refine", "data_classifier_pr",
      "data_epoch_shuffle", "data_split_assign", "data_cube_stats",
      "data_pack_sequences", "data_mixture_temperature",
      "data_sim_ivfadc", "data_sim_l2_topk", "data_bpe_encode",
      "data_shard_manifest", "data_tfidf_selfmrr", "data_mm_components")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val df = Registry.byName(n).build(spark, sfDir)
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[opprobe] $n%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
