package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.{Dedup, TextAnalysis}

/** Skew probe for the LSH band-bucket family (VERDICT r6 #8): builds a
  * DELIBERATELY skewed near-dup corpus — the sf1 documents plus one
  * mega-cluster of `MegaDocs` near-identical documents (a shared base
  * text with a per-doc tail token, so ~86% of the cluster shares each
  * band's minhash slice and piles into one bucket per band) — and
  * measures that [[Dedup.capHotBuckets]] bounds the candidate self-join:
  *
  *  - analytic candidate pairs Σ s(s−1)/2 over the bucket histogram,
  *    uncapped vs capped (the uncapped mega-bucket contributes
  *    ~(0.86·MegaDocs)²/2 pairs PER BAND — the quadratic term the cap
  *    exists to cut);
  *  - the measured row count + wall time of the uncapped candidate join
  *    (the count is the join's real output, no scoring), vs
  *  - the full capped pairs pipeline (join + estJaccard + distinct +
  *    threshold) wall time — identical shape to `similarPairs` in
  *    [[DataQueries]] (K=12, 4 bands × r=3, cap 256).
  *
  * Numbers go to COVERAGE.md's performance notes. Not part of the driver
  * contract.
  *
  * Usage: `runMain graft.SkewProbe <sfDir> [megaDocs]` — sfDir is a
  * ScaleGen output (or /root/testdata/sf0.1 for a small smoke run).
  */
object SkewProbe {
  private val K = 12
  private val Bands = 4
  private val R = 3
  private val Cap = 256 // same guard as DataQueries.HotBucketCap

  /** (doc_id, band, bucket, sig) for the skewed corpus. */
  private def buckets(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .withColumn("sh", TextAnalysis.shingles(col("toks"), 3))
      .withColumn("sig", Dedup.minhashSig(col("sh"), K))
      .select(col("doc_id"), col("sig"),
        explode(Dedup.bandBuckets(col("sig"), Bands, R)).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))

  private def pairsPipeline(bk: DataFrame): DataFrame = {
    val a = bk.select(col("doc_id").as("id_a"), col("sig").as("sig_a"),
      col("band"), col("bucket"))
    val b = bk.select(col("doc_id").as("id_b"), col("sig").as("sig_b"),
      col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.estJaccard(col("sig_a"), col("sig_b"), K).as("est_jaccard"))
      .distinct()
      .where(col("est_jaccard") >= 0.5)
  }

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val megaDocs = if (args.length > 1) args(1).toInt else 10000
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val background = Tables.documentsHot(spark, sfDir).select(col("doc_id"), col("text"))
    // One mega-cluster: 60 shared base words + a per-doc tail token. Each
    // doc differs from the base in 3 of ~61 shingles, so per band the
    // probability its slice matches the base's is ~(60/63)^(3·R) ≈ 0.86 —
    // a bucket of ~0.86·megaDocs colliding documents per band.
    val mega = spark.range(megaDocs.toLong)
      .select((col("id") + lit(1000000000L)).as("doc_id"),
        concat(
          lit((0 until 60).map(i => s"base$i").mkString(" ")),
          lit(" tail"), col("id").cast("string")).as("text"))
    val corpus = background.unionByName(mega)
      .repartition(32).persist()
    val n = corpus.count()
    println(s"[skew] corpus=$n docs (background=${n - megaDocs}, mega-cluster=$megaDocs)")

    val bk = buckets(corpus).persist()
    bk.count() // materialize once; both arms reuse the same bucket table

    val hist = bk.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("s"))
      .agg(sum(expr("s * (s - 1) / 2")).as("pairs"),
        max(col("s")).as("max_bucket"),
        sum(when(col("s") > Cap, 1).otherwise(0)).as("buckets_over_cap"),
        sum(expr(s"CASE WHEN s <= $Cap THEN s * (s - 1) / 2 ELSE 0 END"))
          .as("pairs_capped"))
      .collect()(0)
    println(s"[skew] analytic: uncapped_pairs=${hist.getAs[Any]("pairs")} " +
      s"capped_pairs=${hist.getAs[Any]("pairs_capped")} " +
      s"max_bucket=${hist.getAs[Any]("max_bucket")} " +
      s"buckets_over_cap=${hist.getAs[Any]("buckets_over_cap")}")

    // Uncapped candidate join: real output row count (no scoring).
    val a = bk.select(col("doc_id").as("id_a"), col("band"), col("bucket"))
    val b = bk.select(col("doc_id").as("id_b"), col("band"), col("bucket"))
    val (uncappedRows, tUncapped) = timed {
      a.join(b, Seq("band", "bucket")).where(col("id_a") < col("id_b")).count()
    }
    println(f"[skew] uncapped join: rows=$uncappedRows t=$tUncapped%.1f s")

    // Capped full pipeline (the production shape).
    val capped = Dedup.capHotBuckets(bk, Seq("band", "bucket"), Cap)
    val (cappedPairs, tCapped) = timed { pairsPipeline(capped).count() }
    println(f"[skew] capped pipeline: pairs>=0.5=$cappedPairs t=$tCapped%.1f s " +
      f"(join bounded at O(buckets x cap^2); mega-cluster buckets dropped)")

    if (args.length > 2 && args(2) == "full") {
      // The counterfactual: score + distinct + threshold over the
      // uncapped candidate set (the quadratic mega-bucket included).
      val (uncappedPairs, tFull) = timed { pairsPipeline(bk).count() }
      println(f"[skew] UNCAPPED pipeline: pairs>=0.5=$uncappedPairs t=$tFull%.1f s")
    }

    bk.unpersist(); corpus.unpersist()
    spark.stop()
  }
}
