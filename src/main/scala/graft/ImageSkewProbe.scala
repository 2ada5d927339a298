package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.data.{Dedup, Multimodal}
import graft.functions.MediaFunctions

/** Skew probe for the IMAGE Hamming band join (VERDICT r7 #1) — the
  * image twin of [[SkewProbe]]: builds a corpus of the sf images plus a
  * mega-cluster of `megaDocs` IDENTICAL images (one text, repeated — the
  * common case in a real crawl: exact-duplicate images share the same
  * perceptual hash, hence ALL four band values), and measures that the
  * production shape in [[MediaQueries]] — collapse to one row per
  * DISTINCT phash before banding, then [[Dedup.capHotBuckets]] on
  * (band, bv) — bounds the candidate join where naive doc-level banding
  * is quadratic in the cluster:
  *
  *  - analytic candidate pairs Σ s(s−1)/2 over the DOC-level band-bucket
  *    histogram (the uncapped mega-bucket contributes ~megaDocs²/2 pairs
  *    PER BAND);
  *  - the measured row count + wall time of the naive doc-level banded
  *    join (the r7 shape this probe exists to retire), vs
  *  - the distinct-phash + capped candidate join (rep granularity) and
  *    the full doc-level expansion count (output-sized by contract).
  *
  * Numbers go to COVERAGE.md's performance notes. Not part of the driver
  * contract.
  *
  * Usage: `runMain graft.ImageSkewProbe <sfDir> [megaDocs]`.
  */
object ImageSkewProbe {
  import MediaQueries.{HamBands, BandBits, HamThresh, HotBandCap}

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def banded(hashed: DataFrame, idCol: String): DataFrame =
    hashed.select(col(idCol),
        explode(array((0 until HamBands).map(b =>
          struct(lit(b.toLong).as("band"),
            shiftright(col("phash"), b * BandBits)
              .bitwiseAND(lit((1L << BandBits) - 1)).as("bv"))): _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bv").as("bv"))

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
    MediaFunctions.register(spark)
    import MediaFunctions.media_dhash

    // Mega-cluster: one image text repeated megaDocs times, under BMP-route
    // doc ids (odd, % 10 != 3) — every copy hashes to the SAME phash.
    val megaText = (0 until 64).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val mega = spark.range(megaDocs.toLong)
      .select((col("id") * 10 + lit(1000000001L)).as("doc_id"),
        lit(megaText).as("text"))
    val corpus = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .unionByName(mega)
    val hashed = Multimodal.packRealMedia(corpus, "doc_id", "text")
      .select(col("doc_id"), media_dhash(col("payload")).as("phash"))
      .where(col("phash").isNotNull)
      .repartition(32).persist()
    val nImg = hashed.count()
    println(s"[imgskew] corpus=$nImg images (mega-cluster=$megaDocs identical)")

    // Analytic doc-level histogram: the quadratic term the collapse cuts.
    val docBands = banded(hashed, "doc_id").persist()
    docBands.count()
    val hist = docBands.groupBy(col("band"), col("bv"))
      .agg(count(lit(1)).as("s"))
      .agg(sum(expr("s * (s - 1) / 2")).as("pairs"),
        max(col("s")).as("max_bucket"))
      .collect()(0)
    println(s"[imgskew] analytic doc-level: uncapped_pairs=" +
      s"${hist.getAs[Any]("pairs")} max_bucket=${hist.getAs[Any]("max_bucket")}")

    // Naive doc-level banded join (the retired r7 shape): real output rows.
    val a = docBands.select(col("doc_id").as("id_a"), col("band"), col("bv"))
    val b = docBands.select(col("doc_id").as("id_b"), col("band"), col("bv"))
    val (naiveRows, tNaive) = timed {
      a.join(b, Seq("band", "bv")).where(col("id_a") < col("id_b")).count()
    }
    println(f"[imgskew] naive doc-level join: rows=$naiveRows t=$tNaive%.1f s")
    docBands.unpersist()

    // Production shape: distinct-phash collapse + capHotBuckets.
    val (repRows, tRep) = timed {
      val ph = hashed.select(col("phash")).distinct()
      val capped = Dedup.capHotBuckets(banded(ph, "phash"),
        Seq("band", "bv"), HotBandCap)
      val lhs = capped.select(col("band"), col("bv"), col("phash").as("pa"))
      val rhs = capped.select(col("band"), col("bv"), col("phash").as("pb"))
      lhs.join(rhs, Seq("band", "bv")).where(col("pa") < col("pb"))
        .select(col("pa"), col("pb")).distinct()
        .where(bit_count(col("pa").bitwiseXOR(col("pb"))) <= HamThresh)
        .count()
    }
    println(f"[imgskew] rep-level capped candidates: rows=$repRows t=$tRep%.1f s " +
      f"(mega-cluster enters banding ONCE; join bounded at O(buckets x cap^2))")

    // Full production pair query incl. the output-sized expansion.
    val (outRows, tOut) = timed { MediaQueries.repPairs(spark, sfDir).count() }
    println(f"[imgskew] shipped repPairs on $sfDir: rows=$outRows t=$tOut%.1f s")

    hashed.unpersist()
    spark.stop()
  }
}
